package graft

import org.apache.spark.sql.functions._

/** Plan-shape guard for the heavy-hitters aggregate: the sketch must
  * participate in PARTIAL aggregation (map-side ObjectHashAggregate before
  * the exchange), so only capacity-bounded summaries cross the shuffle. */
class HeavyHittersPlanSpec extends SparkSpec {
  import spark.implicits._

  test("sketch aggregates partially: map-side ObjectHashAggregate before the exchange") {
    val docs = Seq((1L, "a b c", "s1"), (2L, "b c d", "s2"), (3L, "a a", "s1"))
      .toDF("doc_id", "text", "source")
    val q = docs.groupBy("source").agg(graft.functions.HeavyHitters
      .heavyHitters(graft.functions.TextFunctions.words(col("text")), 3, 16).as("hh"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final ObjectHashAggregate, got $aggs:\n$plan")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0, s"grouped agg must exchange on the group key:\n$plan")
    // the partial aggregate appears BELOW the exchange in the plan text
    assert(plan.indexOf("ObjectHashAggregate", exchangeIdx) >= 0,
      s"map-side partial aggregate must sit under the exchange:\n$plan")
  }
}
