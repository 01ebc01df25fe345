package graft

import org.apache.spark.sql.functions._

import graft.operators._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    "alpha beta gamma delta epsilon",
    "one two three").toDF("text")

  private val train = Seq(
    (1L, "alpha beta gamma delta epsilon"),       // verbatim eval doc -> 1.0
    (2L, "alpha beta gamma zzz"),                 // 1 of 2 trigrams match -> 0.5
    (3L, "totally unrelated words in this doc"),  // 0.0
    (4L, "one two"))                              // short doc, whole-doc shingle
    .toDF("id", "text")

  test("ngramOverlap computes exact per-doc trigram contamination") {
    val out = Decontaminate.ngramOverlap(train, "id", "text", bench, "text",
        n = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((3L, 3L, 1.0, true)))
    assert(out(2L) == ((1L, 2L, 0.5, true)))
    assert(out(3L) == ((0L, 4L, 0.0, false)))
    // "one two" collapses to the whole-doc shingle "one two", which is NOT
    // a bench trigram ("one two three" is) -> no match
    assert(out(4L) == ((0L, 1L, 0.0, false)))
  }

  test("decontaminate drops exactly the flagged docs, keeps full rows") {
    val kept = Decontaminate.decontaminate(train, "id", "text", bench, "text",
      n = 3, threshold = 0.5)
    assert(kept.columns.toSeq == Seq("id", "text"))
    assert(kept.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("bench side is broadcast: no shuffle of the training corpus for matching") {
    val plan = Decontaminate.ngramOverlap(train, "id", "text", bench, "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"gram match must be a broadcast join, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the gram match:\n$plan")
  }
}
