package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixing

/** Epoch water-filling: hand-computed levels, saturation boundaries,
  * over-budget behavior, refusals. */
class WaterfillSpec extends SparkSpec {
  import spark.implicits._

  private def run(budget: Long,
      rows: (String, Long, Long)*): Map[String, (Long, Long, Boolean)] =
    Mixing.epochWaterfill(rows.toSeq.toDF("source", "tokens", "cap"),
        "source", "tokens", "cap", budget)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap

  test("level inside the first bracket: nobody saturates") {
    // a:100@cap2, b:300@cap4. budget 200 -> λ = 200/400 = 0.5 epochs
    val r = run(200, ("a", 100, 2), ("b", 300, 4))
    assert(r("a") == ((500L, 50L, false)), r.toString)
    assert(r("b") == ((500L, 150L, false)), r.toString)
  }

  test("low-cap source saturates, level keeps rising") {
    // a:100@cap1, b:100@cap4. consumption at λ: λ<=1: 200λ;
    // budget 300 -> a saturates at 1 (100), b gets (300-100)/100 = 2.0
    val r = run(300, ("a", 100, 1), ("b", 100, 4))
    assert(r("a") == ((1000L, 100L, true)), r.toString)
    assert(r("b") == ((2000L, 200L, false)), r.toString)
    // allocations exactly spend the budget here
    assert(r.values.map(_._2).sum == 300L)
  }

  test("budget over total capacity: all saturate, shortfall visible") {
    val r = run(10000, ("a", 100, 2), ("b", 50, 4))
    assert(r("a") == ((2000L, 200L, true)), r.toString)
    assert(r("b") == ((4000L, 200L, true)), r.toString)
    assert(r.values.map(_._2).sum == 400L, "capacity, not budget")
  }

  test("budget exactly at a cap boundary") {
    // a:100@cap1, b:100@cap2; budget 200 -> λ = 1.0: a saturated AT the
    // boundary, b at exactly 1.0 epochs unsaturated
    val r = run(200, ("a", 100, 1), ("b", 100, 2))
    assert(r("a") == ((1000L, 100L, true)), r.toString)
    assert(r("b") == ((1000L, 100L, false)), r.toString)
  }

  test("cap ties are one level; milli floor under-allocates, never over") {
    // three sources sharing cap 3, budget not divisible: λ floor
    val r = run(1000, ("a", 300, 3), ("b", 300, 3), ("c", 301, 3))
    val total = r.values.map(_._2).sum
    assert(total <= 1000L && total >= 1000L - 3, s"total $total")
    assert(r.values.forall(!_._3))
  }

  test("refusals: null/non-positive tokens or caps") {
    intercept[Exception] {
      Mixing.epochWaterfill(
        Seq(("a", 0L, 2L)).toDF("source", "tokens", "cap"),
        "source", "tokens", "cap", 10).collect()
    }
    intercept[Exception] {
      Mixing.epochWaterfill(
        Seq(("a", java.lang.Long.valueOf(5L),
          null.asInstanceOf[java.lang.Long]))
          .toDF("source", "tokens", "cap"),
        "source", "tokens", "cap", 10).collect()
    }
    intercept[IllegalArgumentException] {
      Mixing.epochWaterfill(
        Seq(("a", 5L, 2L)).toDF("source", "tokens", "cap"),
        "source", "tokens", "cap", 0)
    }
  }
}
