package graft

import org.apache.spark.sql.functions._
import graft.operators.Frontier

/** Fetch-history retention: the maxEvents suffix walk converges to the
  * full-history interval once the interval path saturates, validators
  * always come from the last row, and pruneFetchHistory keeps exactly
  * the suffix rows. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  // one URL, 30 fetches 1000s apart: hash changes on the first 3
  // fetches then goes quiet — the interval halves to min, then doubles
  // to the max clamp and SATURATES well before the suffix window
  private def longHistory = (0 until 30).map { i =>
    val h = if (i < 3) s"v$i" else "stable"
    ("u", i * 1000L, h, s"e$i", null.asInstanceOf[java.lang.Long])
  }.toDF("url", "ts", "h", "etag", "lm")

  test("suffix walk converges to the saturated full-history interval") {
    def plan(maxEvents: Int) = Frontier.revalidationPlan(
      longHistory, "url", "ts", "h", "etag", "lm",
      nowSec = 50000L, baseSec = 400L, minSec = 100L, maxSec = 1600L,
      maxEvents = maxEvents).collect().head
    val full = plan(Int.MaxValue)
    val sufx = plan(8)
    // interval saturated at maxSec long before the last 8 events
    assert(full.getLong(3) == 1600L, full.toString)
    assert(sufx.getLong(3) == full.getLong(3), s"$sufx vs $full")
    assert(sufx.getLong(4) == full.getLong(4), "next_due must agree")
    assert(sufx.getBoolean(5) == full.getBoolean(5), "due must agree")
    // validators are the LAST row's regardless of retention
    assert(sufx.getString(6) == "e29" && full.getString(6) == "e29")
    // counts are suffix-local under retention, by construction
    assert(full.getLong(1) == 30L && sufx.getLong(1) == 8L)
    // v0→v1, v1→v2, v2→stable: three observed changes in the full walk
    assert(full.getLong(2) == 3L && sufx.getLong(2) == 0L)
  }

  test("pruneFetchHistory keeps exactly each URL's last-K rows") {
    val hist = longHistory.unionByName(
      Seq(("v", 5L, "x", "ev", null.asInstanceOf[java.lang.Long]))
        .toDF("url", "ts", "h", "etag", "lm"))
    val kept = Frontier.pruneFetchHistory(hist, "url", "ts", maxEvents = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(kept.count(_._1 == "u") == 8)
    assert(kept.filter(_._1 == "u").map(_._2).sorted.toSeq ==
      (22 until 30).map(_ * 1000L))
    // under-K URLs keep everything
    assert(kept.filter(_._1 == "v").toSeq == Seq(("v", 5L)))
    // the pruned table feeds the same suffix plan
    val p = Frontier.revalidationPlan(
      Frontier.pruneFetchHistory(hist, "url", "ts", 8),
      "url", "ts", "h", "etag", "lm",
      nowSec = 50000L, baseSec = 400L, minSec = 100L, maxSec = 1600L)
      .filter(col("url") === "u").collect().head
    assert(p.getLong(3) == 1600L && p.getLong(1) == 8L, p.toString)
  }
}
