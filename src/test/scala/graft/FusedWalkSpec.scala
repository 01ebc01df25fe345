package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{Frontier, Graph}

/** r20 optimization lock-in: walks of ≤ Graph.FuseIterationLimit
  * iterations run as ONE fused plan (no per-round persist/count/barrier);
  * longer walks keep the barrier discipline. Both paths must produce
  * IDENTICAL rows on identical inputs — asserted here by forcing the
  * barrier path via the test-only fuseLimitOverride hook. */
class FusedWalkSpec extends SparkSpec {
  import spark.implicits._

  private def withBarrierForced[A](body: => A): A = {
    Graph.fuseLimitOverride = Some(0)
    try body finally Graph.fuseLimitOverride = None
  }

  private def assertSameRows(fused: DataFrame, barrier: DataFrame): Unit = {
    val f = canon(fused)
    val b = canon(barrier)
    assert(f == b, s"fused and barrier walks disagree:\n$f\nvs\n$b")
  }

  // irregular graph: cycle + dangling sink + fan-in + isolated-from-seed farm
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 5L), (2L, 5L),
    (8L, 9L), (9L, 8L), (8L, 5L)).toDF("src", "dst")

  test("pageRank: fused plan ≡ barrier plan, iterations inside the limit") {
    assert(Graph.fuseLimit == Graph.FuseIterationLimit)
    for (iters <- Seq(1, 5, Graph.FuseIterationLimit)) {
      val fused = Graph.pageRank(edges, "src", "dst", iterations = iters)
      val barrier = withBarrierForced(
        Graph.pageRank(edges, "src", "dst", iterations = iters))
      assertSameRows(fused, barrier)
    }
  }

  test("pageRank: above the limit both calls take the barrier path and " +
      "agree with a forced-barrier run") {
    val over = Graph.FuseIterationLimit + 2
    val a = Graph.pageRank(edges, "src", "dst", iterations = over)
    val b = withBarrierForced(
      Graph.pageRank(edges, "src", "dst", iterations = over))
    assertSameRows(a, b)
  }

  test("trustRank: fused plan ≡ barrier plan") {
    val seeds = Seq(1L, 4L).toDF("s")
    for (iters <- Seq(1, 5)) {
      val fused = Graph.trustRank(edges, "src", "dst", seeds, "s", iters)
      val barrier = withBarrierForced(
        Graph.trustRank(edges, "src", "dst", seeds, "s", iters))
      assertSameRows(fused, barrier)
    }
  }

  test("resolveRedirects: fused plan ≡ barrier plan across resolved, " +
      "loop, exceeded and mixed-status outcomes") {
    // chain a→b→c→d (permanent), loop l1→l2→l1, long chain that exceeds
    // maxHops, and a mixed-status source (302 twice → politer reading)
    val rows = Seq(
      ("http://a/", 301, "http://b/"),
      ("http://b/", 308, "http://c/"),
      ("http://c/", 301, "http://d/"),
      ("http://l1/", 302, "http://l2/"),
      ("http://l2/", 302, "http://l1/"),
      ("http://e1/", 301, "http://e2/"),
      ("http://e2/", 301, "http://e3/"),
      ("http://e3/", 301, "http://e4/"),
      ("http://e4/", 301, "http://e5/"),
      ("http://e5/", 301, "http://e6/"),
      ("http://m/", 301, "http://c/"),
      ("http://m/", 302, "http://c/")).toDF("url", "status", "location")
    for (hops <- Seq(3, 5)) {
      val fused = Frontier.resolveRedirects(rows, "url", "status",
        "location", maxHops = hops)
      val barrier = withBarrierForced(Frontier.resolveRedirects(
        rows, "url", "status", "location", maxHops = hops))
      assertSameRows(fused, barrier)
    }
  }
}
