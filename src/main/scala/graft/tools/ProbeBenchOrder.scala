package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduces the bench scale-leg measurement in its exact query order to
  * isolate ORDER CONTAMINATION: ProbeScale measured t15_heavyhitters at 10×
  * at ~0.7 s in a fresh JVM, while the bench's scale leg (which runs q6's
  * 15 s window and q20's 14 s join chain immediately before) recorded ~10 s
  * for the same query — a 14× inflation that would read as slope 3.6.
  * Runs the scale set forward, then the light queries again afterwards, so
  * the delta between "after heavies" and "fresh-ish" is visible in one
  * process. */
object ProbeBenchOrder {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("probe-bench-order").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.functions.NanosTimestamp.enable(spark)
    val scaled = graft.Bench.buildScaledDir(spark, sfDir, 10)

    def run(name: String): Double = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, scaled).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); s
      }
      val best = times.min
      val heap = Runtime.getRuntime
      println(f"[order] $name%-18s t=$best%.3f s  (runs ${times.map(t => f"$t%.2f").mkString(",")})" +
        f"  heapUsed=${(heap.totalMemory - heap.freeMemory) / (1 << 20)}%d MiB")
      best
    }

    // warmup at 1× (mirrors bench: main passes precede the scale leg)
    for (n <- graft.Bench.scaleSet) graft.SparkEntry.queries(n)(spark, sfDir).count()
    spark.catalog.clearCache()

    println("[order] === bench order ===")
    graft.Bench.scaleSet.foreach(run)
    println("[order] === light queries re-run after heavies ===")
    Seq("t12b_bm25", "t15_heavyhitters", "as2_asof_native", "d12_chunk_dedup").foreach(run)
    spark.stop()
  }
}
