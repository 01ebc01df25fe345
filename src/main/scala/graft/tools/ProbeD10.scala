package graft.tools

import org.apache.spark.sql.SparkSession

/** Profiling main for the spanStats path: times the operator (persisted and
  * unpersisted span frame) over a documents dir — the harness used to find
  * and fix the interpreted-HOF span generation and the counts-side
  * broadcast OOM (see [[graft.functions.WordSpansExpr]] scaladoc). */
object ProbeD10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("probe-d10").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $tag rows=$n t=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (r <- 1 to 3) {
      time(s"r$r spanStats persist") {
        graft.operators.Dedup.spanStats(docs, "doc_id", "text", n = 5, minDocs = 2).count() }
      time(s"r$r spanStats nopersist") {
        graft.operators.Dedup.spanStats(docs, "doc_id", "text", n = 5, minDocs = 2,
          persistSpans = false).count() }
    }
    spark.stop()
  }
}
