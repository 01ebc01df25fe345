package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling main for the bench scaling-slope outliers (t15_heavyhitters,
  * t12b_bm25): separates the three candidate causes of a >1 slope on the
  * replicated corpus —
  *   (a) text-byte inflation: per-replica token suffixes ("_r7") grow the
  *       corpus BYTES by more than the row factor, and both queries are
  *       tokenizer-bound map-only scans;
  *   (b) regime transition: at 1× the Misra-Gries capacity (64) exceeds the
  *       corpus vocabulary so updates are pure map hits; at 10× the
  *       suffixed vocabulary is ~10× and every novel token pays the
  *       decrement-all eviction path — a one-time constant-factor shift,
  *       not a scaling behavior;
  *   (c) genuine super-linearity: cost growing faster than input between
  *       10× and 20×, which no artifact explains.
  * Prints bytes factors, a tokenize-only baseline, per-query times at
  * 1×/10×/20×, and the MARGINAL slope t(20×)/(2·t(10×)) — ~1.0 means the
  * incremental behavior is linear and the headline slope is (a)+(b). */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("probe-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dirs = Seq(1 -> sfDir) ++ Seq(10, 20).map(f =>
      f -> graft.Bench.buildScaledDir(spark, sfDir, f))

    val bytes = dirs.map { case (f, d) =>
      val b = spark.read.parquet(s"$d/documents.parquet")
        .agg(sum(length(col("text")))).head.getLong(0)
      f -> b
    }.toMap
    println(f"[probe] text bytes 1x=${bytes(1)} 10x=${bytes(10)} " +
      f"(factor ${bytes(10).toDouble / bytes(1)}%.2f) 20x=${bytes(20)} " +
      f"(factor ${bytes(20).toDouble / bytes(1)}%.2f)")

    def time(tag: String)(f: => Long): Double = {
      // best of 2 warm runs, matching the bench's scale-leg protocol
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); (n, s)
      }
      val best = ts.map(_._2).min
      println(f"[probe] $tag rows=${ts.head._1} t=$best%.3f s")
      best
    }

    val results = scala.collection.mutable.Map.empty[(String, Int), Double]
    for ((f, d) <- dirs) {
      val docs = spark.read.parquet(s"$d/documents.parquet")
      results(("tokenize", f)) = time(s"tokenize ${f}x") {
        docs.select(graft.functions.TextFunctions.words(col("text")).as("w"))
          .agg(sum(size(col("w")))).head.getLong(0)
      }
      results(("t15", f)) = time(s"t15_heavyhitters ${f}x") {
        graft.SparkEntry.queries("t15_heavyhitters")(spark, d).count()
      }
      results(("t12b", f)) = time(s"t12b_bm25 ${f}x") {
        graft.SparkEntry.queries("t12b_bm25")(spark, d).count()
      }
    }
    for (q <- Seq("tokenize", "t15", "t12b")) {
      val s10 = results((q, 10)) / (results((q, 1)) * 10)
      val marginal = results((q, 20)) / (results((q, 10)) * 2)
      println(f"[probe] $q%-9s slope(1->10x)=$s10%.2f  MARGINAL slope(10->20x)=$marginal%.2f")
    }
    spark.stop()
  }
}
