package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Stage timer for the composed curation pipeline (t64): which stage —
  * langid, quality metrics, the dedup aggregate, or the join-back
  * double-evaluation — carries the cost at sf0.1. */
object ProbeT64 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.option("pathGlobFilter", "documents.parquet")
      .parquet(dir).select(col("doc_id"), col("text"))
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.count() // warm
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[probe-t64] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($n rows)")
    }
    val copies = docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 9900000L).as("doc_id"), col("text"))
    val corpus = docs.unionByName(copies)
    val metrics = TextFunctions.qualityMetrics(col("text"),
      TextFunctions.englishStopwords).toMap
    time("scan")(corpus)
    time("langid")(corpus.select(TextFunctions.langId(col("text")).as("l"))
      .filter(col("l") === "en"))
    time("metrics")(corpus.select(metrics("n_words").as("w"),
      metrics("stopword_ratio").as("r")).filter(col("w") >= 20))
    val staged = corpus.select(col("doc_id"), col("text"),
      TextFunctions.langId(col("text")).as("lang_pred"),
      metrics("n_words").as("n_words"),
      metrics("stopword_ratio").as("stopword_ratio"))
    val filtered = staged.filter(col("lang_pred") === "en" &&
      col("n_words") >= 20 && col("stopword_ratio") > 0.03)
    time("filtered")(filtered)
    time("dedup only")(Dedup.exact(filtered, "doc_id", "text"))
    time("full t64")(Dedup.exact(filtered, "doc_id", "text")
      .select("doc_id", "n_copies")
      .join(filtered.select("doc_id", "n_words", "stopword_ratio"), "doc_id"))
    spark.stop()
  }
}
