package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm timing of the trigram backoff scorer alone (train once, score
  * repeatedly) — isolates the t20 hot loop from training and session
  * overhead to adjudicate scoring-kernel changes. */
object ProfileLm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // replicate 20x for a stable scoring workload
    val big = docs.crossJoin(spark.range(20).select(col("id").as("__rep")))
      .select((col("doc_id") * 100 + col("__rep")).as("doc_id"), col("text"))
      .persist()
    println(s"[lm] scoring rows: ${big.count()}")
    val lm = graft.functions.LanguageModel.trainTrigram(docs, "text")
    for (i <- 1 to 6) {
      val t0 = System.nanoTime()
      val n = graft.functions.LanguageModel
        .backoffScore(big, "doc_id", "text", lm).count()
      println(f"[lm] pass $i: ${(System.nanoTime() - t0) / 1e9}%6.3f s ($n rows)")
    }
    spark.stop()
  }
}
