package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Timer for the n-gram language-ID path (t1b). */
object ProbeT1b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.option("pathGlobFilter", "documents.parquet")
      .parquet(dir).select(col("doc_id"), col("text"))
    val df = docs.select(TextFunctions.langIdNgram(col("text")).as("l"))
    df.count()
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[probe-t1b] langIdNgram ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    spark.stop()
  }
}
