package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-by-stage timing of the minhash pipeline (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    time("shingle hashes only") {
      docs.select(graft.functions.TextFunctions.words(col("text")).as("w"))
        .select(graft.functions.TextFunctions.shingleHashesFromWords(col("w"), 3).as("h"))
        .select(sum(size(col("h")))).head().getLong(0)
    }
    val withHashes = Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("hashes + distinct") {
      withHashes.select(sum(size(col("shingle_set")))).head().getLong(0)
    }
    val withSig = withHashes.select(col("id"),
      Dedup.minhashSignatureFromHashes(col("shingle_set"), 64).as("sig"))
    time("signature") {
      withSig.select(sum(size(col("sig")))).head().getLong(0)
    }
    time("full pairs") {
      Dedup.minhashPairs(docs, "doc_id", "text", 3, 64, 8, 0.9).count()
    }
    println("=== optimized plan of signature step ===")
    val plan = withSig.queryExecution.optimizedPlan.toString
    println(plan.take(2000))
    println(s"[profile] optimized plan length: ${plan.length} chars; " +
      s"occurrences of 'xxhash64': ${"xxhash64".r.findAllIn(plan).length}")
    spark.stop()
  }
}
