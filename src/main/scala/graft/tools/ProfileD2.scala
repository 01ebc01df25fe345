package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.SparkEntry

object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000))

    // bucket size distribution
    val withHashes = Dedup.shingleSets(docs, "doc_id", "text", 3)
    val withSig = withHashes.select(col("id"),
      Dedup.minhashSignatureFromHashes(col("shingle_set"), 64).as("sig"))
    val buckets = withSig.select(col("id"), explode(expr(
      "transform(sequence(0,7), b -> concat(b, ':', concat_ws(',', slice(sig, b*8+1, 8))))")).as("bucket"))
    val dist = buckets.groupBy("bucket").count().groupBy("count").agg(count(lit(1)).as("n_buckets"))
      .orderBy(desc("count")).limit(20).collect()
    println("bucket_size -> n_buckets (top 20 by size):")
    dist.foreach(r => println(s"  ${r.get(0)} -> ${r.get(1)}"))
    val cand = buckets.as("l").join(buckets.as("r"), "bucket")
      .filter(col("l.id") < col("r.id")).count()
    println(s"raw candidate pairs (pre-dedup): $cand")

    def fn = SparkEntry.queries("d2_dedup_minhash")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[d2 run $i] ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$n)")
    }
    spark.stop()
  }
}
