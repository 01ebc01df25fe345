package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.SparkEntry

/** Stage-level timing breakdown of the d2 minhash pipeline. */
object ProfileD2 {
  private def time(label: String)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = body
    println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$n)")
  }

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

    val numHashes = 64
    val rowsPerBand = 8

    // warmup: touch the scan
    docs.select(sum(length(col("text")))).collect()
    // stage 1: text -> shingle sets (xxhash64 over the array forces it)
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("shingleSets forced")(sets.select(sum(xxhash64(col("shingle_set")))).count())
    time("shingleSets forced x2")(sets.select(sum(xxhash64(col("shingle_set")))).count())
    // stage 2: + minhash signature
    val withSig = sets.select(col("id"),
      Dedup.minhashSignatureFromHashes(col("shingle_set"), numHashes).as("sig"))
    time("sig forced")(withSig.select(sum(xxhash64(col("sig")))).count())
    time("sig forced x2")(withSig.select(sum(xxhash64(col("sig")))).count())
    // stage 3: band explode + self-join candidates (ids only)
    val buckets = withSig.select(col("id"),
      explode(expr(s"transform(sequence(0,${numHashes / rowsPerBand - 1}), " +
        s"b -> xxhash64(b, slice(sig, b*$rowsPerBand+1, $rowsPerBand)))")).as("bucket"))
    val cands = buckets.as("l").join(buckets.as("r"), "bucket")
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    time("candidates (2x recompute)")(cands.count())
    // stage 4: full pipeline
    def fn = SparkEntry.queries("d2_dedup_minhash")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[d2 run $i] ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$n)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
