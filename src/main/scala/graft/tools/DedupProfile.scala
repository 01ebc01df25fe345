package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-by-phase timing of the minhash-LSH dedup pipeline at a given SF —
  * diagnostic main for plan iteration (mirrors Dedup.minhashPairs' stages). */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.operators.Dedup
    time("warmup-docs")(docs.count())
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("shingle-sets")(sets.count())
    val setsP = sets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle-persist")(setsP.count())
    val sig = setsP.select(col("id"),
      Dedup.minhashSignatureFromHashes(col("shingle_set"), 64, 42L).as("sig"))
    time("signatures")(sig.count())
    for (i <- 1 to 3) {
      time(s"pairs-persist-$i") {
        spark.catalog.clearCache()
        Dedup.minhashPairs(docs, "doc_id", "text", persistShingles = true).count()
      }
      time(s"pairs-recompute-$i") {
        spark.catalog.clearCache()
        Dedup.minhashPairs(docs, "doc_id", "text", persistShingles = false).count()
      }
    }
    spark.stop()
  }
}
