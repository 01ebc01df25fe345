package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Persisted inverted index: bm25 parity, bucket pruning, append
  * semantics, sidecar guards. */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark scan agg window agg"), (2L, "agg filter join"),
    (3L, "window sort scan"), (4L, "filter join sort group"),
    (5L, "agg window scan spark"), (6L, "totally unrelated words here")
  ).toDF("doc_id", "text")

  private def freshPath() = tmpDir("invidx") + "/idx"

  test("query over the index equals bm25 over the corpus (rounded)") {
    val path = freshPath()
    Retrieval.invertedIndexBuildAndWrite(docs, "doc_id", "text", path,
      numBuckets = 8)
    val viaIndex = Retrieval.invertedIndexQuery(spark, path,
        Seq("agg", "window"), k = 10)
      .select("doc_id", "score")
    val direct = Retrieval.bm25(docs, "doc_id", "text", Seq("agg", "window"))
      .select(col("doc_id"), round(col("score"), 6).as("score"))
    assert(canon(viaIndex) == canon(direct))
  }

  test("the scan touches only the query terms' buckets") {
    val path = freshPath()
    Retrieval.invertedIndexBuildAndWrite(docs, "doc_id", "text", path,
      numBuckets = 32)
    val pruned = Retrieval.invertedIndexScan(spark, path, Seq("agg"))
      .inputFiles.length
    val full = spark.read.parquet(path).inputFiles.length
    assert(pruned >= 1 && pruned < full, s"$pruned of $full")
  }

  test("append of a disjoint batch updates stats and answers") {
    val path = freshPath()
    Retrieval.invertedIndexBuildAndWrite(
      docs.filter(col("doc_id") <= 3), "doc_id", "text", path, numBuckets = 8)
    Retrieval.invertedIndexAppend(
      docs.filter(col("doc_id") > 3), "doc_id", "text", path, tag = "b1")
    val viaIndex = Retrieval.invertedIndexQuery(spark, path,
        Seq("agg", "window"), k = 10).select("doc_id", "score")
    val direct = Retrieval.bm25(docs, "doc_id", "text", Seq("agg", "window"))
      .select(col("doc_id"), round(col("score"), 6).as("score"))
    assert(canon(viaIndex) == canon(direct))
  }

  test("a replayed append tag converges: postings and stats never double") {
    val path = freshPath()
    Retrieval.invertedIndexBuildAndWrite(
      docs.filter(col("doc_id") <= 3), "doc_id", "text", path, numBuckets = 8)
    val batch = docs.filter(col("doc_id") > 3)
    Retrieval.invertedIndexAppend(batch, "doc_id", "text", path, "b1")
    val once = canon(Retrieval.invertedIndexQuery(spark, path,
      Seq("agg", "window"), k = 10))
    val rowsOnce = spark.read.parquet(path).count()
    // crash-then-replay of the SAME tag
    Retrieval.invertedIndexAppend(batch, "doc_id", "text", path, "b1")
    assert(spark.read.parquet(path).count() == rowsOnce)
    assert(canon(Retrieval.invertedIndexQuery(spark, path,
      Seq("agg", "window"), k = 10)) == once)
  }

  test("streaming ingest equals the batch build (exactly-once end to end)") {
    val path = freshPath()
    val src = tmpDir("invsrc")
    val cp = tmpDir("invcp")
    Retrieval.invertedIndexBuildAndWrite(
      docs.filter(col("doc_id") <= 2), "doc_id", "text", path, numBuckets = 8)
    docs.filter(col("doc_id") === 3).write.mode("append").parquet(src)
    docs.filter(col("doc_id") > 3).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = graft.streaming.Streams.invertedIngest(
      stream, "doc_id", "text", path, cp)
    try q.processAllAvailable() finally q.stop()
    val viaIndex = Retrieval.invertedIndexQuery(spark, path,
        Seq("agg", "window"), k = 10).select("doc_id", "score")
    val direct = Retrieval.bm25(docs, "doc_id", "text", Seq("agg", "window"))
      .select(col("doc_id"), round(col("score"), 6).as("score"))
    assert(canon(viaIndex) == canon(direct))
  }

  test("querying a non-index path is refused loudly") {
    val path = tmpDir("notidx")
    docs.write.mode("overwrite").parquet(path + "/d")
    intercept[IllegalArgumentException] {
      Retrieval.invertedIndexQuery(spark, path + "/d", Seq("agg"), 5)
    }
  }

  test("out-of-vocabulary terms contribute nothing; all-OOV is empty") {
    val path = freshPath()
    Retrieval.invertedIndexBuildAndWrite(docs, "doc_id", "text", path,
      numBuckets = 8)
    assert(Retrieval.invertedIndexQuery(spark, path,
      Seq("zzz_not_a_word"), 5).count() == 0L)
    val mixed = Retrieval.invertedIndexQuery(spark, path,
      Seq("agg", "zzz_not_a_word"), 10).select("doc_id", "score")
    val direct = Retrieval.bm25(docs, "doc_id", "text", Seq("agg"))
      .select(col("doc_id"), round(col("score"), 6).as("score"))
    assert(canon(mixed) == canon(direct))
  }
}
