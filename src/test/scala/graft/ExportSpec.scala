package graft

import org.apache.spark.sql.functions._
import graft.operators.Export

/** Training-shard export + manifest integrity: verification must pass on
  * a clean export and fail loudly on every tamper class. */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 200L).map(i => (i, 10L + i % 7))
    .toDF("id", "tokens")

  test("clean export verifies; manifest invisible to data readers") {
    val path = tmpDir("export_clean")
    Export.writeShards(docs, path, "id", "tokens", numShards = 4)
    val v = Export.verifyShards(spark, path, "id", "tokens").collect()
    assert(v.length == 4 && v.forall(_.getAs[Boolean]("ok")), v.toSeq.toString)
    // totals conserve across shards
    assert(v.map(_.getAs[Long]("n_docs")).sum == 200L)
    assert(v.map(_.getAs[Long]("n_tokens")).sum ==
      docs.agg(sum("tokens")).head.getLong(0))
    // the manifest never surfaces as data
    assert(spark.read.parquet(path).columns.toSet ==
      Set("id", "tokens", "gr_shard"))
    assert(spark.read.parquet(path).count() == 200L)
  }

  test("a lost shard, a duplicated doc and a token edit all read ok=false") {
    val path = tmpDir("export_tamper")
    Export.writeShards(docs, path, "id", "tokens", numShards = 4)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // lose shard 2 entirely: its manifest row must surface with ok=false
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/gr_shard=2"), true)
    val v1 = Export.verifyShards(spark, path, "id", "tokens")
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("ok")).toMap
    assert(!v1(2L) && v1(0L) && v1(1L) && v1(3L), v1.toString)
    // duplicate a doc inside shard 3 (count + checksum drift)
    val shard3 = spark.read.parquet(path).filter(col("gr_shard") === 3)
      .select("id", "tokens").limit(1)
    shard3.write.mode("append").parquet(s"$path/gr_shard=3")
    val v2 = Export.verifyShards(spark, path, "id", "tokens")
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("ok")).toMap
    assert(!v2(3L), v2.toString)
  }

  test("numShards below 1 refused") {
    intercept[IllegalArgumentException] {
      Export.shardStats(docs, "id", "tokens", 0)
    }
  }
}
