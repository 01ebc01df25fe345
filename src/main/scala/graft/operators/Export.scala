package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The last mile of a training-data pipeline: export the curated corpus
  * as N shards a dataloader consumes, with an integrity MANIFEST — per
  * shard, the document count, token total and an order-independent
  * content checksum — so the training side can verify nothing was lost
  * or duplicated between the pipeline and the run (a silently-missing
  * shard file is the classic way a "random" quality regression enters a
  * training run).
  *
  * Shard assignment is a deterministic hash of the id (the md5-prefix
  * integer hash — SQL-replayable in any engine, the cross-engine gate
  * convention): shuffle-free to compute, stable under re-export, and
  * token-balanced by concentration (each shard samples uniformly from
  * the corpus; at training scale the per-shard token totals concentrate
  * tightly — the manifest REPORTS them so the consumer can check, and a
  * pathologically skewed corpus pre-chunks upstream). The per-shard
  * checksum is the SUM of bounded per-doc hash residues — commutative,
  * so any engine and any row order reproduces it.
  */
object Export {

  private val ManifestDir = "_graft_manifest"

  private def docHash(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Shard assignment + per-shard stats (no files written) — the pure
    * frame both [[writeShards]] and the oracle-facing gates read:
    * `(gr_shard, n_docs, n_tokens, checksum)`. */
  def shardStats(df: DataFrame, idCol: String, tokenCol: String,
      numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1; got $numShards")
    df.select(
        (docHash(col(idCol)) % numShards).as("gr_shard"),
        col(tokenCol).cast("long").as("__tok"),
        (docHash(col(idCol)) % 1000003L).as("__res"))
      .groupBy("gr_shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        sum(col("__res")).as("checksum"))
  }

  /** Export `df` as hash-sharded parquet under `path/gr_shard=K/` plus
    * the manifest at `path/_graft_manifest/` (underscore-prefixed: data
    * readers — Spark's and graft discovery alike — skip it). One
    * partitioned write from one scan; the manifest is computed from the
    * SAME assignment expression, not from re-listing the output. */
  def writeShards(df: DataFrame, path: String, idCol: String,
      tokenCol: String, numShards: Int): Unit = {
    require(numShards >= 1, s"numShards must be >= 1; got $numShards")
    df.withColumn("gr_shard", docHash(col(idCol)) % numShards)
      .write.mode("overwrite").partitionBy("gr_shard").parquet(path)
    shardStats(df, idCol, tokenCol, numShards)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/$ManifestDir")
  }

  def readManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/$ManifestDir")

  /** Integrity check: recompute every shard's stats FROM THE DATA and
    * compare to the manifest — full outer, so a shard missing from
    * either side surfaces as a mismatch instead of vanishing. Returns
    * one row per shard: `(gr_shard, n_docs, n_tokens, checksum, ok)`
    * with the manifest's values and `ok` = all three recomputed values
    * match. A lost shard directory, a truncated file, a duplicated doc
    * or a re-export under different sharding all read `ok = false`. */
  def verifyShards(spark: SparkSession, path: String, idCol: String,
      tokenCol: String): DataFrame = {
    val actual = spark.read.parquet(path)
      .select(col("gr_shard").cast("long").as("gr_shard"),
        col(tokenCol).cast("long").as("__tok"),
        (docHash(col(idCol)) % 1000003L).as("__res"))
      .groupBy("gr_shard")
      .agg(count(lit(1)).as("__an"), sum(col("__tok")).as("__at"),
        sum(col("__res")).as("__ac"))
    readManifest(spark, path)
      .join(actual, Seq("gr_shard"), "full_outer")
      .select(col("gr_shard"), col("n_docs"), col("n_tokens"),
        col("checksum"),
        (col("n_docs") <=> col("__an") && col("n_tokens") <=> col("__at") &&
          col("checksum") <=> col("__ac")).as("ok"))
  }
}
