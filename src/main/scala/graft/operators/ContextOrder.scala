package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GreedyChainExpr, HyperplaneSketchExpr}

/** In-context-pretraining document ordering (Shi et al., ICLR 2024):
  * instead of packing shuffled documents into training contexts, chain
  * semantically similar documents so each context reads coherently —
  * measured to improve downstream quality at identical token budgets.
  *
  * Distributed decomposition: the published method orders the WHOLE
  * corpus along one similarity path, which no engine does at 100 TB in
  * one piece. Here the corpus buckets by a seeded random-hyperplane
  * sketch of the embedding (cosine-similar docs land together with LSH
  * probability), and each bucket chains independently with the greedy
  * nearest-neighbor walk ([[graft.functions.GreedyChainExpr]]) —
  * downstream packing consumes buckets as context streams. Bucket
  * granularity is the scale knob: `numPlanes` bits halve expected
  * bucket size each; pick `numPlanes ≈ log2(corpus / targetBucket)`
  * so the O(b²) per-bucket chain stays bounded — the same
  * cap-by-construction contract as the LSH dedup family. One shuffle
  * (the bucket groupBy); the chain itself is a map-side kernel over
  * each bucket's collected members, deterministic in (seed, data).
  *
  * Returns `(bucket, seq_ix, idCol, n_bucket)` — the within-bucket
  * chain position and the bucket's size. */
object ContextOrder {

  def orderWithinBuckets(df: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Array[Double]]): DataFrame = {
    require(planes.nonEmpty, "need at least one hyperplane")
    df.select(
        HyperplaneSketchExpr(col(vecCol), planes).as("bucket"),
        struct(col(idCol).cast("long").as("id"),
          col(vecCol).cast("array<double>").as("v")).as("__m"))
      .groupBy("bucket")
      // sort by id so the collected order is deterministic before the
      // kernel runs (collect_list order is not a contract)
      .agg(sort_array(collect_list(col("__m"))).as("__ms"))
      .select(col("bucket"), size(col("__ms")).cast("long").as("n_bucket"),
        posexplode(GreedyChainExpr(col("__ms"))).as(Seq("seq_ix", idCol)))
      .select(col("bucket"), col("seq_ix").cast("long").as("seq_ix"),
        col(idCol), col("n_bucket"))
  }

  /** [[orderWithinBuckets]] with the seeded Gaussian plane family the
    * ANN operators share. */
  def orderWithinBuckets(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, numPlanes: Int, seed: Long): DataFrame =
    orderWithinBuckets(df, idCol, vecCol, Ann.hyperplanes(dim, numPlanes, seed))
}
