package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for joins whose hot keys overwhelm single tasks
  * (the pre-AQE technique; still needed when AQE's skew-join can't kick in,
  * e.g. broadcast-ineligible aggregations after the join, or when one key is
  * so hot it exceeds a single task even after AQE splitting).
  *
  * The skewed (large) side gets a deterministic salt in [0, factor); the
  * replicated (smaller) side is exploded once per salt value. The join key
  * becomes (key, salt) — hot keys fan out over `factor` tasks. Row-level
  * results are identical to the unsalted join for any salt assignment.
  */
object Skew {

  /** Measure BEFORE salting: the estimated top-k hottest join keys and
    * their counts, via the mergeable Misra–Gries sketch — one narrow
    * aggregation (no exact groupBy shuffle of the key column), so probing
    * a 100 TB fact table for skew costs a single map-side pass plus a
    * few-KB merge. Any key above rows/(capacity+1) is guaranteed
    * surfaced; feed the result's counts into `factor` (≈ hottest-key
    * share × target tasks). */
  def topKeys(
      df: DataFrame,
      keyCol: String,
      k: Int = 20,
      capacity: Int = 4096): DataFrame =
    df.agg(graft.functions.HeavyHitters
        .heavyHitters(col(keyCol).cast("string"), k, capacity).as("__hh"))
      .select(posexplode(col("__hh")).as(Seq("rank", "h")))
      .select(col("h.item").as("key"), col("h.count").as("est_count"),
        (col("rank") + 1).as("rank"))

  /** The deterministic per-row salt the pre-salted query-table joins key
    * on (annJoin/ivfJoin's corpus side, bm25Join's postings side): a pure
    * function of the row's id, so replays and retries salt identically
    * and the result provably equals the unsalted join. Shared with the
    * specs that pin the per-(key, salt) bound. */
  def saltOf(id: org.apache.spark.sql.Column, saltFactor: Int)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(id), lit(saltFactor.toLong))

  def saltedJoin(
      skewed: DataFrame,
      replicated: DataFrame,
      keys: Seq[String],
      factor: Int,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    // right/full outer would emit each unmatched replicated row `factor`
    // times (once per salt); only skewed-side-preserving types are identical
    // to the unsalted join
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left join types only (got '$joinType'): " +
        "outer-preserving the replicated side would duplicate its unmatched rows")
    // salt from the row's own key hash + a per-row component so one hot key
    // still spreads; xxhash64 over all key cols is deterministic
    val salt = pmod(
      xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*), lit(factor))
    val l = skewed.withColumn("__salt", salt)
    val r = replicated.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1)).cast("array<long>")))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
