package graft.operators

import org.apache.spark.sql.{DataFrame, GraftInternals}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

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

  /** Semi-join reduction: shrink the PROBE side of a join with a Bloom
    * filter of the build side's key set BEFORE the shuffle — the classic
    * distributed-join optimization for the "build side misses the
    * broadcast threshold but its KEY SET still fits a filter" regime.
    * Spark's own runtime filtering (`InjectRuntimeFilter`) applies the
    * same idea opportunistically; this operator makes it explicit and
    * composable, reusing Spark's codegen'd bloom expressions so the probe
    * filter runs inside whole-stage codegen.
    *
    * Returns the probe rows that MIGHT join (no false negatives — every
    * matching row survives; false positives at ~`fpp` do a little extra
    * shuffling and are then dropped by the real join, so any subsequent
    * join is EXACT). At 100 TB the win is shuffle bytes: a 1%-selective
    * build side cuts the probe exchange ~100×, for one extra map-side
    * pass and a driver round-trip of the filter bytes
    * (`optimalNumOfBits(n, fpp)/8` ≈ 1.2 MB per 10⁶ keys at 1%).
    *
    * `expectedItems <= 0` counts the build side's distinct keys first
    * (one narrow aggregation) — pass the estimate when you have one to
    * stay single-pass. Spark's bloom aggregate enforces
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default
    * 4×10⁶) and `.maxNumBits` (default 8 MB) — raise both to filter on
    * larger key sets (memory-rich drivers take 10⁸ keys at ~120 MB).
    * The build aggregation is a bitwise-OR merge:
    * deterministic under any partitioning. Probe rows with a NULL key
    * are dropped EXPLICITLY (xxhash64 hashes null to its seed, not to
    * null, so the filter alone would pass them at ~fpp rate) — correct
    * for the inner/semi joins this pre-filter is for (a left join must
    * keep unmatched probe rows, so filtering the probe side would be
    * WRONG; compose left joins without this). */
  def bloomPreFilter(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val n =
      if (expectedItems > 0) expectedItems
      else build.select(countDistinct(col(buildKey))).head().getLong(0) max 1L
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, fpp)
    val bloomAgg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftInternals.expression(col(buildKey)))),
      Literal(n), Literal(numBits)).toAggregateExpression()
    val bloom = build
      .select(GraftInternals.column(bloomAgg).as("__bloom"))
      .head().getAs[Array[Byte]](0)
    if (bloom == null) probe.filter(lit(false)) // empty build side: nothing joins
    else probe
      .filter(col(probeKey).isNotNull)
      .filter(GraftInternals.column(new BloomFilterMightContain(
        Literal(bloom, BinaryType),
        new XxHash64(Seq(GraftInternals.expression(col(probeKey)))))))
  }

  /** [[bloomPreFilter]] composed with the real join: exact results
    * (false positives drop in the join), probe shuffle reduced first.
    * Inner and left-semi only — the probe-preserving types a semi-join
    * reduction cannot serve are rejected loudly. */
  def bloomJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      joinType: String = "inner",
      expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame = {
    val allowed = Set("inner", "left_semi", "leftsemi", "semi")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"bloomJoin supports inner/left_semi only (got '$joinType'): a " +
        "probe-preserving join must keep rows the pre-filter would drop")
    val filtered = bloomPreFilter(probe, build, probeKey, buildKey,
      expectedItems, fpp)
    filtered.join(build, filtered(probeKey) === build(buildKey), joinType)
  }

  /** EXACT equi-join output cardinality, computed WITHOUT running the
    * join: `|A ⋈ B| = Σ_k cntA(k)·cntB(k)`. The pre-flight a 100 TB join
    * deserves — two partially-aggregated key counts (the shuffle moves one
    * long per distinct key per task, never a data row) and one join of the
    * COUNT tables, versus materializing a possibly-quadratic result to
    * discover it was quadratic. Returns one summary row
    * `(total_pairs, matched_keys, max_key_pairs, top_key)` where `top_key`
    * is the string form of the heaviest key (ties: smallest key string —
    * deterministic); feed it to [[saltedJoin]]'s `saltFactor` decision or
    * to a refusal guard before the real join. Self-cardinality
    * (`joinCardinality(df, k, df, k)`) prices a self-join / pair-dedup. */
  def joinCardinality(
      a: DataFrame,
      aKey: String,
      b: DataFrame,
      bKey: String): DataFrame = {
    val ca = a.filter(col(aKey).isNotNull)
      .groupBy(col(aKey).cast("string").as("__k"))
      .agg(count(lit(1)).as("__ca"))
    val cb = b.filter(col(bKey).isNotNull)
      .groupBy(col(bKey).cast("string").as("__k"))
      .agg(count(lit(1)).as("__cb"))
    // decimal(38,0) arithmetic: the pathological join this pre-flight
    // exists to catch (4e9 × 4e9 rows on one key ≈ 1.6e19 pairs) overflows
    // Long exactly when the answer matters — ANSI mode would throw, legacy
    // mode would wrap negative and wave the quadratic join through
    val pairs = ca.join(cb, "__k")
      .select(col("__k"),
        (col("__ca").cast("decimal(19,0)") * col("__cb").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("__pairs"))
    val stats = pairs.agg(
      sum(col("__pairs")).cast("decimal(38,0)").as("total_pairs"),
      count(lit(1)).as("matched_keys"),
      max(col("__pairs")).as("max_key_pairs"))
    // the heaviest key, resolved against the broadcast one-row stats (the
    // count-tables lineage re-executes — count aggregations, not data)
    val top = pairs
      .join(broadcast(stats.select(col("max_key_pairs").as("__m"))))
      .filter(col("__pairs") === col("__m"))
      .agg(min(col("__k")).as("top_key"))
    stats.crossJoin(broadcast(top))
  }
}
