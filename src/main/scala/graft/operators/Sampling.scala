package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for corpus inspection and
  * balanced subset extraction — the "show me 100 docs per source" tool that
  * at 100 TB must neither collect the corpus nor depend on partitioning.
  */
object Sampling {

  /** Exactly min(n, |group|) rows per group, selected by a salted md5 of
    * the id — the same engine-portable determinism trick as
    * [[graft.functions.TextFunctions.deterministicSplit]]: any engine that
    * agrees on md5 picks the identical sample, independent of partitioning,
    * task order, or reruns; changing `salt` re-deals it. Rows with a null
    * id are excluded (a null hashes to null and would sort
    * non-deterministically against real keys).
    *
    * CONTRACT: `idCol` must be unique within each group. Duplicate ids tie
    * on BOTH sort keys, so which of the tied rows is emitted is
    * partitioning-dependent — the determinism guarantee covers the sampled
    * id set either way, but the carried payload columns only under
    * uniqueness (the same caller contract as the as-of join's unique right
    * side).
    *
    * 100 TB shape: ONE hash shuffle on `groupCol`, and the rank filter is
    * recognized by Spark's rank-limit pushdown (`WindowGroupLimit`), so
    * each map task forwards at most `n` rows per group INTO the exchange —
    * the shuffle carries O(tasks × groups × n) rows, not the corpus. The
    * sample is uniform over ids for any fixed salt in the md5 sense
    * (hash-order statistics), and stratification is exact: never fewer
    * than |group| ∧ n rows per group, never more. */
  def sampleByGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      n: Int,
      salt: String = ""): DataFrame = {
    require(n > 0, "sampleByGroup: n must be positive")
    require(!df.columns.contains("__rk"),
      "input already has a '__rk' column — rename it first")
    val order = md5(concat(lit(salt), col(idCol).cast("string")))
    df.filter(col(idCol).isNotNull)
      .withColumn("__rk", row_number().over(
        // idCol tie-break: md5 collisions are unreachable in practice, but
        // a DETERMINISTIC contract cannot rest on "in practice"
        Window.partitionBy(groupCol).orderBy(order.asc, col(idCol).asc)))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Deterministic negative sampling for contrastive-pair mining: up to `k`
    * pseudo-random corpus rows per query, positives excluded, reproducible
    * on any engine that agrees on md5 (same trick as [[sampleByGroup]] /
    * `deterministicSplit`) — no RNG, no global ordering, no cartesian.
    *
    * Shape: corpus ids land in `16^bucketChars` md5 buckets ONCE; each
    * (query, draw j) targets the bucket `md5("q" + qid + "_" + j)` prefixes
    * and takes the member minimizing `md5(qid + "_" + j + "_" + cid)` —
    * ONE equi-join on the bucket string, candidates `|Q|·k·|C|/16^bucketChars`
    * rows, and the per-(query, draw) rank-1 filter rewrites to a map-side
    * `WindowGroupLimit` so the final shuffle carries ≤ 1 row per (query,
    * draw) per task. Pick `bucketChars` so a bucket (|C|/16^bucketChars
    * rows) is a comfortable per-draw candidate list — 2 (256 buckets) for
    * small corpora up to 8 (4·10⁹) at web scale.
    *
    * A draw whose bucket is empty (tiny corpora) or fully positive yields
    * no row — deterministic under-delivery, never a substituted duplicate.
    * Returns (qIdCol, draw, neg_id). */
  def negativeSample(
      queries: DataFrame,
      corpus: DataFrame,
      qIdCol: String,
      cIdCol: String,
      k: Int,
      positives: Option[DataFrame] = None,
      bucketChars: Int = 2): DataFrame = {
    require(k > 0, "negativeSample: k must be positive")
    require(bucketChars >= 1 && bucketChars <= 8,
      s"negativeSample: bucketChars must be in [1, 8], got $bucketChars")
    val c = corpus.select(col(cIdCol).cast("long").as("__cid")).distinct()
      .filter(col("__cid").isNotNull)
      .withColumn("__b",
        substring(md5(concat(lit("b"), col("__cid").cast("string"))), 1, bucketChars))
    val draws = queries.select(col(qIdCol).cast("long").as("__qid")).distinct()
      .filter(col("__qid").isNotNull)
      .select(col("__qid"), explode(sequence(lit(0L), lit(k - 1L))).as("draw"))
      .withColumn("__b",
        substring(md5(concat(lit("q"), col("__qid").cast("string"),
          lit("_"), col("draw").cast("string"))), 1, bucketChars))
    val cand0 = draws.join(c, Seq("__b"))
    val cand = positives match {
      case None => cand0
      case Some(p) =>
        cand0.join(
          p.select(col(qIdCol).cast("long").as("__qid"),
            col(cIdCol).cast("long").as("__cid")),
          Seq("__qid", "__cid"), "left_anti")
    }
    val order = md5(concat(col("__qid").cast("string"), lit("_"),
      col("draw").cast("string"), lit("_"), col("__cid").cast("string")))
    cand
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__qid", "draw").orderBy(order.asc, col("__cid").asc)))
      .filter(col("__rk") === 1)
      .select(col("__qid").as(qIdCol), col("draw"), col("__cid").as("neg_id"))
  }

  /** Exactly `n` rows sampled uniformly (in the md5-order sense) from the
    * whole table, deterministically: the `n` smallest salted hashes win.
    * Plans as `TakeOrderedAndProject` — per-partition top-n heaps feed a
    * driver merge of `tasks × n` rows; the corpus is never globally
    * sorted or shuffled. The fixed-size honest alternative to
    * `df.sample(fraction)`, whose output size varies run to run and
    * whose seed does not survive an engine change. Same contracts as
    * [[sampleByGroup]]: unique non-null ids, `salt` re-deals. */
  def sampleExact(
      df: DataFrame,
      idCol: String,
      n: Int,
      salt: String = ""): DataFrame = {
    require(n > 0, "sampleExact: n must be positive")
    df.filter(col(idCol).isNotNull)
      .orderBy(md5(concat(lit(salt), col(idCol).cast("string"))).asc,
        col(idCol).asc)
      .limit(n)
  }

  /** Deterministic global shuffle for training order: assign every row a
    * shard and a position within its shard, both pure functions of
    * `(salt, id)` — the corpus comes out in a reproducible pseudo-random
    * permutation (the "shuffle the corpus before training" step every
    * epoch pipeline needs) with no RNG, no partitioning dependence, and
    * no driver-side state; changing `salt` re-deals the epoch.
    *
    * `shard` is the leading 24 md5 bits of the salted id mod `numShards`;
    * `pos` ranks the full md5 within the shard (id tie-break, same
    * rationale as [[sampleByGroup]]). Reading shards in order
    * `(shard, pos)` replays one global permutation; any engine that
    * agrees on md5 (the oracle does) deals the identical order.
    *
    * 100 TB shape: ONE hash shuffle on `shard`; each shard sorts
    * independently in its own task — there is no global sort and no
    * single-partition rank anywhere. The per-shard rank serializes one
    * shard per task, so `numShards` is the parallelism AND the shard
    * file size knob: pick corpus_size / ~200 MB (5×10^5 shards at
    * 100 TB — far beyond any hot-key concern since md5 spreads ids
    * uniformly, ±O(√(n/shards)) rows per shard). Rows with a null id
    * are excluded, as in [[sampleByGroup]]. */
  def deterministicShuffle(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      salt: String = ""): DataFrame = {
    require(numShards > 0, "deterministicShuffle: numShards must be positive")
    require(!df.columns.contains("__h"),
      "input already has a '__h' column — rename it first")
    df.filter(col(idCol).isNotNull)
      .withColumn("__h", md5(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("shard",
        (conv(substring(col("__h"), 1, 6), 16, 10).cast("long")
          % numShards).cast("int"))
      .withColumn("pos", row_number().over(
          Window.partitionBy("shard").orderBy(col("__h").asc, col(idCol).asc))
        .cast("long"))
      .drop("__h")
  }

  /** DETERMINISTIC weighted (Bernoulli) sampling: row kept iff its salted
    * md5 uniform `u(id) = int(md5[0:8]) / 2³²` falls under `weightCol`
    * (clamped to [0, 1]) — each row's inclusion probability IS its
    * weight, independently, reproducibly, with zero RNG state. The
    * quality-weighted corpus downsample ("keep high-quality docs with
    * probability ∝ score") as a pure codegen filter: no shuffle, no
    * state, replayable by any md5-capable engine — the same trick as
    * [[sampleByGroup]], applied per-row instead of per-rank. Expected
    * (not exact) output size Σw; use [[sampleExact]] when exactness
    * beats independence. */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weight: Column,
      salt: String = "gw"): DataFrame = {
    val u = conv(substring(
        md5(concat(lit(salt), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("double") / lit(4294967296.0)
    df.filter(col(idCol).isNotNull)
      .filter(u < least(lit(1.0), greatest(lit(0.0), weight)))
  }

  /** DETERMINISTIC weighted sampling WITHOUT replacement (priority
    * sampling — Duffield/Lund/Thorup, JACM'07): each row's priority is
    * `weight / u(id)` with `u` the salted-md5 uniform in (0, 1]; the
    * sample is the top-`k` priorities. Heavier rows are proportionally
    * likelier to make the cut, no row appears twice, and the whole draw
    * is one codegen projection + ONE TakeOrdered pass (per-partition
    * heaps of k, driver merges k per partition — no shuffle of the
    * corpus, no RNG state, identical on any engine that agrees on md5).
    *
    * `weight` must be a non-negative numeric column — a NEGATIVE weight
    * RAISES (a sign bug must not silently shrink the drawn population);
    * null weights are excluded as missing. Zero-weight rows have
    * priority 0 and lose to any positive weight (they enter only a
    * sample larger than the positive-weight population). Ties (identical
    * weight AND identical hash slice) break by id. The priority is ONE
    * double division of exact integers — deterministic everywhere, and
    * the t43 oracle replays it literally.
    *
    * Use [[weightedSample]] for independent Bernoulli inclusion (expected
    * size, with replacement across draws), [[sampleExact]] for uniform
    * exact-k; this is the exact-k AND weight-proportional corner. */
  def prioritySample(
      df: DataFrame,
      idCol: String,
      weight: Column,
      k: Int,
      salt: String = "pr"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (conv(substring(
        md5(concat(lit(salt), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("double") + lit(1.0)) / lit(4294967296.0)
    // a negative weight is a caller sign bug, not a sampling decision —
    // silently dropping those rows would shrink the drawn population with
    // no signal (the loud-failure convention; guard LEFT of the + so the
    // null short-circuit cannot skip it)
    val guard = coalesce(assert_true(weight >= 0,
      lit("prioritySample: negative weight — weights must be >= 0 " +
        "(rows with NULL weight are excluded as missing)")).cast("double"),
      lit(0.0))
    val priority = guard + weight.cast("double") / u
    df.filter(col(idCol).isNotNull && weight.isNotNull)
      .withColumn("__priority", priority)
      .orderBy(desc("__priority"), col(idCol))
      .limit(k)
      .drop("__priority")
  }

  /** Distribution-matching downsample: keep a deterministic subset so the
    * kept rows' distribution over `binCol` is proportional to a target —
    * the "flatten the length histogram" / "rebalance sources toward a
    * recipe" step of corpus curation. Downsample-only: the bin whose
    * target/observed ratio is highest keeps EVERYTHING (no upsampling, no
    * duplicated rows), every other bin keeps the fraction that lands the
    * kept shares exactly proportional to the target in the md5-uniform
    * sense.
    *
    * All arithmetic is BIGINT-exact and engine-replayable: with observed
    * counts n_b, integer target weights w_b and the reference bin R
    * maximizing w/n (ties to the smallest bin; compared CROSS-MULTIPLIED,
    * never as float ratios), a row with 20-hex-bit salted md5 slice h is
    * kept iff  `h · n_b · w_R  <  2²⁰ · w_b · n_R` — i.e. with probability
    * (w_b·n_R)/(n_b·w_R), the exact keep fraction, decided per-row with no
    * RNG, no state, and no partitioning dependence. Overflow bound:
    * products stay in BIGINT while `n_b · w_R < 2⁴³` (≈ 8.8e12 rows per
    * bin at unit weights) — beyond that, pre-scale the weights down.
    *
    * `target` maps bin → weight; bins absent from a non-empty target keep
    * NOTHING (w = 0), bins absent from the DATA are ignored. An empty
    * target means uniform over observed bins (flattening). Null bins and
    * null ids are excluded.
    *
    * 100 TB shape: one bounded counting aggregation plans the per-bin
    * fractions (≤ |bins| rows, the tiny frames broadcast back), then ONE
    * codegen filter pass over the corpus — no shuffle of data rows at all.
    */
  def matchDistribution(
      df: DataFrame,
      binCol: String,
      idCol: String,
      target: Map[Long, Long] = Map.empty,
      salt: String = "dm"): DataFrame = {
    require(target.values.forall(_ >= 0), "target weights must be >= 0")
    val rows = df.filter(col(binCol).isNotNull && col(idCol).isNotNull)
    val wCol: Column =
      if (target.isEmpty) lit(1L)
      else target.foldLeft(lit(0L): Column) { case (acc, (b, w)) =>
        when(col("__bin") === lit(b), lit(w)).otherwise(acc)
      }
    val stats = rows.groupBy(col(binCol).cast("long").as("__bin"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", wCol)
    // reference bin: max w/n, cross-multiplied exact, ties to smallest bin
    val other = stats.select(col("__bin").as("__obin"),
      col("__n").as("__on"), col("__w").as("__ow"))
    val ref = stats.join(other,
        (col("__ow") * col("__n") > col("__w") * col("__on")) ||
          ((col("__ow") * col("__n") === col("__w") * col("__on")) &&
            col("__obin") < col("__bin")),
        "left_anti")
      .select(col("__n").as("__rn"), col("__w").as("__rw"))
    val h = conv(substring(
        md5(concat(lit(salt), col(idCol).cast("string"))), 1, 5),
      16, 10).cast("long")
    rows.join(broadcast(stats), rows(binCol).cast("long") === stats("__bin"))
      .crossJoin(broadcast(ref))
      .filter(h * col("__n") * col("__rw") <
        lit(1048576L) * col("__w") * col("__rn"))
      .drop("__bin", "__n", "__w", "__rn", "__rw")
  }
}
