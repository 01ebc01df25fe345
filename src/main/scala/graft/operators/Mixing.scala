package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source/domain mixture control for training corpora: up- or down-sample
  * each source to hit a target mixture (the "data mixing" step — e.g. 2×
  * epochs of a high-quality source, 0.3 of a crawl dump).
  *
  * Sampling is DETERMINISTIC and seed-free: a weight w yields floor(w) full
  * copies of every row plus one extra copy for the fixed id-slice
  * `id mod granularity < round(frac(w)·granularity)`. That makes runs
  * reproducible byte-for-byte, keeps the operator pure relational algebra
  * (a literal-map lookup + explode — fully codegen'd, no RNG state, no UDF),
  * and at 100 TB it is embarrassingly parallel: no shuffle at all — each
  * input row maps to 0..n output rows in place, and downstream shuffles see
  * the already-mixed stream. Fractional thresholds are resolved to integers
  * on the driver so there is no floating-point rounding in the row path.
  *
  * ASSUMPTION: ids are ~uniform modulo `granularity` (true for dense
  * surrogate ids; NOT for e.g. all-even ids with granularity 1000, which
  * would double a 0.5 slice's realized rate). Callers with structured ids
  * should pre-hash (`xxhash64(id)` as the id column) — the slice criterion
  * stays `id mod granularity` here because it must be reproducible in
  * plain SQL by external auditors. Non-numeric ids fail loudly rather than
  * silently taking floor(w) copies; null ids always take floor(w) copies.
  */
object Mixing {

  /** Resample `df` so each source appears with multiplicity ≈ its weight.
    * Sources absent from `weights` default to 1.0 (pass-through). Weight 0
    * drops the source. Output = input columns + `copy` (0-based copy index,
    * so downstream ids can be disambiguated as (id, copy)). */
  def resample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weights: Map[String, Double],
      granularity: Int = 1000): DataFrame = {
    require(granularity > 0, "granularity must be positive")
    require(weights.values.forall(w => w >= 0 && w.isFinite),
      "weights must be finite and non-negative")
    // withColumn REPLACES an existing column of the same name, which would
    // silently corrupt a chained resample's copy index (or any input that
    // already carries these names) — refuse instead
    require(!df.columns.contains("copy") && !df.columns.contains("__copies"),
      "input already has a 'copy'/'__copies' column — rename it first " +
        "(chained resamples must disambiguate copies themselves, e.g. fold " +
        "the previous copy index into the id)")
    // resolve each weight to (fullCopies, extraSlice) on the driver: a row
    // gets fullCopies + (1 if id mod granularity < extraSlice) copies
    val resolved = weights.map { case (src, w) =>
      val full = math.floor(w).toLong
      val extra = math.round((w - math.floor(w)) * granularity)
      src -> (full, extra)
    }
    // a non-null id that casts to null is a caller bug (string ids etc.) —
    // raise rather than silently handing the row floor(w) copies; the
    // assert_true column is null on success, so adding it is a no-op
    val idLong = col(idCol).cast("long") +
      coalesce(assert_true(col(idCol).isNull || col(idCol).cast("long").isNotNull,
        concat(lit(s"mix: $idCol is not castable to long: "),
          col(idCol).cast("string"))).cast("long"), lit(0L))
    val copies = resolved.foldLeft(
        when(lit(false), lit(0L))) { case (acc, (src, (full, extra))) =>
      acc.when(col(sourceCol) === src,
        lit(full) + when(pmod(idLong, lit(granularity.toLong)) < extra, 1L)
          .otherwise(0L))
    }.otherwise(lit(1L))
    df.withColumn("__copies", copies)
      .filter(col("__copies") >= 1L)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1L)))
      .drop("__copies")
  }

  /** The realized mixture: rows per source after resampling — the number a
    * mixing job reports against its target weights. */
  def mixtureReport(resampled: DataFrame, sourceCol: String): DataFrame =
    resampled.groupBy(sourceCol).agg(count(lit(1)).as("n_rows"))

  /** Temperature-based mixture weights: each source sampled with
    * probability ∝ count^alpha (the standard LLM-corpus reweighting —
    * alpha = 1 keeps the natural mixture, alpha < 1 flattens it toward
    * uniform, upsampling rare sources; alpha = 0 is fully uniform). The
    * per-source [[resample]] weight that realizes those probabilities at
    * unchanged total row count is  w_i = N · n_i^(alpha−1) / Σ n_j^alpha.
    *
    * Driver work is one distributed count aggregation collecting
    * #sources rows — bounded by the source vocabulary, never the corpus.
    * Weights round to 6 decimals so the arithmetic replays identically
    * in any IEEE-double engine (the oracle recomputes them in SQL). */
  def temperatureWeights(df: DataFrame, sourceCol: String,
      alpha: Double): Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1 && !alpha.isNaN,
      s"alpha in [0, 1] (1 = natural mixture, 0 = uniform); got $alpha")
    val counts = df.groupBy(col(sourceCol).cast("string").as("src"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty input")
    val total = counts.values.sum.toDouble
    val z = counts.values.map(n => math.pow(n.toDouble, alpha)).sum
    counts.map { case (s, n) =>
      val w = total * math.pow(n.toDouble, alpha) / (z * n)
      // round the BINARY double exactly as SQL round(w, 6) does (half away
      // from zero on w·1e6) — a shortest-decimal-string detour (BigDecimal
      // .valueOf) can flip values tying at the 7th decimal the other way
      s -> math.round(w * 1e6).toDouble / 1e6
    }
  }

  /** [[resample]] under [[temperatureWeights]]: one counting pass plans
    * the weights, then the zero-shuffle deterministic resample applies
    * them. Expected output size ≈ input size at any alpha (the weights
    * are normalized to preserve N). */
  def mixByTemperature(df: DataFrame, idCol: String, sourceCol: String,
      alpha: Double, granularity: Int = 1000): DataFrame =
    resample(df, idCol, sourceCol, temperatureWeights(df, sourceCol, alpha),
      granularity)

  /** DoReMi-style source reweighting (Xie et al., "DoReMi: Optimizing
    * Data Mixtures Speeds Up Language Model Pretraining", NeurIPS
    * 2023) in its BATCH form: domains whose documents score HIGH on a
    * per-document difficulty proxy (excess loss in the paper; this
    * library's backoff-LM perplexity or any loss column in practice)
    * are upweighted by the Group-DRO multiplicative rule. The paper
    * runs the update per training step of a proxy model; a batch
    * engine sees one static score column, so this is the single-step
    * analog from a uniform initialization — exactly one exponentiated-
    * gradient update, which reduces to a softmax over per-domain
    * excess scores:
    *
    *   excess_i = max(0, mean_i − global_mean)      (clipped, paper eq. 2)
    *   α_i      = softmax(η · excess)_i             (EG update from uniform)
    *   α_i      = (1−c)·α_i + c/K                   (uniform smoothing)
    *
    * α is the DOMAIN DISTRIBUTION; the returned map converts it to the
    * N-preserving per-source [[resample]] multiplicity
    * `w_i = α_i · N / n_i` (the [[temperatureWeights]] convention).
    * NOTE the zero-signal behavior: identical scores everywhere give
    * zero excess, so α stays at the paper's UNIFORM initialization —
    * equivalent to `temperatureWeights(alpha = 0)`, NOT the natural
    * mixture. A no-op prior belongs to temperature mixing; this
    * operator answers "which domains does the proxy find hard".
    *
    * Every intermediate rounds to 6 decimals (the t10b/t12 cross-
    * engine convention — means, exps, the normalized α, the smoothed
    * α, and the final weights), so an external engine replays the
    * whole chain from the same data; the driver sums the K per-source
    * terms in sorted-source order for determinism. Driver state is K
    * rows — the source vocabulary, never the corpus. */
  def learnWeights(df: DataFrame, sourceCol: String, scoreCol: String,
      eta: Double = 1.0, smoothing: Double = 0.0): Map[String, Double] = {
    require(eta > 0 && !eta.isNaN, s"eta must be positive, got $eta")
    require(smoothing >= 0 && smoothing < 1 && !smoothing.isNaN,
      s"smoothing in [0, 1), got $smoothing")
    def r6(x: Double): Double = math.round(x * 1e6).toDouble / 1e6
    val rows = df
      .groupBy(col(sourceCol).cast("string").as("src"))
      .agg(count(lit(1)).as("n"), avg(col(scoreCol).cast("double")).as("m"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r6(r.getDouble(2))))
      .sortBy(_._1)
    require(rows.nonEmpty, "empty input")
    val total = rows.map(_._2).sum
    val k = rows.length
    val gmean = r6(rows.map(r => r._2 * r._3).sum / total)
    val u = rows.map { case (s, _, m) =>
      s -> r6(math.exp(eta * math.max(0.0, r6(m - gmean)))) }
    val z = u.map(_._2).sum
    val nBySrc = rows.map(r => r._1 -> r._2).toMap
    u.map { case (s, ui) =>
      val a = r6((1.0 - smoothing) * r6(ui / z) + smoothing / k)
      s -> r6(a * total / nBySrc(s))
    }.toMap
  }

  /** [[resample]] under [[learnWeights]] — the data-mixture loop
    * closed: score documents with any difficulty proxy upstream, learn
    * the DoReMi mixture, realize it with the zero-shuffle
    * deterministic resample. */
  def mixByProxy(df: DataFrame, idCol: String, sourceCol: String,
      scoreCol: String, eta: Double = 1.0, smoothing: Double = 0.0,
      granularity: Int = 1000): DataFrame =
    resample(df, idCol, sourceCol,
      learnWeights(df, sourceCol, scoreCol, eta, smoothing), granularity)

  /** Curriculum ordering (Bengio et al. 2009): a global training
    * schedule by ascending difficulty, dealt round-robin across
    * `numShards` loader streams so EVERY shard sees the same
    * easy→hard ramp. Returns `(idCol, rank, shard, position)`:
    * `rank` the 1-based global difficulty rank (by `scoreCol`
    * ascending, `idCol` tie-break), `shard = (rank-1) % numShards`,
    * `position = (rank-1) div numShards` — shard `position` order IS
    * the curriculum.
    *
    * A naive global `row_number()` is a single-partition sort — the
    * classic 100 TB scale-killer — so the rank is two-level (the
    * Sweep.concurrency recipe): a per-band window (parallel across
    * bands) plus per-band offsets computed in one TINY window over the
    * band vocabulary and broadcast back. `bandCol` must be a coarse
    * key CONSISTENT with the score order (band(a) < band(b) implies
    * score(a) <= score(b) — e.g. `score div 100` for integer scores)
    * and of BOUNDED cardinality (thousands — it's the operator's
    * parallelism, and the offsets window holds one row per band).
    * CONTRACT: (scoreCol, idCol) unique per row — ids unique suffices. */
  def curriculum(df: DataFrame, idCol: String, scoreCol: String,
      bandCol: String, numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val wBand = org.apache.spark.sql.expressions.Window
      .partitionBy(col(bandCol)).orderBy(col(scoreCol), col(idCol))
    val ranked = df.select(col(idCol), col(scoreCol), col(bandCol))
      .withColumn("__rn", row_number().over(wBand).cast("long"))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col(bandCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = df.groupBy(col(bandCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col(bandCol), col("__off"))
    ranked.join(broadcast(offsets), Seq(bandCol))
      .withColumn("rank", col("__off") + col("__rn"))
      .select(col(idCol), col("rank"),
        pmod(col("rank") - 1L, lit(numShards.toLong)).as("shard"),
        floor((col("rank") - 1L) / numShards).cast("long").as("position"))
  }

  /** Per-source token-budget fill — epoch planning's quota draw: each
    * source contributes its docs in (`priorityCol` DESC, `idCol` ASC)
    * order until the source's token budget is EXHAUSTED (a doc is
    * taken iff the running total INCLUDING it stays ≤ budget — the
    * deterministic closed form; no partial docs). `budgets` is one
    * row per source `(sourceCol, budget)` — broadcast-sized by
    * definition (the source vocabulary), and composable with
    * [[learnWeights]]: `budget(s) = round(weight(s) · T)` turns a
    * DoReMi mixture into an absolute token plan. Sources absent from
    * `budgets` contribute nothing (inner join — absence means quota
    * zero, loudly visible in the output's source set).
    *
    * Returns taken docs: `(idCol, sourceCol, tokens, fill_seq,
    * cum_tokens)` with `fill_seq` the 1-based draw order within the
    * source. 100 TB shape: one keyed window per source (the q6 keyed
    * growth shape) over narrow (id, source, priority, tokens) rows +
    * a broadcast budget join; skipped docs cost one window row each,
    * nothing is collected. NOTE the greedy-skip subtlety: a LATER doc
    * may still fit after an earlier one overflowed (running totals
    * are over TAKEN docs only would be order-dependent) — this
    * operator uses the PREFIX form (cum over all prior candidates),
    * the replayable standard: the cut is a pure function of the
    * ordered prefix sums. */
  def tokenBudgetFill(df: DataFrame, idCol: String, tokensCol: String,
      sourceCol: String, priorityCol: String,
      budgets: DataFrame): DataFrame = {
    require(budgets.columns.contains(sourceCol) &&
        budgets.columns.contains("budget"),
      s"budgets needs ($sourceCol, budget) columns, got " +
        budgets.columns.mkString(","))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(col(priorityCol).desc, col(idCol))
    df.select(col(idCol), col(sourceCol), col(priorityCol),
        col(tokensCol).cast("long").as("tokens"))
      .join(broadcast(budgets.select(col(sourceCol),
        col("budget").cast("long").as("__budget"))), Seq(sourceCol))
      .withColumn("cum_tokens", sum(col("tokens")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .withColumn("fill_seq", row_number().over(w).cast("long"))
      .filter(col("cum_tokens") <= col("__budget"))
      .select(col(idCol), col(sourceCol), col("tokens"),
        col("fill_seq"), col("cum_tokens"))
  }

  /** DATA-CONSTRAINED epoch allocation — how many times to repeat each
    * source under a total token budget when unique data has run out
    * (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    * Models": repeated epochs keep helping up to ~4, then decay —
    * `capCol` carries each source's repeat ceiling, quality-dependent
    * in real mixtures). The allocation is WATER-FILLING: one epoch
    * level λ rises uniformly across sources until the budget is spent,
    * each source contributing `tokens · min(cap, λ)` — sources with
    * low caps saturate and the level keeps rising for the rest. λ is
    * found in closed form over the cap-grain level table (sort caps
    * ascending; the first level whose fully-capped consumption reaches
    * the budget brackets λ; MILLI-epoch integer arithmetic — budgets
    * to ~9e15 tokens fit a Long — so any engine replays the same
    * allocation; floor division under-allocates ≤ tokens/1000 per
    * source rather than inventing a tie rule).
    *
    * Input: ONE row per source `(sourceCol, tokensCol unique tokens,
    * capCol max epochs)`; null/non-positive tokens or caps are refused
    * loudly. Returns one row per source:
    * `(source, tokens, cap_epochs, epochs_milli, alloc_tokens,
    * saturated)` — `saturated` marks sources pinned at their cap (λ
    * rose past them). When the budget exceeds total capacity every
    * source saturates and `sum(alloc_tokens) < budget` — the caller's
    * signal to raise caps or find more data.
    *
    * Shape: source-grain windows over a K-row table (K = distinct
    * sources — the learnWeights/mixtureReport bounded-table contract),
    * one broadcast of the bracketing level row. Never touches corpus
    * rows; compose the resulting per-source epoch counts with
    * [[resample]]/[[tokenBudgetFill]] to materialize the draw. */
  def epochWaterfill(sources: DataFrame, sourceCol: String,
      tokensCol: String, capCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    import org.apache.spark.sql.expressions.Window
    val g = sources.select(
      col(sourceCol).as("source"),
      when(col(tokensCol).isNull || col(tokensCol) <= 0, raise_error(concat(
        lit("epochWaterfill: null or non-positive tokens for source "),
        col(sourceCol).cast("string"))))
        .otherwise(col(tokensCol).cast("long")).as("tokens"),
      when(col(capCol).isNull || col(capCol) <= 0, raise_error(concat(
        lit("epochWaterfill: null or non-positive cap for source "),
        col(sourceCol).cast("string"))))
        .otherwise(col(capCol).cast("long")).as("cap"))
    // cap-grain level table: ties on cap are one level by construction
    val levels = g.groupBy("cap").agg(sum("tokens").as("ltok"))
    val w = Window.orderBy("cap")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = levels.agg(sum("ltok").as("__T"),
      sum(col("ltok") * col("cap")).as("__CAP"), max("cap").as("__MAXC"))
    val walked = levels.crossJoin(broadcast(tot))
      .withColumn("scum", sum(col("ltok") * col("cap")).over(w))
      .withColumn("tpre", sum(col("ltok")).over(w))
      // consumption if the level rose exactly to THIS cap: everything
      // at or below saturated, everything above paused at this cap
      .withColumn("consumed",
        col("scum") + (col("__T") - col("tpre")) * col("cap"))
    // the bracketing level: first cap whose full consumption >= budget
    // (≤ 1 row; aggregated to exactly one row, null fields when empty —
    // an empty bracket means budget > capacity, λ = the max cap)
    val bracket = walked.filter(col("consumed") >= budget)
      .orderBy("cap").limit(1)
      .select(
        least(col("cap") * 1000L,
          expr(s"(CAST($budget AS BIGINT) - (scum - ltok * cap)) * 1000 " +
            "DIV (__T - tpre + ltok)")).as("__lam0"))
      .agg(min(col("__lam0")).as("__lam0"))
    val lam = tot.crossJoin(broadcast(bracket))
      .select(coalesce(col("__lam0"), col("__MAXC") * 1000L).as("__lam"))
    g.crossJoin(broadcast(lam))
      .withColumn("epochs_milli", least(col("cap") * 1000L, col("__lam")))
      .select(col("source"), col("tokens"), col("cap").as("cap_epochs"),
        col("epochs_milli"),
        expr("tokens * epochs_milli DIV 1000").as("alloc_tokens"),
        (col("cap") * 1000L <= col("__lam")).as("saturated"))
  }
}
