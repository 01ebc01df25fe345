package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus collocation mining: which word pairs co-occur more often than
  * chance — the classic PMI (pointwise mutual information) analysis
  * (Church & Hanks 1990, "Word Association Norms, Mutual Information, and
  * Lexicography") used for phrase detection (merge "new york" into one
  * token before training), stopword-pattern discovery, and corpus drift
  * monitoring.
  */
object Collocations {

  /** PMI over ADJACENT word pairs (bigrams): for each pair occurring in at
    * least `minCount` bigram slots corpus-wide, emit
    * `(w1, w2, c_pair, pmi)` with
    * `pmi = round(ln((c_pair/N_pairs) / ((c_w1/N_words)·(c_w2/N_words))), 6)`
    * — positive: the pair sticks together (a collocation); negative: it
    * co-occurs less than its parts' frequencies predict. Counts are exact
    * integers; only the final `ln` is rounded (6 decimals, the t20/t12b
    * cross-engine determinism convention for transcendentals).
    *
    * Spark shape, sized for a 100 TB corpus: bigram generation is
    * map-side array arithmetic on the tokenized row (no join, no window);
    * then TWO bounded-state count aggregations over the corpus (pairs,
    * unigrams) — the same cost class as any n-gram count. Everything else
    * derives from those count tables: the corpus totals are sums OVER THE
    * COUNTS (vocabulary-sized inputs), and the unigram/total subtrees
    * appearing in several branches share one physical aggregation via
    * exchange reuse. The `minCount` filter applies BEFORE the frequency
    * joins, so the join inputs are the collocation vocabulary, not the
    * raw pair stream; hot words ("the") are skew-benign on the unigram
    * side — one build row per word. */
  /** Token-distribution drift between two corpus slices: for every term
    * of the JOINT vocabulary, the slices' add-1-smoothed probabilities
    * and the term's pointwise KL contribution
    * `round(pA·ln(pA/pB), 6)` — the per-term decomposition of
    * KL(A‖B), which is what a drift investigation actually reads (WHICH
    * tokens moved), with the scalar KL one exact-decimal sum away
    * (contributions are pre-rounded, so summing them as DECIMAL is
    * aggregation-order-proof). The distribution-level companion to
    * [[Dedup.corpusDiff]]'s row-level diff: crawl N vs crawl N+1, or
    * source A vs source B under one mixing policy.
    *
    * Add-1 smoothing over the joint vocabulary keeps every ratio finite
    * (a term absent from B contributes a large positive drift instead of
    * ∞). Counts are exact integers; ln is the single rounded step (the
    * t20 transcendental convention).
    *
    * 100 TB shape: ONE token-explode count aggregation keyed by
    * (slice, term), a vocabulary-sized full-outer self-merge, broadcast
    * one-row totals — the same cost class as any n-gram count. */
  def tokenKlDrift(
      df: DataFrame,
      textCol: String,
      sliceCol: String,
      a: String,
      b: String): DataFrame = {
    require(a != b, "comparing a slice to itself is always zero drift")
    val toks = df.filter(col(sliceCol).isin(a, b))
      .select(col(sliceCol).as("__s"),
        explode(graft.functions.TextFunctions.words(col(textCol))).as("term"))
    val counts = toks.groupBy("__s", "term").agg(count(lit(1)).as("c"))
    val ca = counts.filter(col("__s") === a).select(col("term"), col("c").as("c_a"))
    val cb = counts.filter(col("__s") === b).select(col("term"), col("c").as("c_b"))
    val merged = ca.join(cb, Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val totals = merged.agg(
      sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"),
      count(lit(1)).as("vocab"))
    merged.crossJoin(broadcast(totals))
      .select(col("term"), col("c_a"), col("c_b"),
        round(((col("c_a") + 1).cast("double") / (col("n_a") + col("vocab"))) *
          log(((col("c_a") + 1).cast("double") / (col("n_a") + col("vocab"))) /
            ((col("c_b") + 1).cast("double") / (col("n_b") + col("vocab")))), 6)
          .as("kl_contrib"))
  }

  def pmiBigrams(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val ws = df.select(graft.functions.TextFunctions.words(col(textCol)).as("__ws"))
    val uni = ws.select(explode(col("__ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val pairAll = ws
      .filter(size(col("__ws")) >= 2)
      .select(explode(expr(
        "transform(slice(__ws, 1, size(__ws) - 1), (x, i) -> " +
          "struct(x AS w1, __ws[i + 1] AS w2))")).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_pair"))
    val nWords = uni.agg(sum(col("c_w")).as("n_words"))
    val nPairs = pairAll.agg(sum(col("c_pair")).as("n_pairs"))
    pairAll.filter(col("c_pair") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_w1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_w2")), Seq("w2"))
      .crossJoin(broadcast(nPairs))
      .crossJoin(broadcast(nWords))
      .select(col("w1"), col("w2"), col("c_pair"),
        round(log(
          (col("c_pair").cast("double") / col("n_pairs")) /
            ((col("c_w1").cast("double") / col("n_words")) *
              (col("c_w2").cast("double") / col("n_words")))), 6).as("pmi"))
  }
}
