package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination for training corpora: flag (or drop) training
  * documents whose word n-grams overlap an evaluation/benchmark set —
  * the standard guard against eval-set leakage into training data.
  *
  * 100 TB design: the benchmark side is an eval set (thousands of docs,
  * not billions), so its distinct n-gram universe is BROADCAST — matching
  * the corpus is then a map-side join with no shuffle of the training
  * data. The only shuffle is the per-doc match-count aggregation, which
  * partial-aggregates map-side to one narrow row (id, total, matched) per
  * doc per partition. The corpus is never self-joined and never carries
  * its text through a shuffle.
  */
object Decontaminate {

  /** Per-training-doc n-gram overlap against the benchmark n-gram universe.
    *
    * Returns one row per training doc:
    * (idCol, matched_ngrams, total_ngrams, contamination, contaminated)
    * where contamination = matched/total over the doc's DISTINCT n-grams
    * and contaminated = contamination >= threshold.
    *
    * Uses word `n`-grams (documents shorter than n collapse to one
    * whole-document shingle — [[TextFunctions.shingles]] semantics).
    * Real pipelines use n in the 8–13 range so only verbatim spans match.
    */
  def ngramOverlap(
      train: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 8,
      threshold: Double = 0.2,
      broadcastBench: Boolean = true): DataFrame = {
    // gram generation is the fused word_shingles kernel, not the composable
    // words+transform+concat_ws form: Catalyst HOFs are interpreted (no
    // codegen) and dominate the corpus-side cost (same finding as
    // spanStats' word_spans kernel, parity property-tested). Null text
    // coalesces to "" — one empty-string whole-doc shingle, the same gram
    // set the composed form produced — so the doc still gets its
    // contractual output row (explode_outer below) instead of vanishing.
    val trainSh = train
      .select(col(idCol),
        graft.functions.WordShinglesExpr(
          coalesce(col(textCol), lit("")), n).as("__grams"))
    val benchGrams0 = bench
      // no coalesce here: a null-text bench row contributes NO grams (the
      // composed form's null-propagation), not an empty-string gram
      .select(explode(graft.functions.WordShinglesExpr(col(benchTextCol), n))
        .as("__gram"))
      .distinct()
      .withColumn("__hit", lit(1L))
    // normal eval sets broadcast (tens of MB of distinct n-grams); a
    // pathological multi-GB benchmark side can fall back to a shuffle
    // join on __gram with the same semantics
    val benchGrams =
      if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    // keep the doc's total through the explode so ONE aggregation yields
    // both counts — no corpus-sized totals-vs-matches rejoin afterwards
    trainSh
      // explode_outer: a doc too short for ANY n-gram (or with null text)
      // keeps one null-gram row, which matches nothing and scores clean —
      // plain explode would drop it from the output entirely
      .select(col(idCol), size(col("__grams")).cast("long").as("__total"),
        explode_outer(col("__grams")).as("__gram"))
      .join(benchGrams, Seq("__gram"), "left")
      .groupBy(col(idCol))
      .agg(max(col("__total")).as("total_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("matched_ngrams"))
      .select(col(idCol), col("matched_ngrams"), col("total_ngrams"),
        when(col("total_ngrams") > 0L,
          col("matched_ngrams").cast("double") / col("total_ngrams"))
          .otherwise(lit(0.0)).as("contamination"))
      .withColumn("contaminated", col("contamination") >= threshold)
  }

  /** Contamination audit report — the table reviewers ask for ALONGSIDE
    * the drop: per eval set, the n-gram-overlap HISTOGRAM of the whole
    * training corpus (how much borderline contamination exists, not just
    * how many docs crossed the threshold). One row per non-empty
    * `(eval_set, bucket)`: `bucket = floor(contamination · buckets)`
    * computed in INTEGER arithmetic (`matched · buckets DIV total`, top
    * bucket inclusive — no float boundary can flip a count between
    * engines), `n_docs` the docs landing there, `n_contaminated` how
    * many of those meet `threshold` (the [[ngramOverlap]] double
    * comparison, unchanged).
    *
    * 100 TB shape: every set's distinct-gram universe unions into one
    * broadcast tagged by set name, so matching all K sets is the same
    * single map-side join as matching ONE set (never K corpus scans);
    * the shingle kernel itself evaluates twice — once under the per-doc
    * totals, once under the match explode (both map-side; sharing would
    * need persisting corpus-sized gram arrays, a worse trade);
    * per-(doc, set) counts partial-aggregate map-side;
    * the doc × K denominator attach is a broadcast cross join of K
    * names (K = a handful of benchmarks). Output is K · buckets rows —
    * driver-safe by construction. */
  def report(
      train: DataFrame,
      idCol: String,
      textCol: String,
      evalSets: Seq[(String, DataFrame)],
      benchTextCol: String,
      n: Int = 8,
      threshold: Double = 0.2,
      buckets: Int = 10,
      broadcastBench: Boolean = true): DataFrame = {
    require(evalSets.nonEmpty, "need at least one eval set")
    require(evalSets.map(_._1).distinct.size == evalSets.size,
      s"duplicate eval-set names: ${evalSets.map(_._1)}")
    require(buckets >= 1, s"buckets must be >= 1; got $buckets")
    require(threshold > 0.0,
      "threshold must be > 0 (at 0 every doc reads contaminated)")
    val spark = train.sparkSession
    import spark.implicits._
    val setsDf = evalSets.map(_._1).toDF("eval_set")
    val trainSh = train
      .select(col(idCol),
        graft.functions.WordShinglesExpr(
          coalesce(col(textCol), lit("")), n).as("__grams"))
    val totals = trainSh
      .select(col(idCol), size(col("__grams")).cast("long").as("__total"))
    val benchGrams0 = evalSets.map { case (name, df) =>
      df.select(lit(name).as("eval_set"),
          explode(graft.functions.WordShinglesExpr(
            col(benchTextCol), n)).as("__gram"))
        .distinct()
    }.reduce(_ unionByName _)
    val benchGrams =
      if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    val matched = trainSh
      .select(col(idCol), explode(col("__grams")).as("__gram"))
      .join(benchGrams, Seq("__gram"))
      .groupBy(col(idCol), col("eval_set"))
      .agg(count(lit(1)).as("__m"))
    totals.crossJoin(broadcast(setsDf))
      .join(matched, Seq(idCol, "eval_set"), "left")
      .select(col("eval_set"),
        coalesce(col("__m"), lit(0L)).as("__m"), col("__total"))
      .select(col("eval_set"),
        when(col("__total") > 0,
          least(expr(s"__m * $buckets DIV __total"), lit(buckets - 1L)))
          .otherwise(lit(0L)).cast("int").as("bucket"),
        when(col("__total") > 0,
          (col("__m").cast("double") / col("__total")) >= threshold)
          .otherwise(lit(false)).cast("int").as("__c"))
      .groupBy("eval_set", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("__c")).as("n_contaminated"))
  }

  /** FUZZY decontamination: flag training docs that NEAR-duplicate an
    * eval doc — minhash/LSH candidate generation plus exact
    * shingle-Jaccard verification, the [[Dedup.minhashPairsAgainst]]
    * machinery with the EVAL SET as the index side. Catches the
    * paraphrased-contamination class [[ngramOverlap]] provably misses:
    * a light rewrite (word swaps, inserted tokens) leaves no verbatim
    * 8-gram, so exact overlap reads 0, while most word shingles still
    * match (the Lee et al. 2022 / GPT-3 appendix-B warning).
    *
    * Returns one row per (train doc, matched eval doc) pair at
    * `jaccard >= threshold`: `(idCol, eval_id, jaccard)`.
    *
    * Defaults differ from dedup's on purpose: `threshold = 0.2` (any
    * substantial shingle overlap with an eval doc is disqualifying —
    * contamination tolerance is much lower than duplication tolerance)
    * and `rowsPerBand = 1` (64 one-row bands: candidate-recall
    * `1-(1-j)^64` ≈ 1 down to j ≈ 0.15, where dedup's 4-row bands
    * would miss low-j pairs; the extra candidates are cheap because
    * the eval-side bucket table is tiny). 100 TB shape: the corpus
    * streams once through the bucket join (the small eval side
    * broadcasts) and only candidate pairs reach the verify join. */
  def nearDupOverlap(
      train: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      seed: Long = 42L,
      rowsPerBand: Int = 1,
      threshold: Double = 0.2): DataFrame =
    Dedup.minhashPairsAgainst(
        train, idCol, textCol,
        Dedup.minhashIndex(bench, benchIdCol, benchTextCol,
          shingleSize, numHashes, seed),
        shingleSize, numHashes, rowsPerBand, threshold, seed)
      .select(col("id_a").as(idCol), col("id_b").as("eval_id"),
        col("jaccard"))

  /** Drop mode of [[nearDupOverlap]] (composes like [[decontaminate]]):
    * `train` minus docs near-duplicating any eval doc. */
  def decontaminateNearDup(
      train: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      seed: Long = 42L,
      rowsPerBand: Int = 1,
      threshold: Double = 0.2): DataFrame = {
    val flagged = nearDupOverlap(train, idCol, textCol, bench, benchIdCol,
        benchTextCol, shingleSize, numHashes, seed, rowsPerBand, threshold)
      .select(col(idCol)).distinct()
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Semantic (embedding-space) decontamination: flag train rows whose
    * embedding's cosine similarity to ANY eval-set embedding reaches
    * `tau` — the third tier of the decontamination ladder ([[ngramOverlap]]
    * catches verbatim leakage, [[nearDupOverlap]] lexical paraphrase;
    * this catches paraphrase/translation leakage that shares no surface
    * form at all, given an embedding column). Returns one row per
    * flagged (train, eval) pair: `(idCol, eval_id, cos)`.
    *
    * 100 TB shape: eval sets are SMALL by definition (a benchmark is
    * 1e3–1e5 rows) — the eval side broadcasts and the corpus streams
    * ONCE, map-side, through the fused cosine kernel
    * ([[graft.functions.CosineSimilarity]]): a broadcast nested-loop
    * whose inner side is the eval table, |train|·|eval| dot products,
    * zero shuffle of the corpus. An eval set too big to broadcast is
    * not this operator's contract — sketch both sides and band-join
    * instead (the d5 embedding-LSH recipe in [[Embeddings]]). */
  def embeddingOverlap(
      train: DataFrame,
      idCol: String,
      vecCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalVecCol: String,
      tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    train.select(col(idCol), col(vecCol).as("__tv"))
      .crossJoin(broadcast(
        eval.select(col(evalIdCol).as("eval_id"), col(evalVecCol).as("__ev"))))
      .withColumn("cos",
        graft.functions.CosineSimilarity(col("__tv"), col("__ev")))
      .filter(col("cos") >= tau)
      .select(col(idCol), col("eval_id"), col("cos"))
  }

  /** The SCALE PATH of [[embeddingOverlap]] for eval sets too big to
    * scan exhaustively per row: hyperplane-LSH bucketing (the
    * [[Ann.annJoin]] machinery with the roles fixed — eval is the
    * probing side). Both sides sketch against the same seeded planes;
    * the eval side fans out over all Hamming-≤`maxHamming` probe masks
    * and BROADCASTS (|eval|·(1+masks) rows — still eval-scale); the
    * corpus sketches ONCE map-side and equi-joins on the bucket, and
    * only bucket-colliding candidates pay the exact cosine kernel.
    * Each (train, eval) pair matches in at most ONE probe bucket
    * (mask = xor of the two sketches), so no distinct is needed on
    * pairs. RECALL is the LSH family's, not 1 — pairs at cosine ≥ tau
    * whose sketches differ in more than `maxHamming` bits are missed;
    * raise `numPlanes`/`maxHamming` or use [[embeddingOverlap]] when
    * the eval set is broadcast-scannable. Returns flagged pairs
    * `(idCol, eval_id, cos)`. */
  def embeddingOverlapLsh(
      train: DataFrame,
      idCol: String,
      vecCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalVecCol: String,
      tau: Double,
      dim: Int,
      numPlanes: Int = 8,
      maxHamming: Int = 1,
      seed: Long = 42L): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    require(maxHamming >= 0 && maxHamming <= 2,
      "maxHamming in {0,1,2} — larger probe sets square the fan-out")
    val masks: Seq[Long] = {
      val singles = (0 until numPlanes).map(i => 1L << i)
      val pairs = for {
        i <- 0 until numPlanes; j <- i + 1 until numPlanes
      } yield (1L << i) | (1L << j)
      Seq(0L) ++ (if (maxHamming >= 1) singles else Nil) ++
        (if (maxHamming >= 2) pairs else Nil)
    }
    val evSketch = Ann.hyperplaneSketch(col(evalVecCol), dim, numPlanes, seed)
    val trSketch = Ann.hyperplaneSketch(col(vecCol), dim, numPlanes, seed)
    val ev = eval.select(col(evalIdCol).as("eval_id"),
        col(evalVecCol).as("__ev"), evSketch.as("__sk"))
      .select(col("eval_id"), col("__ev"),
        explode(array(masks.map(m => col("__sk").bitwiseXOR(lit(m))): _*))
          .as("__bucket"))
    train.select(col(idCol), col(vecCol).as("__tv"), trSketch.as("__bucket"))
      .join(broadcast(ev), Seq("__bucket"))
      .withColumn("cos",
        graft.functions.CosineSimilarity(col("__tv"), col("__ev")))
      .filter(col("cos") >= tau)
      .select(col(idCol), col("eval_id"), col("cos"))
  }

  /** Drop mode of [[embeddingOverlapLsh]]. */
  def decontaminateEmbeddingLsh(
      train: DataFrame,
      idCol: String,
      vecCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalVecCol: String,
      tau: Double,
      dim: Int,
      numPlanes: Int = 8,
      maxHamming: Int = 1,
      seed: Long = 42L): DataFrame = {
    val flagged = embeddingOverlapLsh(train, idCol, vecCol, eval, evalIdCol,
        evalVecCol, tau, dim, numPlanes, maxHamming, seed)
      .select(col(idCol)).distinct()
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Drop mode of [[embeddingOverlap]] (composes like [[decontaminate]]):
    * `train` minus rows whose embedding cosine-matches any eval row. */
  def decontaminateEmbedding(
      train: DataFrame,
      idCol: String,
      vecCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalVecCol: String,
      tau: Double): DataFrame = {
    val flagged = embeddingOverlap(train, idCol, vecCol, eval, evalIdCol,
        evalVecCol, tau)
      .select(col(idCol)).distinct()
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Drop contaminated docs: `train` minus docs flagged by [[ngramOverlap]]
    * (left-anti on the flagged id set — the corpus streams through one
    * anti-join, no wide row is built). */
  def decontaminate(
      train: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int = 8,
      threshold: Double = 0.2): DataFrame = {
    val flagged = ngramOverlap(train, idCol, textCol, bench, benchTextCol, n, threshold)
      .filter(col("contaminated"))
      .select(col(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }
}
