package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage: fuzzy entity-resolution joins without a cross product.
  *
  * The classic blocking trap is that a single key (e.g. name prefix) misses
  * true matches whose edit happens to fall inside the key, while comparing
  * everything against everything is O(n·m) string distances — a non-starter
  * at corpus scale. The standard repair is MULTI-PASS blocking: each row
  * emits several redundant keys and a candidate pair only needs to agree on
  * ONE of them. Here every row emits
  *
  *   { first whitespace token, last whitespace token, first 3 chars }
  *
  * of the normalized name, each compounded with a full-name length band
  * (see [[blockKeys]]) so low-entropy vocabularies still block finely. A
  * single character edit (insert / delete / substitute, including edits
  * that add or remove the token separator itself) is local to one
  * position, so for names with at least two tokens whose first token has
  * ≥ 3 characters it can invalidate at most two of the three token keys,
  * and the length bands bridge the ≤ 1 length change — any true pair at
  * Levenshtein distance ≤ 1 is guaranteed to share a compound key (the
  * `q49_fuzzy_link` gate PROVES this at sf0.01: its DuckDB oracle is the
  * brute-force all-pairs join and the hashes must match). For larger
  * distance budgets callers widen the key set; recall beyond the
  * guarantee is a fixture question, not a code path.
  *
  * Spark shape: both sides explode to (id, name, key) rows (map-side, ≤ 3
  * rows each), candidates come from ONE hash equi-join on the key followed
  * by a pair-level `dropDuplicates` — no CartesianProduct, no
  * BroadcastNestedLoopJoin (plan-guarded in LinkageSpec). Levenshtein runs
  * only on the deduplicated candidates. Hot keys (stopword-like tokens) are
  * the 100 TB skew risk; they are bounded the same way the LSH buckets are:
  * pass `keyCap` to drop keys whose block would exceed the cap on EITHER
  * side. A dropped block is reported LOUDLY: each capped side carries an
  * observed metric (`graft_linkage_cap_*`) and the first completed action
  * on the result logs a warning naming the dropped-key count and the
  * largest block seen — recall loss must be a visible decision, never
  * silent (the Dedup.minhashPairs cap convention).
  */
object Linkage {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val metricNonce = new java.util.concurrent.atomic.AtomicLong(0)

  /** The multi-pass blocking keys of one normalized name column, each
    * compounded with a length band.
    *
    * Token keys alone degenerate on low-entropy vocabularies (TPC-H part
    * names draw from ~92 words, so a bare token key collects thousands of
    * rows and candidate verification goes quadratic). Compounding each key
    * with the name's length restores selectivity WITHOUT losing the ≤
    * `maxDistance` guarantee: one edit changes the full-string length by at
    * most 1, so a true pair's lengths differ by ≤ d. Both sides emit
    * `(key, len − j)` for j ∈ 0..d; whichever side is longer lands on the
    * shorter side's exact length, so every true pair still shares ≥ 1
    * compound key (if lb = la + k, 0 ≤ k ≤ d, the pair meets at
    * `(key, la)` via j = 0 on the left and j = k on the right). The key
    * count grows (d+1)-fold; block sizes shrink by the length spread —
    * at a 30-length spread that is ~15× fewer candidate verifications,
    * and at 100 TB it is what keeps hot-token blocks sub-quadratic even
    * before `keyCap` intervenes. */
  private[graft] def blockKeys(name: Column, maxDistance: Int): Column = {
    val base = array_distinct(array(
      element_at(split(name, "\\s+"), 1),
      element_at(split(name, "\\s+"), -1),
      substring(name, 1, 3)))
    val bands = (0 to maxDistance).map(j =>
      (length(name) - j).cast("string"))
    // separator: a control char no name contains, so distinct
    // (token, band) pairs cannot alias into one merged block
    array_distinct(flatten(transform(base, k =>
      array(bands.map(b => concat_ws("\u0001", k, b)): _*))))
  }

  private def keyed(df: DataFrame, nameCol: String, maxDistance: Int): DataFrame =
    df.select(col(nameCol),
        explode(blockKeys(col(nameCol), maxDistance)).as("__bk"))

  /** Candidate pairs that share ≥ 1 blocking key, verified with an exact
    * Levenshtein bound. Returns `(leftId, rightId, distance)`; column names
    * are taken from the inputs and must differ between the sides.
    *
    * The verification runs at the DISTINCT-NAME level: each side is
    * first reduced to its distinct names, the banded block join and
    * levenshtein verify those, and two equi-joins expand the verified
    * name pairs back onto the id rows. Levenshtein cost therefore scales
    * with |distinct names|² per block, not |rows|² — on a corpus whose
    * names repeat (the entity-resolution NORM: the q49 fixture carries
    * each name ~300×, and a real customer table is the same shape) this
    * is a duplication-factor-squared reduction of the verify stage, and
    * on an all-unique corpus the distinct pass is a free no-op. The
    * expansion joins shuffle only `(name, name, distance)` matches and
    * id rows — never unverified candidates.
    *
    * `keyCap > 0` drops blocks bigger than the cap (counted in DISTINCT
    * names per key, the unit of verify work) on either side BEFORE the
    * join — bounding every block to `keyCap²` comparisons. */
  def fuzzyJoin(
      left: DataFrame, leftId: String, leftName: String,
      right: DataFrame, rightId: String, rightName: String,
      maxDistance: Int,
      keyCap: Int = 0): DataFrame = {
    require(maxDistance >= 0, s"negative distance bound: $maxDistance")
    require(Set(leftId, leftName).intersect(Set(rightId, rightName)).isEmpty,
      "left and right column names must differ (rename before joining)")
    val nonce = metricNonce.getAndIncrement()
    def capped(side: DataFrame, tag: String): DataFrame =
      if (keyCap <= 0) side
      else {
        val counts = side.groupBy("__bk").count()
          .observe(s"graft_linkage_cap_${tag}_$nonce",
            sum(when(col("count") > keyCap, lit(1L)).otherwise(lit(0L)))
              .as("dropped_keys"),
            max(col("count")).as("max_block"))
        side.join(counts.filter(col("count") <= keyCap).select("__bk"), "__bk")
      }
    // spread the probe side across tasks BY BLOCK KEY before the join:
    // with a broadcast build the stream side keeps the scan partitioning,
    // and a single-file table would push every block's whole candidate
    // stream (and its pipelined levenshtein) through ONE task — the
    // shuffled rows are (name, key), never candidate pairs
    val l = capped(keyed(left.select(col(leftName)).distinct(),
        leftName, maxDistance), "l")
      .repartition(col("__bk"))
    val r = capped(keyed(right.select(col(rightName)).distinct(),
        rightName, maxDistance), "r")
    // verify BEFORE the pair dedup: the distance filter is pipelined
    // map-side on the join output, so the dropDuplicates shuffle carries
    // only TRUE name matches, not every colliding candidate. A pair
    // colliding on several compound keys pays one extra levenshtein per
    // collision instead of a dedup shuffle of unverified pairs — compute
    // in the pipeline is the right side of that trade; distance is
    // deterministic per pair, so dedup-after-filter equals
    // filter-after-dedup exactly.
    // thresholded levenshtein: the banded O(len·maxDistance) kernel
    // (full-matrix distance is O(len²) — ~20× more cell work at name
    // lengths for a bound of 1) returns -1 past the bound, which the
    // BETWEEN filter drops with the same semantics
    val namePairs = l.join(r, "__bk")
      .select(col(leftName), col(rightName),
        levenshtein(col(leftName), col(rightName), maxDistance)
          .as("distance"))
      .filter(col("distance").between(0, maxDistance))
      .dropDuplicates(leftName, rightName)
    // expand verified name pairs back onto the id rows, DISTINCT on
    // (id, name): an input carrying the same id row twice would
    // otherwise fan out to duplicate output pairs (the pre-name-level
    // implementation deduped on (leftId, rightId) — this preserves that
    // contract with an ids-only distinct instead of a pair-level dedup
    // shuffle of the expanded matches). Name repetition fans out here —
    // a plain equi-join fan-out AQE's skew split handles, on matches
    // only.
    val out = namePairs
      .join(left.select(col(leftId), col(leftName)).distinct(), leftName)
      .join(right.select(col(rightId), col(rightName)).distinct(), rightName)
      .select(col(leftId), col(rightId), col("distance"))
    if (keyCap <= 0) out
    else CacheRelease.afterFirstAction(out, Nil, qe =>
      for (tag <- Seq("l", "r");
           m <- qe.observedMetrics.get(s"graft_linkage_cap_${tag}_$nonce")) {
        val dropped = Option(m.get(0)).fold(0L)(_.toString.toLong)
        val maxB = Option(m.get(1)).fold(0L)(_.toString.toLong)
        if (dropped > 0)
          log.warn(s"[graft] fuzzyJoin keyCap=$keyCap dropped $dropped " +
            s"blocking key(s) on side '$tag' (largest block: $maxB " +
            "distinct names); true matches confined to dropped blocks " +
            "are not candidates")
      })
  }

  /** Reduce fuzzyJoin output to each left row's single best match —
    * smallest distance, ties to the smallest right id (deterministic).
    * One keyed window; InferWindowGroupLimit prunes it map-side. */
  def bestMatch(pairs: DataFrame, leftId: String, rightId: String): DataFrame = {
    val w = Window.partitionBy(leftId).orderBy(col("distance"), col(rightId))
    pairs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
