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
  * of the normalized name. A single character edit (insert / delete /
  * substitute, including edits that add or remove the token separator
  * itself) is local to one position, so for names with at least two tokens
  * whose first token has ≥ 3 characters it can invalidate at most two of
  * the three keys — any true pair at Levenshtein distance ≤ 1 is guaranteed
  * to share a key (the `q49_fuzzy_link` gate PROVES this at sf0.01: its
  * DuckDB oracle is the brute-force all-pairs join and the hashes must
  * match). For larger distance budgets callers widen the key set; recall
  * beyond the guarantee is a fixture question, not a code path.
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

  /** The multi-pass blocking keys of one normalized name column. */
  private[graft] def blockKeys(name: Column): Column =
    array_distinct(array(
      element_at(split(name, "\\s+"), 1),
      element_at(split(name, "\\s+"), -1),
      substring(name, 1, 3)))

  private def keyed(df: DataFrame, idCol: String, nameCol: String): DataFrame =
    df.select(col(idCol), col(nameCol),
        explode(blockKeys(col(nameCol))).as("__bk"))

  /** Candidate pairs that share ≥ 1 blocking key, verified with an exact
    * Levenshtein bound. Returns `(leftId, rightId, distance)`; column names
    * are taken from the inputs and must differ between the sides.
    *
    * `keyCap > 0` drops blocks bigger than the cap on either side BEFORE
    * the join (one lightweight count aggregation per side — the same
    * shuffle the join performs anyway at 100 TB is thereby bounded to
    * `keyCap²` comparisons per block). */
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
    // shuffled rows are (id, name, key), never candidate pairs
    val l = capped(keyed(left, leftId, leftName), "l")
      .repartition(col("__bk"))
    val r = capped(keyed(right, rightId, rightName), "r")
    // verify BEFORE the pair dedup: the distance filter is pipelined
    // map-side on the join output, so the dropDuplicates shuffle carries
    // only TRUE matches (ids + distance), not every colliding candidate
    // with both name strings — at a 92-token first-name vocabulary that
    // is the difference between shuffling ~|matches| rows and several
    // million name-pairs (the 1 GiB-heap bench OOM this reordering
    // fixed). A pair colliding on all three keys pays ≤ 3 levenshtein
    // evaluations instead of 1 — compute in the pipeline is the right
    // side of that trade; distance is deterministic per pair, so
    // dedup-after-filter equals filter-after-dedup exactly.
    // thresholded levenshtein: the banded O(len·maxDistance) kernel
    // (full-matrix distance is O(len²) — ~20× more cell work at name
    // lengths for a bound of 1) returns -1 past the bound, which the
    // BETWEEN filter drops with the same semantics
    val out = l.join(r, "__bk")
      .select(col(leftId), col(rightId),
        levenshtein(col(leftName), col(rightName), maxDistance)
          .as("distance"))
      .filter(col("distance").between(0, maxDistance))
      .dropDuplicates(leftId, rightId)
    if (keyCap <= 0) out
    else CacheRelease.afterFirstAction(out, Nil, qe =>
      for (tag <- Seq("l", "r");
           m <- qe.observedMetrics.get(s"graft_linkage_cap_${tag}_$nonce")) {
        val dropped = Option(m.get(0)).fold(0L)(_.toString.toLong)
        val maxB = Option(m.get(1)).fold(0L)(_.toString.toLong)
        if (dropped > 0)
          log.warn(s"[graft] fuzzyJoin keyCap=$keyCap dropped $dropped " +
            s"blocking key(s) on side '$tag' (largest block: $maxB rows); " +
            "true matches confined to dropped blocks are not candidates")
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
