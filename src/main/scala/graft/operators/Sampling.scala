package graft.operators

import org.apache.spark.sql.DataFrame
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
}
