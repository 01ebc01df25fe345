package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators — the aggregate-side complement
  * of per-document PII redaction (t6): redaction scrubs what a row
  * SAYS, k-anonymity bounds what a row's mere presence REVEALS
  * (Sweeney 2002). A released training corpus carrying quasi-identifier
  * metadata (locale × source × time bucket…) re-identifies rare
  * combinations even with every name scrubbed; suppressing combinations
  * rarer than k is the standard floor.
  *
  * Spark shape: ONE hash-aggregate over the quasi-identifier tuple
  * (map-side partial combine) — the violating-combination table is
  * OUTPUT-bounded (rare tuples by definition), so the suppression
  * anti-join broadcasts under AQE. No window, no global sort.
  */
object Privacy {

  /** Per-combination audit: the distinct quasi-identifier tuples with
    * their group sizes and the `anonymous` verdict at `k`. Release
    * dashboards read this; [[kAnonymitySuppress]] enforces it. */
  def kAnonymityStats(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2; got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("anonymous", col("n") >= k)
  }

  /** Suppress every row whose quasi-identifier combination has fewer
    * than `k` occurrences — after this, any attacker knowing a person's
    * quasi-identifiers finds them in a crowd of ≥ k rows or not at all.
    * Null-safe on the quasi columns (a null tuple is a combination like
    * any other; dropping nulls silently would leak them). Appends the
    * combination's `n` to surviving rows so downstream released data
    * carries its own anonymity evidence. */
  def kAnonymitySuppress(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    // one aggregate, one join: the combo table is quasi-grain-bounded
    // (far below row grain for meaningful quasi identifiers), and every
    // row matches exactly one combo, so the filter after the attach IS
    // the suppression — no second scan, no separate anti-join
    val sizes = kAnonymityStats(df, quasiCols, k)
      .select(quasiCols.map(c => col(c).as(s"__s_$c")) :+
        col("n").as("group_n") :+ col("anonymous"): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__s_$c"))
      .reduce(_ && _)
    df.join(sizes, cond, "left")
      .filter(col("anonymous"))
      .drop("anonymous")
      .drop(quasiCols.map(c => s"__s_$c"): _*)
  }
}
