package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/expectation-suite shape):
  * evaluate a set of named row-level constraints over a table in ONE pass
  * and report, per constraint, how many rows violate it. The common
  * pre-ingestion contract check for a 100 TB pipeline — "quantities are
  * positive, dates are in range, codes are in their domain" — where
  * anything that re-scans the table per constraint is unaffordable.
  */
object Expect {

  /** Audit `df` against `checks` (name → boolean predicate over the row).
    * Returns one row per check, in the caller's order:
    * `(check, n_rows, n_violations, pass)`.
    *
    * A row VIOLATES a check when the predicate is false OR null — a null
    * comparison means the constraint could not be established for that
    * row, and an audit that counts unknown as pass would wave through
    * exactly the rows it exists to catch.
    *
    * Spark shape: every check compiles to a conditional count inside ONE
    * aggregation over ONE scan — map-side partial aggregation reduces
    * each task to a single row of counters, the final exchange moves
    * `numChecks + 1` longs per task, and the per-check explode happens on
    * that one final row. Adding a constraint adds a codegen'd counter,
    * not a pass over the data. */
  def audit(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    validate(checks)
    shapeRows(df.agg(counters(checks).head, counters(checks).tail: _*), checks)
  }

  private[graft] def validate(checks: Seq[(String, Column)]): Unit = {
    require(checks.nonEmpty, "audit needs at least one check")
    require(checks.map(_._1).distinct.size == checks.size,
      "check names must be unique")
  }

  /** The counter columns one audit pass aggregates — shared with the
    * STREAMING audit ([[graft.streaming.Streams.streamingAudit]]), whose
    * incremental aggregation sums the same counters across micro-batches. */
  private[graft] def counters(checks: Seq[(String, Column)]): Seq[Column] =
    count(lit(1)).as("__n") +:
    checks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v$i")
    }

  /** Referential-integrity audit: one summary row
    * `(n_rows, n_null_keys, n_orphan_rows, n_orphan_keys)` for the
    * relation `fact.factKey → dim.dimKey`. Null fact keys are counted
    * separately, not as orphans (SQL FK semantics: a null reference is
    * absent, not dangling).
    *
    * Spark shape: the orphan side is ONE left-anti join against the
    * dim's DISTINCT keys (the anti build side is keys-only, so a wide
    * 100 TB dim contributes just its key column through the shuffle);
    * totals are a separate counter pass; both one-row frames meet in a
    * broadcast cross join. Compose per-relation calls with `unionByName`
    * for a whole-schema audit. */
  def orphans(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String): DataFrame = {
    val totals = fact.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col(factKey).isNull, 1L).otherwise(0L)).as("n_null_keys"))
    val orphan = fact.filter(col(factKey).isNotNull)
      .join(dim.select(col(dimKey)).distinct(),
        col(factKey) === col(dimKey), "left_anti")
      .agg(count(lit(1)).as("n_orphan_rows"),
        countDistinct(col(factKey)).as("n_orphan_keys"))
    totals.crossJoin(broadcast(orphan))
  }

  /** Explode the single counter row into per-check result rows. */
  private[graft] def shapeRows(one: DataFrame,
      checks: Seq[(String, Column)]): DataFrame = {
    val rows = array(checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i).as("__ord"), lit(name).as("check"),
        col(s"__v$i").as("n_violations"))
    }: _*)
    one.select(col("__n"), explode(rows).as("__c"))
      .select(col("__c.check").as("check"),
        col("__n").as("n_rows"),
        coalesce(col("__c.n_violations"), lit(0L)).as("n_violations"),
        (coalesce(col("__c.n_violations"), lit(0L)) === 0L).as("pass"),
        col("__c.__ord").as("__ord"))
      .orderBy("__ord")
      .drop("__ord")
  }
}
