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
