package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line analytics over intervals: how many are active at once —
  * concurrent sessions, simultaneous jobs, overlapping reservations. The
  * classic +1/−1 boundary walk, restructured as a DISTRIBUTED prefix sum
  * so no global sort of boundaries ever happens.
  */
object Sweep {

  /** Concurrency profile of `[startCol, endCol]` intervals (inclusive
    * bounds — an interval is active AT its endpoints): one row per
    * distinct boundary instant with the number of active intervals just
    * after that instant. `max(active)` over the result is peak
    * concurrency; joining `active` back by time-bucket gives load curves.
    *
    * Semantics, exactly replayable in ANSI SQL: every start contributes
    * +1 at its instant, every end −1 immediately AFTER its instant
    * (inclusive ends: at a boundary where one interval ends and another
    * starts, both are active). Deltas aggregate per distinct microsecond
    * first, so the running sum runs over UNIQUE ordered keys — no
    * tie-order dependence anywhere. Intervals with `end < start` are
    * rejected loudly rather than silently producing negative occupancy.
    *
    * Spark shape — the distributed prefix-sum pattern: boundaries
    * aggregate per (day, instant) with map-side partial aggregation; the
    * within-day running sum is a window PARTITIONED BY day (parallel
    * across days); the cross-day carry-in is a running sum over the
    * per-day totals — a frame whose size is the calendar span (hundreds
    * to thousands of rows at any corpus size), computed in one tiny
    * single-partition window and broadcast-joined back. The only global
    * ordering ever materialized is over DAYS, never over events: 100 TB
    * of boundaries is still one hash shuffle on (day, instant) plus a
    * per-day sort. */
  def concurrency(
      df: DataFrame,
      startCol: String,
      endCol: String): DataFrame = {
    val DayUs = 86400000000L
    // the guard rides INSIDE a consumed column (assert_true is null on
    // pass → +0): a standalone guard column would be pruned unevaluated
    val withUs = df.select(
      (unix_micros(col(startCol)) +
        coalesce(assert_true(
          unix_micros(col(endCol)) >= unix_micros(col(startCol)),
          concat(lit("Sweep.concurrency: interval end before start at us="),
            unix_micros(col(startCol)).cast("string"))).cast("long"), lit(0L)))
        .as("__s"),
      unix_micros(col(endCol)).as("__e"))
    val deltas = withUs.select(col("__s").as("us"), lit(1L).as("d"))
      .unionAll(withUs.select((col("__e") + 1L).as("us"), lit(-1L).as("d")))
    val perInstant = deltas
      .groupBy((col("us") - pmod(col("us"), lit(DayUs))).as("__day"), col("us"))
      .agg(sum(col("d")).as("dd"))
    val wDay = Window.partitionBy("__day").orderBy("us")
      .rowsBetween(Window.unboundedPreceding, 0)
    val withinDay = perInstant
      .withColumn("__run", sum(col("dd")).over(wDay))
    val dayTotals = perInstant.groupBy("__day").agg(sum(col("dd")).as("__dt"))
    val wDays = Window.orderBy("__day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val dayOffsets = dayTotals
      .withColumn("__off", coalesce(sum(col("__dt")).over(wDays), lit(0L)))
      .select(col("__day"), col("__off"))
    withinDay
      .join(broadcast(dayOffsets), Seq("__day"))
      .select(timestamp_micros(col("us")).as("ts"),
        (col("__off") + col("__run")).as("active"))
  }
}
