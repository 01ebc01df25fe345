package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis: how far does each key progress through
  * a required event sequence (view → click → purchase, signup → activate
  * → retain, …) — the product-analytics conversion primitive.
  */
object Funnel {

  /** For every key, the first time each step of `steps` completes IN
    * ORDER: step i counts only at a strictly later timestamp than step
    * i−1's completion (the same event can never satisfy two steps, and
    * out-of-order occurrences don't count). Returns one row per key:
    * `(key, steps_completed, step_1_ts … step_n_ts)` with null
    * timestamps beyond the last completed step.
    *
    * Deterministic by construction: each completion is a MIN over
    * microsecond timestamps — no row selection, so equal-timestamp
    * duplicates of the same step collapse into the same minimum.
    *
    * Spark shape: ONE hash shuffle on the key; the step chain compiles
    * to stacked Window operators over the SAME partitioning (step i's
    * conditional min references step i−1's column), so Catalyst plans
    * one exchange and n windowed passes over each partition — no joins,
    * no per-step scans of the event log. The final per-key collapse is
    * a groupBy on the already-partitioned key. */
  def funnel(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val w = Window.partitionBy(keyCol)
    val withUs = events.select(col(keyCol), col(tsCol),
      unix_micros(col(tsCol)).as("__us"), col(typeCol).as("__t"))
    val staged = steps.zipWithIndex.foldLeft(withUs) {
      case (df, (step, i)) =>
        val prev: Column = if (i == 0) lit(Long.MinValue) else col(s"__s${i - 1}")
        df.withColumn(s"__s$i",
          min(when(col("__t") === step && col("__us") > prev, col("__us")))
            .over(w))
    }
    val stepCols = steps.indices.map(i => col(s"__s$i"))
    val completed = stepCols.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    staged
      .groupBy(col(keyCol))
      .agg(first(completed).as("steps_completed"),
        steps.indices.map(i =>
          first(timestamp_micros(col(s"__s$i"))).as(s"step_${i + 1}_ts")): _*)
  }

  /** Cohort retention matrix: keys grouped by their FIRST-seen day (the
    * cohort), counted per (cohort, days-since-cohort) active day — the
    * "day-N retention" table behind every growth dashboard, and the
    * aggregate companion to [[funnel]]'s per-key progression.
    *
    * Returns `(cohort_date, day_offset, n_active)`: distinct keys of
    * cohort `cohort_date` active exactly `day_offset` days later
    * (offset 0 row = cohort size). Day boundaries are UTC epoch-day
    * integer arithmetic — exact, timezone-pin-free.
    *
    * Spark shape: first-seen is ONE aggregation by key; the activity
    * set dedupes (key, day) once; cohort attach is a key-equi-join of
    * two key-keyed aggregates (co-partitioned after the first shuffle);
    * the matrix aggregation groups on (cohort, offset) — cardinality
    * days², trivially small at any corpus size. No windows, no state. */
  def retention(
      events: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val days = events.select(col(keyCol).as("__k"),
        floor(unix_micros(col(tsCol)) / lit(86400000000L)).as("__day"))
      .distinct()
    val cohorts = days.groupBy("__k").agg(min(col("__day")).as("__cohort"))
    days.join(cohorts, Seq("__k"))
      .groupBy(col("__cohort"), (col("__day") - col("__cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      // date from pure day arithmetic (epoch + N days): rendering the
      // cohort instant as a date would shift labels under a non-UTC
      // session timezone
      .select(date_add(lit("1970-01-01").cast("date"),
          col("__cohort").cast("int")).as("cohort_date"),
        col("day_offset"), col("n_active"))
  }

  /** Daily NEW and CUMULATIVE distinct keys — the growth curve behind the
    * retention matrix: `(day, new_keys, cum_keys)` with each key counted
    * on its first-seen UTC day only (the epoch-day arithmetic of
    * [[retention]], timezone-proof by construction). Two partial-agg
    * shuffles (per-key min-day, per-day count); the running sum windows
    * over the DAY table — rows bounded by the time span, never the
    * corpus, which is what makes the single-partition window fine. */
  def newAndCumulative(
      events: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val firstDay = events
      .select(col(keyCol).as("__k"),
        floor(unix_micros(col(tsCol)) / lit(86400000000L)).as("__day"))
      .groupBy("__k").agg(min(col("__day")).as("__first"))
    firstDay.groupBy("__first").agg(count(lit(1)).as("new_keys"))
      .withColumn("cum_keys",
        sum(col("new_keys")).over(Window.orderBy("__first")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(date_add(lit("1970-01-01").cast("date"),
          col("__first").cast("int")).as("day"),
        col("new_keys"), col("cum_keys"))
  }

  /** First-order Markov transition matrix over each key's event sequence:
    * for every ordered pair of consecutive events (by `tsCol`, ties broken
    * by the unique `tieCol`) count the `(from_event, to_event)` transition
    * and express its row-normalized probability in EXACT integer
    * parts-per-million (`n · 1e6 div row_total` — no floating point, so
    * the matrix is bit-identical across engines and partitionings; the
    * true probability is `per_million / 1e6` to 6 places, truncated).
    *
    * The transition matrix is the sequence-mining workhorse behind next-
    * event prediction, anomalous-session scoring and funnel discovery —
    * and the `events × events` shape people naively build with a self-join
    * collapses here to ONE keyed window (`lead`) plus one matrix-sized
    * aggregation: at 100 TB the shuffle carries event pairs only as
    * grouped counts (≤ |event vocabulary|², not |events|), and the
    * normalizing row totals come from a second tiny window over the
    * matrix itself, never from re-scanning the log. */
  def transitions(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      eventCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val rowTotal = Window.partitionBy("from_event")
    events
      .select(col(keyCol), col(tsCol), col(tieCol),
        col(eventCol).as("from_event"))
      .withColumn("to_event", lead(col("from_event"), 1).over(w))
      .filter(col("to_event").isNotNull)
      .groupBy("from_event", "to_event")
      .agg(count(lit(1)).as("n"))
      .withColumn("__total", sum(col("n")).over(rowTotal))
      .withColumn("per_million", expr("n * 1000000L div __total"))
      .select(col("from_event"), col("to_event"), col("n"),
        col("per_million"))
  }
}
