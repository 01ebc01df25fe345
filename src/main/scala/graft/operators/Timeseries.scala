package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling of an irregular event series — the gap-filling
  * step every downstream window/as-of/feature pipeline assumes has already
  * happened ("one row per entity per hour, carrying the latest known
  * value").
  *
  * Spark shape: the per-bucket reduction is a WindowGroupLimit-prunable
  * rank filter (map-side top-1 per (key, bucket)); the dense grid is
  * generated per KEY from its own [min, max] bucket span (`sequence` +
  * `explode` — a generator, no driver loop, no cross join against a
  * calendar table); the fill is one `last(ignoreNulls)` running window.
  * Everything shuffles on the key exactly once plus one (key, bucket)
  * join — at 100 TB the output is bounded by keys × span-buckets, and a
  * pathological span cannot OOM a task because `sequence` streams through
  * the generator frame.
  *
  * Determinism: within a bucket the kept value is the event with the
  * greatest (ts, tieCol) — tieCol must be unique per row. The first grid
  * bucket of every key contains its first event by construction, so the
  * forward fill never emits a leading null.
  */
object Timeseries {

  /** One row per (key, bucket) across each key's whole span:
    * `(keyCol, bucket, value, had_event)` with `value` forward-filled.
    * `stepUnit` ∈ hour/day/minute/week/month (a `date_trunc` unit that is
    * also a valid `interval` step). */
  def resampleFfill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valCol: String,
      stepUnit: String = "hour"): DataFrame = {
    require(Set("minute", "hour", "day", "week", "month")(stepUnit.toLowerCase),
      s"unsupported step unit: $stepUnit")
    val b = date_trunc(stepUnit, col(tsCol)).as("bucket")
    val w = Window.partitionBy(col(keyCol), col("bucket"))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val lastPer = df.select(col(keyCol), col(tsCol), col(tieCol),
        col(valCol).as("__v"), b)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("bucket"), col("__v"))
    val grid = df.select(col(keyCol), b)
      .groupBy(keyCol)
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col(keyCol), explode(expr(
        s"sequence(__b0, __b1, interval 1 $stepUnit)")).as("bucket"))
    val fill = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastPer, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        last(col("__v"), ignoreNulls = true).over(fill).as("value"),
        col("__v").isNotNull.as("had_event"))
  }
}
