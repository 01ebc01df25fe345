package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Rolling z-score anomaly flags with BIT-EXACT decisions.
    *
    * The usual rolling `(x − mean) / stddev > z` is built on floating-point
    * window aggregates whose last-ulp noise differs across engines and
    * even across partitionings — a boundary value can flip the flag. This
    * operator makes the decision in pure integer arithmetic instead: the
    * measure is scaled to an integer (`round(value · 10^scale)`), the
    * trailing window keeps exact integer `n`, `Σv`, `Σv²`, and the test
    *
    *   |z| > t   ⟺   (n·x − S)² · (n−1)  >  t² · n · (n·Q − S²)
    *
    * (sample variance, current row included) is evaluated on BIGINTs — the
    * same trick the sessionizer uses for its microsecond gap rule. With
    * 2-decimal measures ≤ ~10⁵ and windows ≤ a few hundred rows every
    * intermediate fits a long with headroom.
    *
    * Spark shape: ONE hash shuffle on the key, a single trailing ROWS
    * window computing all three sums in one pass, O(1) state per row.
    * Rows earlier than `minPoints` in their window report `is_anomaly =
    * false` (not enough evidence — the cold-start convention).
    * Returns `(key, tie, v_scaled, w_n, w_sum, is_anomaly)`. */
  def anomalies(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valCol: String,
      windowRows: Int = 24,
      zThreshold: Int = 3,
      minPoints: Int = 8,
      scale: Int = 2): DataFrame = {
    require(windowRows >= 2 && minPoints >= 2 && zThreshold >= 1 && scale >= 0,
      s"bad anomaly params: window=$windowRows min=$minPoints z=$zThreshold scale=$scale")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(windowRows - 1), Window.currentRow)
    val x = round(col(valCol) * math.pow(10, scale)).cast("long")
    df.select(col(keyCol), col(tsCol), col(tieCol), x.as("v_scaled"))
      // count the VALUES, not the rows: a null-valued row contributes to
      // neither S nor Q, so counting it in n would test |z| against the
      // wrong sample size (and let evidence-free rows satisfy minPoints)
      .withColumn("w_n", count(col("v_scaled")).over(w))
      .withColumn("w_sum", sum(col("v_scaled")).over(w))
      .withColumn("w_sumsq",
        sum(col("v_scaled") * col("v_scaled")).over(w))
      .withColumn("is_anomaly",
        // a null-valued row carries no evidence: flag is false, not null
        col("v_scaled").isNotNull && col("w_n") >= minPoints && {
          val lhs = (col("w_n") * col("v_scaled") - col("w_sum")) *
            (col("w_n") * col("v_scaled") - col("w_sum")) * (col("w_n") - 1)
          val rhs = lit(zThreshold.toLong * zThreshold) * col("w_n") *
            (col("w_n") * col("w_sumsq") - col("w_sum") * col("w_sum"))
          lhs > rhs
        })
      .select(col(keyCol), col(tieCol), col("v_scaled"), col("w_n"),
        col("w_sum"), col("is_anomaly"))
  }

  /** Half-life exponentially-weighted moving average in EXACT integer
    * arithmetic: the current event weighs 2^(horizon−1), each step back
    * halves the weight, and weights older than `horizon` events truncate
    * to zero (they contribute < 2^−horizon of the mass — choose the
    * horizon to taste, ≤ 62 so weights stay in BIGINT). Emitted as the
    * exact fraction `(ewma_num, ewma_den)` — consumers divide, and the
    * smoothed value can never disagree across engines, partitionings or
    * summation orders, because nothing is ever a float (the q51 anomaly
    * design applied to smoothing; a float EWMA is a RUNNING sum whose
    * value depends on summation history).
    *
    * `valueExpr` must be an integral column (pre-scale decimals the
    * v_scaled way). A null value still occupies its position in the lag
    * sequence but contributes to neither numerator nor denominator —
    * its weight renormalizes away via `ewma_den`, exactly like the
    * shorter-than-horizon heads, whose `ewma_den` sums only the weights
    * actually present.
    *
    * Spark shape: ONE keyed window (shuffle on `keyCol`, sort by
    * (tsCol, tieCol)), `horizon` lag expressions evaluated in a single
    * window pass — O(horizon) state per key, no self-joins, no running
    * state. */
  def ewmaHalfLife(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueExpr: Column,
      horizon: Int = 8): DataFrame = {
    require(horizon >= 1 && horizon <= 62,
      s"horizon must be in [1, 62], got $horizon")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val terms = (0 until horizon).map { l =>
      val lv = if (l == 0) valueExpr else lag(valueExpr, l).over(w)
      val weight = 1L << (horizon - 1 - l)
      (when(lv.isNotNull, lv * lit(weight)).otherwise(lit(0L)),
        when(lv.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    df.withColumn("ewma_num", terms.map(_._1).reduce(_ + _))
      .withColumn("ewma_den", terms.map(_._2).reduce(_ + _))
  }

  /** Page's CUSUM changepoint statistic in EXACT integer arithmetic: for
    * the residual series r_j = v_j − target, the upward statistic is
    * `S⁺_k = max(0, S⁺_{k−1} + r_k)` — superficially a sequential
    * recurrence, but it has the closed form
    * `S⁺_k = R_k − min(0, min_{j≤k} R_j)` over the running residual sum R
    * (the 0 is the virtual R₀ — without it the first row's statistic
    * would always read 0) and symmetrically
    * `S⁻_k = max(0, max_{j≤k} R_j) − R_k` for downward shifts, so the whole
    * statistic is TWO extra window aggregates on the same keyed pass: one
    * shuffle on the key, O(1) state, nothing sequential anywhere. A flag
    * fires when the statistic exceeds `threshold` — all BIGINT, so like
    * q51/q53 the alarm can never flip across engines or partitionings.
    *
    * `valueExpr` must be integral (pre-scale the v_scaled way); `target`
    * is the in-control level in the same scale. Emits
    * (cusum_up, cusum_down, is_shift_up, is_shift_down) per row. */
  def cusum(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueExpr: Column,
      target: Long,
      threshold: Long): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__r", valueExpr - lit(target))
      .withColumn("__run", sum(col("__r")).over(w))
      .withColumn("cusum_up",
        col("__run") - least(lit(0L), min(col("__run")).over(w)))
      .withColumn("cusum_down",
        greatest(lit(0L), max(col("__run")).over(w)) - col("__run"))
      .withColumn("is_shift_up", col("cusum_up") > threshold)
      .withColumn("is_shift_down", col("cusum_down") > threshold)
      .drop("__r", "__run")
  }
}
