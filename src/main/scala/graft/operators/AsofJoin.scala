package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (latest right row with rightTime <= leftTime per key),
  * implemented with the union + last-value-carry-forward technique:
  *
  *   1. tag and union both inputs on (key, time) — ONE shuffle, keyed by the
  *      join key, instead of a range cross-join;
  *   2. sort within each key partition by (time, tag) with right rows first
  *      at equal timestamps (inclusive semantics);
  *   3. carry the last non-null right payload forward with an unbounded
  *      preceding window;
  *   4. keep only left rows.
  *
  * Cost is a single sort-merge pass — the same plan shape a native as-of
  * join operator would produce, with no data explosion, so it scales to
  * arbitrarily large inputs as long as single keys fit a partition (salt
  * keys upstream if one key dominates).
  *
  * Right rows sharing (key, time) must be pre-deduplicated by the caller for
  * a deterministic result (the reference point for our oracle: DuckDB ASOF
  * JOIN has the same requirement).
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      leftKey: String,
      rightKey: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq

    val taggedLeft = left
      .withColumn("__key", col(leftKey))
      .withColumn("__time", col(leftTime))
      .withColumn("__is_right", lit(0))

    // the whole right payload travels as ONE struct: a single
    // last(ignoreNulls) then carries all payload columns from the SAME
    // matched right row, so a legitimately-NULL payload field survives
    // instead of being back-filled from an older row (no row tearing)
    val taggedRight = right.select(
      col(rightKey).as("__key"), col(rightTime).as("__time"),
      lit(1).as("__is_right"),
      struct(payloadCols.map(col): _*).as("__payload"))

    // unionByName fills the columns each side lacks (left data columns on
    // right rows; the payload struct on left rows) with typed nulls
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    // right rows (tag 1) sort before left rows (tag 0) at equal time =>
    // a right row at exactly leftTime is visible (inclusive <=)
    val w = Window.partitionBy("__key")
      .orderBy(col("__time").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // the struct is non-null on every right row (even when its fields are
    // null), so this picks the latest right row as a unit
    unioned
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select((leftCols.map(col) ++
        payloadCols.map(c => col(s"__carried.$c").as(c))): _*)
  }

  /** Same semantics as [[asofJoin]] (backward inclusive, left-outer), as the
    * native whole-operator plan node ([[graft.plans.AsofJoinExec]]): one
    * hash exchange per side, partition-local sorts, and a streaming merge
    * with O(1) state — no union materialization, no window carry-forward,
    * and the left (key, time) ordering is preserved for downstream
    * operators. Key and time columns must have identical types on both
    * sides (cast before calling). The planner strategy is registered on
    * `left`'s session on first use (idempotent); sessions built with
    * `spark.sql.extensions=graft.GraftExtensions` already have it. */
  def asofJoinNative(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      leftKey: String,
      rightKey: String,
      payloadCols: Seq[String]): DataFrame = {
    import graft.plans.{AsofJoinNode, AsofJoinPushdown, AsofJoinStrategy}
    import org.apache.spark.sql.GraftInternals
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsofJoinPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsofJoinPushdown
    // fresh exprIds via aliases (self-join safe) + early manual pruning:
    // no column-pruning rule descends into the custom node, so the right
    // side enters it already narrowed to key/time/payload
    val rightSel = right.select(
      col(rightKey).as("__r_key") +: col(rightTime).as("__r_time") +:
        payloadCols.map(c => col(c).as("__r_" + c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightSel.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val (lk, lt) = (attr(lPlan, leftKey), attr(lPlan, leftTime))
    val (rk, rt) = (attr(rPlan, "__r_key"), attr(rPlan, "__r_time"))
    require(lk.dataType == rk.dataType,
      s"key types must match: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"time types must match: ${lt.dataType} vs ${rt.dataType} (cast first)")
    GraftInternals.ofRows(spark, AsofJoinNode(lPlan, rPlan, lk, rk, lt, rt))
      .select(left.columns.toSeq.map(col) ++
        payloadCols.map(c => col("__r_" + c).as(c)): _*)
  }
}
