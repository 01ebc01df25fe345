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

    val taggedLeft = payloadCols
      .foldLeft(left.withColumn("__is_right", lit(0)))(
        (d, c) => d.withColumn(s"__p_$c", lit(null)))
      .withColumn("__key", col(leftKey))
      .withColumn("__time", col(leftTime))

    val taggedRight0 = right.select(
      (Seq(col(rightKey).as("__key"), col(rightTime).as("__time"),
        lit(1).as("__is_right")) ++ payloadCols.map(c => col(c).as(s"__p_$c"))): _*)
    // align schemas: left data columns are null on right rows
    val taggedRight = leftCols.foldLeft(taggedRight0)((d, c) => d.withColumn(c, lit(null)))

    val unioned = taggedLeft.select(
      (leftCols.map(col) ++ Seq(col("__key"), col("__time"), col("__is_right"))
        ++ payloadCols.map(c => col(s"__p_$c"))): _*)
      .unionByName(taggedRight.select(
        (leftCols.map(col) ++ Seq(col("__key"), col("__time"), col("__is_right"))
          ++ payloadCols.map(c => col(s"__p_$c"))): _*))

    // right rows (tag 1) sort before left rows (tag 0) at equal time =>
    // a right row at exactly leftTime is visible (inclusive <=)
    val w = Window.partitionBy("__key")
      .orderBy(col("__time").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payloadCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }

    carried.filter(col("__is_right") === 0)
      .select((leftCols ++ payloadCols).map(col): _*)
  }
}
