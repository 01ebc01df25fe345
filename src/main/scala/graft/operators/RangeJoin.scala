package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cross product.
  *
  * Naive `a JOIN b ON p BETWEEN s AND e` plans as BroadcastNestedLoopJoin —
  * O(|points| × |ranges|) comparisons, which dies at scale. This operator
  * buckets the number line with a fixed width: every interval is exploded to
  * the buckets it overlaps, every point to its single bucket, and the join
  * becomes an equi-join on the bucket id (ONE hash shuffle, AQE-skew-safe)
  * followed by the exact BETWEEN refinement on the collided pairs only.
  *
  * Choose `bucketWidth` near the typical interval length: wider buckets mean
  * fewer replicas per interval but more false collisions; the replication
  * factor is `avg_interval_len / bucketWidth + 1`.
  */
object RangeJoin {

  /** Join `points` to every row of `ranges` whose [startCol, endCol]
    * (inclusive both ends) contains pointCol. Columns must be numeric.
    * Output: all columns of both inputs (names must not collide). */
  def pointInInterval(
      points: DataFrame,
      ranges: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")

    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val r = ranges.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))

    p.join(r, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
