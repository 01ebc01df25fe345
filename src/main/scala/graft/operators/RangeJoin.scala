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

  /** Interval-OVERLAP join: every (left, right) pair whose [start, end]
    * intervals intersect (inclusive ends), without a cross product and
    * without a dedup pass. Both sides fragment to the buckets they cover
    * and the join is ONE bucket equi-join — but a pair overlapping across
    * several buckets would collide in each of them, so the refinement
    * keeps a pair only in its CANONICAL bucket, the one containing
    * `max(left.start, right.start)` (the first instant both intervals are
    * live). Every true overlap reports exactly once, no `distinct()` over
    * the pair stream — at 100 TB a distinct on the collided pairs is a
    * second full shuffle; the canonical-bucket predicate is a codegen
    * comparison.
    *
    * Same tuning rule as [[pointInInterval]]: `bucketWidth` near the
    * typical interval length; replication per row ≈ len/width + 1.
    * Columns must be numeric and names must not collide. */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      leftStartCol: String,
      leftEndCol: String,
      rightStartCol: String,
      rightEndCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")

    val l = left.withColumn("__bucket",
      explode(sequence(bucketOf(col(leftStartCol)), bucketOf(col(leftEndCol)))))
    val r = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(rightStartCol)), bucketOf(col(rightEndCol)))))
    l.join(r, Seq("__bucket"))
      .filter(col(leftStartCol) <= col(rightEndCol) &&
        col(rightStartCol) <= col(leftEndCol))
      .filter(bucketOf(greatest(col(leftStartCol), col(rightStartCol))) ===
        col("__bucket"))
      .drop("__bucket")
  }
}
