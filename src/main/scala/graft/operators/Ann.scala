package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Two paths:
  *
  *  - `bruteForceTopK`: exact cosine against every row — one narrow
  *    projection + TakeOrderedAndProject; the right baseline, and already
  *    distributed (each partition computes its local top-k, driver merges k
  *    per partition, never the full table).
  *  - `lshTopK`: random-hyperplane bucketing; only the query's bucket (and
  *    optionally neighboring buckets by Hamming distance) is scanned. At
  *    100 TB the bucket column is what you'd partition/bucket the table by,
  *    turning ANN into a partition-pruned scan.
  *
  * All dot products use zip_with + aggregate (codegen'd); no UDFs.
  */
object Ann {

  /** Cosine similarity of two array<float>/<double> columns: fused
    * single-loop codegen'd Expression (graft.functions.CosineSimilarity).
    * Bit-identical to [[cosineHof]] — both are sequential double folds. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Composable higher-order-function formulation (reference semantics for
    * the property test; 3 array traversals + intermediates). */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k by cosine against a literal query vector. Returns
    * (idCol, cosine, rank) with deterministic id tiebreak. */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      excludeIds: Seq[Long] = Nil): DataFrame = {
    val q = lit(query.map(_.toDouble))
    val scored = df
      .filter(if (excludeIds.isEmpty) lit(true) else !col(idCol).isin(excludeIds: _*))
      .select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
    scored.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(desc("cosine"), col(idCol))))
  }

  /** Seeded random hyperplanes (Gaussian); returns the sign-bit sketch of a
    * vector as a long (numPlanes <= 63). */
  def hyperplaneSketch(vec: Column, dim: Int, numPlanes: Int, seed: Long): Column = {
    require(numPlanes <= 63, "sketch packs into one long")
    val rnd = new Random(seed)
    val planes: Seq[Array[Double]] =
      Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val d = aggregate(
        zip_with(vec, lit(p), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN via hyperplane LSH: scan only rows whose sketch is within
    * `maxHammingProbe` bits of the query's sketch, then exact cosine top-k
    * on that candidate set. probe=0 scans a single bucket. */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      query: Array[Float],
      k: Int,
      numPlanes: Int = 12,
      maxHammingProbe: Int = 2,
      seed: Long = 42L,
      excludeIds: Seq[Long] = Nil): DataFrame = {
    // query sketch computed driver-side with the same seeded planes
    val rnd = new Random(seed)
    val planes: Seq[Array[Double]] =
      Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    val qSketch = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (w, x) => w * x.toDouble }.sum
      if (d >= 0) 1L << i else 0L
    }.reduce(_ | _)

    val sketch = hyperplaneSketch(col(vecCol), dim, numPlanes, seed)
    val candidates = df
      .filter(if (excludeIds.isEmpty) lit(true) else !col(idCol).isin(excludeIds: _*))
      .withColumn("__sketch", sketch)
      .filter(bit_count(col("__sketch").bitwiseXOR(lit(qSketch))) <= maxHammingProbe)

    val q = lit(query.map(_.toDouble))
    val scored = candidates
      .select(col(idCol), cosine(col(vecCol), q).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
    scored.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(desc("cosine"), col(idCol))))
  }
}
