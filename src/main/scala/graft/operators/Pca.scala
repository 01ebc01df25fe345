package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorCovAgg

/** Distributed PCA over an embedding column — dimensionality reduction
  * for visualization, IVF pre-rotation and cheap near-dup spaces.
  *
  * Spark shape: the fit is ONE pass — [[graft.functions.VectorCovAgg]]
  * condenses the corpus to `(n, Σx, Σxxᵀ)` map-side, so the shuffle
  * carries O(partitions × dim²/2) doubles and the driver sees a single
  * bounded row (dim ≤ 1024 by the aggregate's own guard; 64-dim
  * embeddings → 2 080 doubles). The eigen-decomposition runs on the
  * driver over the dim×dim covariance (cyclic Jacobi — the matrix is
  * symmetric by construction), which is the right split at 100 TB: the
  * data-sized work is distributed, the dim-sized work is a microsecond
  * driver loop, and NOTHING about the eigen step depends on the corpus
  * size. Projection is a codegen'd higher-order dot product against
  * literal component vectors — zero shuffles, zero UDFs.
  *
  * Determinism contract: the fitted moments are double sums in partition
  * order (last-ulp sensitive), so serving flows persist the model
  * ([[writeModel]]) and replay projections from the PERSISTED components
  * — the same fixture discipline as BPE merges and IVF centroids. Within
  * one model, projections are bit-deterministic: the dot product is a
  * sequential left-to-right double sum, matching DuckDB's
  * `list_dot_product` op-for-op, and the mean shift is applied as
  * `dot(x, c) − dot(mean, c)` with the second term folded to a literal so
  * both engines subtract the identical scalar.
  *
  * Eigenvector sign is fixed deterministically (the largest-|coordinate|
  * entry is made positive) — eigensolvers are sign-ambiguous and an
  * unpinned sign would flip projections between fits.
  */
object Pca {

  /** A fitted PCA basis: row count, per-dimension mean, and the top-k
    * eigenpairs of the population covariance (components are unit-norm
    * rows, eigenvalues descending). */
  final case class PcaModel(
      n: Long,
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def dim: Int = mean.length
    def k: Int = components.length
    /** dot(mean, component_j) — the scalar the projection subtracts. */
    def meanDot(j: Int): Double = {
      var s = 0.0
      var i = 0
      while (i < mean.length) { s += mean(i) * components(j)(i); i += 1 }
      s
    }
  }

  /** Fit the top-`k` principal components of `vecCol` in one distributed
    * pass + one driver-side dim×dim eigensolve. */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    val row = df.agg(VectorCovAgg.vectorCov(col(vecCol)).as("s"))
      .selectExpr("s.n", "s.sums", "s.prods")
      .collect()(0)
    require(!row.isNullAt(0) && row.getLong(0) > 1,
      "pca: need at least 2 non-null vectors to fit")
    val n = row.getLong(0)
    val sums = row.getSeq[Double](1).toArray
    val prods = row.getSeq[Double](2).toArray
    val dim = sums.length
    require(k <= dim, s"pca: k=$k exceeds vector dimension $dim")
    val mean = sums.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var idx = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = prods(idx) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    // sort eigenpairs by eigenvalue descending, index ascending on ties
    val order = values.indices.sortBy(i => (-values(i), i))
    val top = order.take(k).toArray
    val comps = top.map { c =>
      val v = Array.tabulate(dim)(r => vectors(r)(c))
      // deterministic sign: the largest-|coordinate| entry is positive
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(m) < 0) v.map(-_) else v
    }
    PcaModel(n, mean, top.map(values), comps)
  }

  /** Project every row onto the model's components, long format:
    * `(idCol, pc, coord)` with `pc` ∈ [0, k). A wrong-dimension vector
    * RAISES (folded assert_true — the loud-failure convention; a silent
    * null would drop rows from every downstream consumer). */
  def projectLong(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: PcaModel): DataFrame = {
    val coords = array(model.components.indices.map { j =>
      dotLit(col(vecCol), model.components(j)) - lit(model.meanDot(j))
    }: _*)
    // assert_true evaluates null on success, so the filter keeps every
    // valid row untouched (no arithmetic riding on the coordinates) and
    // raises on the first wrong-dimension vector
    df.filter(assert_true(size(col(vecCol)) === model.dim,
        lit(s"pca: expected dimension ${model.dim}")).isNull)
      .select(col(idCol), posexplode(coords).as(Seq("pc", "coord")))
  }

  /** Sequential left-to-right dot product against a literal vector —
    * bit-parity with DuckDB's `list_dot_product`. */
  private def dotLit(x: Column, w: Array[Double]): Column =
    aggregate(zip_with(x, lit(w), (p, q) => p.cast("double") * q),
      lit(0.0), (acc, v) => acc + v)

  private val modelSchema = StructType(Seq(
    StructField("pc", IntegerType, nullable = false),
    StructField("eigenvalue", DoubleType, nullable = false),
    StructField("comp", ArrayType(DoubleType, containsNull = false)),
    StructField("mean", ArrayType(DoubleType, containsNull = false)),
    StructField("mean_dot", DoubleType, nullable = false),
    StructField("n", LongType, nullable = false)))

  /** Persist the model as one parquet row per component:
    * `(pc, eigenvalue, comp, mean, mean_dot, n)` — `mean_dot` is the
    * precomputed scalar so any SQL engine can replay a projection as
    * `list_dot_product(x, comp) − mean_dot`. */
  def writeModel(spark: SparkSession, model: PcaModel, path: String): Unit = {
    val rows = model.components.indices.map { j =>
      Row(j, model.eigenvalues(j), model.components(j).toSeq,
        model.mean.toSeq, model.meanDot(j), model.n)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), modelSchema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a persisted model back (inverse of [[writeModel]]). */
  def readModel(spark: SparkSession, path: String): PcaModel = {
    val rows = spark.read.parquet(path).orderBy("pc").collect()
    require(rows.nonEmpty, s"pca: no model rows at $path")
    PcaModel(
      rows(0).getAs[Long]("n"),
      rows(0).getAs[Seq[Double]]("mean").toArray,
      rows.map(_.getAs[Double]("eigenvalue")),
      rows.map(_.getAs[Seq[Double]]("comp").toArray))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Deterministic: fixed sweep order, fixed convergence threshold. */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = Array.tabulate(n, n)((i, j) => m(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += 2 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }
    var frob = 0.0
    for (i <- 0 until n; j <- 0 until n) frob += a(i)(j) * a(i)(j)
    frob = math.sqrt(frob)
    var sweep = 0
    while (sweep < 64 && offNorm > 1e-13 * math.max(frob, 1e-300)) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t =
              math.signum(if (theta == 0) 1.0 else theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }
}
