package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode: split a dim-vector into `m` contiguous
  * subvectors of `dim/m` and replace each with the id of its nearest
  * codebook cell (squared L2, ties to the LOWER cell id) — `m` small ints
  * instead of `dim` floats, the memory/shuffle representation ANN serving
  * uses at 100 TB (a 64-float embedding becomes 8 codes: 32× narrower
  * through every exchange and cache tier).
  *
  * The codebook rides along as a codegen reference object (same pattern
  * as [[HyperplaneSketchExpr]]); the kernel is one fused pass — for each
  * subspace, k squared-L2 folds in ascending cell order, each fold
  * left-to-right over the sub-dimensions, so the arithmetic is
  * reproducible verbatim by an engine that replays the persisted codebook
  * (the d12/t3b fixture-oracle pattern). A vector whose length differs
  * from `m × dsub`, or containing a null element, yields null (encode is
  * undefined for it — callers filter or fail upstream). */
case class PqEncodeExpr(child: Expression, cells: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(cells.nonEmpty && cells.forall(_.nonEmpty), "empty codebook")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.sql}")
  }

  @transient private lazy val elementIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    PqImpl.encode(input.asInstanceOf[ArrayData], cells, elementIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCells", cells, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PqImpl.encode($c, $cbRef, $elementIsFloat);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

object PqEncodeExpr {
  def apply(vec: Column, cells: Array[Array[Array[Double]]]): Column =
    GraftInternals.column(PqEncodeExpr(GraftInternals.expression(vec), cells))
}

/** Asymmetric-distance computation over PQ codes: the query is pre-folded
  * driver-side into a lookup table `lut[sub][cell]` of squared L2 between
  * the query's subvector and each codeword, so scoring a candidate is `m`
  * array reads and adds (ascending subspace order — deterministic) with
  * ZERO per-candidate vector arithmetic. Codes outside the LUT range or a
  * null/mis-sized code array yield null. */
case class PqAdcExpr(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression {

  require(lut.nonEmpty && lut.forall(_.nonEmpty), "empty ADC lookup table")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects array<int> codes, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PqImpl.adc(input.asInstanceOf[ArrayData], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "double[][]")
    val boxed = ctx.freshName("pqDist")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double $boxed = graft.functions.PqImpl.adc($c, $lutRef);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_adc"
}

object PqAdcExpr {
  def apply(codes: Column, lut: Array[Array[Double]]): Column =
    GraftInternals.column(PqAdcExpr(GraftInternals.expression(codes), lut))
}

/** Batched [[PqAdcExpr]]: ONE pass over a row's codes scores it against
  * EVERY query's LUT — `luts(q)(sub)(cell)` — returning one distance per
  * query (array<double>, query order fixed by the caller). The serving
  * shape for query batches: Q queries cost one scan of the code table,
  * not Q, and the per-row work is still Q×m array reads in codegen. */
case class PqAdcBatchExpr(child: Expression, luts: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(luts.nonEmpty && luts.forall(l => l.nonEmpty && l.forall(_.nonEmpty)),
    "empty batched ADC lookup table")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_batch expects array<int> codes, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PqImpl.adcBatch(input.asInstanceOf[ArrayData], luts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutsRef = ctx.addReferenceObj("pqLuts", luts, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PqImpl.adcBatch($c, $lutsRef);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_adc_batch"
}

object PqAdcBatchExpr {
  def apply(codes: Column, luts: Array[Array[Array[Double]]]): Column =
    GraftInternals.column(PqAdcBatchExpr(GraftInternals.expression(codes), luts))
}

/** Table-side asymmetric distance: the query VECTOR is a column (not a
  * driver-folded LUT), so ADC works inside a join where every row carries
  * its own query — the serving shape for query TABLES ([[graft.operators.Pq.ivfPqJoin]]).
  * Arithmetic is bit-identical to the LUT path: per subspace the same
  * left-to-right squared-L2 fold ([[PqImpl.subDistFrom]] — exactly the
  * value buildLut would have precomputed), summed in ascending subspace
  * order. Cost per pair is O(dim) instead of the LUT's O(m) — the LUT
  * amortization needs a per-query driver fold, which is precisely what a
  * table-side query cannot have; the I/O story (codes, not vectors,
  * through scan/shuffle) is unchanged, which is what matters at corpus
  * scale. Null/mis-sized inputs or out-of-range codes yield null. */
case class PqAdcVecExpr(left: Expression, right: Expression,
    cells: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(cells.nonEmpty && cells.forall(_.nonEmpty), "empty codebook")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_vec expects (array<float|double> query, array<int> codes), got $other")
    }

  @transient private lazy val queryIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(q: Any, c: Any): Any =
    PqImpl.adcVec(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      cells, queryIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCells", cells, "double[][][]")
    val boxed = ctx.freshName("pqDist")
    nullSafeCodeGen(ctx, ev, (q, c) => s"""
      java.lang.Double $boxed =
        graft.functions.PqImpl.adcVec($q, $c, $cbRef, $queryIsFloat);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc_vec"
}

object PqAdcVecExpr {
  def apply(qvec: Column, codes: Column,
      cells: Array[Array[Array[Double]]]): Column =
    GraftInternals.column(PqAdcVecExpr(GraftInternals.expression(qvec),
      GraftInternals.expression(codes), cells))
}

object PqImpl {

  /** Squared L2 between `v[off .. off+dsub)` and `cell`, left-to-right —
    * the ONE arithmetic order every consumer (train, encode, oracle
    * replay) must share for bit-stable cell assignment. */
  private def subDistFrom(v: Array[Double], off: Int, cell: Array[Double]): Double = {
    var d = 0.0
    var j = 0
    while (j < cell.length) {
      val diff = v(off + j) - cell(j)
      d += diff * diff
      j += 1
    }
    d
  }

  /** Driver/test-side encode of one plain vector (shared by training). */
  def encodeVector(v: Array[Double], cells: Array[Array[Array[Double]]]): Array[Int] = {
    val m = cells.length
    val dsub = cells(0)(0).length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val sub = cells(s)
      var best = 0
      var bestD = subDistFrom(v, s * dsub, sub(0))
      var c = 1
      while (c < sub.length) {
        val d = subDistFrom(v, s * dsub, sub(c))
        if (d < bestD) { bestD = d; best = c } // strict: ties keep LOWER id
        c += 1
      }
      out(s) = best
      s += 1
    }
    out
  }

  def encode(vec: ArrayData, cells: Array[Array[Array[Double]]],
      elementIsFloat: Boolean): GenericArrayData = {
    val m = cells.length
    val dsub = cells(0)(0).length
    val n = vec.numElements()
    if (n != m * dsub) return null
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      v(i) = if (elementIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val codes = encodeVector(v, cells)
    val out = new Array[Any](m)
    var s = 0
    while (s < m) { out(s) = codes(s); s += 1 }
    new GenericArrayData(out)
  }

  def adc(codes: ArrayData, lut: Array[Array[Double]]): java.lang.Double = {
    val m = lut.length
    if (codes.numElements() != m) return null
    var d = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= lut(s).length) return null
      d += lut(s)(c)
      s += 1
    }
    java.lang.Double.valueOf(d)
  }

  /** Batched [[adc]]: one code walk, every query's LUT — distances in the
    * callers' query order, summed per query in the same ascending-subspace
    * fold as the single-query path. */
  def adcBatch(codes: ArrayData,
      luts: Array[Array[Array[Double]]]): GenericArrayData = {
    val m = luts(0).length
    if (codes.numElements() != m) return null
    val c = new Array[Int](m)
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val v = codes.getInt(s)
      if (v < 0 || v >= luts(0)(s).length) return null
      c(s) = v
      s += 1
    }
    val out = new Array[Any](luts.length)
    var q = 0
    while (q < luts.length) {
      var d = 0.0
      var i = 0
      while (i < m) { d += luts(q)(i)(c(i)); i += 1 }
      out(q) = d
      q += 1
    }
    new GenericArrayData(out)
  }

  /** Table-side ADC: squared L2 between a query vector column value and a
    * candidate's codes under `cells` — per subspace the SAME fold as
    * [[buildLut]]'s entries, summed ascending, so the result is
    * bit-identical to `adc(codes, buildLut(q, cells))`. */
  def adcVec(qvec: ArrayData, codes: ArrayData,
      cells: Array[Array[Array[Double]]], queryIsFloat: Boolean): java.lang.Double = {
    val m = cells.length
    val dsub = cells(0)(0).length
    if (qvec.numElements() != m * dsub || codes.numElements() != m) return null
    val q = new Array[Double](m * dsub)
    var i = 0
    while (i < q.length) {
      if (qvec.isNullAt(i)) return null
      q(i) = if (queryIsFloat) qvec.getFloat(i).toDouble else qvec.getDouble(i)
      i += 1
    }
    var d = 0.0
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= cells(s).length) return null
      d += subDistFrom(q, s * dsub, cells(s)(c))
      s += 1
    }
    java.lang.Double.valueOf(d)
  }

  /** The query-side LUT: `lut[sub][cell]` = squared L2 between the query's
    * sub-th subvector and that codeword — same fold as [[encodeVector]]. */
  def buildLut(q: Array[Double], cells: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val m = cells.length
    val dsub = cells(0)(0).length
    require(q.length == m * dsub,
      s"query dim ${q.length} != codebook dim ${m * dsub}")
    Array.tabulate(m) { s =>
      Array.tabulate(cells(s).length)(c => subDistFrom(q, s * dsub, cells(s)(c)))
    }
  }
}
