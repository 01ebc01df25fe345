package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused random-hyperplane sign sketch: all `numPlanes` dot products in ONE
  * pass over the vector, packed into a long.
  *
  * The composable formulation — per plane, `aggregate(zip_with(vec,
  * lit(plane), _*_), 0, _+_)` — is `numPlanes` separate interpreted
  * higher-order traversals per row (Catalyst HOFs don't codegen), each
  * allocating an intermediate products array. This expression holds the
  * plane matrix as a codegen reference object and walks the vector once,
  * accumulating every plane's partial dot in a local array — O(dim ×
  * planes) fused multiply-adds, zero allocation beyond the accumulator.
  *
  * Bit-parity with the HOF form: each plane's dot is the same sequential
  * left-to-right double fold (`acc + v(i)·w(i)` in element order), so signs
  * — and therefore sketches and LSH bucket assignments — are identical,
  * property-pinned. Degenerate inputs mirror the HOF exactly: `zip_with`
  * pads the shorter side with nulls, so a vector whose length differs from
  * the plane dim — or one containing a null element — turns that plane's
  * fold null, and `when(d >= 0, …).otherwise(0)` drops the bit to 0; the
  * kernel marks such planes poisoned and emits 0 for them. */
case class HyperplaneSketchExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 63, "sketch packs into one long")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sketch expects array<float|double>, got ${other.sql}")
  }

  // lazy: dataType on an unresolved child throws during analysis rewrites
  @transient private lazy val elementIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    HyperplaneSketchImpl.compute(
      input.asInstanceOf[ArrayData], planes, elementIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes,
      "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSketchImpl.compute($c, $planesRef, $elementIsFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sketch"

  // Array fields break case-class equality; compare plane CONTENT so
  // canonicalization/CSE still dedupe identical sketches
  override def equals(other: Any): Boolean = other match {
    case h: HyperplaneSketchExpr =>
      child == h.child && planes.length == h.planes.length &&
        planes.indices.forall(i => java.util.Arrays.equals(planes(i), h.planes(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + planes.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

object HyperplaneSketchExpr {
  def apply(vec: Column, planes: Seq[Array[Double]]): Column =
    GraftInternals.column(
      HyperplaneSketchExpr(GraftInternals.expression(vec), planes.toArray))
}

/** Static kernel — called from both the interpreted eval and generated
  * code. */
object HyperplaneSketchImpl {
  def compute(vec: ArrayData, planes: Array[Array[Double]],
      elementIsFloat: Boolean): Long = {
    val nPlanes = planes.length
    val acc = new Array[Double](nPlanes)
    val len = vec.numElements()
    var anyNull = false
    var i = 0
    while (i < len && !anyNull) {
      if (vec.isNullAt(i)) anyNull = true // nulls every plane's fold
      else {
        val v = if (elementIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        var p = 0
        while (p < nPlanes) {
          val w = planes(p)
          if (i < w.length) acc(p) += v * w(i)
          p += 1
        }
        i += 1
      }
    }
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      // zip_with pads length mismatches with nulls -> that plane's fold is
      // null -> bit 0 in the HOF form; mirror it. Sign test is !(d < 0),
      // NOT d >= 0: Spark compiles `d >= 0` through nanSafeCompareDoubles
      // where NaN is larger than everything, so a NaN dot (Inf
      // cancellation, corrupt embedding) SETS the bit — Java's `>= 0` is
      // false for NaN and would silently re-bucket such rows
      if (!anyNull && planes(p).length == len && !(acc(p) < 0)) bits |= 1L << p
      p += 1
    }
    bits
  }
}
