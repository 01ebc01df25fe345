package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Remove every word covered by an n-word span starting at any of the
  * given positions — the cut step of cross-document repeated-span dedup
  * ([[graft.operators.Dedup.dropRepeatedSpans]]).
  *
  * `starts` are 0-based word positions, duplicates allowed, ORDER
  * IRRELEVANT (the kernel sorts); each covers words `[s, s+n)`. One merge
  * pass over (sorted starts, words) — O(len + |starts| log |starts|),
  * independent of how heavily the spans overlap. Returns
  * `struct(text_clean string, n_removed int)`: the kept words re-joined
  * with single spaces (the [[graft.operators.Dedup.keepFirstChunks]]
  * whitespace-normalized reassembly contract) and the removed-word
  * count. */
case class DropSpansExpr(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n >= 1, "span length must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("text_clean", StringType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"drop_spans expects (array<string>, array<int>), got $l, $r")
    }

  override def nullSafeEval(words: Any, starts: Any): Any =
    SpanMaskImpl.dropSpans(
      words.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, s) =>
      s"graft.functions.SpanMaskImpl.dropSpans($w, $s, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "drop_spans"
}

object DropSpansExpr {
  def apply(words: Column, starts: Column, n: Int): Column =
    GraftInternals.column(DropSpansExpr(
      GraftInternals.expression(words), GraftInternals.expression(starts), n))
}

object SpanMaskImpl {
  /** One merge pass: sort starts, walk words tracking the furthest
    * coverage end. */
  def dropSpans(words: ArrayData, starts: ArrayData, n: Int): InternalRow = {
    val len = words.numElements()
    val m = starts.numElements()
    val ss = new Array[Int](m)
    var i = 0
    while (i < m) { ss(i) = starts.getInt(i); i += 1 }
    java.util.Arrays.sort(ss)
    val sb = new java.lang.StringBuilder()
    var removed = 0
    var kept = 0
    var si = 0
    var coverEnd = -1 // exclusive
    var j = 0
    while (j < len) {
      while (si < m && ss(si) <= j) {
        val e = ss(si) + n
        if (e > coverEnd) coverEnd = e
        si += 1
      }
      if (j < coverEnd) removed += 1
      else {
        val w = words.getUTF8String(j)
        if (kept > 0) sb.append(' ')
        if (w != null) sb.append(w.toString)
        kept += 1
      }
      j += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), removed)
  }
}
