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

/** [[DropSpansExpr]] generalized to VARIABLE span lengths: `right` is an
  * array of `(start, len)` int structs, each covering words
  * `[start, start+len)` — the cut step of the multi-scale repeated-span
  * dedup ([[graft.operators.Dedup.dropRepeatedSpansMulti]]), where cut
  * spans of different scales merge before cutting. Same merge-pass
  * contract as the fixed-n kernel. */
case class DropVarSpansExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("text_clean", StringType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _),
          ArrayType(StructType(Array(a, b)), _))
          if a.dataType == IntegerType && b.dataType == IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"drop_var_spans expects (array<string>, array<struct<int,int>>), " +
          s"got $l, $r")
    }

  override def nullSafeEval(words: Any, cuts: Any): Any =
    SpanMaskImpl.dropVarSpans(
      words.asInstanceOf[ArrayData], cuts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, s) =>
      s"graft.functions.SpanMaskImpl.dropVarSpans($w, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "drop_var_spans"
}

object DropVarSpansExpr {
  def apply(words: Column, cuts: Column): Column =
    GraftInternals.column(DropVarSpansExpr(
      GraftInternals.expression(words), GraftInternals.expression(cuts)))
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

  /** Variable-length twin of [[dropSpans]]: cuts are `(start, len)`
    * structs, packed into longs and sorted by start so the walk is the
    * same single merge pass. */
  def dropVarSpans(words: ArrayData, cuts: ArrayData): InternalRow = {
    val len = words.numElements()
    val m = cuts.numElements()
    val ss = new Array[Long](m) // (start << 32) | len: sorts by start
    var i = 0
    while (i < m) {
      val r = cuts.getStruct(i, 2)
      ss(i) = (r.getInt(0).toLong << 32) | (r.getInt(1).toLong & 0xFFFFFFFFL)
      i += 1
    }
    java.util.Arrays.sort(ss)
    val sb = new java.lang.StringBuilder()
    var removed = 0
    var kept = 0
    var si = 0
    var coverEnd = -1 // exclusive
    var j = 0
    while (j < len) {
      while (si < m && (ss(si) >> 32) <= j) {
        val e = (ss(si) >> 32).toInt + (ss(si) & 0xFFFFFFFFL).toInt
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
