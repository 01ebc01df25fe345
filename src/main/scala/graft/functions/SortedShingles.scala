package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused words → SORTED DISTINCT shingle STRING set in one pass.
  *
  * The exact set-similarity join ([[graft.operators.Dedup.jaccardJoin]])
  * must keep string shingles — its gate's oracle replays them in SQL, so
  * opaque hashes (the [[ShingleHashSetExpr]] shortcut) are not an option.
  * The composable formulation
  * `array_sort(array_distinct(shingles(words, n)))` walks four Catalyst
  * array expressions, each allocating an intermediate array (and `slice` +
  * `concat_ws` allocate per ELEMENT); this kernel builds each n-gram with
  * one StringBuilder, sorts in place, and dedups adjacent equals —
  * one allocation per distinct shingle, one output array.
  *
  * Window semantics mirror [[TextFunctions.shingles]] exactly: fewer than
  * n words collapse to ONE whole-document shingle (the space-join of all
  * words, `""` for an empty array). The sort order is UTF8String binary
  * order — the same total order `array_sort` uses, though the prefix
  * filter only needs SOME consistent order. */
case class SortedShingleSetExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_shingle_set expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SortedShinglesImpl.sortedSet(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SortedShinglesImpl.sortedSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sorted_shingle_set"
}

object SortedShingleSetExpr {
  def apply(words: Column, n: Int): Column =
    GraftInternals.column(SortedShingleSetExpr(
      GraftInternals.expression(words), n))
}

/** Exact |A ∩ B| of two SORTED string arrays in one merge pass.
  *
  * `size(array_intersect(a, b))` builds a hash set of one side per row;
  * the merge walks both arrays once with binary comparisons — no per-row
  * allocation at all. Inputs MUST be sorted in UTF8String binary order
  * (what [[SortedShingleSetExpr]] and `array_sort` emit) and
  * duplicate-free; the count is then exact. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two array<string>, got $l, $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedShinglesImpl.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedShinglesImpl.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCountExpr {
  def apply(a: Column, b: Column): Column =
    GraftInternals.column(SortedIntersectCountExpr(
      GraftInternals.expression(a), GraftInternals.expression(b)))
}

/** Static kernels — called from both the interpreted eval and generated
  * code (one JIT-compiled loop each). */
object SortedShinglesImpl {

  private val SPACE = ' '.toByte

  /** Sorted distinct n-gram shingles of a words array. Null elements are
    * SKIPPED together with their separator — exactly `concat_ws`'s
    * contract, so the kernel stays bit-equal to the composable
    * `array_sort(array_distinct(shingles(words, n)))` formulation even
    * on nullable inputs (a skipped-token-but-kept-separator shingle
    * would silently diverge from the oracle's replay). */
  def sortedSet(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) {
      // whole-document shingle: space-join of all words ("" when empty)
      val sb = new java.lang.StringBuilder()
      var i = 0
      var joined = 0
      while (i < len) {
        val w = words.getUTF8String(i)
        if (w != null) {
          if (joined > 0) sb.append(' ')
          sb.append(w.toString)
          joined += 1
        }
        i += 1
      }
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(sb.toString)))
    }
    val out = new Array[UTF8String](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var bytes = 0
      var nonNull = 0
      var j = 0
      while (j < n) {
        val w = words.getUTF8String(i + j)
        if (w != null) { bytes += w.numBytes(); nonNull += 1 }
        j += 1
      }
      if (nonNull > 1) bytes += nonNull - 1 // separators between non-nulls
      val buf = new Array[Byte](bytes)
      var pos = 0
      var written = 0
      j = 0
      while (j < n) {
        val w = words.getUTF8String(i + j)
        if (w != null) {
          if (written > 0) { buf(pos) = SPACE; pos += 1 }
          w.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
          pos += w.numBytes()
          written += 1
        }
        j += 1
      }
      out(i) = UTF8String.fromBytes(buf)
      i += 1
    }
    java.util.Arrays.sort(out, null) // UTF8String.compareTo = binary order
    // dedup adjacent equals in place
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || !out(i).equals(out(w - 1))) { out(w) = out(i); w += 1 }
      i += 1
    }
    val trimmed: Array[Any] =
      if (w == out.length) out.asInstanceOf[Array[Any]]
      else {
        val t = new Array[Any](w)
        System.arraycopy(out, 0, t, 0, w)
        t
      }
    new GenericArrayData(trimmed)
  }

  /** Merge-count |A ∩ B| of two sorted duplicate-free string arrays. */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val la = a.numElements()
    val lb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < la && j < lb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val cmp = x.compareTo(y)
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}
