package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact Jaccard similarity of two long-array SETS in one merge pass.
  *
  * The composable `size(array_intersect(a,b)) / size(array_union(a,b))`
  * builds two hash structures per ROW PAIR — at verify time that is two
  * allocations + four traversals for every LSH candidate pair, O(pairs ×
  * set size) garbage at corpus scale. The shingle sets the dedup pipeline
  * verifies are SORTED DISTINCT by construction ([[ShingleHashSetImpl]]
  * emits them sorted), so intersection and union sizes fall out of a
  * single allocation-free two-pointer merge.
  *
  * Exactness does NOT rest on the sortedness assumption: the kernel
  * detects out-of-order input during the merge and falls back to the hash
  * path for that row, and adjacent duplicates are skipped (SET semantics,
  * matching `array_intersect`/`array_union`'s dedup). Jaccard VALUES
  * (gate-hashed by d2/d6/d11) are bit-identical to the composable form on
  * every non-degenerate input; the one divergence is empty-vs-empty
  * (union 0), where the composable division throws under ANSI and this
  * kernel yields NaN — unreachable in the pipeline, whose shingle sets
  * are never empty (whole-document collapse emits at least one hash). */
case class SortedJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard expects array<bigint> inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccardImpl.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedJaccardImpl.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_jaccard"
}

object SortedJaccardExpr {
  def apply(a: Column, b: Column): Column =
    GraftInternals.column(SortedJaccardExpr(
      GraftInternals.expression(a), GraftInternals.expression(b)))
}

/** Static kernel — called from both the interpreted eval and generated
  * code. */
object SortedJaccardImpl {

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    // merge fast path; bail to the hash path on any out-of-order element
    var inter = 0
    var union = 0
    var i = 0
    var j = 0
    var prevA = Long.MinValue
    var prevB = Long.MinValue
    var sorted = true
    while (sorted && (i < na || j < nb)) {
      if (i < na && a.isNullAt(i)) { i += 1 } // nulls cannot occur in the
      else if (j < nb && b.isNullAt(j)) { j += 1 } // kernel sets; skip = set-drop
      else if (j >= nb || (i < na && a.getLong(i) < b.getLong(j))) {
        val v = a.getLong(i)
        if (v < prevA) sorted = false
        else if (v != prevA || union == 0) { union += 1; prevA = v }
        i += 1
      } else if (i >= na || b.getLong(j) < a.getLong(i)) {
        val v = b.getLong(j)
        if (v < prevB) sorted = false
        else if (v != prevB || union == 0) { union += 1; prevB = v }
        j += 1
      } else { // equal heads
        val v = a.getLong(i)
        if (v < prevA || v < prevB) sorted = false
        else {
          if (v != prevA || v != prevB || union == 0) { union += 1; inter += 1 }
          prevA = v; prevB = v
        }
        i += 1; j += 1
      }
    }
    if (!sorted) return hashJaccard(a, b)
    inter.toDouble / union
  }

  /** Generic fallback (unsorted input): exact via hash sets — the same
    * answer the merge path gives on sorted input. */
  private def hashJaccard(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[java.lang.Long]()
    val sb = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < a.numElements()) { if (!a.isNullAt(i)) sa.add(a.getLong(i)); i += 1 }
    i = 0
    while (i < b.numElements()) { if (!b.isNullAt(i)) sb.add(b.getLong(i)); i += 1 }
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    inter.toDouble / union
  }
}
