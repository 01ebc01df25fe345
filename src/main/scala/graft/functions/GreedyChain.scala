package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy nearest-neighbor chaining of a bucket's members — the
  * in-context-pretraining document order (Shi et al. 2024: contexts
  * built from semantically adjacent documents train better than
  * shuffled ones; their graph-traversal order is approximated per
  * cluster by the standard greedy chain): start at the member with the
  * SMALLEST id, then repeatedly append the unvisited member most
  * cosine-similar to the LAST appended one, ties to the smaller id.
  *
  * Input `array<struct<id: long, v: array<double>>>`, output
  * `array<long>` — the ids in chain order. O(b²) dot products over a
  * bucket of b members, which is exactly why the caller buckets first
  * (the operator's contract bounds b, not this kernel). Cosine is the
  * oracle-replayable form `dot/(√(a·a)·√(b·b))` with every fold
  * left-to-right in element order, so an engine replaying the same
  * arithmetic chooses the same chain; a zero-norm member's cosine is
  * pinned to −2 (below any real cosine — chains last, never NaN). */
case class GreedyChainExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == LongType &&
          (b.dataType == ArrayType(DoubleType, false) ||
            b.dataType == ArrayType(DoubleType, true)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"greedy_chain expects array<struct<long, array<double>>>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    GreedyChainImpl.chain(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GreedyChainImpl.chain($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "greedy_chain"
}

object GreedyChainExpr {
  def apply(members: Column): Column =
    GraftInternals.column(GreedyChainExpr(GraftInternals.expression(members)))
}

object GreedyChainImpl {
  def chain(members: ArrayData): ArrayData = {
    val n = members.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = members.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val a = row.getArray(1)
      val v = new Array[Double](a.numElements())
      var j = 0
      var s = 0.0
      while (j < v.length) {
        v(j) = a.getDouble(j)
        s += v(j) * v(j)
        j += 1
      }
      vecs(i) = v
      norms(i) = math.sqrt(s)
      i += 1
    }
    def cos(a: Int, b: Int): Double = {
      if (norms(a) == 0.0 || norms(b) == 0.0) return -2.0
      val va = vecs(a); val vb = vecs(b)
      // mixed-dimension embeddings in one bucket are a data defect —
      // fail loudly rather than silently truncating the dot product
      // (the DuckDB oracle's list_dot_product errors on the same input)
      require(va.length == vb.length,
        s"embedding dimension mismatch within a bucket: ids ${ids(a)} " +
          s"(dim ${va.length}) vs ${ids(b)} (dim ${vb.length})")
      var s = 0.0
      var j = 0
      while (j < va.length) { s += va(j) * vb(j); j += 1 }
      s / (norms(a) * norms(b))
    }
    val visited = new Array[Boolean](n)
    val out = new Array[Long](n)
    var cur = 0
    i = 1
    while (i < n) { if (ids(i) < ids(cur)) cur = i; i += 1 }
    visited(cur) = true
    out(0) = ids(cur)
    var k = 1
    while (k < n) {
      var best = -1
      var bestCos = 0.0
      i = 0
      while (i < n) {
        if (!visited(i)) {
          val c = cos(cur, i)
          if (best < 0 || c > bestCos ||
              (c == bestCos && ids(i) < ids(best))) {
            best = i
            bestCos = c
          }
        }
        i += 1
      }
      visited(best) = true
      out(k) = ids(best)
      cur = best
      k += 1
    }
    new GenericArrayData(out)
  }
}
