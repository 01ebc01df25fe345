package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed size of a text's UTF-8 bytes — the classic
  * compressibility quality signal (boilerplate, keyword stuffing and
  * template spam compress far below prose; the Gopher/RefinedWeb rule
  * family thresholds on exactly this ratio). Returned as the SIZE (a
  * long), not a ratio: callers divide by their own length column, so
  * the threshold policy stays visible in the query.
  *
  * Determinism: one `java.util.zip.Deflater` per call at a FIXED level
  * (6) with the default strategy — zlib's output is a pure function of
  * (input, level, strategy) for a given zlib build, so results are
  * stable across runs and partitionings on one cluster image. It is NOT
  * replayable by a foreign SQL engine (no DuckDB deflate), so the `t58`
  * gate derives its hash-checked output from PLANTED rows whose verdict
  * is enumerable and pins the organic behavior in CompressSpec — the
  * sketch-gate convention. */
case class DeflateSizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_size expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CompressibilityImpl.deflateSize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CompressibilityImpl.deflateSize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "deflate_size"
}

object DeflateSizeExpr {
  def apply(text: Column): Column =
    GraftInternals.column(DeflateSizeExpr(GraftInternals.expression(text)))
}

object CompressibilityImpl {
  def deflateSize(text: UTF8String): Long = {
    val in = text.getBytes
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
