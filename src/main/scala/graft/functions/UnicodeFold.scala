package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode compatibility folding for pre-dedup normalization: NFKD
  * decomposition (full-width → ASCII, ligatures 'ﬁ' → "fi", superscripts,
  * …), combining-mark removal ('é' → "e", so accent variants of the same
  * text produce identical shingles), then NFC recomposition for a canonical
  * byte form. Pure JDK (`java.text.Normalizer` + `Character.getType`) — no
  * external ICU dependency, deterministic across JVMs, offline-safe.
  *
  * Codegen'd via a static-call kernel, so the fold stays inside whole-stage
  * codegen like the rest of [[TextFunctions.normalize]]'s pipeline. ASCII
  * input short-circuits without allocating (the overwhelmingly common case
  * in web corpora). */
case class UnicodeFoldExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_fold expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeFoldImpl.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeFoldImpl.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeFoldExpr {
  def apply(text: Column): Column =
    GraftInternals.column(UnicodeFoldExpr(GraftInternals.expression(text)))
}

object UnicodeFoldImpl {

  /** NFC(NFKD(s) minus non-spacing marks); ASCII input returns the input
    * UTF8String untouched (zero-copy). */
  def fold(s: UTF8String): UTF8String = {
    if (s == null) return null
    if (isAscii(s)) return s
    val str = s.toString
    val nfkd = Normalizer.normalize(str, Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(nfkd.length)
    var i = 0
    while (i < nfkd.length) {
      val cp = nfkd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}
