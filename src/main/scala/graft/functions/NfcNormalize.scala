package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonicalization dedup and exact-match
  * joins need BEFORE hashing text: the same visible string arrives from
  * real corpora both precomposed (U+00E9 `é`) and decomposed
  * (`e` + U+0301 combining acute), and a hash-based dedup that skips
  * normalization silently treats them as distinct documents (the
  * classic cross-source near-miss). Backed by `java.text.Normalizer`
  * (the JDK's implementation of UAX #15 — part of the platform, same
  * standing as `java.util.zip` in the codec kernels); Spark has no
  * built-in for it. Codegen'd; the `t62` gate cross-validates the JDK
  * implementation against DuckDB's ICU-backed `nfc_normalize` over
  * fixture-built decomposed text, so the two engines' Unicode tables
  * are pinned against each other. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeImpl.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalizeExpr {
  def apply(text: Column): Column =
    GraftInternals.column(NfcNormalizeExpr(GraftInternals.expression(text)))
}

object NfcNormalizeImpl {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: NFC-checking is much cheaper than normalizing, and real
    // corpus text is overwhelmingly already composed
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}
