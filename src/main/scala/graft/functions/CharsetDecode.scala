package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset auto-detection for crawl payload bytes: STRICT UTF-8 when the
  * bytes validate (the dominant modern case — and strictness is the
  * point, because a permissive decode turns real Latin-1 into U+FFFD
  * mojibake silently), Latin-1 (ISO-8859-1) otherwise — the fallback
  * that never fails and matches the bulk of legacy crawl content
  * (Windows-1252's printable range folds into it for the characters
  * that matter at corpus scale; full charset sniffing needs the page's
  * meta tags, which belong to the HTML layer, not this kernel).
  *
  * A UTF-8 BOM is stripped. Validation is one linear pass over the
  * bytes (no exception-driven control flow, no allocation until the
  * verdict); the Latin-1 path maps bytes 1:1 to code points. The
  * `t55_charset` gate decodes a half-UTF-8 / half-Latin-1 corpus built
  * from the documents table against the identity oracle. */
case class DecodeTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"decode_text expects BINARY input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CharsetDecodeImpl.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharsetDecodeImpl.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "decode_text"
}

object DecodeTextExpr {
  def apply(bytes: Column): Column =
    GraftInternals.column(DecodeTextExpr(GraftInternals.expression(bytes)))
}

object CharsetDecodeImpl {

  def decode(b: Array[Byte]): UTF8String = {
    val start =
      if (b.length >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB &&
        (b(2) & 0xFF) == 0xBF) 3
      else 0
    if (isValidUtf8(b, start))
      UTF8String.fromBytes(b, start, b.length - start)
    else
      UTF8String.fromString(new String(b, start, b.length - start,
        java.nio.charset.StandardCharsets.ISO_8859_1))
  }

  /** Strict UTF-8 validation: correct continuation counts, no overlong
    * encodings, no surrogates, max U+10FFFF. */
  private[graft] def isValidUtf8(b: Array[Byte], from: Int): Boolean = {
    var i = from
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c < 0xC2) return false // stray continuation or overlong 2-byte
      else if (c < 0xE0) { // 2 bytes
        if (i + 1 >= n || (b(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (c < 0xF0) { // 3 bytes
        if (i + 2 >= n || (b(i + 1) & 0xC0) != 0x80 ||
          (b(i + 2) & 0xC0) != 0x80) return false
        val cp = ((c & 0x0F) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
        if (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF)) return false
        i += 3
      } else if (c < 0xF5) { // 4 bytes
        if (i + 3 >= n || (b(i + 1) & 0xC0) != 0x80 ||
          (b(i + 2) & 0xC0) != 0x80 || (b(i + 3) & 0xC0) != 0x80) return false
        val cp = ((c & 0x07) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
        if (cp < 0x10000 || cp > 0x10FFFF) return false
        i += 4
      } else return false
    }
    true
  }
}
