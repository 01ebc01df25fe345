package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused distinct character 1..maxN-grams of whitespace-normalized,
  * lowercased, space-padded text — the [[TextFunctions.charNgrams]]
  * kernel.
  *
  * The composable formulation (per size, `transform(sequence…,
  * substr(p, i+1, n))`, then `concat` + `array_distinct`) is maxN
  * interpreted transforms per row, each allocating a position sequence and
  * per-position substring expressions. This kernel normalizes once and
  * emits every window from a single code-point array.
  *
  * Parity is bit-exact with the composable chain by construction:
  *  - `trim` strips ASCII space 0x20 only (Spark's trim);
  *  - lowercasing calls `UTF8String.toLowerCase` itself (Spark's `lower`);
  *  - `\s+` runs collapse to one space (the six Java-regex default `\s`
  *    chars, all ASCII);
  *  - windows count CODE POINTS, matching `substr`/`length` on UTF8String
  *    (NOT Java UTF-16 units — astral-plane chars are one position);
  *  - a string shorter than `n` emits its single truncated window, the
  *    `sequence(0, greatest(len-n, 0))` quirk;
  *  - distinct keeps first-occurrence order across sizes 1..maxN
  *    (`array_distinct` over the concatenation). */
case class CharNgramsExpr(child: Expression, maxN: Int) extends UnaryExpression {

  require(maxN >= 1, "maxN must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgramsImpl.compute(input.asInstanceOf[UTF8String], maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharNgramsImpl.compute($c, $maxN)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "char_ngrams"
}

object CharNgramsExpr {
  def apply(text: Column, maxN: Int): Column =
    GraftInternals.column(CharNgramsExpr(GraftInternals.expression(text), maxN))
}

/** Static kernel — called from both the interpreted eval and generated
  * code. */
object CharNgramsImpl {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String, maxN: Int): GenericArrayData = {
    // trim (ASCII space only) on the raw string, then Spark's own lowercase
    val raw = text.toString
    var b = 0
    var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    val lowered = UTF8String.fromString(raw.substring(b, e)).toLowerCase.toString
    // collapse \s+ runs to one space, with the leading/trailing pad
    val sb = new java.lang.StringBuilder(lowered.length + 2)
    sb.append(' ')
    var i = 0
    while (i < lowered.length) {
      if (isWs(lowered.charAt(i))) {
        sb.append(' ')
        while (i < lowered.length && isWs(lowered.charAt(i))) i += 1
      } else {
        sb.append(lowered.charAt(i))
        i += 1
      }
    }
    sb.append(' ')
    // window over CODE POINTS (substr/length semantics on UTF8String)
    val cps = sb.toString.codePoints().toArray
    val len = cps.length
    val seen = new java.util.LinkedHashSet[String](Math.min(len * maxN, 1 << 12))
    var n = 1
    while (n <= maxN) {
      val last = Math.max(len - n, 0)
      var p = 0
      while (p <= last) {
        seen.add(new String(cps, p, Math.min(n, len - p)))
        p += 1
      }
      n += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
