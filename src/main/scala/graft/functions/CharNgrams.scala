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

  def compute(text: UTF8String, maxN: Int): GenericArrayData = {
    // trim (ASCII space only, shared with the tokenizer kernels), then
    // Spark's own lowercase
    val lowered = UTF8String.fromString(
      WordSpansImpl.trimSpaces(text.toString)).toLowerCase.toString
    // collapse \s+ runs to one space, with the leading/trailing pad
    val sb = new java.lang.StringBuilder(lowered.length + 2)
    sb.append(' ')
    var i = 0
    while (i < lowered.length) {
      if (WordSpansImpl.isWs(lowered.charAt(i))) {
        sb.append(' ')
        while (i < lowered.length && WordSpansImpl.isWs(lowered.charAt(i))) i += 1
      } else {
        sb.append(lowered.charAt(i))
        i += 1
      }
    }
    sb.append(' ')
    // window over CODE POINTS (substr/length semantics on UTF8String)
    val cps = sb.toString.codePoints().toArray
    val len = cps.length
    // long arithmetic: len * maxN overflows Int on pathological documents
    val seen = new java.util.LinkedHashSet[String](
      Math.min(len.toLong * maxN, 1L << 12).toInt)
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
