package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → DISTINCT n-token span strings in one pass.
  *
  * The composable formulation — `words(text)` then
  * `array_distinct(transform(sequence…, array_join(slice(words, i, n))))`
  * — is built on higher-order functions, and Catalyst's HOFs
  * (`transform` + `lambdafunction`) do NOT participate in whole-stage
  * codegen: every row pays interpreted per-element lambda dispatch, and
  * worse, `InferFiltersFromGenerate` clones the whole chain into a
  * pushed-down non-codegen `Filter` that re-evaluates it per row
  * (measured: ~25× over the fused kernel at sf0.1 on the spanStats path).
  * This expression runs the identical semantics as ONE static JIT-friendly
  * loop — tokenize once, build each window with a StringBuilder, dedup
  * with an insertion-ordered set — and inlines into generated code via a
  * static call, the same pattern as [[ShingleHashSetImpl]].
  *
  * Tokenizer parity with [[TextFunctions.words]] is bit-exact by
  * construction: trim ASCII space 0x20 only (Spark's `trim`), then
  * `Pattern("\\s+").split(s, -1)` (Spark's `split(str, "\\s+", -1)` on the
  * JVM regex engine), empty trimmed text → zero tokens. Documents shorter
  * than `n` tokens yield an EMPTY array (spanStats semantics — NOT the
  * whole-document collapse of [[TextFunctions.shingles]]); distinct spans
  * keep first-occurrence order (`array_distinct` semantics). */
case class WordSpansExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "span length n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_spans expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WordSpansImpl.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordSpansImpl.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_spans"
}

object WordSpansExpr {
  def apply(text: Column, n: Int): Column =
    GraftInternals.column(WordSpansExpr(GraftInternals.expression(text), n))
}

/** [[WordSpansExpr]] with [[TextFunctions.shingles]] collapse semantics
  * instead of spanStats exclusion semantics: a document shorter than `n`
  * tokens yields ONE whole-document shingle (the empty string for an empty
  * document — `concat_ws` over zero words), bit-exactly matching
  * `array_distinct(shingles(words(text), n))`. The decontamination path's
  * generation kernel. */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WordSpansImpl.computeCollapse(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordSpansImpl.computeCollapse($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShinglesExpr {
  def apply(text: Column, n: Int): Column =
    GraftInternals.column(WordShinglesExpr(GraftInternals.expression(text), n))
}

/** Static kernel — called from both the interpreted eval and the generated
  * code (a single static call keeps the loop in one JIT-compiled method). */
object WordSpansImpl {
  private val Whitespace = Pattern.compile("\\s+")

  /** Tokenize with bit-exact [[TextFunctions.words]] parity: trim ASCII
    * space 0x20 only, regex split on `\s+` with limit -1, empty trimmed
    * text → zero tokens. */
  private def tokenize(text: UTF8String): Array[String] = {
    val raw = text.toString
    // Spark's trim(): ASCII space 0x20 only (NOT Java String.trim, which
    // also strips control chars — tokenizer parity requires the narrow one)
    var b = 0
    var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    if (b == e) return Array.empty[String]
    val s = if (b == 0 && e == raw.length) raw else raw.substring(b, e)
    Whitespace.split(s, -1)
  }

  /** Collapse variant ([[TextFunctions.shingles]] semantics): under n
    * tokens → ONE whole-document shingle (space-joined; "" when empty). */
  def computeCollapse(text: UTF8String, n: Int): GenericArrayData = {
    val words = tokenize(text)
    if (words.length < n)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(words.mkString(" "))))
    distinctWindows(words, n)
  }

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val words = tokenize(text)
    val count = words.length - n + 1
    if (words.length == 0 || count <= 0)
      return new GenericArrayData(Array.empty[Any])
    distinctWindows(words, n)
  }

  private def distinctWindows(words: Array[String], n: Int): GenericArrayData = {
    val count = words.length - n + 1
    val seen = new java.util.LinkedHashSet[String](Math.min(count, 1 << 10))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
