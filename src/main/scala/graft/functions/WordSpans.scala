package graft.functions

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
  * construction: trim ASCII space 0x20 only (Spark's `trim`), then split
  * on `\s+` runs with `split(str, "\\s+", -1)` semantics (charwise over
  * Java regex's exact default `\s` class — see [[WordSpansImpl.tokenize]]),
  * empty trimmed text → zero tokens. Documents shorter
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

/** ALL sliding n-token windows in document order, NOT distinct — the
  * MULTISET gram kernel (hashed-ngram bag models weigh by occurrence
  * COUNTS, so the distinct set kernels above lose exactly the signal
  * they need). Same tokenizer contract as [[WordSpansExpr]]; under `n`
  * tokens → empty array (spanStats exclusion semantics — a bag model
  * has no whole-document-collapse convention). */
case class WordGramsExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "gram size n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_grams expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WordSpansImpl.computeAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordSpansImpl.computeAll($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_grams"
}

object WordGramsExpr {
  def apply(text: Column, n: Int): Column =
    GraftInternals.column(WordGramsExpr(GraftInternals.expression(text), n))
}

/** Fused tokenize → DISJOINT n-token chunks in document order (the
  * partition of the token stream into consecutive n-word windows, last
  * chunk possibly shorter), NOT distinct — positions are recoverable as
  * the array index, which is what lets
  * [[graft.operators.Dedup.stripSharedChunks]] reassemble cleaned text.
  * Same tokenizer contract as [[WordSpansExpr]] (trim ASCII space, split
  * `\s+`, empty trimmed text → zero tokens → zero chunks); same codegen
  * rationale — the composable `transform(sequence(...), i ->
  * array_join(slice(words, i*n+1, n), ' '))` form is interpreted per
  * element. */
case class WordChunksExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "chunk length n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_chunks expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WordSpansImpl.computeChunks(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordSpansImpl.computeChunks($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_chunks"
}

object WordChunksExpr {
  def apply(text: Column, n: Int): Column =
    GraftInternals.column(WordChunksExpr(GraftInternals.expression(text), n))
}

/** Fused whitespace tokenizer — the expression behind
  * [[TextFunctions.words]]. The composable `split(trim(text), "\\s+")`
  * form routes through the JVM regex engine per row; this is the same
  * charwise scan the span/shingle kernels use (bit-exact `\s+`/limit -1
  * semantics, empty trimmed text → empty array), exposed as its own
  * codegen'd expression so EVERY tokenizing operator — token counts, term
  * stats, heavy hitters, quality scores — shares one fast path. */
case class WordsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"words expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WordSpansImpl.words(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordSpansImpl.words($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "words"
}

object WordsExpr {
  def apply(text: Column): Column =
    GraftInternals.column(WordsExpr(GraftInternals.expression(text)))
}

/** Static kernel — called from both the interpreted eval and the generated
  * code (a single static call keeps the loop in one JIT-compiled method). */
object WordSpansImpl {

  /** Java regex `\s` (default mode, no UNICODE_CHARACTER_CLASS): exactly
    * the six ASCII whitespace chars. A charwise scan over this class IS
    * `Pattern("\\s+").split(s, -1)` — and several times faster. Shared
    * with [[CharNgramsImpl]] so the whitespace contract lives in ONE
    * place. */
  private[functions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Spark's `trim()`: strips ASCII space 0x20 only (NOT Java String.trim,
    * which also strips control chars — parity requires the narrow one).
    * Shared with [[CharNgramsImpl]]. */
  private[functions] def trimSpaces(raw: String): String = {
    var b = 0
    var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == raw.length) raw else raw.substring(b, e)
  }

  /** Tokenize with bit-exact [[TextFunctions.words]] parity: trim ASCII
    * space 0x20 only, split on `\s+` runs with limit -1 semantics (a
    * leading/trailing separator run yields a leading/trailing "" token),
    * empty trimmed text → zero tokens. */
  private[functions] def tokenize(text: UTF8String): Array[String] = {
    val raw = trimSpaces(text.toString)
    if (raw.isEmpty) return Array.empty[String]
    val b = 0
    val e = raw.length
    val out = new java.util.ArrayList[String](16)
    var i = b
    var tokenStart = b
    while (i < e) {
      if (isWs(raw.charAt(i))) {
        out.add(raw.substring(tokenStart, i)) // "" for a leading separator
        while (i < e && isWs(raw.charAt(i))) i += 1
        tokenStart = i
      } else i += 1
    }
    out.add(raw.substring(tokenStart, e)) // "" for a trailing separator run
    out.toArray(new Array[String](out.size))
  }

  /** Tokens as a catalyst array — [[WordsExpr]]'s kernel. */
  def words(text: UTF8String): GenericArrayData = {
    val ws = tokenize(text)
    val out = new Array[Any](ws.length)
    var i = 0
    while (i < ws.length) { out(i) = UTF8String.fromString(ws(i)); i += 1 }
    new GenericArrayData(out)
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

  /** ALL sliding windows, in order, not distinct — [[WordGramsExpr]]'s
    * kernel. Under n tokens → empty array. */
  def computeAll(text: UTF8String, n: Int): GenericArrayData = {
    val words = tokenize(text)
    val count = words.length - n + 1
    if (words.length == 0 || count <= 0)
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
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
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Disjoint n-token chunks in document order, NOT distinct, the last
    * (possibly partial) chunk kept — [[WordChunksExpr]]'s kernel. Empty
    * trimmed text → empty array (zero tokens → zero chunks). */
  def computeChunks(text: UTF8String, n: Int): GenericArrayData = {
    val words = tokenize(text)
    if (words.length == 0) return new GenericArrayData(Array.empty[Any])
    val m = (words.length + n - 1) / n
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder
    var c = 0
    while (c < m) {
      sb.setLength(0)
      var i = c * n
      val e = Math.min(i + n, words.length)
      while (i < e) {
        if (i > c * n) sb.append(' ')
        sb.append(words(i))
        i += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
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
