package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-term term-frequency counts over a words array in ONE pass.
  *
  * The composable formulation — `array(terms.map(t => size(filter(words,
  * _ === t))))` — walks the words array once PER TERM, and Catalyst's
  * `filter` higher-order function is interpreted (no codegen), so a
  * T-term query pays T interpreted array passes per row per scan. This
  * expression walks the array once, looking each word up in a shared
  * UTF8String→index hash map (a codegen reference object — no per-row
  * allocation, no string copies), emitting the `array<long>` of counts in
  * term order. Semantics parity: null words are skipped (`===` propagates
  * null, which `filter` drops), every occurrence counts.
  */
case class TermFreqsExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  require(terms.nonEmpty, "term_freqs: terms must be non-empty")
  require(terms.distinct == terms, "term_freqs: terms must be distinct")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_freqs expects array<string>, got ${other.sql}")
  }

  @transient private lazy val termIndex: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.size * 2)
    terms.zipWithIndex.foreach { case (t, i) =>
      m.put(UTF8String.fromString(t), Integer.valueOf(i))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    TermFreqsImpl.compute(input.asInstanceOf[ArrayData], termIndex, terms.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("termIdx", termIndex,
      classOf[java.util.HashMap[UTF8String, Integer]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TermFreqsImpl.compute($c, $idxRef, ${terms.size})")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "term_freqs"
}

object TermFreqsExpr {
  def apply(words: Column, terms: Seq[String]): Column =
    GraftInternals.column(TermFreqsExpr(GraftInternals.expression(words), terms))
}

/** Per-SET membership counts over a words array in ONE pass: result(i) =
  * number of tokens contained in `sets(i)`. The composable per-set
  * `size(filter(words, array_contains(lit(set), _)))` is one interpreted
  * traversal (with a linear array_contains probe) per set per row — the
  * language-ID heuristic paid five of them. Here every token is looked up
  * once in a token→set-indices map held as a codegen reference object; a
  * token may belong to several sets (shared vocabulary like "de"/"la"
  * across Romance marker lists) and increments each. Null tokens are
  * skipped (`array_contains` null-propagates into a filter drop). */
case class TermSetCountsExpr(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  require(sets.nonEmpty, "term_set_counts: at least one set required")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_set_counts expects array<string>, got ${other.sql}")
  }

  @transient private lazy val memberIndex: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    sets.zipWithIndex.foreach { case (set, i) =>
      set.distinct.foreach { t =>
        val k = UTF8String.fromString(t)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    TermFreqsImpl.setCounts(
      input.asInstanceOf[ArrayData], memberIndex, sets.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("memberIdx", memberIndex,
      classOf[java.util.HashMap[UTF8String, Array[Int]]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TermFreqsImpl.setCounts($c, $idxRef, ${sets.size})")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "term_set_counts"
}

object TermSetCountsExpr {
  def apply(words: Column, sets: Seq[Seq[String]]): Column =
    GraftInternals.column(
      TermSetCountsExpr(GraftInternals.expression(words), sets))
}

/** [[TermSetCountsExpr]] fused with the ARGMAX: returns `labels(i)` for
  * the highest-count set (strictly-greater, so the FIRST of equals
  * wins — pass label-sorted sets for the lexicographic-ties contract),
  * or `default` when every count is zero.
  *
  * Exists because the Column-composed argmax over a counts array is a
  * performance trap: every `element_at`/`when` reference to the shared
  * counts subtree re-evaluates it (Catalyst's subexpression elimination
  * does not reach across the nested conditional tree), and the
  * language-ID formulation reached ~50 re-tokenizations per row —
  * measured 2.0 s for 5k docs at sf0.1, vs one pass here. */
case class TermSetBestExpr(child: Expression, sets: Seq[Seq[String]],
    labels: Seq[String], default: String) extends UnaryExpression {

  require(sets.nonEmpty && sets.size == labels.size,
    "term_set_best: one label per set required")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_set_best expects array<string>, got ${other.sql}")
  }

  @transient private lazy val memberIndex: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    sets.zipWithIndex.foreach { case (set, i) =>
      set.distinct.foreach { t =>
        val k = UTF8String.fromString(t)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  @transient private lazy val labelStrings: Array[UTF8String] =
    (labels :+ default).map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    TermFreqsImpl.setBest(
      input.asInstanceOf[ArrayData], memberIndex, sets.size, labelStrings)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("memberIdx", memberIndex,
      classOf[java.util.HashMap[UTF8String, Array[Int]]].getName)
    // Java SOURCE array syntax, not classOf[Array[...]].getName: the latter
    // yields the JVM descriptor "[Lorg...UTF8String;" which Janino rejects in
    // the generated cast, silently dropping the whole stage to interpreted
    // mode (the MinhashSignature.scala "long[]" convention).
    val lblRef = ctx.addReferenceObj("labels", labelStrings,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TermFreqsImpl.setBest($c, $idxRef, ${sets.size}, $lblRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "term_set_best"
}

object TermSetBestExpr {
  def apply(words: Column, sets: Seq[Seq[String]], labels: Seq[String],
      default: String): Column =
    GraftInternals.column(TermSetBestExpr(
      GraftInternals.expression(words), sets, labels, default))
}

/** Occurrence count of the MOST frequent token in a words array, in one
  * hash pass.
  *
  * The composable formulation — `transform(array_distinct(words), d =>
  * size(filter(words, _ === d)))` then `array_max` — is O(distinct ×
  * words) interpreted work per row: a 10k-token document with 5k distinct
  * tokens pays ~5·10⁷ lambda dispatches for ONE row. This kernel is one
  * O(words) pass over a hash map. Null elements are skipped (their HOF
  * count is 0, which can never win the max); empty arrays yield 0. */
case class MaxTokenFreqExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_token_freq expects array<string>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TermFreqsImpl.maxFreq(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TermFreqsImpl.maxFreq($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "max_token_freq"
}

object MaxTokenFreqExpr {
  def apply(words: Column): Column =
    GraftInternals.column(MaxTokenFreqExpr(GraftInternals.expression(words)))
}

/** Static kernel — called from both the interpreted eval and generated
  * code. */
object TermFreqsImpl {

  def setCounts(words: ArrayData,
      idx: java.util.HashMap[UTF8String, Array[Int]], nSets: Int): GenericArrayData = {
    val counts = new Array[Long](nSets)
    val len = words.numElements()
    var i = 0
    while (i < len) {
      if (!words.isNullAt(i)) {
        val member = idx.get(words.getUTF8String(i))
        if (member != null) {
          var j = 0
          while (j < member.length) { counts(member(j)) += 1L; j += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Argmax over [[setCounts]]: first strictly-greatest set's label,
    * `labels(nSets)` (the default slot) when all counts are zero. */
  def setBest(words: ArrayData,
      idx: java.util.HashMap[UTF8String, Array[Int]], nSets: Int,
      labels: Array[UTF8String]): UTF8String = {
    val counts = new Array[Long](nSets)
    val len = words.numElements()
    var i = 0
    while (i < len) {
      if (!words.isNullAt(i)) {
        val member = idx.get(words.getUTF8String(i))
        if (member != null) {
          var j = 0
          while (j < member.length) { counts(member(j)) += 1L; j += 1 }
        }
      }
      i += 1
    }
    var best = -1
    var bestC = 0L
    var k = 0
    while (k < nSets) {
      if (counts(k) > bestC) { bestC = counts(k); best = k }
      k += 1
    }
    if (best < 0) labels(nSets) else labels(best)
  }

  def maxFreq(words: ArrayData): Long = {
    val len = words.numElements()
    if (len == 0) return 0L
    // long arithmetic: len * 2 overflows Int on pathological arrays
    val m = new java.util.HashMap[UTF8String, Long](
      Math.min(len.toLong * 2, 1L << 16).toInt)
    var best = 0L
    var i = 0
    while (i < len) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        val c = m.getOrDefault(w, 0L) + 1L
        m.put(w, c)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
  def compute(words: ArrayData,
      idx: java.util.HashMap[UTF8String, Integer], n: Int): GenericArrayData = {
    val counts = new Array[Long](n)
    val len = words.numElements()
    var i = 0
    while (i < len) {
      if (!words.isNullAt(i)) {
        val p = idx.get(words.getUTF8String(i))
        if (p != null) counts(p.intValue()) += 1L
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}
