package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass multi-keyword dictionary matching (Aho–Corasick): which of
  * K dictionary terms occur in each document — the blocklist /
  * topic-tagging / licence-phrase primitive of corpus curation, where
  * K is hundreds-to-thousands and scanning the text K times (one
  * `contains` per term) is the naive cost this kernel removes. One
  * automaton per executor (built once per partition via lazy init,
  * shared by every row), one pass per document, O(len + matches).
  *
  * Semantics: case-sensitive SUBSTRING matching (callers lowercase both
  * sides for case-folding — composing with [[TextFunctions]]'s
  * normalization keeps the policy explicit); overlapping and nested
  * terms all report; output is the DISTINCT matched terms in dictionary
  * order (deterministic, SQL-replayable as `filter(dict, contains)` —
  * the `t57` gate's oracle). Empty dictionary → empty array. */
case class DictionaryMatchExpr(child: Expression, dict: Seq[String])
    extends UnaryExpression {

  require(dict.forall(_.nonEmpty), "dictionary terms must be non-empty")
  require(dict.distinct.size == dict.size,
    "dictionary terms must be distinct (duplicates would tag ambiguously)")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dictionary_match expects STRING input, got ${other.sql}")
  }

  @transient private lazy val automaton = new AhoCorasick(dict)

  override def nullSafeEval(input: Any): Any =
    automaton.matchedTerms(input.asInstanceOf[UTF8String])

  // the automaton lives as a codegen reference object: built once per
  // executor task, reused across every row in the generated loop
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("ahoCorasick", automaton,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$ac.matchedTerms($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "dictionary_match"
}

object DictionaryMatchExpr {
  def apply(text: Column, dict: Seq[String]): Column =
    GraftInternals.column(DictionaryMatchExpr(
      GraftInternals.expression(text), dict))
}

/** Classic Aho–Corasick over chars: goto trie + BFS failure links +
  * output links. Built once (driver side, shipped inside the expression;
  * ~Σ|term| nodes), matched in one pass per document. Serializable so
  * the codegen reference object survives task shipping. */
final class AhoCorasick(dict: Seq[String]) extends Serializable {

  // trie as growable parallel arrays; children in hash maps (term
  // alphabets are unbounded unicode)
  private val children =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Integer]())
  private val termAt = scala.collection.mutable.ArrayBuffer[Int](-1)
  private val fail = scala.collection.mutable.ArrayBuffer[Int](0)
  // output link: nearest suffix-node that ends a term (chains collapse)
  private val out = scala.collection.mutable.ArrayBuffer[Int](-1)

  locally {
    dict.zipWithIndex.foreach { case (term, ix) =>
      var node = 0
      for (c <- term) {
        val nxt = children(node).get(c)
        node =
          if (nxt != null) nxt.intValue()
          else {
            children += new java.util.HashMap[Char, Integer]()
            termAt += -1
            fail += 0
            out += -1
            val id = children.size - 1
            children(node).put(c, id)
            id
          }
      }
      if (termAt(node) < 0) termAt(node) = ix // duplicate terms: first wins
    }
    // BFS failure links
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      out(u) = if (termAt(fail(u)) >= 0) fail(u) else out(fail(u))
      children(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && children(f).get(c) == null) f = fail(f)
        val t = children(f).get(c)
        fail(v) = if (t != null && t.intValue() != v.intValue())
          t.intValue() else 0
        queue.add(v)
      }
    }
  }

  private val termStrings: Array[UTF8String] =
    dict.map(UTF8String.fromString).toArray

  def matchedTerms(text: UTF8String): ArrayData = {
    val s = text.toString
    val seen = new Array[Boolean](termStrings.length)
    var found = 0
    var node = 0
    var i = 0
    val n = s.length
    while (i < n && found < termStrings.length) {
      val c = s.charAt(i)
      var t = children(node).get(c)
      while (t == null && node != 0) { node = fail(node); t = children(node).get(c) }
      node = if (t != null) t.intValue() else 0
      var o = if (termAt(node) >= 0) node else out(node)
      while (o >= 0) {
        val ix = termAt(o)
        if (!seen(ix)) { seen(ix) = true; found += 1 }
        o = out(o)
      }
      i += 1
    }
    val res = new Array[Any](found)
    var w = 0
    var j = 0
    while (j < seen.length) { // dictionary order, deterministic
      if (seen(j)) { res(w) = termStrings(j); w += 1 }
      j += 1
    }
    new GenericArrayData(res)
  }
}
