package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Markup (HTML-ish) → clean text: the FIRST stage of a crawl→train-data
  * pipeline, ahead of chunk-frequency boilerplate removal
  * ([[graft.operators.Dedup.stripBoilerplate]]), quality scoring, dedup
  * and tokenization — all of which assume tag-free text.
  *
  * One charwise state machine per row (no DOM, no regex, bounded memory —
  * the same executor-side from-scratch-codec discipline as the
  * [[graft.operators.Multimodal]] JPEG/PNG/WAV decoders), with browsers'
  * forgiving-parse conventions:
  *
  *  - `<script>`/`<style>` element CONTENT is dropped (case-insensitive,
  *    attributes allowed, runs to the matching close tag or EOF);
  *  - `<!-- comments -->` are dropped (unterminated: to EOF);
  *  - every other tag is stripped; tags whose name is block-level
  *    (p div br hr li ul ol tr table thead tbody blockquote pre h1–h6
  *    title section article aside header footer nav form fieldset figure
  *    figcaption main address dl dt dd caption) emit a newline, open and
  *    close alike; inline tags (b i em a span code …) emit nothing;
  *  - character entities decode: the named set `&amp; &lt; &gt; &quot;
  *    &apos; &nbsp;` (nbsp → plain space) plus numeric `&#NN;`/`&#xHH;`;
  *    an unrecognized or unterminated `&…` run stays literal text;
  *  - a `<` not opening a tag (next char not a letter, `/` or `!`)
  *    is literal text;
  *  - whitespace normalizes: a run containing a tag-emitted newline
  *    collapses to ONE `\n`, any other whitespace run (including raw
  *    `\n`/`\t`/`\r` in source text, which HTML renders as spaces)
  *    collapses to ONE space, and the ends are trimmed.
  *
  * The state machine is deliberately SQL-replayable for fixture-built
  * markup (the `t48_markup_extract` gate builds HTML by concatenation in
  * both engines, so its expected text is a plain SQL expression — the
  * DuckDB oracle needs no HTML parser), while the edge grammar
  * (malformed tags, entities, nesting) is pinned by MarkupExtractSpec. */
case class MarkupExtractExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"markup_extract expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MarkupExtractImpl.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MarkupExtractImpl.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "markup_extract"
}

object MarkupExtractExpr {
  def apply(text: Column): Column =
    GraftInternals.column(MarkupExtractExpr(GraftInternals.expression(text)))
}

/** Static kernel — called from both the interpreted eval and generated
  * code. Operates on the decoded string (entity/tag grammar is ASCII;
  * non-ASCII text passes through untouched). */
object MarkupExtractImpl {

  private[functions] val blockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "br", "hr", "li", "ul", "ol", "tr", "table", "thead",
      "tbody", "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6",
      "title", "section", "article", "aside", "header", "footer", "nav",
      "form", "fieldset", "figure", "figcaption", "main", "address", "dl",
      "dt", "dd", "caption").foreach(s.add)
    s
  }

  private[functions] def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'

  private[functions] def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Entity decode at `s(i) == '&'` -- the named set `amp lt gt quot apos
    * nbsp` plus numeric `&#NN;`/`&#xHH;`. Packs `(resumeIndex << 32) |
    * codepoint`, or -1 when the run is not a recognized entity (caller
    * emits the literal `&`). Shared with [[MainContentImpl]] so the two
    * extractors can never drift on the entity grammar. */
  private[functions] def entityAt(s: String, i: Int): Long = {
    val n = s.length
    var decoded = -1
    var next = i
    if (s.startsWith("&amp;", i)) { decoded = '&'; next = i + 5 }
    else if (s.startsWith("&lt;", i)) { decoded = '<'; next = i + 4 }
    else if (s.startsWith("&gt;", i)) { decoded = '>'; next = i + 4 }
    else if (s.startsWith("&quot;", i)) { decoded = '"'; next = i + 6 }
    else if (s.startsWith("&apos;", i)) { decoded = '\''; next = i + 6 }
    else if (s.startsWith("&nbsp;", i)) { decoded = ' '; next = i + 6 }
    else if (s.startsWith("&#", i)) {
      var j = i + 2
      val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
      if (hex) j += 1
      var v = 0
      var any = false
      var ok = true
      while (j < n && ok && s.charAt(j) != ';') {
        val d = Character.digit(s.charAt(j), if (hex) 16 else 10)
        if (d < 0 || v > 0x10FFFF) ok = false
        else { v = v * (if (hex) 16 else 10) + d; any = true; j += 1 }
      }
      if (ok && any && j < n && s.charAt(j) == ';' && v <= 0x10FFFF) {
        decoded = v; next = j + 1
      }
    }
    if (decoded < 0) -1L else (next.toLong << 32) | decoded.toLong
  }

  def extract(input: UTF8String): UTF8String = {
    val s = input.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    // pending whitespace between emitted text: 0 none, 1 space, 2 newline
    var pending = 0
    var i = 0

    def emitChar(c: Char): Unit = {
      if (out.length() > 0) {
        if (pending == 2) out.append('\n')
        else if (pending == 1) out.append(' ')
      }
      pending = 0
      out.append(c)
    }

    // find the end of a raw-text element (script/style): index just past
    // the matching </name...> close tag, or n
    def rawTextEnd(name: String, from: Int): (Int, Int) = {
      // returns (contentEnd, resumeIndex)
      var j = from
      while (j < n) {
        if (s.charAt(j) == '<' && j + 1 < n && s.charAt(j + 1) == '/') {
          var k = j + 2
          var m = 0
          while (k < n && m < name.length &&
            Character.toLowerCase(s.charAt(k)) == name.charAt(m)) { k += 1; m += 1 }
          if (m == name.length &&
            (k >= n || !isAsciiLetter(s.charAt(k)))) {
            while (k < n && s.charAt(k) != '>') k += 1
            return (j, if (k < n) k + 1 else n)
          }
        }
        j += 1
      }
      (n, n)
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n &&
        (isAsciiLetter(s.charAt(i + 1)) || s.charAt(i + 1) == '/' ||
          s.charAt(i + 1) == '!')) {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          // parse tag name
          var j = i + 1
          val closing = s.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          // first char is a letter (checked at dispatch); the rest of an
          // HTML tag name may carry digits (h1..h6)
          while (j < n && (isAsciiLetter(s.charAt(j)) ||
            (s.charAt(j) >= '0' && s.charAt(j) <= '9'))) j += 1
          val name = s.substring(nameStart, j).toLowerCase
          // scan to tag end (no quote-awareness needed for > inside
          // attributes in this forgiving grammar: browsers also split
          // on the first > outside quotes; quoted > is rare and the
          // failure mode is dropped text, pinned in the spec)
          while (j < n && s.charAt(j) != '>') j += 1
          val tagEnd = if (j < n) j + 1 else n
          if (!closing && (name == "script" || name == "style")) {
            val (_, resume) = rawTextEnd(name, tagEnd)
            i = resume
          } else i = tagEnd
          if (name.nonEmpty && blockTags.contains(name)) pending = 2
        }
      } else if (c == '&') {
        val packed = entityAt(s, i)
        val decoded = if (packed < 0) -1 else packed.toInt
        val next = if (packed < 0) i else (packed >>> 32).toInt
        if (decoded < 0) { emitChar('&'); i += 1 }
        else {
          if (decoded == ' ') { if (pending == 0) pending = 1; }
          else if (Character.isSupplementaryCodePoint(decoded)) {
            emitChar(Character.highSurrogate(decoded))
            out.append(Character.lowSurrogate(decoded))
          } else if (isWsChar(decoded.toChar)) {
            if (pending == 0) pending = 1
          } else emitChar(decoded.toChar)
          i = next
        }
      } else if (isWsChar(c)) {
        if (pending == 0) pending = 1
        i += 1
      } else {
        emitChar(c)
        i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }
}
