package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Main-content extraction: HTML → the page's CONTENT text only, with
  * per-site chrome (nav bars, footers, cookie banners, sidebars, link
  * lists) removed — the gap [[MarkupExtractExpr]] leaves open: a faithful
  * tag-stripper keeps every block, and chunk-frequency dedup removes
  * cross-site repeats but not per-site chrome on small sites.
  *
  * Two public-knowledge signals, fused in one pass:
  *
  *  1. **Block densitometry** (Kohlschütter, Fankhauser, Nejdl:
  *     "Boilerplate Detection Using Shallow Text Features", WSDM 2010):
  *     segment the page at block-level tags, measure each block's word
  *     count and link density (anchor words / words), and classify with
  *     the paper's published shallow decision rules over the
  *     (previous, current, next) block — long low-link blocks are
  *     content; short blocks are content only in a content
  *     neighborhood; link-dense blocks (> 1/3) are never content.
  *  2. **Semantic container pruning**: text inside
  *     `<nav> <aside> <header> <footer> <form> <head>` (incl. `<title>`)
  *     is boilerplate by the markup's own declaration, whatever its
  *     density — HTML5 landmark semantics. Landmark blocks are removed
  *     from the block sequence BEFORE densitometry, so a lead paragraph
  *     right after a nav bar is not judged against the nav's link
  *     density; non-landmark link-dense neighbors (related-article
  *     lists) still provide context exactly as published.
  *
  * Parsing reuses [[MarkupExtractImpl]]'s forgiving grammar — same block
  * tag set, same script/style/comment dropping, same shared entity
  * decoder ([[MarkupExtractImpl.entityAt]]) — so for any page, the
  * main-content output is a subset of the tag-stripper's lines with
  * identical per-block text. Kept blocks join with `\n`.
  *
  * Scale shape: one bounded charwise pass per row, no DOM, map-side
  * inside whole-stage codegen — embarrassingly parallel at 100 TB like
  * the other crawl kernels. */
case class MainContentExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"main_content expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MainContentImpl.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MainContentImpl.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "main_content"
}

object MainContentExpr {
  def apply(html: Column): Column =
    GraftInternals.column(MainContentExpr(GraftInternals.expression(html)))
}

/** [[MainContentExpr]]'s block TABLE: one struct per segmented block in
  * page order — `(text, words, anchor_words, chrome, is_content)` — the
  * WSDM 2010 shallow features AS DATA. For training a custom content
  * classifier on labeled pages, auditing the built-in verdicts, or
  * block-grain downstream processing; `is_content` is exactly the
  * verdict [[MainContentExpr]] keeps, so
  * `array_join(filter(blocks, b -> b.is_content).text, '\n')` equals the
  * scalar extractor by construction (spec-pinned). */
case class MainContentBlocksExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text", StringType,
          nullable = false),
        org.apache.spark.sql.types.StructField("words",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("anchor_words",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("chrome",
          org.apache.spark.sql.types.BooleanType, nullable = false),
        org.apache.spark.sql.types.StructField("is_content",
          org.apache.spark.sql.types.BooleanType, nullable = false))),
      containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"main_content_blocks expects STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MainContentImpl.blocks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MainContentImpl.blocks($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "main_content_blocks"
}

object MainContentBlocksExpr {
  def apply(html: Column): Column =
    GraftInternals.column(
      MainContentBlocksExpr(GraftInternals.expression(html)))
}

object MainContentImpl {

  /** Containers whose text is boilerplate by declaration. `head` is
    * handled separately (it implicitly closes at `<body>` — forgiving
    * parse for pages that omit `</head>`). */
  private val chromeTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("nav", "aside", "header", "footer", "form", "title").foreach(s.add)
    s
  }

  /** One segmented text block: normalized text (single-spaced, trimmed —
    * the [[MarkupExtractImpl]] in-block convention), word counts, and
    * whether any of it sat inside a chrome container. */
  private[functions] final class Block(val text: String, val words: Int,
    val anchorWords: Int, val chrome: Boolean) {
    def linkDensity: Double =
      if (words == 0) 0.0 else anchorWords.toDouble / words
  }

  /** The WSDM 2010 shallow decision rules (the paper's "NumWords/
    * LinkDensity" classifier, Algorithm 2 thresholds) over the
    * (prev, curr, next) block triple. `prev`/`next` word counts are 0 at
    * the page edges. */
  private def isContentByDensity(prevWords: Int, prevLd: Double,
      currWords: Int, currLd: Double, nextWords: Int): Boolean = {
    if (currLd > 0.333333) false
    else if (prevLd <= 0.555556) {
      if (currWords > 16) true
      else if (nextWords > 15) true
      else prevWords > 4
    } else {
      if (currWords > 40) true
      else nextWords > 17
    }
  }

  /** Per-ORIGINAL-index content verdicts: chrome blocks are false by
    * declaration; non-chrome blocks get the densitometric verdict with
    * (prev, next) context taken over the chrome-REMOVED flow (see the
    * landmark-pruning note in [[MainContentExpr]]). */
  private[functions] def verdicts(
      blocks: java.util.ArrayList[Block]): Array[Boolean] = {
    val flowIdx = new java.util.ArrayList[Integer](blocks.size())
    var k = 0
    while (k < blocks.size()) {
      if (!blocks.get(k).chrome) flowIdx.add(k)
      k += 1
    }
    val out = new Array[Boolean](blocks.size())
    val m = flowIdx.size()
    k = 0
    while (k < m) {
      val b = blocks.get(flowIdx.get(k))
      val pw = if (k > 0) blocks.get(flowIdx.get(k - 1)).words else 0
      val pld =
        if (k > 0) blocks.get(flowIdx.get(k - 1)).linkDensity else 0.0
      val nw = if (k + 1 < m) blocks.get(flowIdx.get(k + 1)).words else 0
      out(flowIdx.get(k)) =
        isContentByDensity(pw, pld, b.words, b.linkDensity, nw)
      k += 1
    }
    out
  }

  def extract(input: UTF8String): UTF8String = {
    val blocks = segment(input.toString)
    val keep = verdicts(blocks)
    val out = new java.lang.StringBuilder(64)
    var k = 0
    while (k < blocks.size()) {
      if (keep(k)) {
        if (out.length() > 0) out.append('\n')
        out.append(blocks.get(k).text)
      }
      k += 1
    }
    UTF8String.fromString(out.toString)
  }

  /** One row per segmented block, in page order:
    * `(text, words, anchor_words, chrome, is_content)` — the shallow
    * features of the WSDM 2010 classifier AS DATA, for training a
    * custom content model or auditing the built-in verdicts.
    * [[MainContentBlocksExpr]]'s kernel. */
  def blocks(input: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bs = segment(input.toString)
    val keep = verdicts(bs)
    val rows = new Array[Any](bs.size())
    var k = 0
    while (k < bs.size()) {
      val b = bs.get(k)
      rows(k) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(b.text), b.words, b.anchorWords,
        b.chrome, keep(k))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  private[functions] def segment(
      s: String): java.util.ArrayList[Block] = {
    val n = s.length
    val blocks = new java.util.ArrayList[Block]()

    // current block accumulator
    val cur = new java.lang.StringBuilder(64)
    var curWords = 0
    var curAnchorWords = 0
    var curChrome = false
    var pendingSpace = false

    var chromeDepth = 0
    var headOpen = false
    var anchorDepth = 0

    def flush(): Unit = {
      if (cur.length() > 0) {
        blocks.add(new Block(cur.toString, curWords, curAnchorWords, curChrome))
        cur.setLength(0)
        curWords = 0
        curAnchorWords = 0
      }
      curChrome = false
      pendingSpace = false
    }

    def emitChar(c: Char): Unit = {
      if (cur.length() == 0 || pendingSpace) {
        // a word starts here — classify it by the anchor state at its start
        if (cur.length() > 0) cur.append(' ')
        curWords += 1
        if (anchorDepth > 0) curAnchorWords += 1
      }
      pendingSpace = false
      if (headOpen || chromeDepth > 0) curChrome = true
      cur.append(c)
    }

    // index just past the matching </name...> close tag of a raw-text
    // element (script/style), or n — the MarkupExtractImpl convention
    def rawTextEnd(name: String, from: Int): Int = {
      var j = from
      while (j < n) {
        if (s.charAt(j) == '<' && j + 1 < n && s.charAt(j + 1) == '/') {
          var k = j + 2
          var m = 0
          while (k < n && m < name.length &&
            Character.toLowerCase(s.charAt(k)) == name.charAt(m)) { k += 1; m += 1 }
          if (m == name.length &&
            (k >= n || !MarkupExtractImpl.isAsciiLetter(s.charAt(k)))) {
            while (k < n && s.charAt(k) != '>') k += 1
            return if (k < n) k + 1 else n
          }
        }
        j += 1
      }
      n
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n &&
        (MarkupExtractImpl.isAsciiLetter(s.charAt(i + 1)) ||
          s.charAt(i + 1) == '/' || s.charAt(i + 1) == '!')) {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          var j = i + 1
          val closing = s.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (MarkupExtractImpl.isAsciiLetter(s.charAt(j)) ||
            (s.charAt(j) >= '0' && s.charAt(j) <= '9'))) j += 1
          val name = s.substring(nameStart, j).toLowerCase
          while (j < n && s.charAt(j) != '>') j += 1
          val tagEnd = if (j < n) j + 1 else n
          if (!closing && (name == "script" || name == "style")) {
            i = rawTextEnd(name, tagEnd)
          } else i = tagEnd
          // block boundary BEFORE depth updates: a chrome container's
          // own text flushes while its flag is still raised
          if (name.nonEmpty && MarkupExtractImpl.blockTags.contains(name))
            flush()
          name match {
            case "head" =>
              if (closing) headOpen = false else headOpen = true
            case "body" => headOpen = false // implicit </head>
            case "a" =>
              if (closing) { if (anchorDepth > 0) anchorDepth -= 1 }
              else anchorDepth += 1
            case t if chromeTags.contains(t) =>
              if (closing) { if (chromeDepth > 0) chromeDepth -= 1 }
              else chromeDepth += 1
            case _ => ()
          }
        }
      } else if (c == '&') {
        val packed = MarkupExtractImpl.entityAt(s, i)
        if (packed < 0) { emitChar('&'); i += 1 }
        else {
          val decoded = packed.toInt
          val next = (packed >>> 32).toInt
          if (Character.isSupplementaryCodePoint(decoded)) {
            emitChar(Character.highSurrogate(decoded))
            cur.append(Character.lowSurrogate(decoded))
          } else if (MarkupExtractImpl.isWsChar(decoded.toChar)) {
            pendingSpace = true
          } else emitChar(decoded.toChar)
          i = next
        }
      } else if (MarkupExtractImpl.isWsChar(c)) {
        pendingSpace = true
        i += 1
      } else {
        emitChar(c)
        i += 1
      }
    }
    flush()
    blocks
  }
}
