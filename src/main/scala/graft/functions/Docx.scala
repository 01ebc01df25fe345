package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DOCX (OOXML WordprocessingML) → text extraction: after HTML
  * ([[MarkupExtractExpr]]) and PDF ([[PdfExtractExpr]]), the next
  * container a WARC corpus actually carries. Same from-scratch-codec
  * discipline: one bounded-memory kernel per row, executor-side, no
  * external library (java.util.zip's raw-deflate Inflater is the same
  * JDK primitive the PDF path already stands on).
  *
  * A .docx is a PKZIP archive whose text lives in
  * `word/document.xml`. Coverage, sized to machine-written files:
  *
  *  - the archive is walked from the END OF CENTRAL DIRECTORY record
  *    (the only authoritative index — streaming writers emit local
  *    headers with zeroed sizes + data descriptors, so sizes are taken
  *    from the central directory, and the local header is consulted
  *    only for its own name/extra lengths to locate the data start);
  *  - entry methods 0 (stored) and 8 (raw deflate) decode; anything
  *    else (zip64, encrypted) yields the empty string rather than a
  *    misparse, as does a missing `word/document.xml`;
  *  - WordprocessingML text rules: `<w:t>` character content emits
  *    (XML entities `&amp; &lt; &gt; &quot; &apos;` and numeric
  *    `&#N;`/`&#xN;` decoded); `<w:tab/>` emits a tab; `<w:br/>` and
  *    `<w:cr/>` emit a newline; paragraph ends (`</w:p>`) join with
  *    ONE newline between paragraphs (no trailing newline); every
  *    other element (runs, properties, tables, bookmarks) is
  *    structure, not text. Tag scanning is quote-aware, so a `>`
  *    inside an attribute value cannot truncate a tag.
  *
  * The `t73_docx_extract` gate round-trips the documents corpus
  * through [[DocxBuildExpr]] (deflated document.xml on half the rows,
  * stored on the other half) so the DuckDB oracle is the identity —
  * a reader that mislocates the central directory, fails to inflate,
  * or drops a run diverges immediately. Edge grammar (entities,
  * tabs/breaks, multi-paragraph joins, quoted `>`) is pinned in
  * DocxSpec. */
case class DocxExtractExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"docx_extract expects BINARY input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    DocxImpl.extract(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DocxImpl.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "docx_extract"
}

object DocxExtractExpr {
  def apply(bytes: Column): Column =
    GraftInternals.column(DocxExtractExpr(GraftInternals.expression(bytes)))
}

/** Structurally valid minimal .docx from a text column — the gate's
  * fixture builder ([[graft.functions.PdfBuildExpr]] convention): the
  * [Content_Types].xml and _rels plumbing real readers require, the
  * text split across multiple `<w:r><w:t xml:space="preserve">` runs
  * (so a reader that concatenates runs wrong diverges), XML-escaped.
  * `deflated` selects method 8 for document.xml (the other entries
  * store — both methods in every file). */
case class DocxBuildExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, BooleanType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"docx_build expects (STRING, BOOLEAN), got $l, $r")
    }

  override def nullSafeEval(text: Any, deflated: Any): Any =
    DocxImpl.build(text.asInstanceOf[UTF8String],
      deflated.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, d) => s"graft.functions.DocxImpl.build($t, $d)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "docx_build"
}

object DocxBuildExpr {
  def apply(text: Column, deflated: Column): Column =
    GraftInternals.column(DocxBuildExpr(
      GraftInternals.expression(text), GraftInternals.expression(deflated)))
}

object DocxImpl {

  // ---------------------------------------------------------- extract

  def extract(bytes: Array[Byte]): UTF8String = {
    val doc = zipEntry(bytes, "word/document.xml")
    if (doc == null) UTF8String.EMPTY_UTF8
    else UTF8String.fromString(
      wordText(new String(doc, java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** Decompressed bytes of the named entry, or null: EOCD → central
    * directory (authoritative name/method/sizes/offset) → local header
    * (its own name/extra lengths only) → stored copy or raw inflate. */
  private def zipEntry(b: Array[Byte], name: String): Array[Byte] = {
    val n = b.length
    // EOCD: scan back over the (comment-bearing) tail for PK\5\6
    var e = n - 22
    val floor = math.max(0, n - 22 - 0xFFFF)
    while (e >= floor && !(b(e) == 0x50 && b(e + 1) == 0x4b &&
      b(e + 2) == 0x05 && b(e + 3) == 0x06)) e -= 1
    if (e < floor) return null
    val count = u16(b, e + 10)
    var off = u32(b, e + 16).toInt // central directory start
    var i = 0
    while (i < count && off + 46 <= n) {
      if (u32(b, off) != 0x02014b50L) return null
      val method = u16(b, off + 10)
      val csize = u32(b, off + 20).toInt
      val usize = u32(b, off + 24).toInt
      val nameLen = u16(b, off + 28)
      val extraLen = u16(b, off + 30)
      val commentLen = u16(b, off + 32)
      val local = u32(b, off + 42).toInt
      val entryName =
        new String(b, off + 46, nameLen,
          java.nio.charset.StandardCharsets.UTF_8)
      if (entryName == name) {
        if (local + 30 > n || u32(b, local) != 0x04034b50L) return null
        val dataStart = local + 30 + u16(b, local + 26) + u16(b, local + 28)
        if (dataStart + csize > n || csize < 0 || usize < 0) return null
        method match {
          case 0 => return java.util.Arrays.copyOfRange(b, dataStart,
            dataStart + csize)
          case 8 =>
            val inf = new java.util.zip.Inflater(true) // raw deflate
            try {
              inf.setInput(b, dataStart, csize)
              val out = new Array[Byte](usize)
              var got = 0
              while (got < usize && !inf.finished()) {
                val k = inf.inflate(out, got, usize - got)
                if (k == 0 && inf.needsInput()) return null // truncated
                got += k
              }
              return if (got == usize) out else null
            } catch {
              case _: java.util.zip.DataFormatException => return null
            } finally inf.end()
          case _ => return null
        }
      }
      off += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    null
  }

  /** WordprocessingML → text per the class contract. Quote-aware tag
    * scan; entities decode inside `<w:t>` character data only. */
  private[graft] def wordText(xml: String): String = {
    val sb = new java.lang.StringBuilder()
    var inText = false
    var pendingPara = false // emit ONE \n before the next text, if any
    def emit(c: Char): Unit = {
      if (pendingPara && sb.length > 0) sb.append('\n')
      pendingPara = false
      sb.append(c)
    }
    var i = 0
    val n = xml.length
    while (i < n) {
      val c = xml.charAt(i)
      if (c == '<') {
        val start = i + 1
        var j = start
        var quote = 0.toChar
        while (j < n && (quote != 0 || xml.charAt(j) != '>')) {
          val cj = xml.charAt(j)
          if (quote != 0) { if (cj == quote) quote = 0 }
          else if (cj == '"' || cj == '\'') quote = cj
          j += 1
        }
        val tag = xml.substring(start, math.min(j, n))
        def is(name: String): Boolean =
          tag == name || (tag.startsWith(name) && {
            val d = tag.charAt(name.length)
            d == ' ' || d == '/' || d == '\t' || d == '\n' || d == '\r'
          })
        if (is("w:t")) inText = !tag.endsWith("/")
        else if (is("/w:t")) inText = false
        else if (is("w:tab")) emit('\t')
        else if (is("w:br") || is("w:cr")) emit('\n')
        else if (is("/w:p")) { pendingPara = true; inText = false }
        i = j + 1
      } else if (inText) {
        if (c == '&') {
          val semi = xml.indexOf(';', i + 1)
          if (semi > i && semi - i <= 10) {
            val ent = xml.substring(i + 1, semi)
            val decoded: Int = ent match {
              case "amp" => '&'
              case "lt" => '<'
              case "gt" => '>'
              case "quot" => '"'
              case "apos" => '\''
              case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
                try Integer.parseInt(ent.substring(2), 16) catch {
                  case _: NumberFormatException => -1 }
              case _ if ent.startsWith("#") =>
                try Integer.parseInt(ent.substring(1)) catch {
                  case _: NumberFormatException => -1 }
              case _ => -1
            }
            if (decoded >= 0) {
              if (pendingPara && sb.length > 0) sb.append('\n')
              pendingPara = false
              sb.appendCodePoint(decoded)
              i = semi + 1
            } else { emit(c); i += 1 }
          } else { emit(c); i += 1 }
        } else { emit(c); i += 1 }
      } else i += 1
    }
    sb.toString
  }

  // ------------------------------------------------------------ build

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>"""
      .stripMargin
  private val Rels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/></Relationships>"""
      .stripMargin

  def build(text: UTF8String, deflated: Boolean): Array[Byte] = {
    val doc = documentXml(text.toString)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    writeZip(Seq(
      ("[Content_Types].xml", ContentTypes.getBytes(utf8), false),
      ("_rels/.rels", Rels.getBytes(utf8), false),
      ("word/document.xml", doc.getBytes(utf8), deflated)))
  }

  /** One paragraph, words alternating across runs (~3 words per run,
    * the separating space kept INSIDE a run under xml:space=preserve —
    * run concatenation must be exact, not re-spaced). */
  private[graft] def documentXml(text: String): String = {
    val sb = new java.lang.StringBuilder()
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>")
    sb.append("<w:document xmlns:w=\"http://schemas.openxmlformats.org/")
    sb.append("wordprocessingml/2006/main\"><w:body><w:p><w:pPr></w:pPr>")
    val chunk = 24 // characters per run, split mid-word on purpose
    var i = 0
    while (i < text.length || i == 0) {
      val end = math.min(text.length, i + chunk)
      sb.append("<w:r><w:rPr></w:rPr><w:t xml:space=\"preserve\">")
      var j = i
      while (j < end) {
        text.charAt(j) match {
          case '&' => sb.append("&amp;")
          case '<' => sb.append("&lt;")
          case '>' => sb.append("&gt;")
          case c => sb.append(c)
        }
        j += 1
      }
      sb.append("</w:t></w:r>")
      i = if (end == i) end + 1 else end // empty text: one empty run
    }
    sb.append("</w:p></w:body></w:document>")
    sb.toString
  }

  /** Minimal correct PKZIP: local headers, central directory, EOCD;
    * method 0 or 8 (raw Deflater at a fixed level, like
    * [[CompressibilityImpl]]). */
  private def writeZip(
      entries: Seq[(String, Array[Byte], Boolean)]): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val out = new java.io.ByteArrayOutputStream()
    val centrals = Seq.newBuilder[Array[Byte]]
    for ((name, data, deflate) <- entries) {
      val nameB = name.getBytes(utf8)
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      val packed =
        if (!deflate) data
        else {
          val d = new java.util.zip.Deflater(6, true)
          d.setInput(data); d.finish()
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
          d.end()
          buf.toByteArray
        }
      val method = if (deflate) 8 else 0
      val offset = out.size()
      val lh = new java.io.ByteArrayOutputStream()
      w32(lh, 0x04034b50L); w16(lh, 20); w16(lh, 0); w16(lh, method)
      w16(lh, 0); w16(lh, 0x21) // fixed mod time/date: deterministic
      w32(lh, crc.getValue); w32(lh, packed.length); w32(lh, data.length)
      w16(lh, nameB.length); w16(lh, 0)
      lh.write(nameB); lh.writeTo(out); out.write(packed)
      val ce = new java.io.ByteArrayOutputStream()
      w32(ce, 0x02014b50L); w16(ce, 20); w16(ce, 20); w16(ce, 0)
      w16(ce, method); w16(ce, 0); w16(ce, 0x21)
      w32(ce, crc.getValue); w32(ce, packed.length); w32(ce, data.length)
      w16(ce, nameB.length); w16(ce, 0); w16(ce, 0)
      w16(ce, 0); w16(ce, 0); w32(ce, 0); w32(ce, offset)
      ce.write(nameB)
      centrals += ce.toByteArray
    }
    val cdStart = out.size()
    val cds = centrals.result()
    cds.foreach(out.write)
    val cdSize = out.size() - cdStart
    w32(out, 0x06054b50L); w16(out, 0); w16(out, 0)
    w16(out, cds.length); w16(out, cds.length)
    w32(out, cdSize); w32(out, cdStart); w16(out, 0)
    out.toByteArray
  }

  private def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >> 8) & 0xFF)
  }
  private def w32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xFF).toInt); o.write(((v >> 8) & 0xFF).toInt)
    o.write(((v >> 16) & 0xFF).toInt); o.write(((v >> 24) & 0xFF).toInt)
  }
  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
}
