package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PDF → text extraction: the crawl front door for the second-largest
  * crawl corpus format after HTML (whose extractor is
  * [[MarkupExtractExpr]]). Same from-scratch-codec discipline as the
  * [[graft.operators.Multimodal]] JPEG/PNG/WAV/MP4 decoders and the
  * Xlsx reader: one bounded-memory kernel per row, executor-side, no
  * external library.
  *
  * Coverage (the offline-tractable core of ISO 32000):
  *
  *  - object streams are located by the `stream`…`endstream` envelope,
  *    sized by a direct `/Length` when present (a compressed body may
  *    contain the bytes `endstream` by chance; the declared length is
  *    authoritative) with a scan fallback;
  *  - `/FlateDecode` bodies inflate (java.util.zip — zlib is part of the
  *    PDF spec); unfiltered bodies parse as-is; any other filter
  *    (`/DCTDecode` images, …) is skipped, never misparsed;
  *  - PDF 1.5+ container streams — `/Type /ObjStm` (compressed object
  *    streams) and `/Type /XRef` (cross-reference streams) — are
  *    recognized and EXCLUDED from text parsing: they hold serialized
  *    objects / binary xref tables, never content streams (ISO 32000
  *    §7.5.7 forbids stream objects inside an ObjStm, so every content
  *    stream stays top-level where the scan finds it), and their
  *    decompressed bytes can contain `BT` by coincidence — parsing
  *    them as content would emit garbage string operands as text;
  *  - within `BT`…`ET` text blocks, the text-showing operators emit:
  *    `(s) Tj`, `[(s1) kern (s2)…] TJ` (kerns ignored), and the
  *    line-advancing `'` and `"` forms; line-motion operators
  *    (`Td`/`TD`/`T*`) emit one newline (collapsed, never leading);
  *  - literal strings decode the full escape grammar (\n \r \t \b \f
  *    \( \) \\, 1–3 digit octal, line continuations, balanced nested
  *    parens, EOL normalization to \n) and hex strings `<…>` decode
  *    pairwise; string BYTES pass through untouched, so UTF-8 text
  *    round-trips exactly (no font-encoding table is consulted — the
  *    right trade for machine-written PDFs, which dominate crawls;
  *    custom-encoded scans need OCR anyway).
  *
  * The `t50_pdf_extract` gate round-trips the documents corpus through
  * [[PdfBuildExpr]] (Flate-compressed on half the rows) so the DuckDB
  * oracle is the identity — a parser that fails to inflate, mis-lexes
  * an escape, or loses a show-op diverges immediately. Edge grammar is
  * pinned in PdfSpec. */
case class PdfExtractExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pdf_extract expects BINARY input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PdfImpl.extract(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PdfImpl.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pdf_extract"
}

object PdfExtractExpr {
  def apply(bytes: Column): Column =
    GraftInternals.column(PdfExtractExpr(GraftInternals.expression(bytes)))
}

/** Minimal deterministic one-page PDF writer — the fixture side of the
  * `t50` round-trip gate (the Xlsx/WAV/MP4 builder precedent: gating a
  * from-scratch decoder needs a from-scratch encoder the oracle can
  * trust). Emits a structurally valid PDF 1.4 (catalog → pages → page →
  * contents + Helvetica font, correct xref offsets); the text lands as
  * two `Tj` show-ops inside one `BT` block (split mid-text, exercising
  * show-op concatenation), Flate-compressed when `compress` is true. */
case class PdfBuildExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, BooleanType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pdf_build expects (STRING, BOOLEAN), got $l, $r")
    }

  override def nullSafeEval(text: Any, compress: Any): Any =
    PdfImpl.build(text.asInstanceOf[UTF8String],
      compress.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) => s"graft.functions.PdfImpl.build($t, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "pdf_build"
}

object PdfBuildExpr {
  def apply(text: Column, compress: Column): Column =
    GraftInternals.column(PdfBuildExpr(
      GraftInternals.expression(text), GraftInternals.expression(compress)))
}

/** Static kernels — called from both the interpreted eval and generated
  * code. All parsing is byte-level ASCII (the PDF syntax layer is ASCII
  * by spec; string CONTENT bytes pass through opaquely). */
object PdfImpl {

  // ------------------------------------------------------------ extract

  def extract(pdf: Array[Byte]): UTF8String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < pdf.length) {
      val p = indexOf(pdf, "stream", i)
      if (p < 0) { i = pdf.length }
      else if (p >= 3 && pdf(p - 3) == 'e' && pdf(p - 2) == 'n' &&
          pdf(p - 1) == 'd') {
        i = p + 6 // the tail of an "endstream" keyword, not a stream start
      } else {
        // the governing dictionary: between the nearest preceding "obj"
        // keyword (or buffer start) and the stream keyword
        val objAt = lastIndexOf(pdf, "obj", p)
        val dict = ascii(pdf, if (objAt < 0) 0 else objAt, p)
        var ds = p + 6
        if (ds < pdf.length && pdf(ds) == '\r') ds += 1
        if (ds < pdf.length && pdf(ds) == '\n') ds += 1
        val len = directLength(dict)
        val de =
          // Long math: a wrapped /Length near Int.MaxValue would
          // overflow an Int compare and throw in the range copy
          if (len >= 0 && ds + len.toLong <= pdf.length) ds + len
          else {
            val e = indexOf(pdf, "endstream", ds)
            if (e < 0) pdf.length else e
          }
        val hasFilter = dict.contains("/Filter")
        val flate = dict.contains("/FlateDecode")
        // 1.5+ container streams are object/xref holders, not content —
        // see the class doc; a BT inside their (often binary) bytes is
        // coincidence, not text. Image XObjects likewise: inflated pixel
        // samples can contain a coincidental "BT" (two bytes over
        // arbitrary sample data), which would emit garbage text
        val container = dict.contains("/ObjStm") || dict.contains("/XRef") ||
          isImageDict(dict)
        if ((!hasFilter || flate) && !container) {
          val body =
            if (!flate) java.util.Arrays.copyOfRange(pdf, ds, de)
            else inflate(pdf, ds, de - ds)
          if (body != null && indexOf(body, "BT", 0) >= 0)
            parseContent(body, out)
        }
        i = de
      }
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  /** A direct (non-reference) /Length value, or -1. */
  private def directLength(dict: String): Int = directInt(dict, "/Length")

  /** A direct (non-reference) integer value for `key`, or -1 — the
    * /Length parser generalized for the image dictionary keys
    * (/Width, /Height, /BitsPerComponent). */
  private def directInt(dict: String, key: String): Int = {
    val at = dict.indexOf(key)
    if (at < 0) return -1
    var j = at + key.length
    while (j < dict.length && (dict.charAt(j) == ' ' || dict.charAt(j) == '\n' ||
      dict.charAt(j) == '\r' || dict.charAt(j) == '\t')) j += 1
    var v = 0
    var any = false
    while (j < dict.length && dict.charAt(j) >= '0' && dict.charAt(j) <= '9') {
      v = v * 10 + (dict.charAt(j) - '0'); any = true; j += 1
    }
    if (!any) return -1
    // "N 0 R" is an indirect reference, not a direct length
    var k = j
    while (k < dict.length && dict.charAt(k) == ' ') k += 1
    val indirect = k < dict.length && dict.charAt(k) >= '0' &&
      dict.charAt(k) <= '9'
    if (indirect) -1 else v
  }

  private def inflate(b: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b, off, len)
      val out = new java.io.ByteArrayOutputStream(math.max(64, len * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return out.toByteArray
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => null // skip, never throw
    } finally inf.end()
  }

  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0 || c == 12

  private def isDelim(c: Byte): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** Text operators over one decoded content stream. */
  private def parseContent(b: Array[Byte],
      out: java.io.ByteArrayOutputStream): Unit = {
    val strs = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4)
    var inText = false
    var lastNl = out.size() == 0 // suppress leading and doubled newlines
    def newline(): Unit = if (!lastNl) { out.write('\n'); lastNl = true }
    def emitAll(): Unit = {
      strs.foreach { s =>
        out.write(s)
        if (s.nonEmpty) lastNl = s(s.length - 1) == '\n'
      }
      strs.clear()
    }
    var j = 0
    while (j < b.length) {
      val c = b(j)
      if (c == '(') j = parseLiteral(b, j, strs)
      else if (c == '<' && j + 1 < b.length && b(j + 1) != '<')
        j = parseHex(b, j, strs)
      else if (c == '<' || c == '>') j += 2 // dict delimiters << >>
      else if (c == '[' || c == ']') j += 1
      else if (c == '\'' || c == '"') {
        if (inText) { newline(); emitAll() } else strs.clear()
        j += 1
      } else if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          c == '*') {
        var k = j
        while (k < b.length && !isWs(b(k)) && !isDelim(b(k)) &&
          b(k) != '\'' && b(k) != '"') k += 1
        val op = new String(b, j, k - j, java.nio.charset.StandardCharsets.US_ASCII)
        op match {
          case "BT" => inText = true; strs.clear()
          case "ET" => inText = false; strs.clear()
          case "Tj" | "TJ" => if (inText) emitAll() else strs.clear()
          case "Td" | "TD" | "T*" =>
            if (inText) newline()
            strs.clear()
          case _ => strs.clear() // any other operator consumes its operands
        }
        j = k
      } else j += 1
    }
  }

  /** PDF literal string: balanced parens, the full escape set, EOL
    * normalization. Appends the decoded bytes to `strs`; returns the
    * index just past the closing paren. */
  private def parseLiteral(b: Array[Byte], start: Int,
      strs: scala.collection.mutable.ArrayBuffer[Array[Byte]]): Int = {
    val buf = new java.io.ByteArrayOutputStream()
    var depth = 1
    var j = start + 1
    while (j < b.length && depth > 0) {
      val c = b(j)
      if (c == '\\' && j + 1 < b.length) {
        val e = b(j + 1)
        if (e == 'n') { buf.write('\n'); j += 2 }
        else if (e == 'r') { buf.write('\r'); j += 2 }
        else if (e == 't') { buf.write('\t'); j += 2 }
        else if (e == 'b') { buf.write(8); j += 2 }
        else if (e == 'f') { buf.write(12); j += 2 }
        else if (e == '(' || e == ')' || e == '\\') { buf.write(e); j += 2 }
        else if (e == '\r') // line continuation: swallow \r or \r\n
          j += (if (j + 2 < b.length && b(j + 2) == '\n') 3 else 2)
        else if (e == '\n') j += 2
        else if (e >= '0' && e <= '7') {
          var v = 0
          var k = j + 1
          while (k < b.length && k < j + 4 && b(k) >= '0' && b(k) <= '7') {
            v = v * 8 + (b(k) - '0'); k += 1
          }
          buf.write(v & 0xFF)
          j = k
        } else { buf.write(e); j += 2 } // unknown escape: literal
      } else if (c == '(') { depth += 1; buf.write(c); j += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) buf.write(c)
        j += 1
      } else if (c == '\r') { // EOL inside a string reads as \n (spec)
        buf.write('\n')
        j += (if (j + 1 < b.length && b(j + 1) == '\n') 2 else 1)
      } else { buf.write(c); j += 1 }
    }
    strs += buf.toByteArray
    j
  }

  /** Hex string <48656C…>: pairwise hex, odd final digit pads 0. */
  private def parseHex(b: Array[Byte], start: Int,
      strs: scala.collection.mutable.ArrayBuffer[Array[Byte]]): Int = {
    val buf = new java.io.ByteArrayOutputStream()
    var j = start + 1
    var hi = -1
    while (j < b.length && b(j) != '>') {
      val d = Character.digit(b(j).toChar, 16)
      if (d >= 0) {
        if (hi < 0) hi = d
        else { buf.write((hi << 4) | d); hi = -1 }
      }
      j += 1
    }
    if (hi >= 0) buf.write(hi << 4)
    strs += buf.toByteArray
    if (j < b.length) j + 1 else j
  }

  private def indexOf(h: Array[Byte], needle: String, from: Int): Int = {
    val nb = needle.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var i = math.max(from, 0)
    val last = h.length - nb.length
    while (i <= last) {
      var k = 0
      while (k < nb.length && h(i + k) == nb(k)) k += 1
      if (k == nb.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(h: Array[Byte], needle: String, before: Int): Int = {
    val nb = needle.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var i = math.min(before, h.length) - nb.length
    while (i >= 0) {
      var k = 0
      while (k < nb.length && h(i + k) == nb(k)) k += 1
      if (k == nb.length) return i
      i -= 1
    }
    -1
  }

  private def ascii(b: Array[Byte], from: Int, to: Int): String =
    new String(b, from, to - from, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** True iff the dictionary declares `/Subtype /Image` as an actual
    * key/value pair with the value name TERMINATED (next char not a
    * name char) — `/Subtype /ImageMask` can't occur (ImageMask is a
    * boolean entry, not a subtype) but the terminator guards it anyway,
    * and a Form XObject with `/ProcSet [/PDF /ImageB]` or an
    * `/ImageMask true` entry no longer false-positives the way the old
    * two-independent-substring test did. Mirrors how [[directInt]]
    * anchors on the key. */
  private def isImageDict(dict: String): Boolean =
    imageSubtypeRe.pattern.matcher(dict).find()

  private val imageSubtypeRe =
    "/Subtype\\s*/Image(?![A-Za-z0-9])".r

  // -------------------------------------------------------------- images

  /** One embedded image XObject: dimensions and sample depth from the
    * object dictionary, `channels` from the colorspace name (DeviceRGB=3,
    * DeviceGray=1, 0 when unrecognized), `filter` ∈ {"dct", "flate",
    * "raw", "other"}, and `data` the image payload — RAW DECODED samples
    * for flate/raw (FlateDecode already inflated), the UNtouched JPEG
    * byte stream for dct (DCTDecode's payload IS a JPEG — decode is the
    * image layer's business, [[graft.operators.Multimodal]]'s decoder),
    * null for unsupported filter chains. */
  final case class PdfImage(width: Int, height: Int, channels: Int,
      bitsPerComponent: Int, filter: String, data: Array[Byte])

  /** Every image XObject of the document, in byte order — the same
    * stream walk as [[extract]], keeping only `/Subtype /Image` objects.
    * Classification anchors on the actual key/value PAIR
    * (`/Subtype /Image` with the name terminated — see [[isImageDict]]),
    * not two independent substring hits: a Form XObject whose dict
    * merely carries `/ProcSet [/PDF /ImageB]` or an `/ImageMask` entry
    * is NOT an image stream, and treating it as one both emits a bogus
    * image row here and silently skips its text-bearing content in
    * [[extract]]. Malformed entries degrade to what the dictionary
    * yields (never throws): the caller tags undecodable rows, the
    * [[extract]] contract. */
  def images(pdf: Array[Byte]): Vector[PdfImage] = {
    val out = Vector.newBuilder[PdfImage]
    var i = 0
    while (i < pdf.length) {
      val p = indexOf(pdf, "stream", i)
      if (p < 0) { i = pdf.length }
      else if (p >= 3 && pdf(p - 3) == 'e' && pdf(p - 2) == 'n' &&
          pdf(p - 1) == 'd') {
        i = p + 6
      } else {
        val objAt = lastIndexOf(pdf, "obj", p)
        val dict = ascii(pdf, if (objAt < 0) 0 else objAt, p)
        var ds = p + 6
        if (ds < pdf.length && pdf(ds) == '\r') ds += 1
        if (ds < pdf.length && pdf(ds) == '\n') ds += 1
        val len = directLength(dict)
        val de =
          // Long math: a wrapped /Length near Int.MaxValue would
          // overflow an Int compare and throw in the range copy
          if (len >= 0 && ds + len.toLong <= pdf.length) ds + len
          else {
            val e = indexOf(pdf, "endstream", ds)
            if (e < 0) pdf.length else e
          }
        if (isImageDict(dict)) {
          val w = directInt(dict, "/Width")
          val h = directInt(dict, "/Height")
          val bpc = directInt(dict, "/BitsPerComponent")
          val channels =
            if (dict.contains("/DeviceRGB")) 3
            else if (dict.contains("/DeviceGray")) 1
            else 0
          val hasFilter = dict.contains("/Filter")
          val (filter, data) =
            if (dict.contains("/DCTDecode"))
              ("dct", java.util.Arrays.copyOfRange(pdf, ds, de))
            else if (dict.contains("/FlateDecode"))
              ("flate", inflate(pdf, ds, de - ds))
            else if (!hasFilter)
              ("raw", java.util.Arrays.copyOfRange(pdf, ds, de))
            else ("other", null)
          out += PdfImage(w, h, channels, bpc, filter, data)
        }
        i = de
      }
    }
    out.result()
  }

  // -------------------------------------------------------------- build

  /** An image to embed: raw interleaved 8-bit samples for
    * `dct = false` (the builder deflates them into a FlateDecode
    * XObject), a complete JPEG byte stream for `dct = true`
    * (embedded verbatim as DCTDecode — the PDF-native JPEG carry). */
  final case class ImageSpec(width: Int, height: Int, channels: Int,
      data: Array[Byte], dct: Boolean)

  def build(text: UTF8String, compress: Boolean): Array[Byte] =
    build(text, compress, Seq.empty)

  def build(text: UTF8String, compress: Boolean,
      images: Seq[ImageSpec]): Array[Byte] = {
    val tb = text.getBytes
    val half = tb.length / 2
    val content = new java.io.ByteArrayOutputStream()
    content.write(ascii("BT /F1 12 Tf 72 720 Td "))
    content.write('(')
    writeEscaped(content, tb, 0, half)
    content.write(ascii(") Tj ("))
    writeEscaped(content, tb, half, tb.length)
    content.write(ascii(") Tj ET"))
    val raw = content.toByteArray
    val body =
      if (!compress) raw
      else {
        val d = new java.util.zip.Deflater()
        try {
          d.setInput(raw); d.finish()
          val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
          val buf = new Array[Byte](8192)
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          out.toByteArray
        } finally d.end()
      }
    val filter = if (compress) " /Filter /FlateDecode" else ""
    val xobjRefs =
      if (images.isEmpty) ""
      else " /XObject << " + images.indices
        .map(ix => s"/Im$ix ${6 + ix} 0 R").mkString(" ") + " >>"
    val imageObjs = images.zipWithIndex.map { case (im, ix) =>
      val (filterEntry, payload) =
        if (im.dct) (" /Filter /DCTDecode", im.data)
        else {
          val d = new java.util.zip.Deflater()
          try {
            d.setInput(im.data); d.finish()
            val o = new java.io.ByteArrayOutputStream(im.data.length / 2 + 32)
            val buf = new Array[Byte](8192)
            while (!d.finished()) o.write(buf, 0, d.deflate(buf))
            (" /Filter /FlateDecode", o.toByteArray)
          } finally d.end()
        }
      val cs = if (im.channels == 1) "/DeviceGray" else "/DeviceRGB"
      concat(
        ascii(s"${6 + ix} 0 obj << /Type /XObject /Subtype /Image " +
          s"/Width ${im.width} /Height ${im.height} /ColorSpace $cs " +
          s"/BitsPerComponent 8$filterEntry /Length ${payload.length} " +
          ">> stream\n"),
        payload, ascii("\nendstream endobj\n"))
    }
    val objs = Seq[Array[Byte]](
      ascii("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"),
      ascii("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"),
      ascii("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 5 0 R >>$xobjRefs >> " +
        "/Contents 4 0 R >> endobj\n"),
      concat(ascii(s"4 0 obj << /Length ${body.length}$filter >> stream\n"),
        body, ascii("\nendstream endobj\n")),
      ascii("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
        ">> endobj\n")) ++ imageObjs
    val out = new java.io.ByteArrayOutputStream()
    out.write(ascii("%PDF-1.4\n"))
    val offsets = new Array[Int](objs.length)
    objs.zipWithIndex.foreach { case (o, ix) =>
      offsets(ix) = out.size(); out.write(o)
    }
    val xrefAt = out.size()
    out.write(ascii(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n"))
    offsets.foreach(o => out.write(ascii(f"$o%010d 00000 n \n")))
    out.write(ascii(s"trailer << /Size ${objs.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }

  private def writeEscaped(out: java.io.ByteArrayOutputStream,
      b: Array[Byte], from: Int, to: Int): Unit = {
    var i = from
    while (i < to) {
      val c = b(i)
      if (c == '(') { out.write('\\'); out.write('(') }
      else if (c == ')') { out.write('\\'); out.write(')') }
      else if (c == '\\') { out.write('\\'); out.write('\\') }
      else if (c == '\n') { out.write('\\'); out.write('n') }
      else if (c == '\r') { out.write('\\'); out.write('r') }
      else if (c == '\t') { out.write('\\'); out.write('t') }
      else out.write(c)
      i += 1
    }
  }

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }
}
