package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTTP/1.x message splitting (RFC 9112) — the layer between WARC
  * `response` records and content decoding. Real crawl WARCs (Common
  * Crawl layout) store the FULL HTTP message as the record payload:
  * status line + header fields + entity body, the body often
  * chunk-framed. A pipeline that hands the raw payload to charset or
  * markup stages sees HTTP headers glued to HTML; this kernel strips
  * the framing and surfaces the two header facts curation needs
  * (status code, Content-Type).
  *
  * Returns `struct<status int, content_type string, body binary>`:
  *
  *  - input NOT starting with `HTTP/` passes through untouched with
  *    `status = 0`, `content_type = ''` — so the kernel composes
  *    transparently over WARCs whose records were written body-only
  *    (the t52 layout) and over `warcinfo`/`request` records;
  *  - the status line parses permissively (`HTTP/<ver> <code> ...`);
  *    a malformed code yields 0 with the headers still consumed;
  *  - header names match case-insensitively; `Content-Type` is
  *    surfaced lowercase-trimmed (media types are case-insensitive);
  *  - `Transfer-Encoding: chunked` bodies are de-chunked per RFC 9112
  *    §7.1 (hex sizes, `;ext` chunk extensions ignored, trailer
  *    fields dropped); a malformed or truncated chunk stream yields
  *    the bytes decoded so far — truncation-safe like every codec in
  *    this engine, never an exception;
  *  - otherwise a valid `Content-Length` bounds the entity (guarding
  *    against trailing CRLF padding the container added); absent or
  *    malformed, the remainder IS the body.
  *
  * Pure per-row kernel (one static call) — stays inside whole-stage
  * codegen, so at 100 TB it fuses into the ingest scan's generated
  * loop alongside [[WarcRecordsExpr]] and [[DecodeTextExpr]]. */
case class HttpPayloadExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("body", BinaryType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"http_payload expects BINARY input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    HttpImpl.payload(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HttpImpl.payload($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "http_payload"
}

object HttpPayloadExpr {
  def apply(bytes: Column): Column =
    GraftInternals.column(HttpPayloadExpr(GraftInternals.expression(bytes)))
}

object HttpImpl {

  /** See [[HttpPayloadExpr]]. */
  def payload(b: Array[Byte]): InternalRow = {
    if (b.length < 5 || b(0) != 'H' || b(1) != 'T' || b(2) != 'T' ||
      b(3) != 'P' || b(4) != '/')
      return InternalRow(0, UTF8String.EMPTY_UTF8, b)
    // status line: HTTP/<ver> SP <code> SP <reason> CRLF
    var i = lineEnd(b, 0)
    val statusLine = lineString(b, 0, i)
    val status = {
      val parts = statusLine.split(" +")
      if (parts.length >= 2)
        try parts(1).toInt catch { case _: Exception => 0 }
      else 0
    }
    // header fields until the blank line
    var contentType = ""
    var contentLength = -1L
    var chunked = false
    while (i < b.length && !emptyLineAt(b, i)) {
      var e = lineEnd(b, i)
      var line = lineString(b, i, e)
      // obs-fold (RFC 9112 §5.2): a following line starting with SP/HTAB
      // continues THIS field's value — join with one space BEFORE the
      // colon dispatch, else a folded Transfer-Encoding reads as a
      // colon-less junk line and a chunked body is framed as identity,
      // leaking chunk-size lines into the text (r15 ADVICE)
      while (e < b.length && (b(e) == ' ' || b(e) == '\t')) {
        val e2 = lineEnd(b, e)
        line = line + " " + lineString(b, e, e2).trim
        e = e2
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        name match {
          case "content-type" => contentType = value.toLowerCase
          case "content-length" =>
            contentLength = try value.toLong catch { case _: Exception => -1L }
          case "transfer-encoding" =>
            // the last (outermost) coding must be chunked when present
            chunked = value.toLowerCase.split(",").map(_.trim)
              .lastOption.contains("chunked")
          case _ => ()
        }
      }
      i = e
    }
    // consume the blank separator line; body is what follows
    i = lineEnd(b, i)
    val body =
      if (chunked) dechunk(b, i)
      else if (contentLength >= 0 && i + contentLength <= b.length)
        java.util.Arrays.copyOfRange(b, i, i + contentLength.toInt)
      else java.util.Arrays.copyOfRange(b, i, b.length)
    InternalRow(status, UTF8String.fromString(contentType), body)
  }

  /** RFC 9112 §7.1 chunked decoding from offset `from`: hex size line
    * (chunk extensions after `;` ignored), `size` data bytes, CRLF,
    * repeated until the 0-size terminator; trailer fields dropped.
    * Malformed input returns the bytes decoded so far. */
  private def dechunk(b: Array[Byte], from: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(16, b.length - from))
    var i = from
    var done = false
    while (!done && i < b.length) {
      val e = lineEnd(b, i)
      val sizeLine = lineString(b, i, e)
      val semi = sizeLine.indexOf(';')
      val hex = (if (semi >= 0) sizeLine.substring(0, semi) else sizeLine).trim
      val size = try java.lang.Long.parseLong(hex, 16)
        catch { case _: Exception => -1L }
      if (size < 0 || e + size > b.length) done = true // malformed/truncated
      else if (size == 0) done = true                   // terminator
      else {
        out.write(b, e, size.toInt)
        i = e + size.toInt
        // the CRLF closing the chunk data
        if (emptyLineAt(b, i)) i = lineEnd(b, i) else done = true
      }
    }
    out.toByteArray
  }

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length && b(i) != '\n') i += 1
    math.min(i + 1, b.length)
  }

  private def lineString(b: Array[Byte], from: Int, end: Int): String = {
    var e = end
    if (e > from && b(e - 1) == '\n') e -= 1
    if (e > from && b(e - 1) == '\r') e -= 1
    new String(b, from, e - from, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def emptyLineAt(b: Array[Byte], i: Int): Boolean =
    (i < b.length && b(i) == '\n') ||
      (i + 1 < b.length && b(i) == '\r' && b(i + 1) == '\n')

  /** The deterministic HTTP/1.1 200 framing [[WarcBuildExpr]] wraps
    * response bodies in when its `http` flag is set — fixed header
    * order and Content-Length framing, so build∘parse is the identity
    * the `t59` gate hashes. */
  def frame(body: Array[Byte]): Array[Byte] = {
    val hdr = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](hdr.length + body.length)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    System.arraycopy(body, 0, out, hdr.length, body.length)
    out
  }
}
