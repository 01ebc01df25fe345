package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500) container parsing — the format crawl corpora
  * actually arrive in: one file is a sequence of records (each a
  * `WARC/1.x` header block + `Content-Length`-framed payload), usually
  * with each record its own gzip member so readers can seek. This is
  * the stage BEFORE [[MarkupExtractExpr]] (HTML payloads) and
  * [[PdfExtractExpr]] (PDF payloads) in the crawl→train-data pipeline;
  * same from-scratch-codec discipline as both.
  *
  * [[WarcRecordsExpr]] turns one file's bytes into
  * `array<struct<url string, rec_type string, body binary>>` — gzipped
  * input (1f 8b magic) inflates through all members first (Content-
  * Length framing then makes payload content inert: a body containing
  * the literal bytes `WARC/1.0` cannot start a phantom record). Header
  * names match case-insensitively; unknown headers skip; a record with
  * a malformed or missing Content-Length ends the parse (truncated
  * files yield the records before the damage, never an exception).
  *
  * [[WarcBuildExpr]] writes the mirror image deterministically (fixed
  * header order, CRLF discipline, optional per-file gzip) — the fixture
  * side of the `t52` round-trip gate, whose DuckDB oracle is the
  * identity on the url/body pairs. */
case class WarcRecordsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("rec_type", StringType, nullable = false),
    StructField("body", BinaryType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"warc_records expects BINARY input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WarcImpl.records(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WarcImpl.records($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "warc_records"
}

object WarcRecordsExpr {
  def apply(bytes: Column): Column =
    GraftInternals.column(WarcRecordsExpr(GraftInternals.expression(bytes)))
}

/** Deterministic WARC writer: `records` is
  * `array<struct<url string, body binary>>`; emits one `response`
  * record per element, gzip-compressing the WHOLE file when `gzip`
  * (multi-member per-record gzip reads back identically through the
  * reader's inflate-all). With `http` set, each body is wrapped in
  * the real-crawl payload layout — a full HTTP/1.1 message
  * ([[HttpImpl.frame]]) — so round-trip gates exercise the
  * [[HttpPayloadExpr]] splitting stage real Common-Crawl-shaped WARCs
  * require. */
case class WarcBuildExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StructType(Array(u, b)), _), BooleanType, BooleanType)
          if u.dataType == StringType && b.dataType == BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r, h) => TypeCheckResult.TypeCheckFailure(
        s"warc_build expects (array<struct<string,binary>>, boolean gzip, " +
          s"boolean http), got $l, $r, $h")
    }

  override def nullSafeEval(records: Any, gzip: Any, http: Any): Any =
    WarcImpl.build(records.asInstanceOf[ArrayData],
      gzip.asInstanceOf[Boolean], http.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, g, h) =>
      s"graft.functions.WarcImpl.build($r, $g, $h)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "warc_build"
}

object WarcBuildExpr {
  def apply(records: Column, gzip: Column): Column =
    apply(records, gzip, org.apache.spark.sql.functions.lit(false))
  def apply(records: Column, gzip: Column, http: Column): Column =
    GraftInternals.column(WarcBuildExpr(
      GraftInternals.expression(records), GraftInternals.expression(gzip),
      GraftInternals.expression(http)))
}

object WarcImpl {

  private val CRLF = "\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  // ------------------------------------------------------------- parse

  def records(file: Array[Byte]): ArrayData = {
    val bytes =
      if (file.length >= 2 && (file(0) & 0xFF) == 0x1F &&
        (file(1) & 0xFF) == 0x8B) gunzipAll(file)
      else file
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    if (bytes == null) return new GenericArrayData(out.toArray)
    var i = 0
    while (i >= 0 && i < bytes.length) {
      i = indexOf(bytes, "WARC/", i)
      if (i >= 0) {
        // header block: lines until an empty line
        var j = lineEnd(bytes, i)
        var url = ""
        var recType = ""
        var len = -1L
        while (j < bytes.length && !emptyLineAt(bytes, j)) {
          val e = lineEnd(bytes, j)
          val line = new String(bytes, j, lineLen(bytes, j, e),
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val colon = line.indexOf(':')
          if (colon > 0) {
            val name = line.substring(0, colon).trim.toLowerCase
            val value = line.substring(colon + 1).trim
            name match {
              case "warc-target-uri" => url = value
              case "warc-type" => recType = value
              case "content-length" =>
                len = try value.toLong catch { case _: Exception => -1L }
              case _ => ()
            }
          }
          j = e
        }
        j = lineEnd(bytes, j) // consume the blank separator line
        if (len < 0 || j + len > bytes.length) {
          // malformed or truncated: stop, keep what parsed so far
          i = -1
        } else {
          val body = java.util.Arrays.copyOfRange(bytes, j, j + len.toInt)
          out += InternalRow(UTF8String.fromString(url),
            UTF8String.fromString(recType), body)
          i = j + len.toInt // next record found by the WARC/ scan
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Inflate ALL gzip members of a multi-member stream (the per-record
    * compression layout); null on corrupt data — skipped, never thrown. */
  private def gunzipAll(b: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream(b.length * 4)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } catch { case _: java.io.IOException => null }

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length && b(i) != '\n') i += 1
    math.min(i + 1, b.length)
  }

  private def lineLen(b: Array[Byte], from: Int, end: Int): Int = {
    var e = end
    if (e > from && e <= b.length && (e == b.length || b(e - 1) == '\n')) {
      if (e > from && b(e - 1) == '\n') e -= 1
      if (e > from && b(e - 1) == '\r') e -= 1
    }
    e - from
  }

  private def emptyLineAt(b: Array[Byte], i: Int): Boolean =
    (i < b.length && b(i) == '\n') ||
      (i + 1 < b.length && b(i) == '\r' && b(i + 1) == '\n')

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

  // ------------------------------------------------------------- build

  def build(records: ArrayData, gzip: Boolean, http: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < records.numElements()) {
      val r = records.getStruct(i, 2)
      val url = r.getUTF8String(0)
      val body =
        if (http) HttpImpl.frame(r.getBinary(1)) else r.getBinary(1)
      val hdr = ("WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Target-URI: ${if (url == null) "" else url.toString}\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.write(hdr)
      out.write(body)
      out.write(CRLF); out.write(CRLF)
      i += 1
    }
    val raw = out.toByteArray
    if (!gzip) raw
    else {
      val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(raw); gz.finish(); gz.close()
      bos.toByteArray
    }
  }
}
