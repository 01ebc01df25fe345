package graft

import org.apache.spark.sql.functions._
import graft.functions.{HttpImpl, HttpPayloadExpr, WarcImpl, WarcRecordsExpr}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

/** HTTP/1.x message splitting: status/header grammar, Content-Length
  * bounding, chunked transfer decode (extensions, trailers,
  * truncation), non-HTTP passthrough, WARC http-framing round trip. */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  private def payload(s: String): (Int, String, String) = {
    val r = HttpImpl.payload(
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    (r.getInt(0), r.getUTF8String(1).toString,
      new String(r.getBinary(2), java.nio.charset.StandardCharsets.ISO_8859_1))
  }

  test("non-HTTP payload passes through untouched with status 0") {
    assert(payload("<html>raw body, no framing</html>") ==
      (0, "", "<html>raw body, no framing</html>"))
    assert(payload("") == (0, "", ""))
    assert(payload("HTTP") == (0, "", "HTTP"), "needs the slash")
  }

  test("status line, case-insensitive headers, lowercased content-type") {
    val (st, ct, body) = payload(
      "HTTP/1.1 404 Not Found\r\n" +
        "CONTENT-TYPE: Text/HTML; Charset=UTF-8\r\n" +
        "X-Other: junk: with colons\r\n\r\n" +
        "not here")
    assert(st == 404)
    assert(ct == "text/html; charset=utf-8")
    assert(body == "not here")
    // malformed status code -> 0, headers still consumed
    assert(payload("HTTP/1.1 abc\r\nContent-Type: a/b\r\n\r\nx") ==
      (0, "a/b", "x"))
  }

  test("Content-Length bounds the entity; invalid/absent keeps the rest") {
    assert(payload(
      "HTTP/1.1 200 OK\r\nContent-Length: 4\r\n\r\nbodyPADDING")._3 == "body")
    assert(payload(
      "HTTP/1.1 200 OK\r\nContent-Length: 9999\r\n\r\nshort")._3 == "short",
      "overlong declared length keeps what exists")
    assert(payload(
      "HTTP/1.1 200 OK\r\nContent-Length: nope\r\n\r\nall of it")._3 ==
      "all of it")
  }

  test("chunked decode: sizes, extensions, trailers, last-coding rule") {
    val msg = "HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: gzip, chunked\r\n\r\n" +
      "4;ext=\"x\"\r\nWiki\r\n" +
      "6\r\npedia \r\n" +
      "B\r\nin chunks.\n\r\n" +
      "0\r\nX-Trailer: dropped\r\n\r\n"
    assert(payload(msg) == (200, "", "Wikipedia in chunks.\n"))
    // truncated mid-chunk: keep what decoded
    val cut = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4\r\nWiki\r\nFF\r\nonly a little"
    assert(payload(cut)._3 == "Wiki")
    // malformed size line: keep what decoded
    val bad = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4\r\nWiki\r\nzz\r\nrest"
    assert(payload(bad)._3 == "Wiki")
    // chunked NOT last coding -> not chunked at the message layer
    assert(payload("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked, gzip\r\n\r\nliteral")._3 == "literal")
  }

  test("obs-fold continuations (RFC 9112 §5.2) join onto the field value") {
    // a FOLDED Transfer-Encoding must still switch framing to chunked —
    // pre-fix it read as a colon-less junk line and the chunk-size lines
    // leaked into the body (r15 ADVICE)
    val folded = "HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: gzip,\r\n \tchunked\r\n\r\n" +
      "4\r\nWiki\r\n0\r\n\r\n"
    assert(payload(folded) == (200, "", "Wiki"))
    // folded content-type: value parts joined with one space
    val foldedCt = "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html;\r\n\tcharset=utf-8\r\n\r\nx"
    assert(payload(foldedCt)._2 == "text/html; charset=utf-8")
    // the blank separator line is NOT a continuation: body untouched
    assert(payload("HTTP/1.1 200 OK\r\nX: y\r\n\r\n  indented body")._3 ==
      "  indented body")
  }

  test("WARC http framing round-trips through the splitter") {
    val recs = Seq("first body", "second körper")
      .zipWithIndex.map { case (b, i) =>
        InternalRow(UTF8String.fromString(s"http://h/$i"),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    val warc = WarcImpl.build(
      new GenericArrayData(recs.toArray[Any]), gzip = true, http = true)
    val arr = WarcImpl.records(warc)
    assert(arr.numElements() == 2)
    (0 until 2).foreach { i =>
      val rec = arr.getStruct(i, 3)
      val h = HttpImpl.payload(rec.getBinary(2))
      assert(h.getInt(0) == 200)
      assert(h.getUTF8String(1).toString == "text/html")
      assert(new String(h.getBinary(2),
        java.nio.charset.StandardCharsets.UTF_8) ==
        Seq("first body", "second körper")(i))
    }
  }

  test("column expression: struct fields project through Spark") {
    val got = Seq(("HTTP/1.1 301 Moved\r\nContent-Type: a/b\r\n\r\nB", 0L))
      .toDF("msg", "id")
      .select(HttpPayloadExpr(col("msg").cast("binary")).as("h"))
      .select(col("h.status"), col("h.content_type"),
        col("h.body").cast("string"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((301, "a/b", "B")))
  }

  test("property: arbitrary bodies survive frame∘payload, raw and chunked") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val body = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    var seed = Seed(13L)
    for (_ <- 1 to 150) {
      val b = body.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      // Content-Length framing (the builder's shape)
      val r1 = HttpImpl.payload(HttpImpl.frame(b))
      assert(r1.getInt(0) == 200)
      assert(java.util.Arrays.equals(r1.getBinary(2), b))
      // hand-built chunked framing over the same bytes, split in two
      val cut = b.length / 2
      val out = new java.io.ByteArrayOutputStream()
      def ascii(s: String) = out.write(
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      ascii("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n")
      for (part <- Seq(b.slice(0, cut), b.slice(cut, b.length))
          if part.nonEmpty) {
        ascii(Integer.toHexString(part.length) + "\r\n")
        out.write(part); ascii("\r\n")
      }
      ascii("0\r\n\r\n")
      val r2 = HttpImpl.payload(out.toByteArray)
      assert(java.util.Arrays.equals(r2.getBinary(2), b),
        s"chunked diverged at len=${b.length}")
    }
  }
}
