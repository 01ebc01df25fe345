package graft

import org.apache.spark.sql.functions._
import graft.functions.{WarcBuildExpr, WarcImpl, WarcRecordsExpr}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

/** From-scratch WARC container codec: round trips (raw and gzip),
  * Content-Length framing against adversarial payloads, header grammar,
  * truncation behavior, multi-member gzip. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(url: String, body: Array[Byte]): InternalRow =
    InternalRow(UTF8String.fromString(url), body)

  private def parse(b: Array[Byte]): Seq[(String, String, String)] = {
    val arr = WarcImpl.records(b)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString,
        new String(r.getBinary(2), java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  private def buildFile(gzip: Boolean, recs: (String, String)*): Array[Byte] =
    WarcImpl.build(new GenericArrayData(recs.map { case (u, b) =>
      rec(u, b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }.toArray[Any]), gzip, http = false)

  test("multi-record round trip, raw and gzipped") {
    for (gz <- Seq(false, true)) {
      val got = parse(buildFile(gz,
        "http://a/1" -> "first body",
        "http://a/2" -> "second körper 中文",
        "http://a/3" -> ""))
      assert(got == Seq(
        ("http://a/1", "response", "first body"),
        ("http://a/2", "response", "second körper 中文"),
        ("http://a/3", "response", "")), got.toString)
    }
  }

  test("Content-Length framing makes payload content inert") {
    // a body that CONTAINS a full fake WARC record must not split
    val evil = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://fake/\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    val got = parse(buildFile(gzip = false,
      "http://real/1" -> evil, "http://real/2" -> "tail"))
    assert(got.map(_._1) == Seq("http://real/1", "http://real/2"))
    assert(got.head._3 == evil)
  }

  test("header names are case-insensitive; unknown headers skip") {
    val file = ("WARC/1.0\r\nwarc-type: RESPONSE\r\n" +
      "X-Custom: junk: with colons\r\n" +
      "WARC-TARGET-URI: http://mixed/case\r\ncontent-length: 4\r\n\r\n" +
      "body\r\n\r\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val got = parse(file)
    assert(got == Seq(("http://mixed/case", "RESPONSE", "body")))
  }

  test("truncated file yields the records before the damage") {
    val whole = buildFile(gzip = false,
      "http://a/1" -> "keep me", "http://a/2" -> "this one is cut off")
    val truncated = java.util.Arrays.copyOfRange(whole, 0, whole.length - 12)
    val got = parse(truncated)
    assert(got == Seq(("http://a/1", "response", "keep me")))
    // corrupt gzip: empty result, no exception
    assert(parse(Array[Byte](0x1F.toByte, 0x8B.toByte, 1, 2, 3)).isEmpty)
  }

  test("multi-member gzip (per-record compression layout) reads back") {
    def gzipBytes(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(b); gz.close()
      bos.toByteArray
    }
    val m1 = gzipBytes(buildFile(gzip = false, "http://m/1" -> "one"))
    val m2 = gzipBytes(buildFile(gzip = false, "http://m/2" -> "two"))
    val got = parse(m1 ++ m2)
    assert(got.map(r => (r._1, r._3)) ==
      Seq("http://m/1" -> "one", "http://m/2" -> "two"))
  }

  test("property: arbitrary record sets round-trip, raw and gzipped") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // bodies draw from arbitrary BYTES (including CRLFs, WARC keywords,
    // gzip magic) — Content-Length framing must hold for all of them
    val body = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    val gen = for {
      n <- Gen.chooseNum(0, 8)
      bodies <- Gen.listOfN(n, body)
      gz <- Gen.oneOf(true, false)
    } yield (bodies, gz)
    var seed = Seed(7L)
    for (_ <- 1 to 150) {
      val (bodies, gz) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val recs = bodies.zipWithIndex.map { case (b, i) =>
        rec(s"http://p/$i", b)
      }
      val arr = WarcImpl.records(
        WarcImpl.build(new GenericArrayData(recs.toArray[Any]), gz,
          http = false))
      assert(arr.numElements() == bodies.length)
      bodies.zipWithIndex.foreach { case (b, i) =>
        val r = arr.getStruct(i, 3)
        assert(r.getUTF8String(0).toString == s"http://p/$i")
        assert(java.util.Arrays.equals(r.getBinary(2), b),
          s"body $i diverged (gz=$gz, len=${b.length})")
      }
    }
  }

  test("column expressions round trip through Spark") {
    val df = Seq((0L, "http://x/0", "alpha"), (1L, "http://x/1", "beta (β)"))
      .toDF("id", "url", "text")
    val got = df.groupBy(lit(1))
      .agg(sort_array(collect_list(struct(col("id"), col("url"), col("text"))))
        .as("rs"))
      .select(WarcBuildExpr(
        transform(col("rs"), r => struct(r.getField("url").as("url"),
          r.getField("text").cast("binary").as("body"))),
        lit(true)).as("w"))
      .select(explode(WarcRecordsExpr(col("w"))).as("rec"))
      .select(col("rec.url"), col("rec.body").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq("http://x/0" -> "alpha", "http://x/1" -> "beta (β)"))
  }
}
