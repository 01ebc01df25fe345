package graft

import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.PdfImpl
import graft.operators.Multimodal

/** Seeded fuzz over the round-18 byte kernels: the PDF image walk, the
  * pixel-exposing JPEG decode and the generic dHash must TOTAL-FUNCTION
  * arbitrary input (a kernel exception kills the task at 100 TB), and
  * bit-flips/truncations of VALID carriers must degrade, never throw.
  * Fixed seeds reproduce. */
class Round18FuzzSpec extends SparkSpec {

  test("PdfImpl.images is total on junk, truncations and bit flips") {
    val rnd = new Random(20260818L)
    for (_ <- 1 to 300) {
      val junk = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(junk)
      PdfImpl.images(junk) // may be empty, must not throw
    }
    // keyword-bearing junk exercises the dict/stream walk specifically
    for (i <- 1 to 200) {
      val s = Seq("stream", "endstream", "obj", "/Subtype /Image",
        "/Width 7", "/Length 3", "/FlateDecode", "/DCTDecode", "<<", ">>")
      val body = (0 until 1 + rnd.nextInt(8))
        .map(_ => s(rnd.nextInt(s.length))).mkString(" " * rnd.nextInt(3))
      PdfImpl.images(body.getBytes("ISO-8859-1"))
      PdfImpl.extract(body.getBytes("ISO-8859-1"))
    }
    val px = Array.tabulate(6 * 5 * 3)(i => (i * 37 % 256).toByte)
    val valid = PdfImpl.build(UTF8String.fromString("x"), compress = true,
      images = Seq(
        PdfImpl.ImageSpec(6, 5, 3, px, dct = false),
        PdfImpl.ImageSpec(8, 6, 3,
          Multimodal.syntheticJpegDcBytes(3L, 8, 6, color = true),
          dct = true)))
    for (_ <- 1 to 200) {
      val b = valid.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      PdfImpl.images(b)
      PdfImpl.extract(b)
      PdfImpl.images(java.util.Arrays.copyOf(valid, rnd.nextInt(valid.length)))
    }
  }

  test("jpegDecodeInterleaved is total; success means a full pixel buffer") {
    val rnd = new Random(20260819L)
    for (_ <- 1 to 300) {
      val junk = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(junk)
      if (junk.length >= 2) { junk(0) = 0xFF.toByte; junk(1) = 0xD8.toByte }
      Multimodal.jpegDecodeInterleaved(junk) // None or decode, never throw
    }
    val valid = Multimodal.syntheticJpegDcBytes(9L, 13, 11, color = true)
    for (_ <- 1 to 200) {
      val b = valid.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Multimodal.jpegDecodeInterleaved(b).foreach { case (w, h, c, px) =>
        assert(px.length == w * h * c && w > 0 && h > 0)
      }
    }
  }

  test("dhashFromPixels: bounds refused, brightness-invariance holds") {
    val rnd = new Random(20260820L)
    for (_ <- 1 to 100) {
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(20)
      val c = 1 + 2 * rnd.nextInt(2) // 1 or 3
      val px = Array.fill(w * h * c)(rnd.nextInt(256))
      val (hi, lo) = Multimodal.dhashFromPixels(w, h, c, px)
      // constant brightness shift (clamped-free range) preserves the hash
      if (px.forall(v => v < 200)) {
        val shifted = px.map(_ + 55)
        assert(Multimodal.dhashFromPixels(w, h, c, shifted) == ((hi, lo)))
      }
    }
    intercept[IllegalArgumentException] {
      Multimodal.dhashFromPixels(3, 3, 3, new Array[Int](5)) // short buffer
    }
    intercept[IllegalArgumentException] {
      Multimodal.dhashFromPixels(0, 3, 3, new Array[Int](0))
    }
  }

  test("feed/anchor/cache-control extraction is total over markup junk") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.TextFunctions
    val rnd = new Random(20260821L)
    val frags = Seq("<entry>", "</entry>", "<item>", "<Item >", "<link",
      " href=\"", "'", "\"", ">", "<updated>", "</pubDate>", "<a ", "rel=",
      "nofollow", "&amp;", "&#x", "max-age=", "no-store", "<url>", "<loc>",
      "</loc>", "<lastmod>", "x")
    val rows = (1 to 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(20))
        .map(_ => frags(rnd.nextInt(frags.length))).mkString)
    }
    val df = rows.toDF("id", "s")
    // every kernel must evaluate over every junk row without throwing
    val n = df.select(
      size(TextFunctions.feedEntryBlocks(col("s"))),
      size(TextFunctions.htmlAnchors(col("s"))),
      size(TextFunctions.sitemapEntries(col("s"))),
      size(TextFunctions.htmlFollowableLinks(col("s"))),
      TextFunctions.cacheControl(col("s"))).count()
    assert(n == 200L)
  }
}
