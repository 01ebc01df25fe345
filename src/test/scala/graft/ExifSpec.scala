package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ExifImpl
import graft.operators.Multimodal

/** EXIF kernel edges: round trip through the builder, both TIFF
  * endiannesses, S/W coordinate signs, strip surgery, and totality on
  * crafted bytes. */
class ExifSpec extends AnyFunSuite {

  private def baseJpeg: Array[Byte] =
    Multimodal.syntheticJpegDcBytes(7L, 8, 8, color = false)

  test("builder round trip: tags, GPS microdegrees, no-GPS case") {
    val j = ExifImpl.withExif(baseJpeg, 6, "2024:02:03 04:05:06", "camX",
      Some((51L, 1L, 27L * 3, 3L)))
    val e = ExifImpl.parse(j).get
    assert(e.orientation.contains(6))
    assert(e.dateTime.contains("2024:02:03 04:05:06"))
    assert(e.make.contains("camX"))
    assert(e.hasGps && e.latMicro.contains(51000000L) &&
      e.lonMicro.contains(27000000L))
    val noGps = ExifImpl.parse(
      ExifImpl.withExif(baseJpeg, 1, "2024:01:01 00:00:00", "y", None)).get
    assert(!noGps.hasGps && noGps.latMicro.isEmpty)
    // rationals that exercise the minute/second terms exactly:
    // 12° 30' 00" = 12.5° via (12,1),(30,1),(0,1) is not this builder's
    // layout (deg-only), but a fractional degree divides exactly too
    val frac = ExifImpl.parse(ExifImpl.withExif(baseJpeg, 1, "d", "m",
      Some((25L, 2L, 45L, 4L)))).get // 12.5°, 11.25°
    assert(frac.latMicro.contains(12500000L) &&
      frac.lonMicro.contains(11250000L))
  }

  test("little-endian TIFF parses identically") {
    // hand-build a tiny II stream: orientation only
    val tiff = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { tiff.write(v & 0xff); tiff.write(v >> 8) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16(v >>> 16) }
    tiff.write('I'); tiff.write('I'); w16(42); w32(8)
    w16(1) // one entry
    w16(0x0112); w16(3); w32(1); w16(5); w16(0)
    w32(0)
    val body = tiff.toByteArray
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    val len = 2 + 6 + body.length
    seg.write(len >> 8); seg.write(len & 0xff)
    seg.write("Exif".getBytes("US-ASCII")); seg.write(0); seg.write(0)
    seg.write(body)
    val out = new java.io.ByteArrayOutputStream()
    val b = baseJpeg
    out.write(b, 0, 2); seg.writeTo(out); out.write(b, 2, b.length - 2)
    val e = ExifImpl.parse(out.toByteArray).get
    assert(e.orientation.contains(5) && !e.hasGps)
  }

  test("strip removes exactly the Exif segment; pixels decode identically") {
    val j = ExifImpl.withExif(baseJpeg, 3, "2024:01:01 00:00:00", "m",
      Some((10L, 1L, 20L, 1L)))
    val s = ExifImpl.strip(j)
    assert(ExifImpl.parse(s).isEmpty, "Exif must be gone after strip")
    assert(java.util.Arrays.equals(s, baseJpeg),
      "stripping the only added segment must restore the original bytes")
    // exif-free and non-JPEG payloads pass through reference-equal
    val noExif = baseJpeg
    assert(ExifImpl.strip(noExif) eq noExif)
    val notJpeg = "plain".getBytes
    assert(ExifImpl.strip(notJpeg) eq notJpeg)
  }

  test("orientPixels: all 8 EXIF transforms normalize exactly") {
    // non-square 3×2 RGB with distinct pixels so any coordinate slip
    // shows; for each orientation, store the inverse-transformed image
    // and check normalization reproduces the upright bytes
    val wu = 3; val hu = 2
    val upright = Array.tabulate(wu * hu * 3)(i => (i * 7 + 1).toByte)
    for (o <- 1 to 8) {
      val swap = o >= 5
      val ws = if (swap) hu else wu
      val hs = if (swap) wu else hu
      val stored = new Array[Byte](ws * hs * 3)
      for (y <- 0 until hu; x <- 0 until wu) {
        val (sx, sy) = o match {
          case 1 => (x, y)
          case 2 => (ws - 1 - x, y)
          case 3 => (ws - 1 - x, hs - 1 - y)
          case 4 => (x, hs - 1 - y)
          case 5 => (y, x)
          case 6 => (y, hs - 1 - x)
          case 7 => (ws - 1 - y, hs - 1 - x)
          case _ => (ws - 1 - y, x)
        }
        (0 until 3).foreach(c =>
          stored((sy * ws + sx) * 3 + c) = upright((y * wu + x) * 3 + c))
      }
      val (gw, gh, got) = Multimodal.orientPixels(ws, hs, 3, stored, o)
      assert(gw == wu && gh == hu, s"dims for o=$o")
      assert(java.util.Arrays.equals(got, upright), s"pixels for o=$o")
    }
    // applying a 90° rotation twice equals the 180° transform
    val (_, _, once) = Multimodal.orientPixels(wu, hu, 3, upright, 6)
    val (_, _, twice) = Multimodal.orientPixels(hu, wu, 3, once, 6)
    val (_, _, r180) = Multimodal.orientPixels(wu, hu, 3, upright, 3)
    assert(java.util.Arrays.equals(twice, r180))
    intercept[IllegalArgumentException] {
      Multimodal.orientPixels(wu, hu, 3, upright, 9)
    }
    intercept[IllegalArgumentException] {
      Multimodal.orientPixels(wu, hu, 3, upright, 0)
    }
  }

  test("parser is total on crafted bytes") {
    val cases = Seq[Array[Byte]](
      null, Array.empty, Array[Byte](-1, -40), // bare SOI
      baseJpeg, // valid JPEG, no Exif
      // APP1 claiming a huge length
      Array[Byte](-1, -40, -1, -31, 0x7f, -1) ++ Array.fill[Byte](4)(0),
      // Exif header but truncated TIFF
      Array[Byte](-1, -40, -1, -31, 0, 12) ++
        "Exif".getBytes ++ Array[Byte](0, 0, 'M', 'M'),
      // IFD offset pointing out of bounds
      ExifImpl.withExif(baseJpeg, 1, "d", "m", None).take(30))
    cases.foreach { b =>
      ExifImpl.parse(b) // never throws is the assertion
      ExifImpl.strip(b)
    }
  }
}
