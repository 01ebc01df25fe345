package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ImageCodecs, Vp8}

/** RFC 6386 bool coder + VP8 key-frame header layer: a hand-computed
  * known-answer vector pins the decoder against the spec arithmetic
  * (not just against our own encoder), wide roundtrips pin the
  * encoder, and the header walk is checked through its optional
  * sub-blocks and refusal edges. */
class Vp8Spec extends AnyFunSuite {

  test("bool decoder known-answer: hand-computed spec arithmetic") {
    // bytes AC 53 → value = 0xAC53 = 44115, range 255.
    // bool(128): split = 1 + ((254·128)>>8) = 128, SPLIT = 32768;
    //   44115 ≥ 32768 → 1; range 127, value 11347; renorm → 22694/254.
    // bool(128): split = 1 + ((253·128)>>8) = 127, SPLIT = 32512;
    //   22694 < 32512 → 0; range 127 → renorm → 45388/254.
    // bool(128): split 127, SPLIT 32512; 45388 ≥ → 1; value 12876,
    //   range 127 → renorm → 25752/254.
    // bool(250): split = 1 + ((253·250)>>8) = 248, SPLIT = 63488;
    //   25752 < 63488 → 0; range 248, no renorm.
    val d = new Vp8.BoolDecoder(Array(0xAC.toByte, 0x53.toByte), 0, 2)
    assert(d.bool(128) == 1)
    assert(d.bool(128) == 0)
    assert(d.bool(128) == 1)
    assert(d.bool(250) == 0)
  }

  test("bool coder roundtrip: mixed probabilities, long sequences, " +
      "carry propagation") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 20) {
      val n = 50 + rnd.nextInt(400)
      val seq = Array.fill(n)((1 + rnd.nextInt(254), rnd.nextInt(2)))
      val e = new Vp8.BoolEncoder
      seq.foreach { case (p, v) => e.bool(p, v) }
      val bytes = e.result()
      val d = new Vp8.BoolDecoder(bytes, 0, bytes.length)
      seq.zipWithIndex.foreach { case ((p, v), i) =>
        assert(d.bool(p) == v, s"trial $trial symbol $i (p=$p)")
      }
    }
    // all-ones at high probability stresses the carry path
    val e = new Vp8.BoolEncoder
    (0 until 300).foreach(_ => e.bool(254, 1))
    val bytes = e.result()
    val d = new Vp8.BoolDecoder(bytes, 0, bytes.length)
    (0 until 300).foreach(i => assert(d.bool(254) == 1, s"ones $i"))
  }

  test("key-frame header roundtrip incl. segmentation and lf-adjust " +
      "walks") {
    for {
      (seg, lf) <- Seq((false, false), (true, false), (false, true),
        (true, true))
      qi <- Seq(0, 63, 127)
    } {
      val chunk = Vp8.buildKeyFrameHeader(641, 480, version = 3,
        filterType = 1, filterLevel = 33, sharpness = 5, log2Parts = 2,
        yAcQi = qi, yDcDelta = -7, uvAcDelta = 4,
        withSegmentation = seg, withLfAdjust = lf)
      val m = Vp8.keyFrameMeta(chunk, 0, chunk.length)
      assert(m.isDefined, s"seg=$seg lf=$lf qi=$qi")
      val k = m.get
      assert(k.width == 641 && k.height == 480 && k.version == 3 &&
        k.filterType == 1 && k.filterLevel == 33 && k.sharpness == 5 &&
        k.tokenPartitions == 4 && k.yAcQi == qi && k.yDcDelta == -7 &&
        k.y2DcDelta == 0 && k.uvAcDelta == 4 && k.showFrame,
        s"seg=$seg lf=$lf qi=$qi: $k")
    }
  }

  test("container meta: VP8L dims, VP8 lossy header, VP8X canvas") {
    val rgba = Array.tabulate(6 * 5 * 4)(i => (i * 7 % 256).toByte)
    val lossless = ImageCodecs.webpMeta(ImageCodecs.webpEncode(6, 5, rgba))
    assert(lossless.exists(m => m.kind == "lossless" && m.width == 6 &&
      m.height == 5 && !m.extended && m.lossy.isEmpty), lossless.toString)
    val frame = Vp8.buildKeyFrameHeader(320, 240, 0, 0, 10, 1, 0, 90,
      0, 0, withSegmentation = false, withLfAdjust = false)
    val lossy = ImageCodecs.webpMeta(
      ImageCodecs.wrapWebp(Seq(("VP8 ", frame))))
    assert(lossy.exists(m => m.kind == "lossy" && m.width == 320 &&
      m.height == 240 && m.lossy.exists(_.yAcQi == 90)), lossy.toString)
    val ext = ImageCodecs.webpMeta(ImageCodecs.wrapWebp(Seq(
      ("VP8X", ImageCodecs.vp8xPayload(400, 300)), ("VP8 ", frame))))
    assert(ext.exists(m => m.extended && m.canvasW == 400 &&
      m.canvasH == 300 && m.kind == "lossy"), ext.toString)
  }

  test("WebP EXIF chunk: both wild payload forms parse; the scrub " +
      "drops the chunk, clears the flag, keeps pixels byte-identical") {
    import graft.functions.ExifImpl
    val rgba = Array.tabulate(8 * 6 * 4)(i => (i * 13 % 256).toByte)
    val full = ImageCodecs.webpEncode(8, 6, rgba)
    val sz = (full(16) & 0xff) | ((full(17) & 0xff) << 8) |
      ((full(18) & 0xff) << 16) | ((full(19) & 0xff) << 24)
    val vp8l = full.slice(20, 20 + sz)
    val body = ExifImpl.buildTiffBody(6, "2024:01:02 03:04:05", "cam",
      Some((45L, 1L, 90L, 1L)))
    for (prefixed <- Seq(true, false)) {
      val exifPayload =
        if (prefixed) "Exif".getBytes("US-ASCII") ++
          Array[Byte](0, 0) ++ body
        else body
      val webp = ImageCodecs.wrapWebp(Seq(
        ("VP8X", ImageCodecs.vp8xPayload(8, 6, exifFlag = true)),
        ("VP8L", vp8l), ("EXIF", exifPayload)))
      val m = ImageCodecs.webpMeta(webp)
      assert(m.exists(_.exif.exists(e => e.orientation.contains(6) &&
        e.hasGps && e.latMicro.contains(45000000L) &&
        e.lonMicro.contains(90000000L))), s"prefixed=$prefixed: $m")
      val (clean, status) = ImageCodecs.stripWebpExif(webp)
      assert(status == "scrubbed")
      val after = ImageCodecs.webpMeta(clean)
      assert(after.exists(_.exif.isEmpty), "EXIF must be gone")
      assert((clean(20) & 0x0c) == 0, "VP8X EXIF/XMP flags cleared")
      // pixels decode byte-identically after the scrub
      val px0 = ImageCodecs.webpDecode(webp)
      val px1 = ImageCodecs.webpDecode(clean)
      assert(px0.isDefined && px1.isDefined &&
        java.util.Arrays.equals(px0.get._4, px1.get._4))
      // re-scrub reports clean with the payload unchanged
      val (again, st2) = ImageCodecs.stripWebpExif(clean)
      assert(st2 == "clean" && (again eq clean))
    }
    // a corrupt chunk size before EXIF: walk_failed, payload unchanged
    val bad = ImageCodecs.wrapWebp(Seq(("VP8L", vp8l),
      ("EXIF", body))).clone()
    bad(16) = -1; bad(17) = -1; bad(18) = -1; bad(19) = 0x7f
    val (out, st3) = ImageCodecs.stripWebpExif(bad)
    assert(st3 == "walk_failed" && (out eq bad))
  }

  test("refusals are total: interframe, bad start code, truncation, " +
      "non-webp") {
    val frame = Vp8.buildKeyFrameHeader(64, 64, 0, 0, 0, 0, 0, 50, 0, 0,
      withSegmentation = false, withLfAdjust = false)
    // flip the key-frame bit → interframe
    val inter = frame.clone(); inter(0) = (inter(0) | 1).toByte
    assert(Vp8.keyFrameMeta(inter, 0, inter.length).isEmpty)
    // corrupt start code
    val badSc = frame.clone(); badSc(3) = 0x00
    assert(Vp8.keyFrameMeta(badSc, 0, badSc.length).isEmpty)
    // truncations at every offset: total, mostly None
    (0 until frame.length).foreach { cut =>
      Vp8.keyFrameMeta(frame.take(cut), 0, cut)
    }
    assert(Vp8.keyFrameMeta(null, 0, 0).isEmpty)
    assert(ImageCodecs.webpMeta("RIFFxxxxWAVE".getBytes).isEmpty)
    // a first_part_size larger than the chunk refuses
    val tooBig = frame.clone()
    tooBig(2) = 0x7f // inflate the 19-bit size field's high bits
    assert(Vp8.keyFrameMeta(tooBig, 0, tooBig.length).isEmpty)
  }
}
