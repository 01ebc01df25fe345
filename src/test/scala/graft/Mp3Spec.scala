package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mp3

/** MP3 frame-header layer: the classic 128 kbps @ 44.1 kHz frame-size
  * pin, version/rate/bitrate roundtrips, VBR detection, ID3v2 skip,
  * and walk totality on junk and truncation. */
class Mp3Spec extends AnyFunSuite {

  test("the classic frame sizes pin the formula: 128kbps@44100 -> " +
      "417 bytes unpadded, 418 padded") {
    // V1 L3: 144000 * 128 / 44100 = 417 (truncating) + padding
    val unpadded = Mp3.build(3, 9, 0, 0, 2) // index 9 = 128 kbps
    assert(unpadded.length == 417 * 2, s"got ${unpadded.length}")
    val padded = Mp3.build(3, 9, 0, 0, 2, alternatePadding = true)
    assert(padded.length == 417 + 418, s"got ${padded.length}")
    val m = Mp3.parse(unpadded).get
    assert(m.version == "1" && m.bitrateKbps == 128 &&
      m.sampleRate == 44100 && m.frames == 2 &&
      m.durationMs == 2L * 1152 * 1000 / 44100)
  }

  test("version / rate / bitrate / channel roundtrips incl. VBR and " +
      "ID3v2") {
    for {
      verBits <- Seq(3, 2, 0)
      rateIx <- 0 to 2
      bix <- Seq(1, 7, 14)
      mode <- Seq(0, 3)
    } {
      val b = Mp3.build(verBits, bix, rateIx, mode, frames = 7,
        id3Size = 33)
      val m = Mp3.parse(b)
      assert(m.isDefined, s"v=$verBits r=$rateIx b=$bix")
      val k = m.get
      val expVer = verBits match {
        case 3 => "1"; case 2 => "2"; case _ => "2.5" }
      assert(k.version == expVer && k.frames == 7 && k.hasId3 &&
        !k.vbr && k.channels == (if (mode == 3) 1 else 2),
        s"v=$verBits r=$rateIx b=$bix: $k")
      val expRate = (verBits match {
        case 3 => Seq(44100, 48000, 32000)
        case 2 => Seq(22050, 24000, 16000)
        case _ => Seq(11025, 12000, 8000) })(rateIx)
      assert(k.sampleRate == expRate)
      assert(k.durationMs == 7L *
        (if (verBits == 3) 1152 else 576) * 1000 / expRate)
    }
    val vbr = Mp3.parse(Mp3.build(3, 5, 1, 1, 10, bitrateIx2 = 11)).get
    assert(vbr.vbr && vbr.bitrateKbps == 64,
      "first frame's bitrate + the vbr flag: " + vbr)
  }

  test("ID3v2.4 footer flag: the 10-byte footer is skipped, not " +
      "mistaken for a broken sync") {
    val withFooter = Mp3.build(3, 9, 0, 0, 4, id3Size = 25,
      id3Footer = true)
    val m = Mp3.parse(withFooter)
    assert(m.exists(k => k.frames == 4 && k.hasId3),
      s"footer-tagged file must stay in the envelope: $m")
  }

  test("walk totality: junk, truncation, oversized ID3, trailing tag") {
    assert(Mp3.parse(null).isEmpty)
    assert(Mp3.parse("not an mp3 stream".getBytes).isEmpty)
    val good = Mp3.build(3, 9, 0, 0, 5, id3Size = 20)
    (0 until good.length by 37).foreach(cut => Mp3.parse(good.take(cut)))
    // truncation mid-final-frame: the walk keeps the whole frames
    val cutMid = good.dropRight(100)
    val m = Mp3.parse(cutMid)
    assert(m.exists(_.frames == 4), s"whole frames only: $m")
    // trailing ID3v1-style tag bytes after the last frame are tolerated
    val tailed = good ++ ("TAG" + "x" * 125).getBytes("US-ASCII")
    assert(Mp3.parse(tailed).exists(_.frames == 5))
    // an ID3 size running past the end refuses
    val bogus = good.clone()
    bogus(6) = 0x7f; bogus(7) = 0x7f
    assert(Mp3.parse(bogus).isEmpty)
  }
}
