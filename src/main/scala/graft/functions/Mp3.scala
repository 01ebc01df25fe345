package graft.functions

/** MPEG-1/2/2.5 Layer III (MP3) frame-header metadata — the audio
  * sibling of [[Vp8]]'s header layer: real crawled audio is
  * overwhelmingly MP3, and the m2 family covered only WAV. The frame
  * walk parses the ID3v2 envelope (syncsafe size) and every audio
  * frame header (ISO/IEC 11172-3 §2.4.1 / the MPEG-2 LSF extension):
  * version, bitrate/samplerate tables, padding-aware frame sizes,
  * channel mode — yielding an EXACT frame count and duration (frame
  * walks are how players measure CBR files; a Xing/VBRI scan is not
  * needed when every frame is visited). Envelope, stated loudly:
  * Layer III only (Layers I/II parse their headers but the walk
  * refuses them — different frame-size formulas are implemented but
  * the gate pins Layer III, the web's format); free-format bitrate
  * (index 0) refused — its frame size is undefined without a sync
  * scan. Decoders are total; all offset math in Long. The builder
  * exists to make exact fixtures (zero-payload frames, chosen header
  * fields, optional ID3v2). */
object Mp3 {

  /** Parsed stream metadata. `bitrateKbps` is the FIRST frame's;
    * `vbr` is true when any later frame differs. `durationMs` is the
    * exact frame-walk duration (frames · samplesPerFrame / rate). */
  final case class Mp3Meta(version: String, layer: Int,
      bitrateKbps: Int, sampleRate: Int, channels: Int,
      frames: Long, durationMs: Long, vbr: Boolean, hasId3: Boolean)

  // bitrate tables (kbps), index 1..14; 0 = free-format, 15 = invalid
  private val V1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320)
  private val V1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160,
    192, 224, 256, 320, 384)
  private val V1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256,
    288, 320, 352, 384, 416, 448)
  private val V2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144,
    160, 176, 192, 224, 256)
  private val V2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 144, 160)

  private val RatesV1 = Array(44100, 48000, 32000)
  private val RatesV2 = Array(22050, 24000, 16000)
  private val RatesV25 = Array(11025, 12000, 8000)

  private final case class Header(version: String, layer: Int,
      bitrateKbps: Int, sampleRate: Int, channels: Int, padding: Int,
      frameBytes: Int, samplesPerFrame: Int)

  /** Parse the 4-byte frame header at `i`; None unless it is a valid
    * Layer III header with a defined frame size. */
  private def header(b: Array[Byte], i: Int): Option[Header] = {
    if (i < 0 || i + 4L > b.length) return None
    val h = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    if ((h >>> 21) != 0x7ff) return None // 11-bit sync
    val verBits = (h >>> 19) & 3
    val layerBits = (h >>> 17) & 3
    val bitrateIx = (h >>> 12) & 15
    val rateIx = (h >>> 10) & 3
    val padding = (h >>> 9) & 1
    val mode = (h >>> 6) & 3
    if (verBits == 1 || layerBits == 0) return None // reserved
    if (bitrateIx == 0 || bitrateIx == 15) return None // free/invalid
    if (rateIx == 3) return None
    val version = verBits match {
      case 3 => "1"; case 2 => "2"; case _ => "2.5"
    }
    val rate = (verBits match {
      case 3 => RatesV1; case 2 => RatesV2; case _ => RatesV25
    })(rateIx)
    val v1 = verBits == 3
    // layerBits: 3 = Layer I, 2 = Layer II, 1 = Layer III
    val (kbps2, spf, frameBytes) = layerBits match {
      case 3 => // Layer I
        val k = if (v1) V1L1(bitrateIx) else V2L1(bitrateIx)
        (k, 384, ((12000 * k / rate) + padding) * 4)
      case 2 => // Layer II
        val k = if (v1) V1L2(bitrateIx) else V2L23(bitrateIx)
        (k, 1152, 144000 * k / rate + padding)
      case _ => // Layer III
        val k = if (v1) V1L3(bitrateIx) else V2L23(bitrateIx)
        val s = if (v1) 1152 else 576
        val fb = (if (v1) 144000 else 72000) * k / rate + padding
        (k, s, fb)
    }
    if (frameBytes < 4) return None
    Some(Header(version, 4 - layerBits, kbps2, rate,
      if (mode == 3) 1 else 2, padding, frameBytes, spf))
  }

  /** Parse an MP3 payload's metadata by walking every frame. None for
    * non-MP3 bytes, non-Layer-III streams, or a walk that derails
    * before the first full frame. Trailing junk after the last whole
    * frame is tolerated (ID3v1 tags, truncation mid-frame). */
  def parse(b: Array[Byte]): Option[Mp3Meta] = {
    if (b == null || b.length < 4) return None
    var i = 0
    var hasId3 = false
    // ID3v2 envelope: "ID3" + version(2) + flags(1) + syncsafe size(4);
    // the v2.4 footer flag (0x10) appends a 10-byte footer NOT counted
    // in the size — skipping it is what keeps footer-tagged files
    // inside the envelope
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      val footer = if ((b(5) & 0x10) != 0) 10L else 0L
      val end = 10L + size + footer
      if (end > b.length) return None
      hasId3 = true
      i = end.toInt
    }
    val first = header(b, i).getOrElse(return None)
    if (first.layer != 3) return None // Layer III only (the envelope)
    var frames = 0L
    var vbr = false
    var cur = first
    var pos = i.toLong
    var ok = true
    while (ok && pos + cur.frameBytes <= b.length) {
      frames += 1
      pos += cur.frameBytes
      if (pos + 4 <= b.length) {
        header(b, pos.toInt) match {
          case Some(next) if next.layer == 3 &&
              next.sampleRate == first.sampleRate &&
              next.version == first.version =>
            if (next.bitrateKbps != first.bitrateKbps) vbr = true
            cur = next
          case _ => ok = false // trailing junk / derail: stop cleanly
        }
      } else ok = false
    }
    if (frames == 0) return None
    val durationMs =
      frames * first.samplesPerFrame * 1000L / first.sampleRate
    Some(Mp3Meta(first.version, 3, first.bitrateKbps, first.sampleRate,
      first.channels, frames, durationMs, vbr, hasId3))
  }

  /** Fixture builder: `frames` zero-payload Layer III frames with the
    * requested header fields; `bitrateIx2` ≥ 0 alternates bitrate
    * indexes on odd frames (a VBR stream); padding alternates by
    * frame parity when `alternatePadding`. Optional ID3v2 tag of
    * `id3Size` payload bytes (syncsafe-coded). */
  def build(verBits: Int, bitrateIx: Int, rateIx: Int,
      channelMode: Int, frames: Int, bitrateIx2: Int = -1,
      alternatePadding: Boolean = false, id3Size: Int = -1,
      id3Footer: Boolean = false): Array[Byte] = {
    require(verBits == 3 || verBits == 2 || verBits == 0, "verBits")
    require(bitrateIx >= 1 && bitrateIx <= 14, "bitrateIx")
    require(rateIx >= 0 && rateIx <= 2, "rateIx")
    require(frames >= 1, "frames")
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size >= 0) {
      require(id3Size < (1 << 28), "id3Size")
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(if (id3Footer) 0x10 else 0)
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      (0 until id3Size).foreach(_ => out.write(0))
      if (id3Footer) {
        out.write('3'); out.write('D'); out.write('I')
        out.write(4); out.write(0); out.write(0x10)
        out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
        out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      }
    }
    val rate = (verBits match {
      case 3 => RatesV1; case 2 => RatesV2; case _ => RatesV25
    })(rateIx)
    var f = 0
    while (f < frames) {
      val ix = if (bitrateIx2 >= 1 && f % 2 == 1) bitrateIx2 else bitrateIx
      val pad = if (alternatePadding) f % 2 else 0
      val kbps = if (verBits == 3) V1L3(ix) else V2L23(ix)
      val frameBytes = (if (verBits == 3) 144000 else 72000) * kbps /
        rate + pad
      val h = (0x7ff << 21) | (verBits << 19) | (1 << 17) /* L3 */ |
        (1 << 16) /* no CRC */ | (ix << 12) | (rateIx << 10) |
        (pad << 9) | (channelMode << 6)
      out.write((h >>> 24) & 0xff); out.write((h >>> 16) & 0xff)
      out.write((h >>> 8) & 0xff); out.write(h & 0xff)
      (4 until frameBytes).foreach(_ => out.write(0))
      f += 1
    }
    out.toByteArray
  }
}
