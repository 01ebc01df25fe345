package graft.functions

/** Lossy-VP8 KEY-FRAME header layer (RFC 6386 §7/§9) — the metadata
  * tier of the dominant real-web WebP form. Envelope, stated loudly:
  * this parses the uncompressed frame tag + dimensions and the
  * bool-coded first-partition header through the quantizer indices —
  * segmentation, loop-filter adjustments, partition counts, the five
  * quant deltas — but does NOT decode macroblock data to pixels (the
  * coefficient-token layer needs RFC 6386's default probability
  * tables; a from-memory transcription of 1000+ table bytes would be
  * exactly the silently-wrong-constant class the VP8L cl-order advice
  * item warned about, so pixels stay refused rather than guessed).
  * What this DOES give a crawl pipeline today: dimensions for every
  * lossy WebP (previously invisible), and the y_ac quantizer index —
  * a direct compression-quality signal for curation filters.
  *
  * The bool (arithmetic) coder here is the full RFC 6386 §7.3
  * decoder, reusable by a future coefficient layer; the encoder
  * exists to build exact fixtures and is pinned against hand-computed
  * spec arithmetic in Vp8Spec, not just roundtrips.
  */
object Vp8 {

  /** Key-frame header fields through the quant block. Deltas are 0
    * when absent (the spec's meaning of a cleared flag). */
  final case class KeyFrameMeta(
      width: Int, height: Int, scaleW: Int, scaleH: Int,
      version: Int, showFrame: Boolean,
      colorSpace: Int, clampingType: Int,
      filterType: Int, filterLevel: Int, sharpness: Int,
      tokenPartitions: Int,
      yAcQi: Int, yDcDelta: Int, y2DcDelta: Int, y2AcDelta: Int,
      uvDcDelta: Int, uvAcDelta: Int)

  /** RFC 6386 §7.3 bool decoder over b[start, end). Reads past the
    * partition end yield implicit zero bytes (spec tail behavior). */
  final class BoolDecoder(b: Array[Byte], start: Int, end: Int) {
    private var pos = start + 2
    private var range = 255
    private var value =
      if (start + 2 <= end)
        (((b(start) & 0xff) << 8) | (b(start + 1) & 0xff))
      else if (start + 1 <= end) ((b(start) & 0xff) << 8)
      else 0
    private var bitCount = 0

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) {
        ret = 1; range -= split; value -= bigSplit
      } else range = split
      while (range < 128) {
        value <<= 1; range <<= 1; bitCount += 1
        if (bitCount == 8) {
          bitCount = 0
          if (pos < end) { value |= b(pos) & 0xff; pos += 1 }
          // else: implicit zero byte
        }
      }
      ret
    }

    /** n-bit literal, MSB first, each bit at probability 128. */
    def literal(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** Flagged signed field: L(1) present; if set L(n) magnitude +
      * L(1) sign (1 = negative). 0 when absent. */
    def flaggedSigned(n: Int): Int =
      if (bool(128) == 0) 0
      else {
        val mag = literal(n)
        if (bool(128) == 1) -mag else mag
      }
  }

  /** RFC 6386 §7.3 bool encoder (fixture side): 32-bit `bottom` with
    * carry propagation into emitted bytes; the lazy flush appends 32
    * zero bools at p=128, forcing every pending byte out (the tail is
    * never decoded — header parsers stop at their last field). */
  final class BoolEncoder {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var range = 255
    private var bottom = 0L // bits 0..31 live; Long avoids sign traps
    private var bitCount = 24

    private def carry(): Unit = {
      var i = out.length - 1
      while (i >= 0 && out(i) == -1) { out(i) = 0; i -= 1 }
      require(i >= 0, "bool encoder carry out of the stream head")
      out(i) = (out(i) + 1).toByte
    }

    def bool(prob: Int, v: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (v != 0) { bottom += split; range -= split }
      else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & (1L << 31)) != 0) carry()
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          out += ((bottom >> 24) & 0xff).toByte
          bottom &= (1L << 24) - 1
          bitCount = 8
        }
      }
    }

    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, (v >> i) & 1); i -= 1 }
    }

    def flaggedSigned(v: Int, n: Int): Unit =
      if (v == 0) bool(128, 0)
      else {
        bool(128, 1); literal(math.abs(v), n)
        bool(128, if (v < 0) 1 else 0)
      }

    def result(): Array[Byte] = {
      var i = 0
      while (i < 32) { bool(128, 0); i += 1 } // lazy flush
      out.toArray
    }
  }

  /** Parse a VP8 chunk payload (b[off, off+len)) as a key frame;
    * None for interframes, bad start codes, or truncation. Walks the
    * segmentation and loop-filter-adjustment sub-headers (skipping
    * their values correctly is what lands the quant block at the
    * right bit position) and stops before the token-probability
    * updates. Total — never throws. */
  def keyFrameMeta(b: Array[Byte], off: Int, len: Int): Option[KeyFrameMeta] = {
    if (b == null || len < 10 || off < 0 || off.toLong + len > b.length)
      return None
    val tag = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16)
    if ((tag & 1) != 0) return None // interframe
    val version = (tag >> 1) & 7
    val show = ((tag >> 4) & 1) == 1
    val firstPartSize = tag >> 5
    if ((b(off + 3) & 0xff) != 0x9d || (b(off + 4) & 0xff) != 0x01 ||
      (b(off + 5) & 0xff) != 0x2a) return None
    val wCode = (b(off + 6) & 0xff) | ((b(off + 7) & 0xff) << 8)
    val hCode = (b(off + 8) & 0xff) | ((b(off + 9) & 0xff) << 8)
    val w = wCode & 0x3fff; val h = hCode & 0x3fff
    if (w == 0 || h == 0) return None
    val partStart = off + 10
    if (firstPartSize < 0 || partStart.toLong + firstPartSize > off + len)
      return None
    val d = new BoolDecoder(b, partStart, partStart + firstPartSize)
    val colorSpace = d.bool(128)
    val clampingType = d.bool(128)
    if (d.bool(128) == 1) { // segmentation_enabled
      val updateMap = d.bool(128)
      val updateData = d.bool(128)
      if (updateData == 1) {
        d.bool(128) // segment_feature_mode
        var i = 0
        while (i < 4) { d.flaggedSigned(7); i += 1 } // quantizer
        i = 0
        while (i < 4) { d.flaggedSigned(6); i += 1 } // loop filter
      }
      if (updateMap == 1) {
        var i = 0
        while (i < 3) { if (d.bool(128) == 1) d.literal(8); i += 1 }
      }
    }
    val filterType = d.bool(128)
    val filterLevel = d.literal(6)
    val sharpness = d.literal(3)
    if (d.bool(128) == 1) { // loop_filter_adj_enable
      if (d.bool(128) == 1) { // mode_ref_lf_delta_update
        var i = 0
        while (i < 8) { d.flaggedSigned(6); i += 1 }
      }
    }
    val log2Parts = d.literal(2)
    val yAcQi = d.literal(7)
    val yDc = d.flaggedSigned(4)
    val y2Dc = d.flaggedSigned(4)
    val y2Ac = d.flaggedSigned(4)
    val uvDc = d.flaggedSigned(4)
    val uvAc = d.flaggedSigned(4)
    // refresh_entropy_probs would follow; token prob updates are the
    // envelope boundary
    Some(KeyFrameMeta(w, h, wCode >> 14, hCode >> 14, version, show,
      colorSpace, clampingType, filterType, filterLevel, sharpness,
      1 << log2Parts, yAcQi, yDc, y2Dc, y2Ac, uvDc, uvAc))
  }

  /** Fixture builder: a syntactically-valid VP8 key-frame chunk
    * payload carrying exactly the planted header fields (first
    * partition = the bool-coded header; no macroblock data — the
    * metadata layer never reads past it). Optional segmentation and
    * loop-filter-adjustment sub-headers exercise the parser's walk. */
  def buildKeyFrameHeader(w: Int, h: Int, version: Int,
      filterType: Int, filterLevel: Int, sharpness: Int,
      log2Parts: Int, yAcQi: Int, yDcDelta: Int, uvAcDelta: Int,
      withSegmentation: Boolean, withLfAdjust: Boolean): Array[Byte] = {
    require(w >= 1 && w <= 0x3fff && h >= 1 && h <= 0x3fff, "dims")
    require(yAcQi >= 0 && yAcQi < 128 && filterLevel >= 0 &&
      filterLevel < 64, "ranges")
    val e = new BoolEncoder
    e.bool(128, 0) // color_space
    e.bool(128, 0) // clamping_type
    if (withSegmentation) {
      e.bool(128, 1) // segmentation_enabled
      e.bool(128, 1) // update_mb_segmentation_map
      e.bool(128, 1) // update_segment_feature_data
      e.bool(128, 0) // segment_feature_mode
      (0 until 4).foreach(i => e.flaggedSigned(if (i % 2 == 0) 10 else 0, 7))
      (0 until 4).foreach(i => e.flaggedSigned(if (i == 1) -3 else 0, 6))
      (0 until 3).foreach { i =>
        e.bool(128, 1); e.literal(100 + i, 8)
      }
    } else e.bool(128, 0)
    e.bool(128, filterType)
    e.literal(filterLevel, 6)
    e.literal(sharpness, 3)
    if (withLfAdjust) {
      e.bool(128, 1); e.bool(128, 1)
      (0 until 8).foreach(i => e.flaggedSigned(if (i % 3 == 0) 5 else 0, 6))
    } else e.bool(128, 0)
    e.literal(log2Parts, 2)
    e.literal(yAcQi, 7)
    e.flaggedSigned(yDcDelta, 4)
    e.flaggedSigned(0, 4) // y2_dc
    e.flaggedSigned(0, 4) // y2_ac
    e.flaggedSigned(0, 4) // uv_dc
    e.flaggedSigned(uvAcDelta, 4)
    e.bool(128, 1) // refresh_entropy_probs
    val part = e.result()
    val out = new java.io.ByteArrayOutputStream()
    val tag = (part.length << 5) | (1 << 4) | ((version & 7) << 1) // key frame
    out.write(tag & 0xff); out.write((tag >> 8) & 0xff)
    out.write((tag >> 16) & 0xff)
    out.write(0x9d); out.write(0x01); out.write(0x2a)
    out.write(w & 0xff); out.write((w >> 8) & 0x3f)
    out.write(h & 0xff); out.write((h >> 8) & 0x3f)
    out.write(part)
    out.toByteArray
  }
}
