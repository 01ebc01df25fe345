package graft.functions

import scala.collection.mutable

/** From-scratch GIF and WebP-VP8L codecs — the two web image formats the
  * dHash family ([[graft.operators.Multimodal.dhashFromPixels]]) was
  * missing: without them, a large share of real crawled images is
  * invisible to cross-format image dedup. Same house rules as the
  * PNG/JPEG decoders in Multimodal: decoders are total functions
  * (None on anything outside the documented envelope, never a throw),
  * encoders exist to build exact-decode fixtures, and everything is
  * integer arithmetic a DuckDB oracle can replay in closed form.
  *
  * GIF (GIF87a/89a, CompuServe spec + RFC-adjacent common practice):
  * first image frame only, global or local palette, interlace
  * supported; animation/later frames ignored (the dedup hash wants the
  * poster frame). Decode returns interleaved RGB.
  *
  * WebP VP8L (the lossless WebP bitstream, Alakuijala & Koivisto,
  * "WebP Lossless Bitstream Specification", 2012): support envelope is
  * the no-color-cache, single-meta-group stream with the
  * subtract-green transform (the other three transforms → None);
  * literals AND LZ77 backward references decode. Both the simple
  * (1–2 symbol) and normal (code-length-coded) prefix-code forms are
  * implemented; codes walk root-first, the DEFLATE/libwebp convention.
  * Decode returns interleaved RGBA. Lossy VP8 → None (different codec
  * entirely).
  */
object ImageCodecs {

  // ------------------------------------------------------------------ GIF

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Decode the first frame of a GIF to (w, h, 3, interleaved RGB).
    * None outside the envelope (malformed header, missing palette,
    * corrupt LZW, unbounded dims). */
  def gifDecode(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (b == null || b.length < 14) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val gFlags = b(10) & 0xff
    var i = 13
    var gct: Array[Byte] = null
    if ((gFlags & 0x80) != 0) {
      val n = 2 << (gFlags & 7)
      if (i + 3 * n > b.length) return None
      gct = java.util.Arrays.copyOfRange(b, i, i + 3 * n)
      i += 3 * n
    }
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x3B => return None // trailer before any image
        case 0x21 => // extension: label then sub-blocks
          i += 2
          while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
          i += 1
        case 0x2C =>
          if (i + 10 > b.length) return None
          val iw = u16le(b, i + 5); val ih = u16le(b, i + 7)
          val iFlags = b(i + 9) & 0xff
          i += 10
          var pal = gct
          if ((iFlags & 0x80) != 0) {
            val n = 2 << (iFlags & 7)
            if (i + 3 * n > b.length) return None
            pal = java.util.Arrays.copyOfRange(b, i, i + 3 * n)
            i += 3 * n
          }
          if (pal == null || iw <= 0 || ih <= 0 ||
            iw.toLong * ih * 3 >= (1L << 28)) return None
          if (i >= b.length) return None
          val lzwMin = b(i) & 0xff
          if (lzwMin < 2 || lzwMin > 11) return None
          i += 1
          val data = new java.io.ByteArrayOutputStream()
          while (i < b.length && (b(i) & 0xff) != 0) {
            val n = b(i) & 0xff
            if (i + 1 + n > b.length) return None
            data.write(b, i + 1, n)
            i += 1 + n
          }
          val idx = lzwDecode(lzwMin, data.toByteArray, iw * ih)
            .getOrElse(return None)
          if (idx.length < iw * ih) return None
          val palN = pal.length / 3
          val out = new Array[Byte](iw * ih * 3)
          val interlaced = (iFlags & 0x40) != 0
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(ih)(identity)
            else {
              val o = new Array[Int](ih); var k = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- start until ih by step) { o(k) = y; k += 1 }
              o
            }
          var src = 0
          rowOrder.foreach { y =>
            var x = 0
            while (x < iw) {
              val p = idx(src) & 0xff
              if (p >= palN) return None
              val d = (y * iw + x) * 3
              out(d) = pal(p * 3); out(d + 1) = pal(p * 3 + 1)
              out(d + 2) = pal(p * 3 + 2)
              src += 1; x += 1
            }
          }
          return Some((iw, ih, 3, out))
        case _ => return None
      }
    }
    None
  }

  /** GIF container metadata — the ANIMATION fields [[gifDecode]]'s
    * poster-frame contract ignores: logical-screen dims, frame count,
    * per-frame Graphic Control delays summed to a total duration
    * (centiseconds), and the Netscape loop count (0 = forever; -1 when
    * the extension is absent — a still or single-play file). The walk
    * skips LZW data block-wise (no pixel decode — O(blocks), not
    * O(pixels)). None for non-GIF / walks that derail. */
  final case class GifMeta(width: Int, height: Int, frames: Int,
      animated: Boolean, totalDelayCs: Long, loopCount: Int)

  def gifMeta(b: Array[Byte]): Option[GifMeta] = {
    if (b == null || b.length < 14) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = u16le(b, 6); val h = u16le(b, 8)
    val gFlags = b(10) & 0xff
    var i = 13
    if ((gFlags & 0x80) != 0) {
      val n = 2 << (gFlags & 7)
      if (i + 3L * n > b.length) return None
      i += 3 * n
    }
    var frames = 0
    var totalDelay = 0L
    var loop = -1
    def skipSubBlocks(start: Int): Int = {
      var j = start
      while (j < b.length && (b(j) & 0xff) != 0) {
        val n = b(j) & 0xff
        if (j + 1L + n > b.length) return -1
        j += 1 + n
      }
      if (j >= b.length) -1 else j + 1
    }
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x3B => // trailer
          if (frames == 0) return None
          return Some(GifMeta(w, h, frames, frames > 1, totalDelay, loop))
        case 0x21 => // extension
          if (i + 2 > b.length) return None
          val label = b(i + 1) & 0xff
          if (label == 0xF9 && i + 7 < b.length && (b(i + 2) & 0xff) >= 4)
            totalDelay += u16le(b, i + 4) // GCE delay in centiseconds
          if (label == 0xFF && i + 13 < b.length &&
            (b(i + 2) & 0xff) == 11 &&
            new String(b, i + 3, 11, "US-ASCII") == "NETSCAPE2.0") {
            // app data sub-block: 0x03 0x01 <loop u16le>
            val d = i + 14
            if (d + 3 < b.length && (b(d) & 0xff) >= 3 &&
              (b(d + 1) & 0xff) == 1)
              loop = u16le(b, d + 2)
          }
          val next = skipSubBlocks(i + 2)
          if (next < 0) return None
          i = next
        case 0x2C => // image descriptor
          if (i + 10 > b.length) return None
          val iFlags = b(i + 9) & 0xff
          var j = i + 10
          if ((iFlags & 0x80) != 0) {
            val n = 2 << (iFlags & 7)
            if (j + 3L * n > b.length) return None
            j += 3 * n
          }
          if (j >= b.length) return None
          j += 1 // LZW minimum code size
          val next = skipSubBlocks(j)
          if (next < 0) return None
          frames += 1
          i = next
        case _ => return None
      }
    }
    None // ran out before the trailer
  }

  /** Fixture builder: an animated GIF whose N frames are 1×1
    * sub-images (no real pixel payloads needed for the metadata walk)
    * with per-frame Graphic Control delays; `loop ≥ 0` plants the
    * Netscape extension. */
  def gifAnimBytes(w: Int, h: Int, delaysCs: Seq[Int],
      loop: Int = -1): Array[Byte] = {
    require(w >= 1 && h >= 1 && delaysCs.nonEmpty, "anim shape")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80) // GCT, 2 entries
    out.write(0); out.write(0)
    out.write(0); out.write(0); out.write(0) // color 0 black
    out.write(255); out.write(255); out.write(255)
    if (loop >= 0) {
      out.write(0x21); out.write(0xFF); out.write(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      out.write(3); out.write(1)
      out.write(loop & 0xff); out.write((loop >> 8) & 0xff)
      out.write(0)
    }
    delaysCs.foreach { d =>
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0) // disposal/flags
      out.write(d & 0xff); out.write((d >> 8) & 0xff)
      out.write(0) // no transparent index
      out.write(0) // terminator
      out.write(0x2C)
      out.write(0); out.write(0); out.write(0); out.write(0) // at (0,0)
      out.write(1); out.write(0); out.write(1); out.write(0) // 1x1
      out.write(0) // no LCT
      out.write(2) // LZW min code size
      // 1 pixel at 3-bit codes, LSB-first packing: clear(4) index(0)
      // EOI(5) -> bytes 0x44, 0x01
      out.write(2); out.write(0x44); out.write(0x01)
      out.write(0) // block terminator
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** GIF-variant LZW decode: variable code width from `min`+1 up to 12
    * bits, CLEAR resets, the shared add-then-maybe-widen rule (dict
    * size hitting 1<<width widens; at 4096 the dict freezes). */
  private def lzwDecode(min: Int, data: Array[Byte],
      maxPixels: Int): Option[Array[Byte]] = {
    val clear = 1 << min; val eoi = clear + 1
    var codeSize = min + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = eoi + 1
    var prev = -1
    val out = new java.io.ByteArrayOutputStream(maxPixels)
    var acc = 0L; var nbits = 0; var pos = 0
    def next(): Int = {
      while (nbits < codeSize && pos < data.length) {
        acc |= (data(pos) & 0xffL) << nbits; nbits += 8; pos += 1
      }
      if (nbits < codeSize) -1
      else {
        val c = (acc & ((1 << codeSize) - 1)).toInt
        acc >>>= codeSize; nbits -= codeSize; c
      }
    }
    // expand a code to bytes (root literal first)
    val stack = new Array[Byte](4097)
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= eoi + 1) c = prefix(c)
      c.toByte
    }
    def write(code: Int, extra: Int): Boolean = {
      var c = code; var top = 0
      while (c >= eoi + 1) {
        if (top >= stack.length) return false
        stack(top) = suffix(c); top += 1; c = prefix(c)
      }
      out.write(c)
      while (top > 0) { top -= 1; out.write(stack(top)) }
      if (extra >= 0) out.write(extra)
      true
    }
    var done = false
    while (!done && out.size < maxPixels) {
      val c = next()
      if (c < 0) return None // truncated before enough pixels
      else if (c == clear) {
        codeSize = min + 1; dictSize = eoi + 1; prev = -1
      } else if (c == eoi) done = true
      else if (prev < 0) {
        if (c >= clear) return None
        out.write(c); prev = c
      } else {
        val known = c < dictSize
        if (!known && c != dictSize) return None
        val newSuffix =
          if (known) firstByte(c) else firstByte(prev)
        if (known) { if (!write(c, -1)) return None }
        else { if (!write(prev, newSuffix & 0xff)) return None }
        if (dictSize < 4096) {
          prefix(dictSize) = prev; suffix(dictSize) = newSuffix
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = c
      }
    }
    Some(out.toByteArray)
  }

  /** Encode interleaved RGB as a single-frame non-interlaced GIF89a
    * with a global palette (first-appearance order; ≤256 distinct
    * colors required — refuse otherwise: GIF is palettized and an
    * inexact quantization would break exact-decode fixtures). Real LZW
    * (longest-match dict) mirroring [[lzwDecode]]'s widen rule. */
  def gifEncode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"bad pixel buffer: ${w}x$h vs ${rgb.length}")
    val colorIdx = mutable.LinkedHashMap.empty[Int, Int]
    val indices = new Array[Byte](w * h)
    var p = 0
    while (p < w * h) {
      val c = ((rgb(p * 3) & 0xff) << 16) | ((rgb(p * 3 + 1) & 0xff) << 8) |
        (rgb(p * 3 + 2) & 0xff)
      val ix = colorIdx.getOrElseUpdate(c, colorIdx.size)
      require(ix < 256, "gifEncode: more than 256 distinct colors")
      indices(p) = ix.toByte
      p += 1
    }
    var palBits = 1
    while ((2 << (palBits - 1)) < colorIdx.size) palBits += 1 // 2^palBits >= n
    val palN = 1 << palBits
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | (palBits - 1)) // GCT present, size bits
    out.write(0); out.write(0)      // bg index, aspect
    val pal = colorIdx.keys.toArray
    (0 until palN).foreach { i =>
      val c = if (i < pal.length) pal(i) else 0
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff)
      out.write(c & 0xff)
    }
    out.write(0x2C)
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0) // no LCT, no interlace
    val min = math.max(2, palBits)
    out.write(min)
    // LZW encode
    val clear = 1 << min; val eoi = clear + 1
    var codeSize = min + 1
    val dict = mutable.HashMap.empty[(Int, Int), Int] // (prefixCode, byte)
    var nextCode = eoi + 1
    val body = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << nbits; nbits += codeSize
      while (nbits >= 8) { body.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    emit(clear)
    var cur = indices(0) & 0xff
    p = 1
    while (p < indices.length) {
      val k = indices(p) & 0xff
      dict.get((cur, k)) match {
        case Some(code) => cur = code
        case None =>
          emit(cur)
          if (nextCode < 4096) {
            dict((cur, k)) = nextCode
            // widen when the JUST-ASSIGNED code hits 1<<codeSize — the
            // decoder mirrors this exactly one code later because its
            // add for entry m happens while reading code m+1
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
            nextCode += 1
          }
          cur = k
      }
      p += 1
    }
    emit(cur)
    emit(eoi)
    if (nbits > 0) body.write((acc & 0xff).toInt)
    val bb = body.toByteArray
    var off = 0
    while (off < bb.length) {
      val n = math.min(255, bb.length - off)
      out.write(n); out.write(bb, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  // ----------------------------------------------------------- VP8L bits

  /** `limit` bounds the readable bytes to the owning chunk's end — a
    * truncated VP8L payload followed by trailing RIFF chunks must set
    * `truncated`, not silently consume the next chunk's bytes as
    * bitstream. */
  private final class BitReader(b: Array[Byte], var pos: Int,
      limit: Int) {
    def this(b: Array[Byte], pos: Int) = this(b, pos, b.length)
    private val end = math.min(limit, b.length)
    private var acc = 0L
    private var nbits = 0
    var truncated = false
    def bit(): Int = bits(1)
    def bits(n: Int): Int = {
      while (nbits < n) {
        if (pos >= end) { truncated = true; return 0 }
        acc |= (b(pos) & 0xffL) << nbits; nbits += 8; pos += 1
      }
      val v = (acc & ((1L << n) - 1)).toInt
      acc >>>= n; nbits -= n
      v
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def bits(v: Int, n: Int): Unit = {
      acc |= (v.toLong & ((1L << n) - 1)) << nbits; nbits += n
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    def result(): Array[Byte] = {
      if (nbits > 0) { out.write((acc & 0xff).toInt); acc = 0; nbits = 0 }
      out.toByteArray
    }
  }

  /** Canonical prefix-code decoder: walk root-first one bit at a time
    * (depth ≤ 15, alphabet ≤ 280 — a flat walk is plenty and has no
    * table-build edge cases). Built from code lengths exactly like
    * DEFLATE: codes assigned in (length, symbol) order. */
  private final class PrefixDecoder(lengths: Array[Int]) {
    // map (depth, code-so-far) -> symbol
    private val map = mutable.HashMap.empty[(Int, Int), Int]
    val singleSymbol: Int = {
      val nz = lengths.indices.filter(lengths(_) > 0)
      if (nz.length == 1) nz.head else -1
    }
    val valid: Boolean = {
      if (singleSymbol >= 0) true
      else {
        var code = 0
        var ok = lengths.exists(_ > 0)
        var kraft = 0L
        (1 to 15).foreach { len =>
          code <<= 1
          lengths.indices.foreach { s =>
            if (lengths(s) == len) {
              map((len, code)) = s
              code += 1
              kraft += 1L << (15 - len)
            }
          }
        }
        ok && kraft == (1L << 15) // complete code required
      }
    }
    def decode(r: BitReader): Int = {
      if (singleSymbol >= 0) return singleSymbol
      var code = 0; var len = 0
      while (len <= 15) {
        code = (code << 1) | r.bit()
        len += 1
        map.get((len, code)) match {
          case Some(s) => return s
          case None =>
        }
        if (r.truncated) return -1
      }
      -1
    }
  }

  /** Length-limited canonical Huffman code lengths (package-merge),
    * deterministic: ties resolve by symbol index. Zero-count symbols
    * get length 0. A single used symbol gets length 1 caller-side
    * handling (VP8L's simple-code form). */
  private[functions] def packageMerge(freq: Array[Long], limit: Int): Array[Int] = {
    val used = freq.indices.filter(freq(_) > 0)
    val lengths = new Array[Int](freq.length)
    if (used.isEmpty) return lengths
    if (used.length == 1) { lengths(used.head) = 1; return lengths }
    // package-merge over (weight, symbol-set) items
    type Item = (Long, List[Int])
    val leaves: Seq[Item] =
      used.map(s => (freq(s), List(s))).sortBy(x => (x._1, x._2.head))
    var pkg: Seq[Item] = Seq.empty
    (1 to limit).foreach { _ =>
      val merged = (pkg ++ leaves).sortBy(x => (x._1, x._2.headOption.getOrElse(-1)))
      pkg = merged.grouped(2).collect {
        case Seq((w1, s1), (w2, s2)) => (w1 + w2, s1 ++ s2)
      }.toSeq
    }
    // count: each symbol's length = number of times it appears in the
    // first 2*(n-1) packages of the final level's expansion
    val counts = new Array[Int](freq.length)
    def expand(items: Seq[Item], take: Int): Unit =
      items.take(take).foreach(_._2.foreach(s => counts(s) += 1))
    expand(pkg, used.length - 1)
    used.foreach(s => lengths(s) = counts(s))
    lengths
  }

  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val codes = new Array[Int](lengths.length)
    var code = 0
    (1 to 15).foreach { len =>
      code <<= 1
      lengths.indices.foreach { s =>
        if (lengths(s) == len) { codes(s) = code; code += 1 }
      }
    }
    codes
  }

  // package-merge as above counts SMALLEST weights most often — that
  // yields the DEEPEST codes for rare symbols, which is correct; the
  // expansion above implements the standard boundary package-merge.

  // Spec §4.1.1 / libwebp kCodeLengthCodeOrder: symbol 16 sits between
  // 5 and 6 — NOT last. Encoder and decoder share this table, so a
  // wrong order roundtrips against itself but misparses every
  // spec-compliant stream that declares >= 9 code-length symbols; the
  // spec-order interop fixture in ImageCodecsSpec pins it.
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** VP8L's 120-entry short-distance map (dx, dy), spec §4.2.2. */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (8, 3), (-8, 3), (5, 7), (-5, 7), (7, 5),
    (-7, 5), (8, 4), (3, 8), (-3, 8), (8, 5), (-8, 5), (6, 7), (-6, 7),
    (7, 6), (-7, 6))

  /** LZ77 length/distance prefix decoding (spec §4.2.1): code < 4 →
    * value code+1; else extra bits. */
  private def lz77Value(code: Int, r: BitReader): Int = {
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + r.bits(extra) + 1
    }
  }

  /** Read one prefix code (simple or normal form) for `alphabetSize`. */
  private def readPrefixCode(r: BitReader, alphabetSize: Int)
      : Option[PrefixDecoder] = {
    val lengths = new Array[Int](alphabetSize)
    if (r.bit() == 1) { // simple
      val numSymbols = r.bit() + 1
      val firstWide = r.bit() == 1
      val s0 = if (firstWide) r.bits(8) else r.bit()
      if (s0 >= alphabetSize) return None
      lengths(s0) = 1
      if (numSymbols == 2) {
        val s1 = r.bits(8)
        if (s1 >= alphabetSize || s1 == s0) return None
        lengths(s1) = 1
      } else {
        // one symbol: the decoder emits it consuming zero bits
        return Some(new PrefixDecoder(lengths))
      }
      val d = new PrefixDecoder(lengths)
      if (!d.valid) None else Some(d)
    } else { // normal: code-length code
      val numCl = 4 + r.bits(4)
      if (numCl > ClOrder.length) return None
      val clLengths = new Array[Int](19)
      (0 until numCl).foreach(i => clLengths(ClOrder(i)) = r.bits(3))
      val clDec = new PrefixDecoder(clLengths)
      if (!clDec.valid) return None
      var maxSymbol = alphabetSize
      if (r.bit() == 1) {
        val lenNBits = 2 + 2 * r.bits(3)
        maxSymbol = 2 + r.bits(lenNBits)
        if (maxSymbol > alphabetSize) return None
      }
      var s = 0
      var prevNz = 8
      while (s < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clDec.decode(r)
        if (cl < 0 || r.truncated) return None
        cl match {
          case c if c < 16 =>
            lengths(s) = c; s += 1
            if (c != 0) prevNz = c
          case 16 =>
            val rep = 3 + r.bits(2)
            (0 until rep).foreach { _ =>
              if (s < alphabetSize) { lengths(s) = prevNz; s += 1 }
            }
          case 17 => s += 3 + r.bits(3)
          case 18 => s += 11 + r.bits(7)
          case _ => return None
        }
      }
      if (s > alphabetSize) return None
      val d = new PrefixDecoder(lengths)
      if (!d.valid) None else Some(d)
    }
  }

  /** ceil(size / 2^bits) — the spec's DIV_ROUND_UP for transform
    * sub-image dimensions. */
  private def subSampleSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** The three transforms inside the decode envelope, held in REVERSE
    * bitstream-read order so a plain foreach applies the inverses the
    * way the spec demands (last-read inverted first). */
  private sealed trait Vp8lTransform
  private case object SubtractGreenT extends Vp8lTransform
  private final case class PredictorT(sizeBits: Int, modes: Array[Int])
    extends Vp8lTransform
  private final case class ColorT(sizeBits: Int, ctes: Array[Int])
    extends Vp8lTransform

  /** One spatially-coded image stream (spec §5 DecodeImageStream minus
    * the meta-prefix recursion): optional color cache (1..11 bits),
    * five prefix codes, literals + LZ77 backrefs + cache hits. Used for
    * the main image (isLevel0, which also owns the meta-prefix bit we
    * refuse) and for transform sub-images. Returns ARGB words. */
  private def decodeImageStream(r: BitReader, w: Int, h: Int,
      isLevel0: Boolean): Option[Array[Int]] = {
    var cacheBits = 0
    if (r.bit() == 1) {
      cacheBits = r.bits(4)
      if (cacheBits < 1 || cacheBits > 11) return None
    }
    if (isLevel0 && r.bit() == 1) return None // meta prefix out of envelope
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = new Array[Int](cacheSize)
    val green = readPrefixCode(r, 256 + 24 + cacheSize).getOrElse(return None)
    val red = readPrefixCode(r, 256).getOrElse(return None)
    val blue = readPrefixCode(r, 256).getOrElse(return None)
    val alpha = readPrefixCode(r, 256).getOrElse(return None)
    val dist = readPrefixCode(r, 40).getOrElse(return None)
    val n = w * h
    val px = new Array[Int](n)
    // spec §4.4: hash is uint32 wrap-around multiply then a top-bit shift
    def insert(v: Int): Unit =
      if (cacheBits > 0) cache((0x1e35a7bd * v) >>> (32 - cacheBits)) = v
    var p = 0
    while (p < n) {
      val g = green.decode(r)
      if (g < 0 || r.truncated) return None
      if (g < 256) {
        val rr = red.decode(r); val bb = blue.decode(r)
        val aa = alpha.decode(r)
        if (rr < 0 || bb < 0 || aa < 0 || r.truncated) return None
        px(p) = (aa << 24) | (rr << 16) | (g << 8) | bb
        insert(px(p))
        p += 1
      } else if (g < 280) {
        val length = lz77Value(g - 256, r)
        val dcode = dist.decode(r)
        if (dcode < 0 || r.truncated) return None
        val dval = lz77Value(dcode, r)
        val distance =
          if (dval > 120) dval - 120
          else {
            val (dx, dy) = DistMap(dval - 1)
            math.max(1, dy * w + dx)
          }
        if (distance > p || p + length > n) return None
        var k = 0
        while (k < length) {
          px(p) = px(p - distance); insert(px(p)); p += 1; k += 1
        }
      } else { // color-cache hit
        val idx = g - 280
        if (idx >= cacheSize) return None
        px(p) = cache(idx)
        p += 1
      }
    }
    if (r.truncated) None else Some(px)
  }

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2 without cross-channel carry
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Spec §4.2.2 predictor modes over (L, T, TL, TR). Border handling
    * lives in the caller. */
  private def predictPixel(mode: Int, l: Int, t: Int, tl: Int,
      tr: Int): Int = mode match {
    case 0 => 0xff000000
    case 1 => l
    case 2 => t
    case 3 => tr
    case 4 => tl
    case 5 => avg2(avg2(l, tr), t)
    case 6 => avg2(l, tl)
    case 7 => avg2(l, t)
    case 8 => avg2(tl, t)
    case 9 => avg2(t, tr)
    case 10 => avg2(avg2(l, tl), avg2(t, tr))
    case 11 => // Select: Manhattan-closer of L and T to the gradient
      var pl = 0; var pt = 0
      var sh = 0
      while (sh < 32) {
        val cl = (l >>> sh) & 0xff; val ct = (t >>> sh) & 0xff
        val ctl = (tl >>> sh) & 0xff
        val pc = cl + ct - ctl
        pl += math.abs(pc - cl); pt += math.abs(pc - ct)
        sh += 8
      }
      if (pl < pt) l else t
    case 12 => // ClampAddSubtractFull
      var out = 0; var sh = 0
      while (sh < 32) {
        val v = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) -
          ((tl >>> sh) & 0xff))
        out |= v << sh; sh += 8
      }
      out
    case _ => // 13: ClampAddSubtractHalf
      var out = 0; var sh = 0
      while (sh < 32) {
        val a = (((l >>> sh) & 0xff) + ((t >>> sh) & 0xff)) / 2
        val v = clamp255(a + (a - ((tl >>> sh) & 0xff)) / 2)
        out |= v << sh; sh += 8
      }
      out
  }

  /** Per-channel mod-256 add — residual + prediction. */
  private def addPixels(a: Int, b: Int): Int = {
    val ag = (a & 0xff00ff00) >>> 8; val bg = (b & 0xff00ff00) >>> 8
    val rb = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    val g = (((ag + bg) & 0x00ff00ff) << 8)
    rb | g
  }

  /** Per-channel mod-256 subtract — the encoder's forward residual. */
  private def subPixels(a: Int, b: Int): Int = {
    val arb = a & 0x00ff00ff; val brb = b & 0x00ff00ff
    val ag = (a >>> 8) & 0x00ff00ff; val bg = (b >>> 8) & 0x00ff00ff
    val rb = ((arb | 0x01000100) - brb) & 0x00ff00ff
    val g = (((ag | 0x01000100) - bg) & 0x00ff00ff) << 8
    rb | g
  }

  /** In-place inverse predictor transform (spec §4.2.2): px holds
    * residuals on entry, reconstructed pixels on exit. Border rules:
    * (0,0) → black, top row → L, left column → T; the TR of a
    * rightmost-column pixel is the leftmost pixel of the SAME row.
    * Unknown predictor modes (>13) refuse. */
  private def inversePredictor(px: Array[Int], w: Int, h: Int,
      sizeBits: Int, modes: Array[Int]): Boolean = {
    val mw = subSampleSize(w, sizeBits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(p - 1)
          else if (x == 0) px(p - w)
          else {
            val mode = (modes((y >> sizeBits) * mw + (x >> sizeBits)) >> 8) & 0xff
            if (mode > 13) return false
            val tr = if (x == w - 1) px(y * w) else px(p - w + 1)
            predictPixel(mode, px(p - 1), px(p - w), px(p - w - 1), tr)
          }
        px(p) = addPixels(px(p), pred)
        x += 1
      }
      y += 1
    }
    true
  }

  /** Signed 3.5 fixed-point color-transform delta (spec §4.2.3):
    * both multiplier and channel value are SIGNED 8-bit. */
  private def cteDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  /** In-place inverse cross-color transform: per block, the transform
    * element pixel packs red_to_blue | green_to_blue | green_to_red in
    * its R | G | B channels; inversion first recovers red (it feeds the
    * blue delta). */
  private def inverseColorTransform(px: Array[Int], w: Int, h: Int,
      sizeBits: Int, ctes: Array[Int]): Unit = {
    val mw = subSampleSize(w, sizeBits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = y * w + x
        val cte = ctes((y >> sizeBits) * mw + (x >> sizeBits))
        val g2r = cte & 0xff
        val g2b = (cte >> 8) & 0xff
        val r2b = (cte >> 16) & 0xff
        val v = px(p)
        val g = (v >> 8) & 0xff
        val r = ((v >> 16) & 0xff) + cteDelta(g2r, g)
        val rr = r & 0xff
        val bb = ((v & 0xff) + cteDelta(g2b, g) + cteDelta(r2b, rr)) & 0xff
        px(p) = (v & 0xff00ff00) | (rr << 16) | bb
        x += 1
      }
      y += 1
    }
  }

  /** In-place inverse subtract-green: add green back to red and blue. */
  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var p = 0
    while (p < px.length) {
      val v = px(p)
      val g = (v >> 8) & 0xff
      val rr = (((v >> 16) & 0xff) + g) & 0xff
      val bb = ((v & 0xff) + g) & 0xff
      px(p) = (v & 0xff00ff00) | (rr << 16) | bb
      p += 1
    }
  }

  /** Decode a WebP container holding a VP8L (lossless) stream to
    * (w, h, 4, interleaved RGBA). Envelope: color cache, LZ77,
    * subtract-green + predictor + cross-color transforms (spec §4.2),
    * the color-indexing (palette) transform with pixel bundling
    * (standalone — the form real palette images take), simple and
    * code-length-coded prefix codes. Still refused: palette COMBINED
    * with other transforms, meta prefix groups, and lossy VP8 (a
    * different codec entirely — see [[Vp8]] for its header layer) →
    * None. */
  def webpDecode(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (b == null || b.length < 20) return None
    if (new String(b, 0, 4, "US-ASCII") != "RIFF" ||
      new String(b, 8, 4, "US-ASCII") != "WEBP") return None
    // chunk walk to the VP8L payload
    var i = 12
    var payload: Option[(Int, Int)] = None
    while (payload.isEmpty && i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val sz = (b(i + 4) & 0xff) | ((b(i + 5) & 0xff) << 8) |
        ((b(i + 6) & 0xff) << 16) | ((b(i + 7) & 0xff) << 24)
      // bounds math in Long: a crafted size near Int.MaxValue would
      // overflow an Int compare, drive i negative and THROW — breaking
      // the decoder-totality contract on untrusted crawl payloads
      if (sz < 0 || i + 8L + sz > b.length) return None
      if (id == "VP8L") payload = Some((i + 8, sz))
      else i += 8 + sz + (sz & 1)
    }
    val (off, len) = payload.getOrElse(return None)
    if (len < 5 || (b(off) & 0xff) != 0x2f) return None
    // reader clamped to the chunk end: truncation inside VP8L must not
    // consume a following chunk's bytes as bitstream
    val r = new BitReader(b, off + 1, off + len)
    val w = r.bits(14) + 1
    val h = r.bits(14) + 1
    r.bit() // alpha hint
    if (r.bits(3) != 0) return None // version
    if (w.toLong * h * 4 >= (1L << 28)) return None
    var transforms = List.empty[Vp8lTransform] // prepend → reverse read order
    var seenTypes = Set.empty[Int]
    // color indexing: (widthBits, cumulative table) — it changes the
    // effective width the main image is READ at (pixel bundling), so
    // within this envelope it must be the only transform
    var indexing: Option[(Int, Array[Int])] = None
    while (r.bit() == 1) {
      val t = r.bits(2)
      if (seenTypes(t)) return None // each transform appears at most once
      seenTypes += t
      t match {
        case 0 =>
          val sizeBits = r.bits(3) + 2
          val img = decodeImageStream(r, subSampleSize(w, sizeBits),
            subSampleSize(h, sizeBits), isLevel0 = false)
            .getOrElse(return None)
          transforms ::= PredictorT(sizeBits, img)
        case 1 =>
          val sizeBits = r.bits(3) + 2
          val img = decodeImageStream(r, subSampleSize(w, sizeBits),
            subSampleSize(h, sizeBits), isLevel0 = false)
            .getOrElse(return None)
          transforms ::= ColorT(sizeBits, img)
        case 2 => transforms ::= SubtractGreenT
        case _ =>
          // spec §4.2.4: 1..256 entries, DELTA-coded as a width×1
          // entropy image (each entry adds to the previous, prev
          // starts at 0), small palettes bundle several pixel indices
          // per green byte
          val tableSize = r.bits(8) + 1
          val deltas = decodeImageStream(r, tableSize, 1,
            isLevel0 = false).getOrElse(return None)
          val table = new Array[Int](tableSize)
          var prev = 0
          var k = 0
          while (k < tableSize) {
            prev = addPixels(prev, deltas(k)); table(k) = prev; k += 1
          }
          val widthBits =
            if (tableSize <= 2) 3
            else if (tableSize <= 4) 2
            else if (tableSize <= 16) 1
            else 0
          indexing = Some((widthBits, table))
      }
      if (r.truncated) return None
    }
    if (indexing.isDefined && transforms.nonEmpty) return None
    val readW = indexing match {
      case Some((wb, _)) => subSampleSize(w, wb)
      case None => w
    }
    val px0 = decodeImageStream(r, readW, h, isLevel0 = true)
      .getOrElse(return None)
    val px = indexing match {
      case None =>
        transforms.foreach {
          case SubtractGreenT => inverseSubtractGreen(px0)
          case PredictorT(sb, img) =>
            if (!inversePredictor(px0, w, h, sb, img)) return None
          case ColorT(sb, img) => inverseColorTransform(px0, w, h, sb, img)
        }
        px0
      case Some((wb, table)) =>
        // unpack bundled indices (first sub-pixel in the LOWEST bits of
        // the green channel); out-of-range index → 0x00000000 per spec
        val bpp = 8 >> wb
        val mask = (1 << bpp) - 1
        val out = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val packed = (px0(y * readW + (x >> wb)) >> 8) & 0xff
            val idx = (packed >> ((x & ((1 << wb) - 1)) * bpp)) & mask
            out(y * w + x) = if (idx < table.length) table(idx) else 0
            x += 1
          }
          y += 1
        }
        out
    }
    val n = w * h
    val out = new Array[Byte](n * 4)
    var p = 0
    while (p < n) {
      val v = px(p)
      out(p * 4) = ((v >> 16) & 0xff).toByte
      out(p * 4 + 1) = ((v >> 8) & 0xff).toByte
      out(p * 4 + 2) = (v & 0xff).toByte
      out(p * 4 + 3) = ((v >>> 24) & 0xff).toByte
      p += 1
    }
    Some((w, h, 4, out))
  }

  /** One image stream for [[webpEncode]]: optional color cache,
    * per-channel canonical prefix codes (package-merge limited to 15;
    * simple form for ≤2-symbol channels with 8-bit-expressible
    * symbols), code lengths emitted plainly (no RLE), distance tree a
    * 1-symbol stub (literals + cache hits only, no LZ77 emission).
    * Shared by the main image and the transform sub-images. */
  private def encodeImageStream(bw: BitWriter, w: Int, h: Int,
      argb: Array[Int], cacheBits: Int, isLevel0: Boolean): Unit = {
    val n = w * h
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    if (cacheBits > 0) { bw.bits(1, 1); bw.bits(cacheBits, 4) }
    else bw.bits(0, 1)
    if (isLevel0) bw.bits(0, 1) // no meta prefix groups
    def cacheIx(v: Int): Int = (0x1e35a7bd * v) >>> (32 - cacheBits)
    // pass 1: symbol frequencies, simulating the decoder's cache state
    // (same zero-initialized array, same literal-insert rule) — a hit
    // against a never-written zero slot is still correct: the decoder's
    // slot holds the same zero
    val freqs = Array(new Array[Long](256 + 24 + cacheSize),
      new Array[Long](256), new Array[Long](256), new Array[Long](256))
    val cache = new Array[Int](cacheSize)
    var p = 0
    while (p < n) {
      val v = argb(p)
      if (cacheBits > 0 && cache(cacheIx(v)) == v)
        freqs(0)(280 + cacheIx(v)) += 1
      else {
        freqs(0)((v >> 8) & 0xff) += 1
        freqs(1)((v >> 16) & 0xff) += 1
        freqs(2)(v & 0xff) += 1
        freqs(3)((v >>> 24) & 0xff) += 1
        if (cacheBits > 0) cache(cacheIx(v)) = v
      }
      p += 1
    }
    val lens = freqs.map(f => packageMerge(f, 15))
    val codes = lens.map(canonicalCodes)
    def writeCode(ix: Int): Unit = {
      val used = freqs(ix).indices.filter(freqs(ix)(_) > 0)
      if (used.isEmpty) {
        // every pixel was a cache hit: this channel's tree is never
        // consulted, but the stream still must carry a valid code —
        // a 1-symbol simple form for symbol 0 (zero bits per use)
        bw.bits(1, 1); bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
        java.util.Arrays.fill(lens(ix), 0)
        return
      }
      if (used.length <= 2 && used.forall(_ < 256)) { // simple form
        bw.bits(1, 1)
        bw.bits(used.length - 1, 1)
        val s0 = used.head
        if (s0 <= 1) { bw.bits(0, 1); bw.bits(s0, 1) }
        else { bw.bits(1, 1); bw.bits(s0, 8) }
        if (used.length == 2) bw.bits(used(1), 8)
        // overwrite lengths so the emit stage matches the simple code
        java.util.Arrays.fill(lens(ix), 0)
        if (used.length == 1) lens(ix)(s0) = 0 // zero bits emitted
        else { lens(ix)(used.head) = 1; lens(ix)(used(1)) = 1 }
        val c = canonicalCodes(lens(ix))
        Array.copy(c, 0, codes(ix), 0, c.length)
      } else { // normal form, plain lengths via the cl code
        bw.bits(0, 1)
        val clFreq = new Array[Long](19)
        lens(ix).foreach(l => clFreq(l) += 1)
        val clLens = packageMerge(clFreq, 7)
        // single-cl-symbol codes must still be a valid prefix code for
        // the READER (it walks bits): give the lone symbol a 1-bit code
        // partner by bumping an unused zero... a complete 1-symbol cl
        // code cannot exist, so fall back to two symbols of length 1
        if (clFreq.count(_ > 0) == 1) {
          val lone = clLens.indices.find(clFreq(_) > 0).get
          val other = if (lone == 0) 1 else 0
          clLens(lone) = 1; clLens(other) = 1
        }
        val clCodes = canonicalCodes(clLens)
        val numCl = {
          var last = ClOrder.length
          while (last > 4 && clLens(ClOrder(last - 1)) == 0) last -= 1
          last
        }
        bw.bits(numCl - 4, 4)
        (0 until numCl).foreach(i => bw.bits(clLens(ClOrder(i)), 3))
        bw.bits(0, 1) // no max_symbol: a length for every alphabet slot
        // prefix codes go root-bit-first into the LSB-first stream
        lens(ix).foreach { l =>
          bw.bits(Integer.reverse(clCodes(l)) >>> (32 - clLens(l)), clLens(l))
        }
      }
    }
    writeCode(0); writeCode(1); writeCode(2); writeCode(3)
    // distance tree: 1-symbol stub (never used — no LZ77 emission)
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
    def emit(ix: Int, s: Int): Unit = bw.bits(
      Integer.reverse(codes(ix)(s)) >>> (32 - math.max(lens(ix)(s), 1)),
      lens(ix)(s))
    // pass 2: emission, replaying the identical cache evolution
    java.util.Arrays.fill(cache, 0)
    p = 0
    while (p < n) {
      val v = argb(p)
      if (cacheBits > 0 && cache(cacheIx(v)) == v) {
        val s = 280 + cacheIx(v)
        if (lens(0)(s) > 0) emit(0, s)
      } else {
        val gg = (v >> 8) & 0xff
        if (lens(0)(gg) > 0) emit(0, gg)
        val rr = (v >> 16) & 0xff
        if (lens(1)(rr) > 0) emit(1, rr)
        val bb = v & 0xff
        if (lens(2)(bb) > 0) emit(2, bb)
        val aa = (v >>> 24) & 0xff
        if (lens(3)(aa) > 0) emit(3, aa)
        if (cacheBits > 0) cache(cacheIx(v)) = v
      }
      p += 1
    }
  }

  /** Container-level WebP metadata — the layer that sees EVERY WebP,
    * including the lossy-VP8 majority whose pixels stay outside the
    * decode envelope: `kind` ∈ "lossless" | "lossy", frame dims from
    * the VP8L header or the VP8 key-frame header
    * ([[graft.functions.Vp8.keyFrameMeta]]), the VP8X extended-format
    * canvas when present, and the lossy header's curation fields
    * (quantizer index, loop-filter setup, partition count). None for
    * non-WebP payloads, interframes-as-stills, or malformed chunks. */
  final case class WebpMeta(kind: String, width: Int, height: Int,
      extended: Boolean, canvasW: Int, canvasH: Int,
      lossy: Option[Vp8.KeyFrameMeta],
      exif: Option[graft.functions.ExifImpl.Exif])

  def webpMeta(b: Array[Byte]): Option[WebpMeta] = {
    if (b == null || b.length < 20) return None
    if (new String(b, 0, 4, "US-ASCII") != "RIFF" ||
      new String(b, 8, 4, "US-ASCII") != "WEBP") return None
    var i = 12
    var extended = false
    var canvasW = -1; var canvasH = -1
    var frame: Option[(String, Int, Int, Option[Vp8.KeyFrameMeta])] = None
    var exif: Option[graft.functions.ExifImpl.Exif] = None
    // the EXIF chunk comes AFTER the frame chunk in the spec's layout,
    // so the walk covers the whole container
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val sz = (b(i + 4) & 0xff) | ((b(i + 5) & 0xff) << 8) |
        ((b(i + 6) & 0xff) << 16) | ((b(i + 7) & 0xff) << 24)
      if (sz < 0 || i + 8L + sz > b.length) return None
      id match {
        case "VP8X" if sz >= 10 =>
          extended = true
          val o = i + 8
          canvasW = 1 + ((b(o + 4) & 0xff) | ((b(o + 5) & 0xff) << 8) |
            ((b(o + 6) & 0xff) << 16))
          canvasH = 1 + ((b(o + 7) & 0xff) | ((b(o + 8) & 0xff) << 8) |
            ((b(o + 9) & 0xff) << 16))
        case "VP8L" if sz >= 5 && frame.isEmpty =>
          val o = i + 8
          if ((b(o) & 0xff) != 0x2f) return None
          val r = new BitReader(b, o + 1, o + sz)
          val w = r.bits(14) + 1
          val h = r.bits(14) + 1
          if (r.truncated) return None
          frame = Some(("lossless", w, h, None))
        case "VP8 " if frame.isEmpty =>
          val meta = Vp8.keyFrameMeta(b, i + 8, sz).getOrElse(return None)
          frame = Some(("lossy", meta.width, meta.height, Some(meta)))
        case "EXIF" if exif.isEmpty =>
          // payload is a TIFF stream, with or without the JPEG-style
          // "Exif\0\0" prefix (both occur in the wild)
          val o = i + 8
          val skip = if (sz >= 6 && b(o) == 'E' && b(o + 1) == 'x' &&
            b(o + 2) == 'i' && b(o + 3) == 'f' && b(o + 4) == 0 &&
            b(o + 5) == 0) 6 else 0
          exif = graft.functions.ExifImpl.parseTiffStream(
            b, o + skip, sz - skip)
        case _ =>
      }
      i += 8 + sz + (sz & 1)
    }
    frame.map { case (kind, w, h, lossy) =>
      WebpMeta(kind, w, h, extended, canvasW, canvasH, lossy, exif)
    }
  }

  /** GPS-PII scrub for WebP — [[graft.functions.ExifImpl.stripWithStatus]]'s
    * container sibling: EXIF (and XMP) chunks are removed by byte
    * surgery and the VP8X EXIF/XMP feature flags cleared; frame chunks
    * copy through untouched, so pixels decode identically. Statuses:
    * "scrubbed" | "clean" (walk completed, no metadata chunks) |
    * "not_webp" | "walk_failed" (chunk walk aborted — the payload may
    * still carry unreachable metadata: quarantine, returned
    * UNCHANGED). */
  def stripWebpExif(b: Array[Byte]): (Array[Byte], String) = {
    if (b == null || b.length < 20 ||
      new String(b, 0, 4, "US-ASCII") != "RIFF" ||
      new String(b, 8, 4, "US-ASCII") != "WEBP") return (b, "not_webp")
    val body = new java.io.ByteArrayOutputStream()
    var i = 12
    var changed = false
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val sz = (b(i + 4) & 0xff) | ((b(i + 5) & 0xff) << 8) |
        ((b(i + 6) & 0xff) << 16) | ((b(i + 7) & 0xff) << 24)
      if (sz < 0 || i + 8L + sz > b.length) return (b, "walk_failed")
      // the RIFF pad byte after an odd-sized FINAL chunk is often
      // omitted in the wild — clamp every copy to the bytes present
      // (the never-throws contract) and re-pad the rewrite ourselves
      val avail = (b.length - i - 8L - sz).min(sz & 1).toInt
      if (id == "EXIF" || id == "XMP ") changed = true
      else if (id == "VP8X" && sz >= 10) {
        body.write(b, i, 8)
        val flags = b(i + 8) & ~0x0c // clear EXIF (0x08) + XMP (0x04)
        body.write(flags)
        body.write(b, i + 9, sz - 1)
        if ((sz & 1) == 1) body.write(0)
      } else {
        body.write(b, i, 8 + sz + avail)
        if ((sz & 1) == 1 && avail == 0) body.write(0)
      }
      i += 8 + sz + (sz & 1)
    }
    if (!changed) return (b, "clean")
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val riffLen = 4 + body.size()
    Seq(riffLen, riffLen >> 8, riffLen >> 16, riffLen >> 24)
      .foreach(v => out.write(v & 0xff))
    out.write("WEBP".getBytes("US-ASCII"))
    body.writeTo(out)
    (out.toByteArray, "scrubbed")
  }

  /** RIFF/WEBP container wrap for fixture chunks (sizes + padding per
    * the spec). */
  def wrapWebp(chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    chunks.foreach { case (id, payload) =>
      require(id.length == 4, s"chunk id '$id'")
      body.write(id.getBytes("US-ASCII"))
      Seq(payload.length, payload.length >> 8, payload.length >> 16,
        payload.length >> 24).foreach(v => body.write(v & 0xff))
      body.write(payload)
      if ((payload.length & 1) == 1) body.write(0)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val riffLen = 4 + body.size()
    Seq(riffLen, riffLen >> 8, riffLen >> 16, riffLen >> 24)
      .foreach(v => out.write(v & 0xff))
    out.write("WEBP".getBytes("US-ASCII"))
    body.writeTo(out)
    out.toByteArray
  }

  /** VP8X chunk payload for [[wrapWebp]]: feature flags (EXIF = 0x08
    * when an EXIF chunk follows), the canvas dims minus one in 24-bit
    * little-endian. */
  def vp8xPayload(canvasW: Int, canvasH: Int,
      exifFlag: Boolean = false): Array[Byte] = {
    require(canvasW >= 1 && canvasH >= 1, "canvas dims")
    val o = new java.io.ByteArrayOutputStream()
    o.write(if (exifFlag) 0x08 else 0)
    o.write(0); o.write(0); o.write(0) // reserved
    val cw = canvasW - 1; val ch = canvasH - 1
    o.write(cw & 0xff); o.write((cw >> 8) & 0xff); o.write((cw >> 16) & 0xff)
    o.write(ch & 0xff); o.write((ch >> 8) & 0xff); o.write((ch >> 16) & 0xff)
    o.toByteArray
  }

  /** PALETTE (color-indexing) VP8L encoder for fixtures: requires
    * ≤ 256 distinct RGBA colors (first-appearance order — exact, no
    * quantization); the table is delta-coded per the spec (prev
    * starts at 0) and small palettes bundle 2/4/8 indices per green
    * byte. Exact decode by construction. */
  def webpEncodePalette(w: Int, h: Int, rgba: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgba.length == w * h * 4,
      s"bad pixel buffer: ${w}x$h vs ${rgba.length}")
    require(w <= (1 << 14) && h <= (1 << 14), "dims exceed VP8L's 14 bits")
    val n = w * h
    val argb = new Array[Int](n)
    var p = 0
    while (p < n) {
      argb(p) = ((rgba(p * 4 + 3) & 0xff) << 24) |
        ((rgba(p * 4) & 0xff) << 16) |
        ((rgba(p * 4 + 1) & 0xff) << 8) | (rgba(p * 4 + 2) & 0xff)
      p += 1
    }
    val colorIdx = mutable.LinkedHashMap.empty[Int, Int]
    val indices = new Array[Int](n)
    p = 0
    while (p < n) {
      val ix = colorIdx.getOrElseUpdate(argb(p), colorIdx.size)
      require(ix < 256, "webpEncodePalette: more than 256 distinct colors")
      indices(p) = ix
      p += 1
    }
    val table = colorIdx.keys.toArray
    val tableSize = table.length
    val deltas = new Array[Int](tableSize)
    var prev = 0
    var k = 0
    while (k < tableSize) {
      deltas(k) = subPixels(table(k), prev); prev = table(k); k += 1
    }
    val widthBits =
      if (tableSize <= 2) 3
      else if (tableSize <= 4) 2
      else if (tableSize <= 16) 1
      else 0
    val bpp = 8 >> widthBits
    val readW = subSampleSize(w, widthBits)
    val packed = new Array[Int](readW * h)
    var y = 0
    while (y < h) {
      var xp = 0
      while (xp < readW) {
        var g = 0
        var s = 0
        while (s < (1 << widthBits)) {
          val x = (xp << widthBits) + s
          if (x < w) g |= indices(y * w + x) << (s * bpp)
          s += 1
        }
        packed(y * readW + xp) = 0xff000000 | (g << 8)
        xp += 1
      }
      y += 1
    }
    val bw = new BitWriter
    bw.bits(w - 1, 14); bw.bits(h - 1, 14)
    bw.bits(0, 1) // no alpha hint
    bw.bits(0, 3) // version
    bw.bits(1, 1); bw.bits(3, 2) // color-indexing transform
    bw.bits(tableSize - 1, 8)
    encodeImageStream(bw, tableSize, 1, deltas, 0, isLevel0 = false)
    bw.bits(0, 1) // end of transforms
    encodeImageStream(bw, readW, h, packed, 0, isLevel0 = true)
    val payload = Array[Byte](0x2f.toByte) ++ bw.result()
    wrapWebp(Seq(("VP8L", payload)))
  }

  /** Encode interleaved RGBA as a literal-only, transform-free VP8L
    * WebP — the exact-decode fixture form. */
  def webpEncode(w: Int, h: Int, rgba: Array[Byte]): Array[Byte] =
    webpEncode(w, h, rgba, cacheBits = 0, predictor = false,
      colorTransform = false, subtractGreen = false)

  /** Transform-capable VP8L encoder for fixtures: optional color cache
    * (1..11 bits), subtract-green, cross-color (deterministic
    * per-block multipliers) and predictor transforms (block mode
    * cycles through all 14 spec predictors). Forward transforms apply
    * in subtract-green → cross-color → predictor order and the
    * bitstream lists them the same way, so the decoder's
    * reverse-read-order inversion reconstructs exactly. Exact decode by
    * construction — fixture material for the cross-format dedup gates. */
  def webpEncode(w: Int, h: Int, rgba: Array[Byte], cacheBits: Int,
      predictor: Boolean, colorTransform: Boolean,
      subtractGreen: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && rgba.length == w * h * 4,
      s"bad pixel buffer: ${w}x$h vs ${rgba.length}")
    require(w <= (1 << 14) && h <= (1 << 14), "dims exceed VP8L's 14 bits")
    require(cacheBits >= 0 && cacheBits <= 11, s"cacheBits $cacheBits")
    val n = w * h
    val argb = new Array[Int](n)
    var p = 0
    while (p < n) {
      argb(p) = ((rgba(p * 4 + 3) & 0xff) << 24) |
        ((rgba(p * 4) & 0xff) << 16) |
        ((rgba(p * 4 + 1) & 0xff) << 8) | (rgba(p * 4 + 2) & 0xff)
      p += 1
    }
    val bw = new BitWriter
    bw.bits(w - 1, 14); bw.bits(h - 1, 14)
    bw.bits(0, 1) // no alpha hint
    bw.bits(0, 3) // version
    if (subtractGreen) {
      bw.bits(1, 1); bw.bits(2, 2)
      p = 0
      while (p < n) {
        val v = argb(p); val g = (v >> 8) & 0xff
        val rr = (((v >> 16) & 0xff) - g) & 0xff
        val bb = ((v & 0xff) - g) & 0xff
        argb(p) = (v & 0xff00ff00) | (rr << 16) | bb
        p += 1
      }
    }
    if (colorTransform) {
      bw.bits(1, 1); bw.bits(1, 2)
      val sizeBits = 2
      bw.bits(sizeBits - 2, 3)
      val mw = subSampleSize(w, sizeBits); val mh = subSampleSize(h, sizeBits)
      val ctes = Array.tabulate(mw * mh) { bi =>
        0xff000000 | (((bi * 41 + 11) & 0xff) << 16) |
          (((bi * 29 + 7) & 0xff) << 8) | ((bi * 17 + 3) & 0xff)
      }
      encodeImageStream(bw, mw, mh, ctes, 0, isLevel0 = false)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val q = y * w + x
          val cte = ctes((y >> sizeBits) * mw + (x >> sizeBits))
          val v = argb(q)
          val g = (v >> 8) & 0xff; val r0 = (v >> 16) & 0xff
          val rr = (r0 - cteDelta(cte & 0xff, g)) & 0xff
          // forward blue delta uses the ORIGINAL red (the inverse adds
          // it back only after recovering red)
          val bb = ((v & 0xff) - cteDelta((cte >> 8) & 0xff, g) -
            cteDelta((cte >> 16) & 0xff, r0)) & 0xff
          argb(q) = (v & 0xff00ff00) | (rr << 16) | bb
          x += 1
        }
        y += 1
      }
    }
    if (predictor) {
      bw.bits(1, 1); bw.bits(0, 2)
      val sizeBits = 2
      bw.bits(sizeBits - 2, 3)
      val mw = subSampleSize(w, sizeBits); val mh = subSampleSize(h, sizeBits)
      val modes = Array.tabulate(mw * mh)(bi => 0xff000000 | ((bi % 14) << 8))
      encodeImageStream(bw, mw, mh, modes, 0, isLevel0 = false)
      // residuals predict from the PRE-predictor coded values — the
      // decoder's reconstruction state at each pixel
      val src = argb.clone()
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val q = y * w + x
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) src(q - 1)
            else if (x == 0) src(q - w)
            else {
              val mode = (modes((y >> sizeBits) * mw + (x >> sizeBits)) >> 8) & 0xff
              val tr = if (x == w - 1) src(y * w) else src(q - w + 1)
              predictPixel(mode, src(q - 1), src(q - w), src(q - w - 1), tr)
            }
          argb(q) = subPixels(src(q), pred)
          x += 1
        }
        y += 1
      }
    }
    bw.bits(0, 1) // end of transforms
    encodeImageStream(bw, w, h, argb, cacheBits, isLevel0 = true)
    val payload0 = bw.result()
    val payload = Array[Byte](0x2f.toByte) ++ payload0
    val riffLen = 4 + 8 + payload.length + (payload.length & 1)
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(riffLen & 0xff); out.write((riffLen >> 8) & 0xff)
    out.write((riffLen >> 16) & 0xff); out.write((riffLen >> 24) & 0xff)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII"))
    out.write(payload.length & 0xff); out.write((payload.length >> 8) & 0xff)
    out.write((payload.length >> 16) & 0xff)
    out.write((payload.length >> 24) & 0xff)
    out.write(payload)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }
}
