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

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nbits = 0
    var truncated = false
    def bit(): Int = bits(1)
    def bits(n: Int): Int = {
      while (nbits < n) {
        if (pos >= b.length) { truncated = true; return 0 }
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

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

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

  /** Decode a WebP container holding a VP8L (lossless) stream to
    * (w, h, 4, interleaved RGBA). Envelope: no color cache, no meta
    * prefix groups, transforms limited to subtract-green; lossy VP8 /
    * VP8X-wrapped lossy → None. */
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
    val r = new BitReader(b, off + 1)
    val w = r.bits(14) + 1
    val h = r.bits(14) + 1
    r.bit() // alpha hint
    if (r.bits(3) != 0) return None // version
    if (w.toLong * h * 4 >= (1L << 28)) return None
    var subtractGreen = false
    while (r.bit() == 1) {
      r.bits(2) match {
        case 2 => subtractGreen = true
        case _ => return None // predictor/color/indexing out of envelope
      }
    }
    if (r.bit() == 1) return None // color cache out of envelope
    if (r.bit() == 1) return None // meta prefix groups out of envelope
    val green = readPrefixCode(r, 256 + 24).getOrElse(return None)
    val red = readPrefixCode(r, 256).getOrElse(return None)
    val blue = readPrefixCode(r, 256).getOrElse(return None)
    val alpha = readPrefixCode(r, 256).getOrElse(return None)
    val dist = readPrefixCode(r, 40).getOrElse(return None)
    val n = w * h
    val px = new Array[Int](n) // ARGB words pre-inverse-transform
    var p = 0
    while (p < n) {
      val g = green.decode(r)
      if (g < 0 || r.truncated) return None
      if (g < 256) {
        val rr = red.decode(r); val bb = blue.decode(r)
        val aa = alpha.decode(r)
        if (rr < 0 || bb < 0 || aa < 0 || r.truncated) return None
        px(p) = (aa << 24) | (rr << 16) | (g << 8) | bb
        p += 1
      } else {
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
        while (k < length) { px(p) = px(p - distance); p += 1; k += 1 }
      }
    }
    val out = new Array[Byte](n * 4)
    p = 0
    while (p < n) {
      val v = px(p)
      var rr = (v >> 16) & 0xff; val gg = (v >> 8) & 0xff
      var bb = v & 0xff; val aa = (v >>> 24) & 0xff
      if (subtractGreen) { rr = (rr + gg) & 0xff; bb = (bb + gg) & 0xff }
      out(p * 4) = rr.toByte; out(p * 4 + 1) = gg.toByte
      out(p * 4 + 2) = bb.toByte; out(p * 4 + 3) = aa.toByte
      p += 1
    }
    Some((w, h, 4, out))
  }

  /** Encode interleaved RGBA as a literal-only, transform-free VP8L
    * WebP: per-channel canonical prefix codes (package-merge limited to
    * 15; simple form for ≤2-symbol channels), code lengths emitted
    * plainly (no RLE), distance tree a 1-symbol stub. Exact decode by
    * construction — fixture material for the cross-format dedup gates. */
  def webpEncode(w: Int, h: Int, rgba: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgba.length == w * h * 4,
      s"bad pixel buffer: ${w}x$h vs ${rgba.length}")
    require(w <= (1 << 14) && h <= (1 << 14), "dims exceed VP8L's 14 bits")
    val n = w * h
    val bw = new BitWriter
    bw.bits(w - 1, 14); bw.bits(h - 1, 14)
    bw.bits(0, 1) // no alpha hint
    bw.bits(0, 3) // version
    bw.bits(0, 1) // no transforms
    bw.bits(0, 1) // no color cache
    bw.bits(0, 1) // no meta prefix groups
    val freqs = Array(new Array[Long](280), new Array[Long](256),
      new Array[Long](256), new Array[Long](256))
    var p = 0
    while (p < n) {
      freqs(0)(rgba(p * 4 + 1) & 0xff) += 1 // green drives the g tree
      freqs(1)(rgba(p * 4) & 0xff) += 1
      freqs(2)(rgba(p * 4 + 2) & 0xff) += 1
      freqs(3)(rgba(p * 4 + 3) & 0xff) += 1
      p += 1
    }
    val lens = freqs.map(f => packageMerge(f, 15))
    val codes = lens.map(canonicalCodes)
    def writeCode(ix: Int): Unit = {
      val used = freqs(ix).indices.filter(freqs(ix)(_) > 0)
      if (used.length <= 2) { // simple form
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
    // distance tree: 1-symbol stub (never used — literals only)
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
    def emit(ix: Int, s: Int): Unit = bw.bits(
      Integer.reverse(codes(ix)(s)) >>> (32 - math.max(lens(ix)(s), 1)),
      lens(ix)(s))
    p = 0
    while (p < n) {
      val gg = rgba(p * 4 + 1) & 0xff
      if (lens(0)(gg) > 0) emit(0, gg)
      val rr = rgba(p * 4) & 0xff
      if (lens(1)(rr) > 0) emit(1, rr)
      val bb = rgba(p * 4 + 2) & 0xff
      if (lens(2)(bb) > 0) emit(2, bb)
      val aa = rgba(p * 4 + 3) & 0xff
      if (lens(3)(aa) > 0) emit(3, aa)
      p += 1
    }
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
