package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Progressive JPEG (SOF2) decode equivalence: a self-contained
  * test-side encoder emits the SAME quantized coefficient blocks as a
  * baseline (SOF0) stream and as progressive scan scripts — spectral
  * bands, DC+AC successive approximation with refinement scans
  * (correction bits for nonzero history, ±1 insertions, buffered-bit
  * ordering), EOB runs spanning blocks, ZRL, restart intervals — and
  * the decoder must land both on identical pixels. The fixture-encoder
  * twins (grayscale / 4:4:4 / 4:2:0) are cross-checked against the
  * baseline fixture encoder too. */
class ProgressiveJpegSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- encoder

  /** MSB-first bit sink with 0xFF00 stuffing; scans end 1-padded. */
  private final class Sink {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var n = 0
    def bits(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); n += 1
        if (n == 8) {
          out.write(acc); if (acc == 0xFF) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) {
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(acc); if (acc == 0xFF) out.write(0x00)
      acc = 0; n = 0
    }
  }

  // custom complete-enough tables: DC symbols 0..11 at length 4,
  // AC symbols = EOBn (0x00..0xE0), ZRL (0xF0) and every (r,s) with
  // s 1..10 at length 8 — one table serves baseline AND progressive
  private val DcCounts = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray
  private val AcVals: Array[Int] =
    ((0 to 14).map(_ << 4) :+ 0xF0).toArray ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)
  private val AcCounts = {
    val c = new Array[Int](16); c(7) = AcVals.length; c
  }

  private def codeMap(counts: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val m = Map.newBuilder[Int, (Int, Int)]
    var code = 0; var k = 0; var l = 1
    while (l <= 16) {
      var i = 0
      while (i < counts(l - 1)) {
        m += vals(k) -> ((code, l)); code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    m.result()
  }
  private val dcC = codeMap(DcCounts, DcVals)
  private val acC = codeMap(AcCounts, AcVals)

  private def magBits(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def emitSigned(s: Sink, v: Int, t: Int): Unit =
    if (t > 0) s.bits(if (v >= 0) v else v - 1 + (1 << t), t)

  /** Shared headers: SOI, DQT(all 1s), SOF(marker), DHTs; returns the
    * stream with everything up to (not including) the first SOS. */
  private def headers(sof: Int, w: Int, h: Int): java.io.ByteArrayOutputStream = {
    val out = new java.io.ByteArrayOutputStream()
    def wr(bs: Int*): Unit = bs.foreach(v => out.write(v & 0xFF))
    def seg(marker: Int, payload: Array[Int]): Unit = {
      wr(0xFF, marker); wr((payload.length + 2) >> 8, payload.length + 2)
      payload.foreach(v => out.write(v & 0xFF))
    }
    wr(0xFF, 0xD8)
    seg(0xDB, 0 +: Array.fill(64)(1)) // quant all 1s: coefficients direct
    seg(sof, Array(8, h >> 8, h, w >> 8, w, 1, 1, 0x11, 0))
    seg(0xC4, 0x00 +: (DcCounts ++ DcVals))
    seg(0xC4, 0x10 +: (AcCounts ++ AcVals))
    out
  }

  private def sos(out: java.io.ByteArrayOutputStream, ss: Int, se: Int,
      ah: Int, al: Int): Unit = {
    def wr(bs: Int*): Unit = bs.foreach(v => out.write(v & 0xFF))
    wr(0xFF, 0xDA, 0, 8, 1, 1, 0x00, ss, se, (ah << 4) | al)
  }

  /** Baseline SOF0 encoding of zigzag-order coefficient blocks. */
  private[graft] def baselineBytes(w: Int, h: Int,
      blocks: Array[Array[Int]]): Array[Byte] = {
    val out = headers(0xC0, w, h)
    sos(out, 0, 63, 0, 0)
    val s = new Sink
    var pred = 0
    blocks.foreach { blk =>
      val diff = blk(0) - pred; pred = blk(0)
      val t = magBits(diff)
      val (c, l) = dcC(t); s.bits(c, l); emitSigned(s, diff, t)
      var r = 0; var k = 1
      while (k < 64) {
        if (blk(k) == 0) r += 1
        else {
          while (r > 15) { val (zc, zl) = acC(0xF0); s.bits(zc, zl); r -= 16 }
          val t2 = magBits(blk(k))
          val (c2, l2) = acC((r << 4) | t2)
          s.bits(c2, l2); emitSigned(s, blk(k), t2)
          r = 0
        }
        k += 1
      }
      if (r > 0) { val (ec, el) = acC(0x00); s.bits(ec, el) }
    }
    s.flush()
    s.out.writeTo(out)
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  /** Progressive SOF2 encoding of the SAME blocks: DC at Al=1 +
    * refinement, AC band(s) at acAl with refinement scans down to 0.
    * `bands` are inclusive [lo, hi] spectral slices; `dri` > 0 plants
    * restart markers every `dri` blocks in the DC first scan. */
  private[graft] def progressiveBytes(w: Int, h: Int, blocks: Array[Array[Int]],
      bands: Seq[(Int, Int)], acAl: Int, dri: Int = 0): Array[Byte] = {
    val out = headers(0xC2, w, h)
    def wr(bs: Int*): Unit = bs.foreach(v => out.write(v & 0xFF))
    if (dri > 0) wr(0xFF, 0xDD, 0, 4, dri >> 8, dri & 0xFF)
    // --- DC first, Al=1 ---
    sos(out, 0, 0, 0, 1)
    var s = new Sink
    var pred = 0
    var rstN = 0
    blocks.zipWithIndex.foreach { case (blk, bi) =>
      if (dri > 0 && bi > 0 && bi % dri == 0) {
        s.flush()
        s.out.write(0xFF); s.out.write(0xD0 + (rstN & 7)); rstN += 1
        pred = 0
      }
      val v = blk(0) >> 1
      val diff = v - pred; pred = v
      val t = magBits(diff)
      val (c, l) = dcC(t); s.bits(c, l); emitSigned(s, diff, t)
    }
    s.flush(); s.out.writeTo(out)
    // DRI stays in force for every later scan (T.81) — disable it so
    // the remaining emitters stay restart-free while the first scan
    // still exercises the predictor reset
    if (dri > 0) wr(0xFF, 0xDD, 0, 4, 0, 0)
    // --- DC refinement, Al=0 ---
    sos(out, 0, 0, 1, 0)
    s = new Sink
    blocks.foreach(blk => s.bits(blk(0) & 1, 1))
    s.flush(); s.out.writeTo(out)
    // --- AC bands: first scan at acAl, then refinements down to 0 ---
    bands.foreach { case (lo, hi) =>
      sos(out, lo, hi, 0, acAl)
      s = new Sink
      var eobrun = 0
      def flushEob(pending: scala.collection.mutable.Buffer[Int]): Unit = {
        if (eobrun > 0) {
          val r = 31 - Integer.numberOfLeadingZeros(eobrun)
          val (c, l) = acC(r << 4); s.bits(c, l)
          if (r > 0) s.bits(eobrun - (1 << r), r)
          eobrun = 0
        }
        pending.foreach(b => s.bits(b, 1)); pending.clear()
      }
      val noPending = scala.collection.mutable.Buffer.empty[Int]
      blocks.foreach { blk =>
        var r = 0; var any = false
        // point transform toward zero: sign * (|v| >> acAl)
        (lo to hi).foreach { k =>
          val vt = { val m = math.abs(blk(k)) >> acAl
            if (blk(k) >= 0) m else -m }
          if (vt == 0) r += 1
          else {
            flushEob(noPending)
            while (r > 15) { val (zc, zl) = acC(0xF0); s.bits(zc, zl); r -= 16 }
            val t = magBits(vt)
            val (c, l) = acC((r << 4) | t)
            s.bits(c, l); emitSigned(s, vt, t)
            r = 0; any = true
          }
        }
        if (r > 0 || !any) eobrun += 1
        if (eobrun == 32767) flushEob(noPending)
      }
      flushEob(noPending)
      s.flush(); s.out.writeTo(out)
      // refinement scans acAl-1 .. 0, the jcphuff encode_mcu_AC_refine
      // structure: the ZRL condition is checked at EVERY nonzero
      // position (so each buffered correction sits within 15 zeros of
      // the last emission point — the decoder reads corrections
      // positionally inside each window), and ZRLs are suppressed past
      // the block's last newly-nonzero (those zeros fold into the EOB
      // run)
      var al = acAl - 1
      while (al >= 0) {
        sos(out, lo, hi, al + 1, al)
        s = new Sink
        eobrun = 0
        val runBits = scala.collection.mutable.Buffer.empty[Int]
        blocks.foreach { blk =>
          var r = 0
          val corr = scala.collection.mutable.Buffer.empty[Int]
          val eobPos = (lo to hi)
            .filter(k => (math.abs(blk(k)) >> al) == 1)
            .lastOption.getOrElse(lo - 1)
          (lo to hi).foreach { k =>
            val temp = math.abs(blk(k)) >> al
            if (temp == 0) r += 1
            else {
              while (r > 15 && k <= eobPos) {
                flushEob(runBits)
                val (zc, zl) = acC(0xF0); s.bits(zc, zl)
                r -= 16
                corr.foreach(b => s.bits(b, 1)); corr.clear()
              }
              if (temp > 1) corr += (temp & 1) // history correction
              else { // newly nonzero at this precision
                flushEob(runBits)
                val (c, l) = acC((r << 4) | 1)
                s.bits(c, l)
                s.bits(if (blk(k) >= 0) 1 else 0, 1)
                corr.foreach(b => s.bits(b, 1)); corr.clear()
                r = 0
              }
            }
          }
          if (r > 0 || corr.nonEmpty) {
            eobrun += 1; runBits ++= corr; corr.clear()
          }
          if (eobrun == 32767) flushEob(runBits)
        }
        flushEob(runBits)
        s.flush(); s.out.writeTo(out)
        al -= 1
      }
    }
    wr(0xFF, 0xD9)
    out.toByteArray
  }

  // ---------------------------------------------------------------- tests

  private[graft] def randomBlocks(nBlocks: Int, seed: Long): Array[Array[Int]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBlocks) {
      val blk = new Array[Int](64)
      blk(0) = rnd.nextInt(401) - 200
      // sparse ACs including ±1s (the newly-nonzero refine path),
      // even/odd values (correction bits both ways), a high-k tail
      (0 until 8).foreach { _ =>
        blk(1 + rnd.nextInt(63)) = rnd.nextInt(81) - 40
      }
      blk(1 + rnd.nextInt(8)) = if (rnd.nextBoolean()) 1 else -1
      blk(55 + rnd.nextInt(8)) = rnd.nextInt(5) - 2
      blk
    }
  }

  private def decode(b: Array[Byte]) =
    Multimodal.jpegDecodeInterleaved(b)

  test("progressive == baseline: successive approximation with AC " +
      "refinement (correction bits, ±1 insertions, EOB runs, ZRL)") {
    for (seed <- Seq(1L, 7L, 99L)) {
      val w = 24; val h = 17 // 3x3 blocks, ragged edges
      val blocks = randomBlocks(9, seed)
      val base = decode(baselineBytes(w, h, blocks))
      assert(base.isDefined, s"baseline decode seed=$seed")
      val prog = decode(progressiveBytes(w, h, blocks,
        bands = Seq((1, 63)), acAl = 1))
      assert(prog.isDefined, s"progressive decode seed=$seed")
      assert(java.util.Arrays.equals(base.get._4, prog.get._4),
        s"pixel equivalence seed=$seed")
    }
  }

  test("progressive == baseline: split spectral bands + two-level " +
      "successive approximation") {
    val w = 32; val h = 24
    val blocks = randomBlocks(12, 5L)
    val base = decode(baselineBytes(w, h, blocks)).get
    val prog = decode(progressiveBytes(w, h, blocks,
      bands = Seq((1, 5), (6, 63)), acAl = 2)).get
    assert(java.util.Arrays.equals(base._4, prog._4),
      "banded + Al=2 script must land on the baseline pixels")
  }

  test("progressive == baseline: restart interval resets the DC " +
      "predictor mid-scan") {
    val w = 40; val h = 8 // 5 blocks in one row
    val blocks = randomBlocks(5, 11L)
    val base = decode(baselineBytes(w, h, blocks)).get
    val prog = decode(progressiveBytes(w, h, blocks,
      bands = Seq((1, 63)), acAl = 1, dri = 2)).get
    assert(java.util.Arrays.equals(base._4, prog._4))
  }

  test("partial progression decodes what it has (DC-only stream)") {
    val w = 16; val h = 16
    val blocks = randomBlocks(4, 3L)
    val prog = decode(progressiveBytes(w, h, blocks,
      bands = Seq.empty, acAl = 1))
    assert(prog.isDefined, "EOI before any AC band is still an image")
    // the DC-only rendering equals a baseline stream with zeroed ACs
    val dcOnly = blocks.map { b =>
      val c = new Array[Int](64); c(0) = b(0); c
    }
    val base = decode(baselineBytes(w, h, dcOnly)).get
    assert(java.util.Arrays.equals(base._4, prog.get._4))
  }

  test("fixture twins: syntheticJpegProgressiveBytes decodes to " +
      "syntheticJpegDcBytes' exact pixels (gray / 4:4:4 / 4:2:0)") {
    for ((seed, w, h) <- Seq((0L, 12, 9), (7L, 17, 14), (42L, 16, 16))) {
      val pg = decode(Multimodal.syntheticJpegProgressiveBytes(
        seed, w, h, color = false)).get
      val bg = decode(Multimodal.syntheticJpegDcBytes(
        seed, w, h, color = false)).get
      assert(java.util.Arrays.equals(pg._4, bg._4), s"gray $seed ${w}x$h")
      val pc = decode(Multimodal.syntheticJpegProgressiveBytes(
        seed, w, h, color = true)).get
      val bc = decode(Multimodal.syntheticJpegDcBytes(
        seed, w, h, color = true)).get
      assert(java.util.Arrays.equals(pc._4, bc._4), s"color $seed ${w}x$h")
      val p420 = decode(Multimodal.syntheticJpegProgressiveBytes(
        seed, w, h, color = true, subsample420 = true)).get
      val b420 = decode(Multimodal.syntheticJpegDcBytes(
        seed, w, h, color = true, subsample420 = true)).get
      assert(java.util.Arrays.equals(p420._4, b420._4),
        s"4:2:0 $seed ${w}x$h")
    }
  }

  test("progressive decoder is total on malformed scan scripts") {
    val good = progressiveBytes(16, 16, randomBlocks(4, 1L),
      bands = Seq((1, 63)), acAl = 1)
    assert(decode(good.dropRight(8)).isEmpty ||
      decode(good.dropRight(8)).isDefined) // never throws either way
    // truncations at every 16th byte: no exception may escape
    (2 until good.length by 16).foreach { cut =>
      Multimodal.jpegDecodeInterleaved(good.take(cut))
    }
    assert(decode("garbage".getBytes).isEmpty)
  }
}
