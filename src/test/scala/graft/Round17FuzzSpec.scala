package graft

import scala.util.Random

import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Multimodal

/** Seeded fuzz over the round-17 byte/char kernels: mojibake repair,
  * MP4 shot detection and PCM silence segmentation must TOTAL-FUNCTION
  * arbitrary input (a kernel exception kills the task at 100 TB), and
  * each pins its cheap any-input invariants. Fixed seeds reproduce. */
class Round17FuzzSpec extends SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  test("mojibake repair is total, idempotent-safe and never lengthens") {
    val rnd = new Random(20260816L)
    for (_ <- 1 to 400) {
      val len = 1 + rnd.nextInt(120)
      val sb = new StringBuilder
      for (_ <- 0 until len) {
        rnd.nextInt(5) match {
          case 0 => sb.append((32 + rnd.nextInt(95)).toChar)       // ascii
          case 1 => sb.append((0x80 + rnd.nextInt(0x80)).toChar)   // latin1 high
          case 2 => sb.append(Seq('€', '’', '™',
            'Œ', '˜')(rnd.nextInt(5)))                   // cp1252 specials
          case 3 => sb.append((0x100 + rnd.nextInt(0x3000)).toChar) // genuine unicode
          case _ => sb.append(Seq('Ã', 'Â', 'â')(rnd.nextInt(3)))
        }
      }
      val in = sb.toString
      val out = graft.functions.MojibakeRepairImpl.repair(u(in)).toString
      assert(out.length <= in.length, s"repair lengthened: $in -> $out")
      // a second pass over already-repaired text must also be total
      val out2 = graft.functions.MojibakeRepairImpl.repair(u(out)).toString
      assert(out2.length <= out.length)
    }
  }

  test("shot detection is total on arbitrary bytes and truncations") {
    val rnd = new Random(20260817L)
    for (i <- 1 to 300) {
      val junk = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(junk)
      Multimodal.mp4ShotBoundaries(junk, 8000) // may be None, must not throw
      val valid = Multimodal.syntheticMp4WithShots(32, 24, 1000, 40,
        nFrames = 2 + rnd.nextInt(12), frameSize = 8 + rnd.nextInt(40),
        shotLen = 1 + rnd.nextInt(6), docSeed = i.toLong)
      // bit flips and truncations of a valid container
      val cut = valid.take(rnd.nextInt(valid.length + 1))
      Multimodal.mp4ShotBoundaries(cut, 8000)
      val flipped = valid.clone()
      for (_ <- 0 to 4)
        flipped(rnd.nextInt(flipped.length)) = rnd.nextInt(256).toByte
      Multimodal.mp4ShotBoundaries(flipped, 8000)
      // the untouched container must parse with shot 0 at frame 0
      val ok = Multimodal.mp4ShotBoundaries(valid, 8000)
      assert(ok.exists(s => s.headOption.contains((0, 0, 0L))))
    }
  }

  test("silence segmentation is total; segments are ordered, disjoint, in-range") {
    val rnd = new Random(20260818L)
    for (i <- 1 to 300) {
      val junk = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(junk)
      Multimodal.wavSilenceSegments(junk, 100, 10) // must not throw
      val n = 20 + rnd.nextInt(300)
      val sil = Seq.fill(rnd.nextInt(3))(
        (rnd.nextInt(n), 1 + rnd.nextInt(60)))
      val wav = Multimodal.syntheticWavPcm16Silence(8000, i.toLong, n, sil)
      val segs = Multimodal.wavSilenceSegments(wav, 100,
        1 + rnd.nextInt(40)).get
      // invariants for ANY input: ordered, disjoint, within [0, n)
      segs.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 <= b._2, s"$a overlaps $b")
        case _ =>
      }
      assert(segs.forall(s => s._2 >= 0 && s._3 <= n && s._2 < s._3))
      assert(segs.map(_._1) == segs.indices)
      // truncations of the container must be None or consistent
      Multimodal.wavSilenceSegments(
        wav.take(rnd.nextInt(wav.length + 1)), 100, 10)
    }
  }
}
