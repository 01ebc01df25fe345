package graft

import org.apache.spark.sql.functions._
import graft.functions.{CompressibilityImpl, DeflateSizeExpr}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-size quality signal: separation between repetitive and
  * high-entropy text, determinism, UTF-8 byte accounting. */
class CompressSpec extends SparkSpec {
  import spark.implicits._

  private def sz(s: String): Long =
    CompressibilityImpl.deflateSize(UTF8String.fromString(s))

  private def hexChain(seed: String, n: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to n).map { i =>
      md.digest(s"$seed$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.mkString
  }

  test("repetition sits far below the 0.3 ratio; hex entropy far above") {
    val rep = "spam phrase " * 200
    assert(sz(rep) * 10 < rep.length * 3,
      s"repetitive ratio ${sz(rep).toDouble / rep.length}")
    val hex = hexChain("organic text seed", 20)
    assert(sz(hex) * 10 > hex.length * 3,
      s"hex ratio ${sz(hex).toDouble / hex.length}")
    // prose lands between the planted extremes
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "considers whether compression ratios measure repetitiveness " * 8
    assert(sz(prose) < sz(hexChain("x", 20)) && sz(prose) > sz(rep) / 4)
  }

  test("deterministic, monotone-ish under repetition, UTF-8 bytes counted") {
    val s = "deterministic input 中文 mixed"
    assert(sz(s) == sz(s))
    assert(sz("ab" * 1000) < sz(hexChain("y", 10)))
    assert(sz("") >= 0 && sz("") < 16) // empty deflate block overhead only
  }

  test("column expression separates the planted variants per row") {
    val got = Seq(("r", "tok " * 300), ("h", hexChain("z", 20)))
      .toDF("k", "t")
      .select(col("k"),
        (DeflateSizeExpr(col("t")) * 10 < length(col("t")) * 3).as("rep"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("r") && !got("h"))
  }
}
