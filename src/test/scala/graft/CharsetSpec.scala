package graft

import org.apache.spark.sql.functions._
import graft.functions.{CharsetDecodeImpl, DecodeTextExpr}

/** Strict-UTF-8-else-Latin-1 decoding: validator edge cases (overlongs,
  * surrogates, truncations), BOM stripping, fallback mapping. */
class CharsetSpec extends SparkSpec {
  import spark.implicits._

  private def decode(b: Array[Byte]): String =
    CharsetDecodeImpl.decode(b).toString

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("valid UTF-8 passes through: ASCII, BMP, supplementary") {
    for (s <- Seq("", "plain ascii", "中文 mixed", "emoji 😀 end", "é"))
      assert(decode(utf8(s)) == s)
  }

  test("BOM strips; BOM alone decodes to empty") {
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    assert(decode(bom ++ utf8("after bom")) == "after bom")
    assert(decode(bom) == "")
  }

  test("invalid UTF-8 falls back to Latin-1, byte per code point") {
    // lone 0xE9 = 'é' in Latin-1, invalid as UTF-8
    val latin = "café süß"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(decode(latin) == "café süß")
    // CP1252-style byte soup still maps losslessly through Latin-1
    val soup = Array(0x41.toByte, 0xFF.toByte, 0x80.toByte, 0x42.toByte)
    assert(decode(soup) == "AÿB")
  }

  test("validator rejects overlongs, surrogates, truncations, 0xF5+") {
    def valid(bs: Int*) = CharsetDecodeImpl.isValidUtf8(
      bs.map(_.toByte).toArray, 0)
    assert(!valid(0xC0, 0xAF), "overlong 2-byte")
    assert(!valid(0xE0, 0x80, 0xAF), "overlong 3-byte")
    assert(!valid(0xED, 0xA0, 0x80), "surrogate D800")
    assert(!valid(0xF5, 0x80, 0x80, 0x80), "above U+10FFFF lead")
    assert(!valid(0xE4, 0xB8), "truncated 3-byte")
    assert(!valid(0x80), "stray continuation")
    assert(valid(0xF0, 0x9F, 0x98, 0x80), "U+1F600 valid")
    assert(valid(0xED, 0x9F, 0xBF), "U+D7FF just below surrogates")
  }

  test("column expression decodes a mixed frame") {
    val got = Seq(
      ("u", utf8("unicode 中")),
      ("l", "déjà vu".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
      .toDF("k", "b")
      .select(col("k"), DecodeTextExpr(col("b")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("u") == "unicode 中" && got("l") == "déjà vu")
  }
}
