package graft

import org.apache.spark.sql.functions._
import graft.functions.{AhoCorasick, DictionaryMatchExpr}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick dictionary tagging: nested/overlapping terms, failure
  * links through shared prefixes, dedup, determinism vs brute force. */
class DictionaryMatchSpec extends SparkSpec {
  import spark.implicits._

  private def tags(dict: Seq[String], text: String): Seq[String] = {
    val arr = new AhoCorasick(dict).matchedTerms(UTF8String.fromString(text))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  test("nested and overlapping terms all report; repeats dedup") {
    val dict = Seq("he", "she", "his", "hers", "her")
    // classic AC fixture: "ushers" contains she, he, hers, her
    assert(tags(dict, "ushers") == Seq("he", "she", "hers", "her"))
    assert(tags(dict, "his his his") == Seq("his"))
    assert(tags(dict, "nothing").isEmpty)
  }

  test("failure links cross shared prefixes; unicode terms work") {
    val dict = Seq("abcd", "bc", "cdx", "中文")
    assert(tags(dict, "zabcdxz") == Seq("abcd", "bc", "cdx"))
    assert(tags(dict, "say 中文 here") == Seq("中文"))
    assert(tags(dict, "") == Seq.empty)
  }

  test("matches brute-force contains over random texts") {
    val dict = Seq("aa", "ab", "ba", "aba", "bab", "aaaa")
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val s = Seq.fill(rnd.nextInt(30))(if (rnd.nextBoolean()) 'a' else 'b')
        .mkString
      assert(tags(dict, s) == dict.filter(s.contains(_)), s"text=$s")
    }
  }

  test("column expression: one pass per row, case-sensitive") {
    val got = Seq("Scan the column", "scan THE column order")
      .toDF("text")
      .select(DictionaryMatchExpr(col("text"),
        Seq("scan", "column order", "order", "the")).as("tags"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got == Seq(Seq("the"), Seq("scan", "column order", "order")))
  }
}
