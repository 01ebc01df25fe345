package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Cross-document boilerplate line removal (the C4 frequency rule):
  * every occurrence of a corpus-frequent line drops, survivors re-join
  * in order, document identity survives total loss. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val footer = "subscribe to our newsletter"

  test("a line at minCount occurrences drops everywhere; unique lines keep order") {
    val docs = Seq(
      (1L, s"alpha one\n$footer\nalpha two"),
      (2L, s"beta one\n$footer"),
      (3L, s"$footer\ngamma solo")
    ).toDF("id", "text")
    val r = Dedup.dropFrequentLines(docs, "id", "text", minCount = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(1L) == (("alpha one\nalpha two", 3L, 2L, 1L)))
    assert(r(2L) == (("beta one", 2L, 1L, 1L)))
    assert(r(3L) == (("gamma solo", 2L, 1L, 1L)))
  }

  test("a line below minCount survives") {
    val docs = Seq(
      (1L, s"alpha\n$footer"),
      (2L, s"beta\n$footer"),
      (3L, "gamma")
    ).toDF("id", "text")
    val r = Dedup.dropFrequentLines(docs, "id", "text", minCount = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(4)).toMap
    assert(r.values.forall(_ == 0L), s"nothing may drop at 2 < 3: $r")
  }

  test("a document that is all boilerplate keeps its identity with empty text") {
    val docs = Seq(
      (1L, footer), (2L, footer), (3L, footer),
      (4L, s"real content\n$footer")
    ).toDF("id", "text")
    val r = Dedup.dropFrequentLines(docs, "id", "text", minCount = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getLong(3), x.getLong(4))).toMap
    assert(r(1L) == (("", 0L, 1L)))
    assert(r(4L) == (("real content", 1L, 1L)))
  }

  test("within-document repeats count toward the corpus frequency") {
    // 2 occurrences inside doc 1 + 1 in doc 2 = 3 total -> all drop
    val docs = Seq(
      (1L, "x\nspam line\nspam line\ny"),
      (2L, "spam line\nz")
    ).toDF("id", "text")
    val r = Dedup.dropFrequentLines(docs, "id", "text", minCount = 3)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "x\ny" && r(2L) == "z")
  }

  test("custom separator") {
    val docs = Seq(
      (1L, "a|dup|b"), (2L, "dup|c"), (3L, "dup")
    ).toDF("id", "text")
    val r = Dedup.dropFrequentLines(docs, "id", "text", minCount = 3, sep = "|")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "a|b", 2L -> "c", 3L -> ""))
  }

  test("minCount below 2 is refused") {
    val docs = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Dedup.dropFrequentLines(docs, "id", "text", minCount = 1)
    }
  }

  test("null-text documents survive with empty text_clean") {
    val docs = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, s"real\n$footer"), (3L, footer), (4L, footer)
    ).toDF("id", "text")
    val r = Dedup.dropFrequentLines(docs, "id", "text", minCount = 3)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L), s"doc identity lost: $r")
    assert(r(1L) == "" && r(2L) == "real")
  }
}
