package graft

import org.apache.spark.sql.functions._
import graft.operators.DictionaryTag

/** Table-driven dictionary tagging: the collect-distinct-sort lexicon
  * contract, null/empty-term hygiene, the loud cap, empty-lexicon
  * degeneracy. */
class DictionaryTagSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta gamma"),
    (1L, "beta only"),
    (2L, "nothing matches here")).toDF("doc_id", "text")

  test("terms table: distinct, lexicographic order, null/empty dropped") {
    // duplicates, reverse order, a null and an empty string — the
    // lexicon must come out (alpha, beta) and tags in that order
    val terms = Seq(Some("beta"), Some("alpha"), Some("beta"),
      Some(""), None).toDF("term")
    val got = DictionaryTag.tag(docs, "text", terms, "term")
      .select(col("doc_id"), array_join(col("tags"), "|").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "alpha|beta", 1L -> "beta", 2L -> ""))
  }

  test("empty terms table tags nothing") {
    val got = DictionaryTag.tag(docs, "text",
        Seq.empty[String].toDF("term"), "term")
      .select(size(col("tags"))).collect().map(_.getInt(0))
    assert(got.forall(_ == 0))
  }

  test("more distinct terms than maxTerms refuses loudly") {
    val terms = (0 until 50).map(i => f"term$i%03d").toDF("term")
    val e = intercept[IllegalArgumentException] {
      DictionaryTag.tag(docs, "text", terms, "term", maxTerms = 10)
    }
    assert(e.getMessage.contains("maxTerms"))
    // at the boundary it proceeds
    assert(DictionaryTag.tag(docs, "text", terms, "term", maxTerms = 50)
      .count() == 3)
  }

  test("non-string term column casts; custom output column name") {
    val terms = Seq(1, 2, 11).toDF("term") // "1" is a substring of "11"
    val d = Seq((0L, "ids 11 and 2")).toDF("doc_id", "text")
    val got = DictionaryTag.tag(d, "text", terms, "term", outCol = "hits")
      .select(array_join(col("hits"), "|")).head().getString(0)
    assert(got == "1|11|2", "lexicographic string order, nested term hits")
  }
}
