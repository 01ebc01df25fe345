package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Cross-document repeated-span dedup: alignment-shifted copies cut,
  * owner keeps, overlapping spans merge, short docs exempt. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("a shifted copy is cut; the owner keeps its text") {
    val src = "a b c d e f g h i j"               // 10 words
    val copyAt3 = "x y z c d e f g h i j w"       // words c..j at offset 3
    val docs = Seq((1L, src), (2L, copyAt3)).toDF("id", "text")
    val r = Dedup.dropRepeatedSpans(docs, "id", "text", n = 8)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) == ((src, 10L, 0L)), "owner must keep everything")
    // doc 2's only duplicated 8-span is c..j at start 3 -> words 3..10 cut
    assert(r(2L) == (("x y z w", 12L, 8L)), r(2L).toString)
  }

  test("overlapping duplicated spans merge into one cut") {
    val src = "a b c d e f g h i j k"             // 11 words: spans a..h etc.
    val copy = "p q " + src                        // all of src at offset 2
    val docs = Seq((1L, src), (2L, copy)).toDF("id", "text")
    val r = Dedup.dropRepeatedSpans(docs, "id", "text", n = 8)
      .filter(col("id") === 2L).collect().head
    // spans at starts 2,3,4,5 (each 8 wide) merge to cover words 2..12
    assert(r.getString(1) == "p q" && r.getLong(3) == 11L)
  }

  test("documents shorter than n contribute and lose nothing") {
    val docs = Seq((1L, "same short text"), (2L, "same short text"))
      .toDF("id", "text")
    val r = Dedup.dropRepeatedSpans(docs, "id", "text", n = 8).collect()
    assert(r.forall(_.getLong(3) == 0L))
    assert(r.forall(_.getString(1) == "same short text"))
  }

  test("three-way duplication: min id owns, both others cut") {
    val run = "one two three four five six seven eight"
    val docs = Seq(
      (5L, s"early $run"), (3L, s"owner has $run here"),
      (9L, s"$run trailing words"))
      .toDF("id", "text")
    val r = Dedup.dropRepeatedSpans(docs, "id", "text", n = 8)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(3L) == 0L && r(5L) == 8L && r(9L) == 8L)
  }

  test("hashKeys path agrees with string keys") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y z c d e f g h i j w"),
      (3L, "totally different words here mate nothing shared at all")
    ).toDF("id", "text")
    val a = Dedup.dropRepeatedSpans(docs, "id", "text", n = 8)
    val b = Dedup.dropRepeatedSpans(docs, "id", "text", n = 8, hashKeys = true)
    assert(canon(a) == canon(b))
  }

  test("partitioning-invariant") {
    val docs = (0L until 60L).map { i =>
      (i, if (i % 3 == 0) "shared run w1 w2 w3 w4 w5 w6 w7 w8 tail" + i
          else s"unique text $i body words filler column value row agg")
    }.toDF("id", "text")
    val a = Dedup.dropRepeatedSpans(docs, "id", "text", n = 8)
    val b = Dedup.dropRepeatedSpans(docs.repartition(7), "id", "text", n = 8)
    assert(canon(a) == canon(b))
  }

  test("multi-scale: the fine scale cuts a run the coarse scale misses, " +
      "and cross-scale cuts merge") {
    // a 6-word duplicated run: invisible to n=8 (no 8-window fits), cut
    // by ns = {5, 8} via the fine scale's two sliding windows
    val src = "c1 c2 c3 c4 c5 c6 tail1 tail2 tail3"
    val copy = "p1 p2 c1 c2 c3 c4 c5 c6 q1 q2"
    val docs = Seq((1L, src), (2L, copy)).toDF("id", "text")
    val fixed = Dedup.dropRepeatedSpans(docs, "id", "text", n = 8)
      .filter(col("id") === 2L).collect().head
    assert(fixed.getLong(3) == 0L, "n=8 should provably miss the 6-word run")
    val multi = Dedup.dropRepeatedSpansMulti(docs, "id", "text", Seq(5, 8))
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getLong(3))).toMap
    assert(multi(1L) == ((src, 0L)), "owner keeps everything")
    assert(multi(2L) == (("p1 p2 q1 q2", 6L)), multi(2L).toString)
  }

  test("multi-scale equals single scale when one scale is given; " +
      "hashKeys and partitioning invariant") {
    val docs = (0L until 40L).map { i =>
      (i, if (i % 4 == 0) "shared run w1 w2 w3 w4 w5 w6 w7 w8 tail" + i
          else s"unique text $i body words filler column value row agg")
    }.toDF("id", "text")
    val single = Dedup.dropRepeatedSpans(docs, "id", "text", n = 8)
    val multi1 = Dedup.dropRepeatedSpansMulti(docs, "id", "text", Seq(8))
    assert(canon(single) == canon(multi1))
    val a = Dedup.dropRepeatedSpansMulti(docs, "id", "text", Seq(5, 8))
    val b = Dedup.dropRepeatedSpansMulti(docs.repartition(7), "id", "text",
      Seq(5, 8), hashKeys = true)
    assert(canon(a) == canon(b))
  }
}
