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

/** Arbitrary-length exact substring dedup (ExactSubstr, keep-first):
  * within-doc repeats cut, off-grid run lengths covered exactly,
  * minLen-1 survives, ladder hashes agree with string windows. */
class RunDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: org.apache.spark.sql.DataFrame, m: Int) =
    Dedup.dropRepeatedRuns(docs, "id", "text", m)
      .collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap

  test("within-document second copy is cut; the first stays") {
    val run13 = (1 to 13).map(i => s"r$i").mkString(" ")
    val doc = s"ww alpha $run13 ww beta $run13 ww omega"
    val docs = Seq((1L, doc)).toDF("id", "text")
    val r = run(docs, 10)
    // the second run13 goes, plus the trailing "ww": "r5..r13 ww" is
    // ITSELF a repeated 10-window (offsets 6 and 21), so the second
    // occurrence's coverage reaches one word past the run — exact
    // sliding-window semantics, replayed by the brute-force test below
    assert(r(1L) == ((s"ww alpha $run13 ww beta omega", 32L, 14L)),
      r(1L).toString)
  }

  test("cross-doc: first occurrence by (id, pos) keeps; off-grid length " +
      "13 under minLen 10 is covered exactly") {
    val run13 = (1 to 13).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (5L, s"head words here $run13 tail words here"),
      (9L, s"p1 p2 $run13 p3 p4")).toDF("id", "text")
    val r = run(docs, 10)
    assert(r(5L)._3 == 0L, s"first doc intact: ${r(5L)}")
    assert(r(9L) == (("p1 p2 p3 p4", 17L, 13L)), r(9L).toString)
  }

  test("a repeated run of minLen-1 words survives everywhere") {
    val run9 = (1 to 9).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $run9 a4 a5"),
      (2L, s"b1 b2 b3 $run9 b4 b5")).toDF("id", "text")
    val r = run(docs, 10)
    assert(r(1L)._3 == 0L && r(2L)._3 == 0L,
      s"9-run must survive a 10 policy: $r")
  }

  test("agrees with a brute-force string-window replay on a seeded corpus") {
    val rnd = new scala.util.Random(20260815L)
    // small vocabulary forces natural repeats at several lengths
    val docs = (0L until 30L).map { i =>
      (i, Seq.fill(8 + rnd.nextInt(30))("w" + rnd.nextInt(6)).mkString(" "))
    }
    val m = 5
    // brute force: first occurrence per exact window string keeps
    val words = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val occ = docs.flatMap { case (id, t) =>
      val w = words(id)
      if (w.length < m) Nil
      else (0 to w.length - m).map(p => (w.slice(p, p + m).mkString(" "), id, p))
    }
    val firsts = occ.groupBy(_._1).collect {
      case (k, os) if os.size >= 2 => k -> os.map(o => (o._2, o._3)).min
    }
    val cuts = occ.filter { case (k, id, p) =>
      firsts.get(k).exists(_ != ((id, p))) }
      .groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    val expect = docs.map { case (id, _) =>
      val w = words(id)
      val covered = (0 until w.length).filter(j =>
        cuts.getOrElse(id, Set.empty).exists(s => s <= j && j < s + m)).toSet
      val kept = w.zipWithIndex.collect {
        case (t, j) if !covered.contains(j) => t }
      id -> ((kept.mkString(" "), w.length.toLong, covered.size.toLong))
    }.toMap
    val got = run(docs.toDF("id", "text").repartition(7), m)
    assert(got == expect,
      got.toSeq.sortBy(_._1).zip(expect.toSeq.sortBy(_._1))
        .filter(p => p._1 != p._2).take(3).toString)
  }

  test("ladder window hashes: equal iff the word windows are equal " +
      "(seeded, all lengths 2..17 incl. non-powers of two)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(7L)
    for (m <- 2 to 17) {
      val w = Seq.fill(40)("t" + rnd.nextInt(4))
      val arr = new GenericArrayData(
        w.map(s => UTF8String.fromString(s)).toArray[Any])
      val h = graft.functions.RunHashImpl.windowHashes(arr, m)
      val strs = (0 to w.length - m).map(p => w.slice(p, p + m).mkString(" "))
      for (i <- strs.indices; j <- strs.indices)
        assert((h.getLong(i) == h.getLong(j)) == (strs(i) == strs(j)),
          s"m=$m i=$i j=$j: '${strs(i)}' vs '${strs(j)}'")
    }
  }

  test("short docs emit no windows and lose nothing") {
    val docs = Seq((1L, "same nine words one two three four five six"),
      (2L, "same nine words one two three four five six")).toDF("id", "text")
    val r = run(docs, 10)
    assert(r(1L)._3 == 0L && r(2L)._3 == 0L)
  }
}
