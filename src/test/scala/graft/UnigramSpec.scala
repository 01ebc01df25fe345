package graft

import org.apache.spark.sql.functions._
import graft.functions.{Unigram, UnigramEncodeExpr}
import graft.functions.Unigram.UnigramModel

/** Unigram-LM tokenization: Viterbi optimality against brute-force
  * enumeration, lossless segmentation, determinism, trainer contracts
  * (alphabet floor, vocab bound, frequent words become pieces). */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("Viterbi equals brute-force best segmentation (score, then " +
      "fewest pieces, then longest-earliest)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    // random small vocabs + every char (the fallback floor)
    for (trial <- 1 to 60) {
      val pieces = (alphabet.map(_.toString) ++
        Seq.fill(5)((1 to (1 + rnd.nextInt(3)))
          .map(_ => alphabet(rnd.nextInt(3))).mkString)).distinct
      val model = UnigramModel(
        pieces.map(p => p -> -(1.0 + rnd.nextInt(5)).toDouble).toMap)
      val word = (1 to (1 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(3))).mkString
      // brute force: enumerate ALL segmentations over vocab pieces
      def all(s: String): Seq[Vector[String]] =
        if (s.isEmpty) Seq(Vector.empty)
        else (1 to s.length).flatMap { l =>
          val h = s.substring(0, l)
          if (model.pieces.contains(h)) all(s.substring(l)).map(h +: _)
          else Seq.empty
        }
      import scala.math.Ordering.Implicits._
      val best = all(word).minBy { seg =>
        val score = seg.map(model.pieces).sum
        // mirror the kernel's tie-break: max score, fewest pieces, then
        // the longer piece preferred from the END backwards (the DP
        // picks the longest LAST piece and recurses into the prefix) —
        // lexicographic on the REVERSED negated length sequence
        (-score, seg.length, seg.reverse.map(p => -p.length).toSeq)
      }
      assert(model.segment(word) == best,
        s"trial $trial word=$word vocab=${model.pieces}")
    }
  }

  test("segmentation is lossless; unknown chars fall back per-char") {
    val m = UnigramModel(Map("ab" -> -1.0, "a" -> -3.0, "b" -> -3.0))
    assert(m.segment("abab") == Vector("ab", "ab"))
    assert(m.segment("abba").mkString == "abba")
    assert(m.segment("xyab") == Vector("x", "y", "ab"),
      "unknown chars become their own pieces")
    assert(m.segment("") == Vector.empty)
  }

  test("trainer: alphabet floor, vocab bound, frequent words become " +
      "single pieces, deterministic") {
    val words = Map("scan" -> 100L, "scanner" -> 40L, "plan" -> 60L,
      "planner" -> 30L, "x" -> 1L)
    val m1 = Unigram.train(words, vocabSize = 20)
    val m2 = Unigram.train(words, vocabSize = 20)
    assert(m1.pieces == m2.pieces, "training must be deterministic")
    val chars = words.keysIterator.flatMap(_.map(_.toString)).toSet
    assert(chars.subsetOf(m1.pieces.keySet), "alphabet is never pruned")
    assert(m1.pieces.keysIterator.count(_.length > 1) <=
      20 - chars.size + chars.size) // bound holds
    // the dominant words should segment to one piece each
    assert(m1.segment("scan").length == 1, m1.segment("scan").toString)
    assert(m1.segment("plan").length == 1)
    // and compression beats per-char on seen vocabulary
    assert(m1.countPieces("scanner planner") < "scannerplanner".length)
  }

  test("vocabSize below the alphabet keeps the alphabet (no loop, " +
      "still encodes everything)") {
    val m = Unigram.train(Map("abcdef" -> 5L), vocabSize = 2)
    assert(m.segment("fedcba").mkString == "fedcba")
  }

  test("column expression encodes through Spark; whitespace contract") {
    val m = Unigram.train(Map("spark" -> 10L, "scan" -> 8L), vocabSize = 16)
    val got = Seq((0L, "spark scan spark"), (1L, " "), (2L, "zq"))
      .toDF("id", "text")
      .select(col("id"),
        array_join(UnigramEncodeExpr(col("text"), m), "|").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "spark|scan|spark")
    assert(got(1L) == "", "blank text yields no pieces")
    assert(got(2L) == "z|q", "unseen word falls back to chars")
  }

  test("exact trainer sees corpus-frequent words the 256-doc sample misses") {
    // the BPE planted-skew corpus: sample window all 'aaab', tail docs
    // dominated by 'qqqz' (corpus-wide the most frequent word)
    val rows = (1L to 256L).map(i => (i, "aaab aaab")) ++
      (257L to 300L).map(i => (i, Seq.fill(20)("qqqz").mkString(" ")))
    val docs = rows.toDF("doc_id", "text")
    val sampled = Unigram.trainFromCorpus(docs.orderBy("doc_id"), "text",
      vocabSize = 16, sampleDocs = 256)
    val exact = Unigram.trainFromCorpusExact(docs, "text",
      vocabSize = 16, maxVocab = 1024)
    assert(sampled.segment("qqqz").length > 1,
      s"the sample never saw qqqz — it must fall back to pieces")
    assert(exact.segment("qqqz") == Vector("qqqz"),
      "the exact histogram makes the dominant word one piece")
    assert(Unigram.trainFromCorpusExact(docs.repartition(7), "text",
      vocabSize = 16, maxVocab = 1024).pieces == exact.pieces)
  }
}
