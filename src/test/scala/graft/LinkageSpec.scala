package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup, Embeddings, Funnel, Linkage, Timeseries}

/** Blocked fuzzy entity-resolution join: recall vs brute force, key
  * capping, and the no-cross-product plan shape. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val clean = Seq(
    (1L, "small ring"), (2L, "red widget"), (3L, "blue bolt"),
    (4L, "green gear"), (5L, "red widgets")
  ).toDF("rid", "rname")

  test("blocked join equals brute force at distance <= 1") {
    // every single-edit corruption class: delete in first token, delete
    // the space (token merge), delete in last token, substitution, insert
    val dirty = Seq(
      (11L, "smal ring"),   // delete in first token
      (12L, "redwidget"),   // delete the separator
      (13L, "blue blt"),    // delete in last token
      (14L, "green gea"),   // trailing delete
      (15L, "rad widget"),  // substitution
      (16L, "blue boltt"),  // insert
      (17L, "nothing close")
    ).toDF("lid", "lname")
    val blocked = Linkage.fuzzyJoin(dirty, "lid", "lname",
        clean, "rid", "rname", maxDistance = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = dirty.crossJoin(clean)
      .withColumn("d", levenshtein(col("lname"), col("rname")))
      .filter(col("d") <= 1)
      .collect().map(r => (r.getAs[Long]("lid"), r.getAs[Long]("rid"),
        r.getAs[Int]("d"))).toSet
    assert(blocked == brute, s"blocked=$blocked brute=$brute")
    assert(brute.exists(_._1 == 12L), "separator-deletion pair must be found")
    assert(!brute.exists(_._1 == 17L))
  }

  test("bestMatch keeps min distance, ties to min right id") {
    // "red widget" (exact, d=0) beats "red widgets" (d=1)
    val dirty = Seq((21L, "red widget")).toDF("lid", "lname")
    val best = Linkage.bestMatch(
      Linkage.fuzzyJoin(dirty, "lid", "lname", clean, "rid", "rname", 1),
      "lid", "rid").collect()
    assert(best.length == 1)
    assert(best.head.getAs[Long]("rid") == 2L)
    assert(best.head.getAs[Int]("distance") == 0)
  }

  test("duplicated id rows do not duplicate output pairs") {
    val l = Seq((1L, "red widget"), (1L, "red widget"), (2L, "red widget"))
      .toDF("lid", "lname")
    val r = Seq((10L, "red widget"), (10L, "red widget")).toDF("rid", "rname")
    val out = Linkage.fuzzyJoin(l, "lid", "lname", r, "rid", "rname", 1)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(out.length == 2 && out.toSet == Set((1L, 10L), (2L, 10L)),
      out.mkString(","))
  }

  test("keyCap drops oversized blocks on either side") {
    val hotLeft = (0 until 50).map(i => (100L + i, s"common token$i"))
      .toDF("lid", "lname")
    val hotRight = (0 until 50).map(i => (200L + i, s"common token$i"))
      .toDF("rid", "rname")
    // "common" blocks 50x50; token$i blocks are singletons — capping at 5
    // kills the hot block but keeps each exact pair via its unique token
    val capped = Linkage.fuzzyJoin(hotLeft, "lid", "lname",
      hotRight, "rid", "rname", maxDistance = 0, keyCap = 5)
    assert(capped.count() == 50)
  }

  test("plan has no cartesian product or nested-loop join") {
    val dirty = Seq((11L, "smal ring")).toDF("lid", "lname")
    val out = Linkage.fuzzyJoin(dirty, "lid", "lname",
      clean, "rid", "rname", 1)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("length bands split a shared-token block; d<=1 pairs still meet") {
    // 60 names share the token "common" but spread over 30 lengths: the
    // bare-token key would make one 60-row block; the banded keys must
    // cap every block at (rows per length) x (bands per key)
    val nameOf = (i: Int) => s"common ${"x" * (3 + i % 30)}"
    val df = (0 until 60).map(i => (i.toLong, nameOf(i))).toDF("id", "name")
    val keys = df.select(col("id"),
      explode(Linkage.blockKeys(col("name"), 1)).as("k"))
    val maxBlock = keys.groupBy("k").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxBlock <= 8, s"largest banded block was $maxBlock rows")
    // the guarantee survives banding: a one-char-shorter corruption (length
    // differs by 1) still shares a compound key with its source
    val a = df.filter(col("id") === 29)  // "common " + "x" * 32
    val corrupted = Seq((999L, s"common ${"x" * 31}")).toDF("cid", "cname")
    val hit = Linkage.fuzzyJoin(corrupted, "cid", "cname",
      a.withColumnRenamed("id", "rid").withColumnRenamed("name", "rname"),
      "rid", "rname", maxDistance = 1).collect()
    assert(hit.length == 1 && hit.head.getAs[Int]("distance") == 1)
  }
}

/** Markov transition matrix: hand-checked counts, exact integer
  * probabilities, tie ordering. */
class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("counts and parts-per-million on a hand-built log") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "a"),
      (1L, ts("2024-01-01 00:03:00"), 4L, "c"),
      (2L, ts("2024-01-01 00:00:00"), 5L, "a"),
      (2L, ts("2024-01-01 00:01:00"), 6L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.transitions(events, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // from a: a->b twice, a->c once → 666666 / 333333 ppm (truncating div)
    assert(out(("a", "b")) == (2L, 666666L))
    assert(out(("a", "c")) == (1L, 333333L))
    assert(out(("b", "a")) == (1L, 1000000L))
    assert(out.size == 3)
  }

  test("equal timestamps order by the tie column") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 00:00:00"), 1L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.transitions(events, "user_id", "ts", "event_id", "event_type")
      .collect()
    assert(out.length == 1)
    assert((out.head.getString(0), out.head.getString(1)) == ("a", "b"))
  }

  test("partitioning-invariant") {
    val events = (0 until 300).map(i =>
      (i.toLong % 7, ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"),
        i.toLong, s"e${i % 4}"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val a = Funnel.transitions(events, "user_id", "ts", "event_id", "event_type")
    val b = Funnel.transitions(events.repartition(7), "user_id", "ts",
      "event_id", "event_type")
    assert(canon(a) == canon(b))
  }
}

/** Integer-exact rolling z-score: planted spikes flag, stable series
  * don't, decisions survive repartitioning bit-for-bit. */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)

  test("a planted spike flags; the calm neighborhood does not") {
    val rows = (0 until 40).map { i =>
      val v = if (i == 30) 500.0 else 10.0 + (i % 3) * 0.5
      (1L, ts(i), i.toLong, v)
    }
    val out = Timeseries.anomalies(rows.toDF("k", "ts", "tie", "v"),
        "k", "ts", "tie", "v")
      .collect().map(r => r.getAs[Long]("tie") -> r.getAs[Boolean]("is_anomaly"))
      .toMap
    assert(out(30L), "the spike must flag")
    assert((0 until 40).filter(_ != 30).count(i => out(i.toLong)) == 0,
      "nothing else may flag")
  }

  test("constant series never flags (zero variance)") {
    val rows = (0 until 30).map(i => (1L, ts(i), i.toLong, 42.0))
    val out = Timeseries.anomalies(rows.toDF("k", "ts", "tie", "v"),
      "k", "ts", "tie", "v")
    assert(out.filter(col("is_anomaly")).count() == 0)
  }

  test("cold start: rows before minPoints cannot flag") {
    val rows = (0 until 7).map(i => (1L, ts(i), i.toLong, if (i == 6) 1e4 else 1.0))
    val out = Timeseries.anomalies(rows.toDF("k", "ts", "tie", "v"),
      "k", "ts", "tie", "v", minPoints = 8)
    assert(out.filter(col("is_anomaly")).count() == 0)
  }

  test("flags are partitioning-invariant (bit-exact decisions)") {
    val rows = (0 until 500).map { i =>
      (i.toLong % 5, ts(i), i.toLong, 10.0 + (i % 13) + (if (i % 97 == 0) 300.0 else 0.0))
    }
    val df = rows.toDF("k", "ts", "tie", "v")
    val a = Timeseries.anomalies(df, "k", "ts", "tie", "v")
    val b = Timeseries.anomalies(df.repartition(11), "k", "ts", "tie", "v")
    assert(canon(a) == canon(b))
    assert(a.filter(col("is_anomaly")).count() > 0)
  }

  test("null values carry no evidence: n matches S/Q and flags stay boolean") {
    // 20 calm points with 10 interleaved nulls, then a spike: the window
    // stats must count only the 21 real values, null rows must flag
    // false (not null), and the spike must still flag
    val rows = (0 until 30).map { i =>
      val v: Option[Double] =
        if (i % 3 == 2 && i < 29) None
        else if (i == 29) Some(500.0) else Some(10.0 + (i % 2) * 0.5)
      (1L, ts(i), i.toLong, v)
    }
    val out = Timeseries.anomalies(rows.toDF("k", "ts", "tie", "v"),
        "k", "ts", "tie", "v")
      .collect().map(r => (r.getAs[Long]("tie"),
        r.getAs[Long]("w_n"), r.getAs[Boolean]("is_anomaly"))).toList
    // every flag is a real boolean even on null-valued rows
    assert(out.length == 30)
    // w_n on the last row counts only non-null values in its 24-row window
    val lastN = out.find(_._1 == 29L).get._2
    val expectN = (6 until 30).count(i => !(i % 3 == 2 && i < 29))
    assert(lastN == expectN, s"w_n=$lastN expected=$expectN")
    assert(out.find(_._1 == 29L).get._3, "spike must still flag")
    assert(out.filter(_._1 != 29L).forall(!_._3), "nulls/calm must not flag")
  }
}

/** Prefix-filtered set-similarity join: lossless vs brute force, exact
  * rational threshold boundary, no cross product. */
class JaccardJoinSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "a completely different sentence about spark plans"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "one two"),
    (6L, "one two")
  ).toDF("doc_id", "text")

  private def brute(n: Int, num: Int, den: Int): Set[(Long, Long, Int, Int)] = {
    val toks = docs.select(col("doc_id"),
      array_distinct(graft.functions.TextFunctions.shingles(
        graft.functions.TextFunctions.words(col("text")), n)).as("ts"))
    val q = toks.select(col("doc_id").as("q_id"), col("ts").as("qs"))
    q.crossJoin(toks)
      .withColumn("inter", size(array_intersect(col("qs"), col("ts"))))
      .withColumn("uni", size(col("qs")) + size(col("ts")) - col("inter"))
      .filter(col("inter") * den >= col("uni") * num)
      .select("q_id", "doc_id", "inter", "uni")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
  }

  test("equals brute force, 3-shingles at 3/5") {
    val out = Dedup.jaccardJoin(
        docs.select(col("doc_id").as("q_id"), col("text").as("q_text")),
        "q_id", "q_text", docs, "doc_id", "text", 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(out == brute(3, 3, 5))
    assert(out.exists(p => p._1 == 1L && p._2 == 4L), "exact dup pair")
    assert(out.exists(p => p._1 == 5L && p._2 == 6L),
      "short docs collapse to the whole-document shingle and still match")
  }

  test("equals brute force, bag-of-words at 1/2") {
    val out = Dedup.jaccardJoin(
        docs.select(col("doc_id").as("q_id"), col("text").as("q_text")),
        "q_id", "q_text", docs, "doc_id", "text", 1, 2, shingleSize = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(out == brute(1, 1, 2))
  }

  test("threshold boundary is exact: inter·den == uni·num is INCLUDED") {
    // sets {a b c d} vs {a b c e}: inter 3, uni 5 → J = 3/5 exactly
    val l = Seq((1L, "a b c d")).toDF("q_id", "q_text")
    val r = Seq((2L, "a b c e")).toDF("doc_id", "text")
    val hit = Dedup.jaccardJoin(l, "q_id", "q_text", r, "doc_id", "text",
      3, 5, shingleSize = 1).collect()
    assert(hit.length == 1 && hit.head.getInt(2) == 3 && hit.head.getInt(3) == 5)
    // and 4/5 excludes it
    assert(Dedup.jaccardJoin(l, "q_id", "q_text", r, "doc_id", "text",
      4, 5, shingleSize = 1).isEmpty)
  }

  test("carry-the-arrays layout equals the inverted default exactly") {
    val q = docs.select(col("doc_id").as("q_id"), col("text").as("q_text"))
    val inverted = Dedup.jaccardJoin(q, "q_id", "q_text",
      docs, "doc_id", "text", 3, 5)
    val carried = Dedup.jaccardJoin(q, "q_id", "q_text",
      docs, "doc_id", "text", 3, 5, carryArrays = true)
    assert(canon(inverted) == canon(carried))
  }

  test("null array elements: kernel matches the concat_ws formulation") {
    // concat_ws skips a null element INCLUDING its separator; the fused
    // kernel must shingle identically or diverge from the oracle replay
    val df = Seq(1).toDF("x").select(
      array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")).as("w"))
    for (n <- Seq(2, 5)) { // sliding branch and whole-document branch
      val kernel = df.select(
          graft.functions.SortedShingleSetExpr(col("w"), n).as("s"))
        .collect().head.getSeq[String](0)
      val composed = df.select(array_sort(array_distinct(
          graft.functions.TextFunctions.shingles(col("w"), n))).as("s"))
        .collect().head.getSeq[String](0)
      assert(kernel == composed, s"n=$n: $kernel vs $composed")
    }
  }

  test("plan has no cartesian product or nested-loop join") {
    val q = docs.select(col("doc_id").as("q_id"), col("text").as("q_text"))
    val out = Dedup.jaccardJoin(q, "q_id", "q_text", docs, "doc_id", "text", 3, 5)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }
}

/** Binary quantization + Hamming search: local/distributed packing parity,
  * distance-from-first-principles, exact re-rank agreement. */
class BinaryAnnSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-embeddings incl. negatives, zeros and a
  // non-multiple-of-64 dimension
  private def vec(id: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(j => (((id * 31 + j * 17) % 7) - 3).toFloat / 2f)

  test("signWords (Spark) equals signWordsLocal (driver) at dim 64 and 100") {
    for (dim <- Seq(64, 100)) {
      val df = (0L until 20L).map(i => (i, vec(i, dim))).toDF("id", "emb")
      val got = Embeddings.binarize(df, "id", "emb")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      for (i <- 0L until 20L)
        assert(got(i).sameElements(Embeddings.signWordsLocal(vec(i, dim))),
          s"id $i dim $dim")
    }
    // degenerate parity: both packings map an empty vector to [0L]
    val empty = Seq((1L, Seq.empty[Float])).toDF("id", "emb")
    val sqlWords = Embeddings.binarize(empty, "id", "emb")
      .collect().head.getSeq[Long](1)
    assert(sqlWords == Seq(0L))
    assert(Embeddings.signWordsLocal(Array.empty[Float]).toSeq == Seq(0L))
  }

  test("a dimension-drifted corpus code fails loudly, never ranks first") {
    val dim = 64
    val good = (0L until 10L).map(i => (i, vec(i, dim)))
    val drifted = Seq((99L, vec(99L, 130))) // 3 words vs the query's 1
    val df = (good ++ drifted).toDF("id", "emb")
    val q = vec(999L, dim)
    val e = intercept[Exception] {
      Ann.binaryTopK(Embeddings.binarize(df, "id", "emb"), "id", "bits",
          Seq((999L, Embeddings.signWordsLocal(q))), k = 3)
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("hamming equals the sign-disagreement count from raw floats") {
    val dim = 100
    val df = (0L until 30L).map(i => (i, vec(i, dim))).toDF("id", "emb")
    val q = vec(999L, dim)
    val got = Ann.binaryTopK(Embeddings.binarize(df, "id", "emb"), "id", "bits",
        Seq((999L, Embeddings.signWordsLocal(q))), k = 30)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("hamming")).toMap
    for (i <- 0L until 30L) {
      val expect = vec(i, dim).zip(q).count { case (a, b) => (a > 0f) != (b > 0f) }
      assert(got(i) == expect, s"id $i")
    }
  }

  test("rerank with full shortlist equals exact brute-force cosine top-k") {
    val df = (0L until 40L).map(i => (i, vec(i, 64))).toDF("id", "emb")
    val q = vec(7L, 64)
    val rerank = Ann.binaryRerankTopK(df, "id", "emb", Seq((7L, q)), k = 5,
        shortlist = 40)
      .orderBy("rank").collect().map(_.getAs[Long]("id")).toSeq
    val brute = Ann.bruteForceTopK(df, "id", "emb", q, 5)
      .orderBy("rank").collect().map(_.getAs[Long]("id")).toSeq
    assert(rerank == brute)
  }
}

/** Generic 64-bit signature band join: brute-force losslessness at the
  * pigeonhole bound, bound refusal past it. */
class HashPairs64Spec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def sig(i: Long): Long =
    i * 0x9E3779B97F4A7C15L // golden-ratio mix, full 64-bit spread

  test("banded pairs equal brute-force Hamming <= 3 incl. sign-bit codes") {
    val rows = (1L to 120L).map(i => (i, sig(i))) ++
      Seq((200L, sig(7L) ^ 1L), (201L, sig(7L) ^ 0x8000000000000001L))
    val df = rows.toDF("id", "h")
    val got = graft.operators.Dedup.hashPairs64(df, "id", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got === brute)
    assert(brute.exists(_._3 == 2), "fixture must exercise the sign chunk")
  }

  test("beyond the pigeonhole bound is best-effort: chunk-sharers found") {
    // distance 4 spread over two chunks: still found (shares 2 chunks);
    // distance 4 spread over all four chunks: correctly never a candidate
    val base = sig(42L)
    val twoChunks = base ^ 0x0000000300000003L
    val fourChunks = base ^ 0x1000100010001000L
    val df = Seq((1L, base), (2L, twoChunks), (3L, fourChunks))
      .toDF("id", "h")
    val got = graft.operators.Dedup.hashPairs64(df, "id", "h", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.contains((1L, 3L)), "all-chunks-differ pair must not collide")
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.hashPairs64(df, "id", "h", maxHamming = 65)
    }
  }
}
