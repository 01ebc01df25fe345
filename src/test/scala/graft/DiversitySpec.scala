package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Sampling}

/** MMR re-rank pinned against a driver-side reference greedy that uses the
  * IDENTICAL double arithmetic (sequential fold cosine, λ·rel − (1−λ)·max). */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def refCosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Reference greedy MMR over one query's candidate list. */
  private def refMmr(
      cands: Seq[(Long, Array[Float], Double)],
      k: Int, lambda: Double): Seq[(Long, Int)] = {
    var picked = Vector.empty[(Long, Array[Float])]
    var out = Vector.empty[(Long, Int)]
    for (step <- 1 to k) {
      val remaining = cands.filterNot(c => picked.exists(_._1 == c._1))
      val scored = remaining.map { case (id, v, rel) =>
        val score =
          if (picked.isEmpty) rel
          else lambda * rel -
            (1.0 - lambda) * picked.map(p => refCosine(v, p._2)).max
        (id, v, score)
      }
      val best = scored.minBy { case (id, _, s) => (-s, id) }
      picked :+= ((best._1, best._2))
      out :+= ((best._1, step))
    }
    out
  }

  private def mkCands(queryId: Long, rows: Seq[(Long, Array[Float])],
      query: Array[Float]): Seq[(Long, Array[Float], Double)] =
    rows.map { case (id, v) => (id, v, refCosine(v, query)) }

  /** Deterministic pseudo-random vectors (no RNG in tests that pin values). */
  private def vec(seed: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(i => (((seed * 31 + i * 17) % 97) - 48) / 48.0f)

  test("mmrRerank equals the reference greedy over pseudo-random candidates") {
    val query = vec(7, 8)
    val rows = (1L to 15L).map(id => (id, vec(id * 13 + 1, 8)))
    val cands = mkCands(0L, rows, query)
    val df = cands.map { case (id, v, rel) => (0L, id, v.toSeq, rel) }
      .toDF("query_id", "vec_id", "embedding", "rel")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    for (lambda <- Seq(0.5, 0.7)) {
      val got = Ann.mmrRerank(df, "query_id", "vec_id", "embedding", "rel",
          k = 5, lambda = lambda)
        .orderBy("step").collect()
        .map(r => (r.getLong(1), r.getInt(2))).toSeq
      assert(got === refMmr(cands, 5, lambda), s"lambda=$lambda")
    }
  }

  test("lambda = 1.0 degenerates to pure relevance ranking") {
    val query = vec(3, 8)
    val rows = (1L to 10L).map(id => (id, vec(id * 7 + 5, 8)))
    val cands = mkCands(0L, rows, query)
    val df = cands.map { case (id, v, rel) => (0L, id, v.toSeq, rel) }
      .toDF("query_id", "vec_id", "embedding", "rel")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = Ann.mmrRerank(df, "query_id", "vec_id", "embedding", "rel",
        k = 4, lambda = 1.0)
      .orderBy("step").collect().map(_.getLong(1)).toSeq
    val byRel = cands.sortBy { case (id, _, rel) => (-rel, id) }
      .take(4).map(_._1)
    assert(got === byRel)
  }

  test("diversification: near-duplicate of the seed loses to a distinct doc") {
    // seed direction (id 1), an almost-identical duplicate (id 2), and a
    // clearly different direction (id 3); with λ=0.5 the duplicate's
    // marginal gain collapses and step 2 must take the distinct doc
    val a = Array(1.0f, 0.0f, 0.0f, 0.1f)
    val dup = Array(0.999f, 0.01f, 0.0f, 0.1f)
    val div = Array(0.1f, 1.0f, 0.3f, 0.0f)
    val query = Array(0.9f, 0.1f, 0.05f, 0.1f)
    val cands = mkCands(0L, Seq((1L, a), (2L, dup), (3L, div)), query)
    val df = cands.map { case (id, v, rel) => (0L, id, v.toSeq, rel) }
      .toDF("query_id", "vec_id", "embedding", "rel")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = Ann.mmrRerank(df, "query_id", "vec_id", "embedding", "rel", k = 2)
      .orderBy("step").collect().map(_.getLong(1)).toSeq
    assert(got === refMmr(cands, 2, 0.5).map(_._1))
    // the distinct doc displaces the near-duplicate at step 2 — pure
    // relevance (λ=1) would have taken both members of the dup pair
    assert(got(1) === 3L)
    val pureRel = cands.sortBy { case (id, _, rel) => (-rel, id) }
      .take(2).map(_._1)
    assert(pureRel.toSet === Set(1L, 2L))
  }

  test("barrier fallback (non-integral id type) matches the grouped kernel") {
    // double ids route to the legacy join-chain path (the kernel only
    // replicates Catalyst's ordering for integral/string ids); both
    // paths must agree with the reference greedy
    val query = vec(5, 8)
    val rows = (1L to 10L).map(id => (id, vec(id * 11 + 3, 8)))
    val cands = mkCands(0L, rows, query)
    val long = cands.map { case (id, v, rel) => (0L, id, v.toSeq, rel) }
      .toDF("query_id", "vec_id", "embedding", "rel")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val dbl = long.withColumn("vec_id", col("vec_id").cast("double"))
    val viaKernel = Ann.mmrRerank(long, "query_id", "vec_id", "embedding",
        "rel", k = 4)
      .orderBy("step").collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    val viaBarrier = Ann.mmrRerank(dbl, "query_id", "vec_id", "embedding",
        "rel", k = 4)
      .orderBy("step").collect()
      .map(r => (r.getDouble(1).toLong, r.getInt(2))).toSeq
    assert(viaKernel === refMmr(cands, 4, 0.5))
    assert(viaBarrier === viaKernel)
  }

  test("barrier fallback (non-integral query type) matches the grouped kernel") {
    // double query keys route to the join-chain path: the kernel's group
    // key (String.valueOf) is not injective on doubles (-0.0 vs 0.0) nor
    // on binary/struct/array query values, where SQL grouping semantics
    // differ from the rendered-string key
    val query = vec(9, 8)
    val rows = (1L to 10L).map(id => (id, vec(id * 7 + 2, 8)))
    val cands = mkCands(0L, rows, query)
    val long = cands.map { case (id, v, rel) => (0L, id, v.toSeq, rel) }
      .toDF("query_id", "vec_id", "embedding", "rel")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val dblQ = long.withColumn("query_id", col("query_id").cast("double"))
    val viaKernel = Ann.mmrRerank(long, "query_id", "vec_id", "embedding",
        "rel", k = 4)
      .orderBy("step").collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    val out = Ann.mmrRerank(dblQ, "query_id", "vec_id", "embedding", "rel",
      k = 4)
    // routed to the barrier path: no grouped-kernel node in the plan
    assert(!out.queryExecution.analyzed.toString.contains("MapGroups"),
      out.queryExecution.analyzed.toString)
    val viaBarrier = out.orderBy("step").collect()
      .map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(viaKernel === refMmr(cands, 4, 0.5))
    assert(viaBarrier === viaKernel)
  }

  test("the default candidate cap refuses shortlists above 65536") {
    // the default must fire while one task buffers a shortlist-scale
    // list — NOT after it has accumulated a corpus-scale buffer
    val big = spark.range(70000).select(
      lit(0L).as("query_id"), col("id").as("vec_id"),
      array(lit(1.0f), lit(0.5f)).as("embedding"), lit(1.0).as("rel"))
    val e = intercept[org.apache.spark.SparkException] {
      Ann.mmrRerank(big, "query_id", "vec_id", "embedding", "rel", k = 1)
        .collect()
    }
    assert(e.getMessage.contains("maxCandidatesPerQuery") ||
      Option(e.getCause).exists(_.getMessage.contains("maxCandidatesPerQuery")))
  }

  test("kernel refuses a candidate list above maxCandidatesPerQuery") {
    val query = vec(2, 4)
    val rows = (1L to 6L).map(id => (id, vec(id * 3 + 1, 4)))
    val df = mkCands(0L, rows, query)
      .map { case (id, v, rel) => (0L, id, v.toSeq, rel) }
      .toDF("query_id", "vec_id", "embedding", "rel")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val e = intercept[org.apache.spark.SparkException] {
      Ann.mmrRerank(df, "query_id", "vec_id", "embedding", "rel", k = 2,
        maxCandidatesPerQuery = 5).collect()
    }
    assert(e.getMessage.contains("maxCandidatesPerQuery") ||
      Option(e.getCause).exists(_.getMessage.contains("maxCandidatesPerQuery")))
  }

  test("multi-query independence and plan has no cartesian/nested-loop join") {
    val qs = Seq(0L -> vec(3, 8), 1L -> vec(11, 8))
    val rowsPerQ = qs.map { case (qid, query) =>
      qid -> mkCands(qid, (1L to 8L).map(id => (id, vec(id * 5 + qid, 8))), query)
    }
    val df = rowsPerQ.flatMap { case (qid, cs) =>
      cs.map { case (id, v, rel) => (qid, id, v.toSeq, rel) }
    }.toDF("query_id", "vec_id", "embedding", "rel")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = Ann.mmrRerank(df, "query_id", "vec_id", "embedding", "rel", k = 3)
    val rows = out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    for ((qid, cs) <- rowsPerQ) {
      val got = rows.filter(_.getLong(0) == qid).sortBy(_.getInt(2))
        .map(_.getLong(1)).toSeq
      assert(got === refMmr(cs, 3, 0.5).map(_._1), s"query $qid")
    }
  }
}

/** Streaming left-outer time join: matched pairs plus watermark-proven
  * null extensions, via the staged-files + sentinel replay pattern. */
class StreamOuterJoinSpec extends SparkSpec {
  import spark.implicits._

  test("unmatched left rows null-extend; matched rows pair as inner") {
    val base = tmpDir("outerjoin") + "/src"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // click 100 has a view 5 min before (match); click 101's only view is
    // 20 min before (outside the 10-min lookback); click 102 has none.
    val data = Seq(
      (100L, 1L, ts(10), "click"), (900L, 1L, ts(5), "view"),
      (101L, 2L, ts(30), "click"), (901L, 2L, ts(10), "view"),
      (102L, 3L, ts(40), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    data.coalesce(1).write.parquet(base)
    def sentinel(days: Int) = Seq(
      (-1L, -1L, new java.sql.Timestamp(t0.getTime + days * 86400000L), "click"),
      (-2L, -1L, new java.sql.Timestamp(t0.getTime + days * 86400000L), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    sentinel(30).coalesce(1).write.mode("append").parquet(base)
    sentinel(60).coalesce(1).write.mode("append").parquet(base)
    val schema = spark.read.parquet(base).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(base)
    val clicks = stream.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts")
    val views = stream.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id", $"ts")
    val joined = graft.streaming.Streams.streamTimeJoin(
        clicks, views, "user_id", lookback = "10 minutes",
        delay = "1 minute", joinType = "left_outer")
      .select($"click_id", $"view_id")
    val got = graft.streaming.Streams.runToMemory(
        joined, "outer_spec", outputMode = "append")
      .filter($"click_id" >= 0)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(got === Set((100L, Some(900L)), (101L, None), (102L, None)))
  }
}

/** Distribution-matching downsample: every acceptance decision replayed on
  * the driver from the documented BIGINT inequality. */
class MatchDistributionSpec extends SparkSpec {
  import spark.implicits._

  private def h(salt: String, id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest((salt + id.toString).getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(3).map(b => f"$b%02x").mkString.take(5), 16)
  }

  private def df(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("id", "bin")

  test("acceptance matches the documented inequality row by row") {
    // bins 0/1/2 with 40/20/10 rows — uniform target makes bin 2 (highest
    // w/n) the keep-everything reference
    val rows = (0L until 70L).map(i => (i, if (i < 40) 0L else if (i < 60) 1L else 2L))
    val got = Sampling.matchDistribution(df(rows), "bin", "id", salt = "s1")
      .select("id").as[Long].collect().toSet
    val n = Map(0L -> 40L, 1L -> 20L, 2L -> 10L)
    val expected = rows.filter { case (id, bin) =>
      h("s1", id) * n(bin) * 1L < 1048576L * 1L * 10L
    }.map(_._1).toSet
    assert(got === expected)
    // the reference bin keeps everything
    assert(rows.filter(_._2 == 2L).map(_._1).toSet.subsetOf(got))
  }

  test("weighted target: zero-weight bin drops entirely, absent bin drops") {
    val rows = (0L until 30L).map(i => (i, i % 3))
    val kept = Sampling.matchDistribution(df(rows), "bin", "id",
        target = Map(0L -> 3L, 1L -> 0L), salt = "s2")
      .select("id", "bin").as[(Long, Long)].collect()
    assert(kept.forall(_._2 == 0L)) // bin 1 zero-weight, bin 2 absent
    assert(kept.map(_._1).toSet === rows.filter(_._2 == 0L).map(_._1).toSet)
  }

  test("partition-invariant: repartitioned input keeps the identical set") {
    val rows = (0L until 200L).map(i => (i, i % 4))
    val a = Sampling.matchDistribution(df(rows), "bin", "id")
      .select("id").as[Long].collect().toSet
    val b = Sampling.matchDistribution(df(rows).repartition(13), "bin", "id")
      .select("id").as[Long].collect().toSet
    assert(a === b)
  }

  test("null bins and null ids are excluded") {
    val rows = Seq((Some(1L), Some(0L)), (None, Some(0L)), (Some(2L), None))
      .toDF("id", "bin")
    val kept = Sampling.matchDistribution(rows, "bin", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
  }
}
