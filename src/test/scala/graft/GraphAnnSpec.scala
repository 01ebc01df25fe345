package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, GraphAnn}

/** Per-cluster NSW graph ANN: exactness at full beam, determinism across
  * partitionings, degree bounds, the approximate regime's recall, and
  * result-only exclusion semantics. */
class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-embeddings, all DISTINCT directions (a golden-
  // ratio mix; a small-period formula would fill the corpus with exact
  // duplicates, and a plateau of cosine ties is a degenerate regime the
  // full-beam test covers anyway)
  private def vec(id: Long, dim: Int): Array[Float] =
    Array.tabulate(dim) { j =>
      val h = (id * 0x9E3779B97F4A7C15L + j * 0xBF58476D1CE4E5B9L)
      (((h >>> 40) & 0x3FF) / 512.0f) - 1f
    }

  private def corpus(n: Int, dim: Int = 16) =
    (0L until n.toLong).map(i => (i, vec(i, dim))).toDF("id", "emb")

  test("full-beam search equals brute-force top-k over probed clusters") {
    val df = corpus(150)
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 4)
    val nsw = GraphAnn.nswBuild(idx, "id", m = 4, efConstruction = 16)
    val q = vec(7L, 16)
    // nprobe = nlist: every cluster probed, full beam -> must be EXACT
    val got = GraphAnn.nswTopK(nsw, q, k = 10, nprobe = 4, ef = 200)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    val brute = Ann.bruteForceTopK(df, "id", "emb", q, 10)
      .orderBy("rank").collect().map(_.getLong(0)).toSeq
    assert(got == brute)
  }

  test("graph build is partitioning-invariant and degree-bounded") {
    val df = corpus(120)
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 3)
    val a = GraphAnn.nswBuild(idx, "id", m = 4, efConstruction = 16)
    val b = GraphAnn.nswBuild(
      Ann.IvfIndex(idx.centroids, idx.clustered.repartition(13), idx.vecCol),
      "id", m = 4, efConstruction = 16)
    assert(canon(a.adjacency) == canon(b.adjacency))
    val maxDeg = a.adjacency.select(size(col("neighbors")).as("d"))
      .agg(max("d")).collect().head.getInt(0)
    assert(maxDeg <= 10, s"degree $maxDeg exceeds 2m + 2 chain edges")
    // every row of the base frame has a graph row
    assert(a.adjacency.count() == df.count())
  }

  test("narrow beam still finds a planted exact duplicate") {
    // a direction the periodic corpus formula never produces, so the
    // planted twin is the UNIQUE cosine-1.0 row for this query
    val novel = Array.tabulate(16)(j => if (j == 0) 10f else 0.1f * j)
    val df = corpus(300).unionByName(Seq((9000L, novel)).toDF("id", "emb"))
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 4)
    val nsw = GraphAnn.nswBuild(idx, "id", m = 6, efConstruction = 24)
    // beam of 20 over ~75-node clusters: the greedy walk must still reach
    // the planted cosine-1.0 twin of the query
    val got = GraphAnn.nswTopK(nsw, novel, k = 5, nprobe = 2, ef = 20)
      .orderBy("rank").collect()
    assert(got.head.getLong(0) == 9000L,
      s"planted twin not rank 1: ${got.map(_.getLong(0)).mkString(",")}")
    // excludeIds drops from results (the same query minus the twin)
    val excl = GraphAnn.nswTopK(nsw, novel, k = 5, nprobe = 2, ef = 20,
        excludeIds = Seq(9000L))
      .collect().map(_.getLong(0)).toSet
    assert(!excl.contains(9000L), "excluded id surfaced")
  }

  test("approximate regime: recall@10 against brute force at modest ef") {
    val df = corpus(400)
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 4)
    val nsw = GraphAnn.nswBuild(idx, "id", m = 6, efConstruction = 24)
    val q = vec(1234L, 16)
    val got = GraphAnn.nswTopK(nsw, q, k = 10, nprobe = 4, ef = 32)
      .collect().map(_.getLong(0)).toSet
    val brute = Ann.bruteForceTopK(df, "id", "emb", q, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = got.intersect(brute).size / 10.0
    assert(recall >= 0.8, s"recall@10 = $recall below floor")
  }

  test("persisted graph round-trips; probes agree; stale graph refuses") {
    val df = corpus(120)
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 3)
    val nsw = GraphAnn.nswBuild(idx, "id", m = 4, efConstruction = 16)
    val dir = java.nio.file.Files.createTempDirectory("nsw").toString
    GraphAnn.nswWrite(nsw, dir)
    val back = GraphAnn.nswRead(spark, dir)
    assert(back.m == 4 && back.efConstruction == 16 && back.idCol == "id")
    val q = vec(55L, 16)
    assert(
      GraphAnn.nswTopK(back, q, k = 5, nprobe = 3, ef = 200)
        .orderBy("rank").collect().map(_.getLong(0)).toSeq ==
      GraphAnn.nswTopK(nsw, q, k = 5, nprobe = 3, ef = 200)
        .orderBy("rank").collect().map(_.getLong(0)).toSeq)
    // an append without a graph update must refuse at read
    Ann.ivfAppend(spark, dir,
      Seq((500L, vec(500L, 16))).toDF("id", "emb"), "id", "emb", tag = "t1")
    val e = intercept[IllegalArgumentException] {
      GraphAnn.nswRead(spark, dir)
    }
    assert(e.getMessage.contains("nswAppend") ||
      e.getMessage.contains("nswBuild"))
  }

  test("nswAppend equals a full rebuild (adjacency and probes) and " +
      "replays idempotently") {
    val df = corpus(150)
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 3)
    val dir = java.nio.file.Files.createTempDirectory("nswapp").toString
    GraphAnn.nswWrite(GraphAnn.nswBuild(idx, "id", m = 4, efConstruction = 16),
      dir)
    val batch = (1000L until 1020L).map(i => (i, vec(i, 16))).toDF("id", "emb")
    assert(GraphAnn.nswAppend(spark, dir, batch, "id", "emb", "b0") == 20L)
    val grown = GraphAnn.nswRead(spark, dir) // witness must accept
    // rebuild over the SAME frozen centroids and post-append base: the
    // monotone-id contract makes append's insertion order equal the
    // rebuild's, so the adjacency must be bit-identical
    val rebuilt = GraphAnn.nswBuild(Ann.ivfRead(spark, dir), "id",
      m = 4, efConstruction = 16)
    assert(canon(grown.adjacency) == canon(rebuilt.adjacency))
    val q = vec(1005L, 16)
    assert(
      GraphAnn.nswTopK(grown, q, k = 8, nprobe = 3, ef = 200)
        .orderBy("rank").collect().map(_.getLong(0)).toSeq ==
      GraphAnn.nswTopK(rebuilt, q, k = 8, nprobe = 3, ef = 200)
        .orderBy("rank").collect().map(_.getLong(0)).toSeq)
    // replaying the same tag converges: same adjacency, witness intact
    assert(GraphAnn.nswAppend(spark, dir, batch, "id", "emb", "b0") == 20L)
    assert(canon(GraphAnn.nswRead(spark, dir).adjacency) ==
      canon(rebuilt.adjacency))
  }

  test("delete-then-append of equal size is refused by the id checksum") {
    val df = corpus(120)
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 3)
    val dir = java.nio.file.Files.createTempDirectory("nswxor").toString
    GraphAnn.nswWrite(GraphAnn.nswBuild(idx, "id", m = 4, efConstruction = 16),
      dir)
    // tombstone one row, append one NEW row: base count matches the
    // sidecar exactly — only the id checksum can see the swap
    Ann.ivfDelete(spark, dir, Seq(7L).toDF("id"))
    Ann.ivfAppend(spark, dir, Seq((2000L, vec(2000L, 16))).toDF("id", "emb"),
      "id", "emb", tag = "swap")
    val e = intercept[IllegalArgumentException] { GraphAnn.nswRead(spark, dir) }
    assert(e.getMessage.contains("checksum"))
    // and nswAppend onto the drifted base refuses too (no laundering)
    val e2 = intercept[IllegalArgumentException] {
      GraphAnn.nswAppend(spark, dir,
        Seq((3000L, vec(3000L, 16))).toDF("id", "emb"), "id", "emb", "b9")
    }
    assert(e2.getMessage.contains("drifted"))
  }

  test("non-monotone (backfill) append falls back to a per-cluster " +
      "rebuild and still equals the full rebuild") {
    val df = (10L until 130L).map(i => (i, vec(i, 16))).toDF("id", "emb")
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 3)
    val dir = java.nio.file.Files.createTempDirectory("nswmono").toString
    GraphAnn.nswWrite(GraphAnn.nswBuild(idx, "id", m = 4, efConstruction = 16),
      dir)
    // id 5 sorts below every existing id: its cluster takes the rebuild
    // path; untouched clusters keep their incremental graphs
    assert(GraphAnn.nswAppend(spark, dir,
      Seq((5L, vec(5L, 16))).toDF("id", "emb"), "id", "emb", "mono") == 1L)
    val grown = GraphAnn.nswRead(spark, dir)
    val rebuilt = GraphAnn.nswBuild(Ann.ivfRead(spark, dir), "id",
      m = 4, efConstruction = 16)
    assert(canon(grown.adjacency) == canon(rebuilt.adjacency))
    val got = GraphAnn.nswTopK(grown, vec(5L, 16), k = 3, nprobe = 3,
      ef = 200).orderBy("rank").collect()
    assert(got.head.getLong(0) == 5L, "backfilled id must be reachable")
  }

  test("soft multi-assignment composes: per-copy nodes, dedup'd probes, " +
      "boundary recall never drops") {
    val df = corpus(400)
    val idx1 = Ann.ivfBuild(df, "id", "emb", nlist = 8)
    val idx2 = Ann.ivfBuild(df, "id", "emb", nlist = 8, assignTop = 2)
    val nsw1 = GraphAnn.nswBuild(idx1, "id", m = 6, efConstruction = 24)
    val nsw2 = GraphAnn.nswBuild(idx2, "id", m = 6, efConstruction = 24)
    // one graph node per stored copy
    assert(nsw2.adjacency.count() == 2 * df.count())
    // full beam isolates the layout effect: within the probed clusters
    // the walk is exact, so any recall delta IS the boundary coverage
    // nprobe=1 maximizes the boundary exposure: a row whose true home is
    // the runner-up cluster is invisible to the single-assignment probe.
    // Candidates under assignTop=2 are a SUPERSET per probed cluster
    // (same seed → identical Lloyd centroids), so r2 >= r1 must hold
    // query-by-query — the assertion cannot flap.
    val queries = (500L until 515L).map(vec(_, 16))
    def recallOf(nsw: GraphAnn.NswIndex): Double = {
      val rs = queries.map { q =>
        val got = GraphAnn.nswTopK(nsw, q, k = 10, nprobe = 1, ef = 400)
          .collect().map(_.getLong(0))
        assert(got.length == got.distinct.length, "duplicate id in top-k")
        val brute = Ann.bruteForceTopK(df, "id", "emb", q, 10)
          .collect().map(_.getLong(0)).toSet
        got.count(brute).toDouble / 10.0
      }
      rs.sum / rs.size
    }
    val r1 = recallOf(nsw1)
    val r2 = recallOf(nsw2)
    info(f"graph recall@10 at nprobe=1: assignTop=1 $r1%.3f, assignTop=2 $r2%.3f")
    assert(r2 >= r1,
      f"assignTop=2 graph probe must not lose recall: $r2%.3f < $r1%.3f")
  }

  test("multi-assigned graph index persists, appends, and equals rebuild") {
    val df = corpus(150)
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 3, assignTop = 2)
    val dir = java.nio.file.Files.createTempDirectory("nswma").toString
    GraphAnn.nswWrite(GraphAnn.nswBuild(idx, "id", m = 4, efConstruction = 16),
      dir)
    val back = GraphAnn.nswRead(spark, dir) // per-copy witness must accept
    assert(back.base.assignTop == 2)
    // append: every copy's cluster graph must grow (the return counts
    // STORED rows — batch × assignTop copies, the ivfAppend contract)
    val batch = (1000L until 1010L).map(i => (i, vec(i, 16))).toDF("id", "emb")
    assert(GraphAnn.nswAppend(spark, dir, batch, "id", "emb", "ma0") == 20L)
    val grown = GraphAnn.nswRead(spark, dir)
    assert(grown.adjacency.count() == 2 * (df.count() + 10))
    val rebuilt = GraphAnn.nswBuild(Ann.ivfRead(spark, dir), "id",
      m = 4, efConstruction = 16)
    assert(canon(grown.adjacency) == canon(rebuilt.adjacency))
    // replay converges (the tag idempotency carries to the copies)
    assert(GraphAnn.nswAppend(spark, dir, batch, "id", "emb", "ma0") == 20L)
    assert(canon(GraphAnn.nswRead(spark, dir).adjacency) ==
      canon(rebuilt.adjacency))
    // the even-assignTop xor-cancellation trap: a delete+append swap of
    // equal size must still be visible to the per-copy checksum
    Ann.ivfDelete(spark, dir, Seq(7L).toDF("id"))
    Ann.ivfAppend(spark, dir, Seq((5000L, vec(5000L, 16))).toDF("id", "emb"),
      "id", "emb", tag = "swap-ma")
    val e = intercept[IllegalArgumentException] { GraphAnn.nswRead(spark, dir) }
    assert(e.getMessage.contains("checksum"))
  }

  test("nswDelete: touched clusters equal a fresh rebuild, untouched " +
      "partitions survive, emptied clusters vanish, replay converges") {
    val df = corpus(150)
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 4)
    val dir = java.nio.file.Files.createTempDirectory("nswdel").toString
    GraphAnn.nswWrite(GraphAnn.nswBuild(idx, "id", m = 4, efConstruction = 16),
      dir)
    // delete a handful of ids spread across clusters
    val doomed = Seq(3L, 7L, 50L, 99L)
    assert(GraphAnn.nswDelete(spark, dir, doomed.toDF("id")) == 4L)
    val after = GraphAnn.nswRead(spark, dir) // witness must accept
    assert(after.adjacency.filter(col("id").isin(doomed: _*)).count() == 0)
    val rebuilt = GraphAnn.nswBuild(Ann.ivfRead(spark, dir), "id",
      m = 4, efConstruction = 16)
    assert(canon(after.adjacency) == canon(rebuilt.adjacency))
    // deleted ids never surface; probes agree with the rebuild
    val q = vec(7L, 16)
    val got = GraphAnn.nswTopK(after, q, k = 10, nprobe = 4, ef = 400)
      .collect().map(_.getLong(0)).toSet
    assert(got.intersect(doomed.toSet).isEmpty, "ghost id surfaced")
    // replaying the same delete is a no-op
    assert(GraphAnn.nswDelete(spark, dir, doomed.toDF("id")) == 4L)
    assert(canon(GraphAnn.nswRead(spark, dir).adjacency) ==
      canon(rebuilt.adjacency))
    // appends still work after a delete (the lifecycle composes)
    assert(GraphAnn.nswAppend(spark, dir,
      Seq((1000L, vec(1000L, 16))).toDF("id", "emb"), "id", "emb", "pd") == 1L)
    GraphAnn.nswRead(spark, dir)
  }

  test("nswDelete composes with soft multi-assignment: every copy goes") {
    val df = corpus(120)
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 3, assignTop = 2)
    val dir = java.nio.file.Files.createTempDirectory("nswdelma").toString
    GraphAnn.nswWrite(GraphAnn.nswBuild(idx, "id", m = 4, efConstruction = 16),
      dir)
    assert(GraphAnn.nswDelete(spark, dir, Seq(7L, 30L).toDF("id")) == 2L)
    val after = GraphAnn.nswRead(spark, dir) // per-copy witness accepts
    assert(after.adjacency.filter(col("id").isin(7L, 30L)).count() == 0,
      "a soft copy survived the delete")
    val rebuilt = GraphAnn.nswBuild(Ann.ivfRead(spark, dir), "id",
      m = 4, efConstruction = 16)
    assert(canon(after.adjacency) == canon(rebuilt.adjacency))
  }

  test("nswDelete empties a whole cluster: its graph partition is " +
      "removed, not left as ghost nodes") {
    // two far-apart blobs -> 2 clusters; delete every row of one blob
    val blobA = (0L until 20L).map(i => (i, Array.tabulate(8)(j =>
      1f + 0.001f * i * j)))
    val blobB = (100L until 120L).map(i => (i, Array.tabulate(8)(j =>
      (if (j % 2 == 0) -1f else 1f) + 0.001f * i)))
    val df = (blobA ++ blobB).toDF("id", "emb")
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 2)
    val dir = java.nio.file.Files.createTempDirectory("nswempty").toString
    GraphAnn.nswWrite(GraphAnn.nswBuild(idx, "id", m = 4, efConstruction = 16),
      dir)
    // find which cluster holds blob B and delete ALL of it
    val bCluster = Ann.ivfRead(spark, dir).clustered
      .filter(col("id") >= 100L).select("gr_cluster").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (bCluster.length == 1) { // both-blobs-one-cluster would be vacuous
      GraphAnn.nswDelete(spark, dir, (100L until 120L).toDF("id"))
      val after = GraphAnn.nswRead(spark, dir)
      assert(after.adjacency
        .filter(col("gr_cluster") === bCluster.head).count() == 0,
        "emptied cluster left ghost graph nodes")
      assert(after.adjacency.count() == 20)
    }
  }

  test("oversized cluster refuses loudly with the nlist remedy") {
    val df = corpus(50)
    val idx = Ann.ivfBuild(df, "id", "emb", nlist = 2)
    // the guard runs inside the build kernel (no separate pre-check
    // pass), so the refusal surfaces at the first action on the graph
    val e = intercept[Exception] {
      GraphAnn.nswBuild(idx, "id", m = 4, efConstruction = 8,
        maxClusterNodes = 10).adjacency.count()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(msgs.contains("nlist") && msgs.contains("maxClusterNodes"))
  }
}
