package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, GraphAnn}

/** Recall-regression gates for the approximate ANN paths. The planted
  * oracle gates (a2/a3) prove the happy path exactly, but a parameter or
  * kernel regression that degrades ORGANIC candidate quality can keep
  * planted copies (cosine 1.0 — every bucket and probe agrees on them)
  * while recall on real neighbors quietly collapses. This suite measures
  * recall@10 against brute-force ground truth over organic queries at
  * sf0.01.
  *
  * Absolute levels here reflect the DATA, not a defect: the synthetic
  * embeddings are near-orthogonal random vectors — the known worst case
  * for ANN, where neighbor gaps are tiny and high recall requires
  * scanning a large corpus fraction (measured sweep: LSH planes=12/
  * probe=3 → 0.21, planes=8/probe=4 → 0.83; IVF 16/4 → 0.55, 16/10 →
  * 0.90). Real embedding corpora cluster, and these parameters behave
  * far better there. So the gate pins TWO things: (1) the gate-default
  * parameters at measured-minus-margin floors — a kernel/seeding
  * regression shows up as a drop below them; (2) a tuned configuration
  * at a high floor — the probe-budget knobs must actually buy recall.
  * Everything here is deterministic (seeded hyperplanes, seeded k-means,
  * fixed data), so the floors cannot flap. */
class RecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val k = 10

  private def topIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSet

  private lazy val emb =
    spark.read.option("pathGlobFilter", "embeddings.parquet").parquet(dir)

  private lazy val queries = emb.filter(col("vec_id") < 20)
    .select("vec_id", "embedding").collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private lazy val truth: Map[Long, Set[Long]] = queries.map { case (qid, qv) =>
    qid -> topIds(Ann.bruteForceTopK(emb, "vec_id", "embedding", qv,
      k = k, excludeIds = Seq(qid)))
  }.toMap

  private def avgRecall(top: (Long, Array[Float]) => Set[Long]): Double = {
    val rs = queries.map { case (qid, qv) =>
      (top(qid, qv) & truth(qid)).size.toDouble / k
    }
    rs.sum / rs.size
  }

  test("gate-default parameters hold their measured recall floors") {
    assert(queries.length == 20)
    // a2's parameters (numPlanes=12, maxHammingProbe=3): measured 0.21
    val lsh = avgRecall((qid, qv) => topIds(Ann.lshTopK(emb, "vec_id",
      "embedding", dim = 64, qv, k = k, numPlanes = 12, maxHammingProbe = 3,
      excludeIds = Seq(qid))))
    // a3's parameters (nlist=16, nprobe=4): measured 0.545
    val ivf16 = Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 16)
    val ivf = avgRecall((qid, qv) => topIds(Ann.ivfTopK(ivf16, "vec_id",
      "embedding", qv, k = k, nprobe = 4, excludeIds = Seq(qid))))
    info(f"gate-default recall@10: lsh=$lsh%.3f ivf=$ivf%.3f")
    assert(lsh >= 0.15, f"LSH recall@10 regressed: $lsh%.3f < 0.15")
    assert(ivf >= 0.45, f"IVF recall@10 regressed: $ivf%.3f < 0.45")
  }

  test("soft multi-assignment lifts organic recall at fixed nprobe") {
    // SPANN-style boundary recovery: assignTop=2 stores each row in its
    // two nearest clusters, so a vector near a cluster boundary is found
    // when only its runner-up cluster is probed. Same centroids (same
    // seed/corpus → identical Lloyd refinement), same nprobe=4 — the only
    // change is the stored layout, so the delta IS the boundary effect.
    val ivf1 = Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 16)
    val ivf2 = Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 16,
      assignTop = 2)
    def recallOf(ix: Ann.IvfIndex) = avgRecall((qid, qv) =>
      topIds(Ann.ivfTopK(ix, "vec_id", "embedding", qv, k = k,
        nprobe = 4, excludeIds = Seq(qid))))
    val r1 = recallOf(ivf1)
    val r2 = recallOf(ivf2)
    info(f"IVF recall@10 at nprobe=4: assignTop=1 $r1%.3f, assignTop=2 $r2%.3f")
    assert(r2 > r1, f"assignTop=2 must beat single assignment: $r2%.3f <= $r1%.3f")
    // results stay duplicate-free despite the stored copies
    val (qid, qv) = queries.head
    val ids = Ann.ivfTopK(ivf2, "vec_id", "embedding", qv, k = k,
      nprobe = 4, excludeIds = Seq(qid)).select("vec_id")
      .collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "duplicate id in top-k")
    // and the multi-assigned layout round-trips through persistence
    val path = tmpDir("ivf_top2")
    Ann.ivfWrite(ivf2, path)
    val back = Ann.ivfRead(spark, path)
    assert(back.assignTop == 2)
    assert(recallOf(back) == r2)
  }

  // Slow: the statistical depth variant of the composition the a15c gate
  // pins exactly (planted truth) and the untagged multi-assign IVF test
  // measures on the same layout delta — ~16 s of the default budget
  test("graph ANN composes with soft multi-assignment: the boundary " +
      "recall lift carries to the serving index", Slow) {
    // same layout delta as the IVF test above (identical seed → identical
    // centroids), probed through per-cluster NSW walks at full beam: the
    // walk is exact within probed clusters, so candidates under
    // assignTop=2 are a per-query SUPERSET and the lift IS the boundary
    // effect the a16 machinery bought — now available to the graph index.
    val g1 = GraphAnn.nswBuild(
      Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 16),
      "vec_id", m = 8, efConstruction = 32)
    val g2 = GraphAnn.nswBuild(
      Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 16, assignTop = 2),
      "vec_id", m = 8, efConstruction = 32)
    def recallOf(g: GraphAnn.NswIndex) = avgRecall((qid, qv) =>
      topIds(GraphAnn.nswTopK(g, qv, k = k, nprobe = 4, ef = 512,
        excludeIds = Seq(qid))))
    val r1 = recallOf(g1)
    val r2 = recallOf(g2)
    info(f"graph recall@10 at nprobe=4: assignTop=1 $r1%.3f, assignTop=2 $r2%.3f")
    assert(r2 > r1,
      f"assignTop=2 graph probe must lift organic recall: $r2%.3f <= $r1%.3f")
  }

  test("recall holds over an APPENDED corpus, not just the build corpus") {
    // the planted a3b gate proves exact-copy retrieval through the append
    // path; this floor proves ORGANIC neighbor quality survives it — an
    // append-path kernel or assignment regression (wrong tie-break, stale
    // centroids, dropped rows) shows up here as a recall drop vs the
    // brute-force truth computed over the FULL corpus including appends
    val path = tmpDir("ivf_appended_recall")
    val build = emb.filter(col("vec_id") % 5 =!= 4)
    val growth = emb.filter(col("vec_id") % 5 === 4)
    Ann.ivfWrite(Ann.ivfBuild(build, "vec_id", "embedding", nlist = 16), path)
    Ann.ivfAppend(spark, path, growth, "vec_id", "embedding", "growth")
    val idx = Ann.ivfRead(spark, path)
    val r = avgRecall((qid, qv) => topIds(Ann.ivfTopK(idx, "vec_id",
      "embedding", qv, k = k, nprobe = 10, excludeIds = Seq(qid))))
    info(f"appended-corpus IVF recall@10 (nprobe=10): $r%.3f")
    assert(r >= 0.80, f"appended-corpus recall@10 regressed: $r%.3f < 0.80")
    // and the same-distribution growth batch must not read as drift. The
    // threshold is calibrated for THIS data: the sidecar baseline is
    // in-sample, and on near-orthogonal random vectors the k-means
    // generalization gap alone measures ~0.106 — a default-threshold
    // false-positive documented in ivfDriftReport's scaladoc, not drift
    val drift = Ann.ivfDriftReport(spark, path, maxDrop = 0.2).collect()
    assert(drift.length == 1 && !drift.head.getBoolean(5),
      s"same-distribution append flagged as drift: ${drift.mkString}")
  }

  test("JOIN-path recall floors: annJoin / ivfJoin / ivfPqJoin over organic queries") {
    // the per-query agreement specs pin each join to its single-query
    // counterpart, but would only miss a regression if BOTH paths broke
    // identically; this floor runs the JOIN paths themselves against
    // brute-force truth, so a mask-list, probe-explode, or ADC regression
    // that degrades organic neighbor quality shows up directly
    import graft.operators.Pq
    val corpus = emb.filter(col("vec_id") >= 20)
    val qdf = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val joinTruth: Map[Long, Set[Long]] = queries.map { case (qid, qv) =>
      qid -> topIds(Ann.bruteForceTopK(corpus, "vec_id", "embedding", qv, k = k))
    }.toMap
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val by = res.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      queries.map { case (qid, _) =>
        (by.getOrElse(qid, Array.empty).map(_._2).toSet & joinTruth(qid)).size
          .toDouble / k
      }.sum / queries.length
    }
    // a6's family at the tuned-LSH budget (planes=8, Hamming<=2)
    val annR = recallOf(Ann.annJoin(qdf, corpus, "query_id", "vec_id",
      "embedding", dim = 64, k = k, numPlanes = 8, maxHamming = 2))
    // a7 at ivfTopK's tuned budget (nprobe=10/16 — single-query floor 0.80)
    val idx = Ann.ivfBuild(corpus, "vec_id", "embedding", nlist = 16)
    val ivfR = recallOf(Ann.ivfJoin(qdf, idx, "query_id", "vec_id",
      "embedding", k = k, nprobe = 10))
    // a8: same routing, quantized scoring — recall is bounded by PQ loss
    // on near-orthogonal random vectors (the documented worst case), so
    // its floor pins regressions, not absolute quality
    val model = Pq.pqTrain(corpus, "vec_id", "embedding", m = 8, k = 16)
    val serving = Pq.ivfPqEncode(idx, "vec_id", "embedding", model)
    val pqR = recallOf(Pq.ivfPqJoin(qdf, serving, idx.centroids, model,
      "query_id", "vec_id", "embedding", k = k, nprobe = 10))
    // measured on this (deterministic) data: ann 0.295 (Hamming<=2 caps
    // the probe budget below lshTopK's probe=4 regime), ivf 0.880,
    // ivfpq 0.235; floors sit measured-minus-margin, the suite's policy
    info(f"join recall@10: ann=$annR%.3f ivf=$ivfR%.3f ivfpq=$pqR%.3f")
    assert(annR >= 0.22, f"annJoin recall@10 regressed: $annR%.3f")
    assert(ivfR >= 0.80, f"ivfJoin recall@10 regressed: $ivfR%.3f")
    assert(pqR >= 0.15, f"ivfPqJoin recall@10 regressed: $pqR%.3f")
  }

  test("probe budget buys recall: tuned configurations clear a high floor") {
    // LSH with wider buckets + probe (8 planes, Hamming<=4): measured 0.83
    val lsh = avgRecall((qid, qv) => topIds(Ann.lshTopK(emb, "vec_id",
      "embedding", dim = 64, qv, k = k, numPlanes = 8, maxHammingProbe = 4,
      excludeIds = Seq(qid))))
    // IVF probing 10/16 clusters: measured 0.90
    val ivf16 = Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 16)
    val ivf = avgRecall((qid, qv) => topIds(Ann.ivfTopK(ivf16, "vec_id",
      "embedding", qv, k = k, nprobe = 10, excludeIds = Seq(qid))))
    info(f"tuned recall@10: lsh=$lsh%.3f ivf=$ivf%.3f")
    assert(lsh >= 0.75, f"tuned LSH recall@10 regressed: $lsh%.3f < 0.75")
    assert(ivf >= 0.80, f"tuned IVF recall@10 regressed: $ivf%.3f < 0.80")
  }
}
