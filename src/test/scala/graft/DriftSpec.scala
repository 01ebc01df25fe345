package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Pq}

/** Maintenance telemetry for the frozen-model append contract: IVF appends
  * assign against build-time centroids forever, PQ appends encode against
  * build-time codebooks forever — standard practice, but a corpus whose
  * distribution shifts after build silently degrades recall, and the
  * RecallSpec floors only measure the build corpus. These specs pin the
  * drift signal: same-distribution appends must NOT flag, shifted
  * appends MUST.
  *
  * Data is deterministic: clustered vectors around two orthogonal-ish
  * centers (the distribution the index is built for) vs a third center
  * far from both (the shift). */
class DriftSpec extends SparkSpec {

  private val dim = 16

  /** id-keyed deterministic vector near one of two centers (unit-ish):
    * center A = e0-heavy, center B = e1-heavy, tiny id-dependent jitter. */
  private def nearVec(id: Long): Array[Float] = {
    val base = if (id % 2 == 0) 0 else 1
    Array.tabulate(dim) { i =>
      val c = if (i == base) 1.0f else 0.0f
      c + 0.01f * (((id * 31 + i * 7 + id * id % 101) % 23).toInt - 11)
    }
  }

  /** Shifted distribution: mass on the LAST axes, away from both centers. */
  private def shiftedVec(id: Long): Array[Float] =
    Array.tabulate(dim) { i =>
      val c = if (i == dim - 1 - (id % 2).toInt) 1.0f else 0.0f
      c + 0.01f * (((id * 17 + i * 13) % 11).toInt - 5)
    }

  private def frame(ids: Range, vec: Long => Array[Float]) = {
    import spark.implicits._
    ids.map(i => (i.toLong, vec(i.toLong))).toDF("vec_id", "embedding")
  }

  test("IVF drift report: same-distribution append clean, shifted append flagged") {
    val path = tmpDir("ivf_drift")
    val corpus = frame(0 until 200, nearVec)
    Ann.ivfWrite(Ann.ivfBuild(corpus, "vec_id", "embedding", nlist = 4), path)

    Ann.ivfAppend(spark, path, frame(1000 until 1060, nearVec),
      "vec_id", "embedding", "same-dist")
    Ann.ivfAppend(spark, path, frame(2000 until 2060, shiftedVec),
      "vec_id", "embedding", "shifted")

    val report = Ann.ivfDriftReport(spark, path).collect()
      .map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(report == Map("same-dist" -> false, "shifted" -> true), s"got $report")

    // replayed append overwrites its record — one row per tag, not two
    Ann.ivfAppend(spark, path, frame(1000 until 1060, nearVec),
      "vec_id", "embedding", "same-dist")
    assert(Ann.ivfDriftReport(spark, path).count() == 2)
  }

  test("IVF drift report refuses a pre-telemetry sidecar") {
    val path = tmpDir("ivf_drift_legacy")
    Ann.ivfWrite(Ann.ivfBuild(frame(0 until 100, nearVec),
      "vec_id", "embedding", nlist = 4), path)
    // simulate an index persisted before the baseline existed
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(path, Ann.IvfParamsSidecar), true)
    try out.write(s"""{"dim":$dim,"nlist":4}""".getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalArgumentException](Ann.ivfDriftReport(spark, path))
    assert(e.getMessage.contains("re-persist"))
  }

  test("PQ drift report: same-distribution append clean, shifted append flagged") {
    val path = tmpDir("pq_drift")
    // a realistically-sized training sample: the hash-sample keeps ~1/16,
    // and a baseline fitted to a dozen vectors overfits — even
    // same-distribution batches then read as drift
    val corpus = frame(0 until 2000, nearVec)
    val model = Pq.pqTrain(corpus, "vec_id", "embedding", m = 4, k = 8)
    assert(java.lang.Double.isFinite(model.trainMse) && model.trainMse >= 0)
    Pq.pqWrite(Pq.pqEncode(corpus, "vec_id", "embedding", model), model, path)
    val (loaded, _) = Pq.pqRead(spark, path)
    assert(math.abs(loaded.trainMse - model.trainMse) < 1e-12,
      "train_mse must round-trip through the sidecar")

    Pq.pqAppend(spark, path, frame(1000 until 1060, nearVec),
      "vec_id", "embedding", "same-dist")
    Pq.pqAppend(spark, path, frame(2000 until 2060, shiftedVec),
      "vec_id", "embedding", "shifted")

    val rows = Pq.pqDriftReport(spark, path).collect()
    info(rows.mkString(" | "))
    val report = rows.map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(report == Map("same-dist" -> false, "shifted" -> true), s"got $report")
  }

  private def sidecarJson(path: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(path, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private def exists(path: String, child: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, child)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  test("flagged IVF drift -> ivfRebuild -> clean report, correct probes, bumped generation") {
    val path = tmpDir("ivf_rebuild")
    Ann.ivfWrite(Ann.ivfBuild(frame(0 until 200, nearVec),
      "vec_id", "embedding", nlist = 4), path)
    Ann.ivfAppend(spark, path, frame(2000 until 2100, shiftedVec),
      "vec_id", "embedding", "shift-1")
    // the drift signal fires: this is the state the rebuild exists for
    assert(Ann.ivfDriftReport(spark, path).collect().exists(_.getBoolean(5)))

    val idx = Ann.ivfRebuild(spark, path, "vec_id")
    // every row (build + append) survives the swap
    assert(idx.clustered.count() == 300)
    // drift records measured the retired centroids — cleared
    assert(Ann.ivfDriftReport(spark, path).count() == 0)
    // probes still correct post-swap: original and appended vectors each
    // find themselves (assignment and probe share centroid ranking, so
    // this holds independent of cluster quality)
    val top = Ann.ivfTopK(idx, "vec_id", "embedding", nearVec(7), k = 1,
      nprobe = 1).collect()
    assert(top.head.getLong(0) == 7L && math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    val tops = Ann.ivfTopK(idx, "vec_id", "embedding", shiftedVec(2007), k = 1,
      nprobe = 1).collect()
    assert(tops.head.getLong(0) == 2007L)
    // the rebuilt baseline covers the shifted region: a FURTHER shifted
    // append is now clean (0.2 absorbs the in-sample generalization gap —
    // ivfDriftReport's documented calibration)
    Ann.ivfAppend(spark, path, frame(3000 until 3060, shiftedVec),
      "vec_id", "embedding", "shift-2")
    val rep = Ann.ivfDriftReport(spark, path, maxDrop = 0.2).collect()
    assert(rep.length == 1 && !rep.head.getBoolean(5),
      s"post-rebuild same-mix append flagged: ${rep.mkString(" | ")}")
    // generation recorded; no staging/retired leftovers
    assert(sidecarJson(path, Ann.IvfParamsSidecar).contains("\"generation\":2"))
    assert(!exists(path, ".graft_rebuild_staging") &&
      !exists(path, ".graft_rebuild_retired"))
  }

  test("flagged PQ drift -> pqRetrain -> clean report, new appends clean, bumped generation") {
    val path = tmpDir("pq_retrain")
    val corpus = frame(0 until 2000, nearVec)
    val model = Pq.pqTrain(corpus, "vec_id", "embedding", m = 4, k = 8)
    Pq.pqWrite(Pq.pqEncode(corpus, "vec_id", "embedding", model), model, path)
    Pq.pqAppend(spark, path, frame(5000 until 6000, shiftedVec),
      "vec_id", "embedding", "shift-1")
    assert(Pq.pqDriftReport(spark, path).collect().exists(_.getBoolean(5)))

    // a PQ index stores codes, not vectors: retrain takes the full corpus
    val full = corpus.unionByName(frame(5000 until 6000, shiftedVec))
    val (m2, codes) = Pq.pqRetrain(spark, path, full, "vec_id", "embedding")
    assert(codes.count() == 3000)
    assert(m2.m == 4 && m2.k == 8, "stored (m, k) must be preserved")
    assert(Pq.pqDriftReport(spark, path).count() == 0)
    // the retrained baseline describes the corpus MIX (2:1 near:shifted):
    // an append drawn from that same mix is clean against the NEW
    // train_mse (a shifted-only slice still reads high — correctly, since
    // it IS a distribution shift relative to the training mixture)
    Pq.pqAppend(spark, path,
      frame(7000 until 7040, nearVec).unionByName(frame(7040 until 7060, shiftedVec)),
      "vec_id", "embedding", "shift-2")
    val rep = Pq.pqDriftReport(spark, path).collect()
    info(rep.mkString(" | "))
    assert(rep.length == 1 && !rep.head.getBoolean(5),
      s"post-retrain same-mix append flagged: ${rep.mkString(" | ")}")
    assert(sidecarJson(path, Pq.PqParamsSidecar).contains("\"generation\":2"))
    assert(!exists(path, ".graft_retrain_staging") &&
      !exists(path, ".graft_retrain_retired"))
  }

  test("PQ drift report refuses an index whose model has no train_mse") {
    val path = tmpDir("pq_drift_legacy")
    val corpus = frame(0 until 100, nearVec)
    val trained = Pq.pqTrain(corpus, "vec_id", "embedding", m = 4, k = 8)
    val handBuilt = Pq.PqModel(trained.cells) // trainMse = NaN
    Pq.pqWrite(Pq.pqEncode(corpus, "vec_id", "embedding", handBuilt),
      handBuilt, path)
    val e = intercept[IllegalArgumentException](Pq.pqDriftReport(spark, path))
    assert(e.getMessage.contains("train_mse"))
  }
}
