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
