package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic cloud with a planted dominant direction:
    * x = t·d + small structured noise, d = (3,4)/5 in the first two dims. */
  private def cloud(dim: Int, n: Int) = {
    (0 until n).map { i =>
      val t = (i % 17) - 8.0          // spread along the planted axis
      val e = ((i * 7) % 5) - 2.0     // small off-axis noise
      val v = Array.fill(dim)(0.0f)
      v(0) = (t * 0.6 + 0.01 * e).toFloat
      v(1) = (t * 0.8 - 0.01 * e).toFloat
      if (dim > 2) v(2) = (0.05 * e).toFloat
      (i.toLong, v.toSeq)
    }.toDF("id", "vec")
  }

  test("fit recovers the planted principal direction, unit-norm, sorted") {
    val df = cloud(dim = 6, n = 200)
    val m = Pca.fit(df, "vec", k = 3)
    assert(m.n === 200L)
    assert(m.k === 3 && m.dim === 6)
    // eigenvalues descending
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // components unit-norm and mutually orthogonal
    for (a <- m.components) {
      val nrm = math.sqrt(a.map(x => x * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-9, s"norm $nrm")
    }
    for (Seq(a, b) <- m.components.toSeq.combinations(2)) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 1e-9, s"dot $dot")
    }
    // top component is ±(0.6, 0.8, …)/|…| direction; sign fix makes the
    // largest-|coordinate| entry positive, so c(1) (=0.8 side) is positive
    val c = m.components(0)
    assert(math.abs(math.abs(c(0)) / math.abs(c(1)) - 0.75) < 0.01,
      s"direction ratio ${c(0)}/${c(1)}")
    assert(c(1) > 0, "deterministic sign: dominant coordinate positive")
  }

  test("projection variance equals the eigenvalue; mean projects to origin") {
    val df = cloud(dim = 4, n = 170)
    val m = Pca.fit(df, "vec", k = 2)
    val proj = Pca.projectLong(df, "id", "vec", m)
      .groupBy("pc").agg(avg("coord").as("mu"),
        avg(col("coord") * col("coord")).as("m2"))
      .orderBy("pc").collect()
    proj.zipWithIndex.foreach { case (r, j) =>
      // projections are centered (mean removed)
      assert(math.abs(r.getDouble(1)) < 1e-9, s"pc $j mean ${r.getDouble(1)}")
      // population variance of the scores = eigenvalue
      val variance = r.getDouble(2) - r.getDouble(1) * r.getDouble(1)
      assert(math.abs(variance - m.eigenvalues(j)) < 1e-6 * (1 + m.eigenvalues(j)),
        s"pc $j var $variance vs eig ${m.eigenvalues(j)}")
    }
  }

  test("writeModel/readModel round-trips bit-exactly") {
    val df = cloud(dim = 5, n = 120)
    val m = Pca.fit(df, "vec", k = 2)
    val path = tmpDir("pca_model")
    Pca.writeModel(spark, m, path)
    val r = Pca.readModel(spark, path)
    assert(r.n === m.n)
    assert(r.mean.toSeq === m.mean.toSeq)
    assert(r.eigenvalues.toSeq === m.eigenvalues.toSeq)
    assert(r.components.map(_.toSeq).toSeq === m.components.map(_.toSeq).toSeq)
    // projections from the reloaded model are bit-identical
    val a = Pca.projectLong(df, "id", "vec", m).orderBy("id", "pc").collect()
    val b = Pca.projectLong(df, "id", "vec", r).orderBy("id", "pc").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("wrong-dimension vector raises loudly, not a silent drop") {
    val df = cloud(dim = 4, n = 50)
    val m = Pca.fit(df, "vec", k = 1)
    val bad = Seq((999L, Seq(1.0f, 2.0f))).toDF("id", "vec")
    val e = intercept[Exception] {
      Pca.projectLong(df.unionByName(bad), "id", "vec", m).collect()
    }
    assert(e.getMessage.contains("expected dimension") ||
      e.getCause != null && e.getCause.getMessage.contains("expected dimension"))
  }

  test("jacobi eigensolver matches a hand-checkable 2x2") {
    // [[2,1],[1,2]] → eigenvalues 3 and 1, eigenvectors (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted.reverse
    assert(math.abs(sorted(0) - 3.0) < 1e-12)
    assert(math.abs(sorted(1) - 1.0) < 1e-12)
    val hi = if (vals(0) >= vals(1)) 0 else 1
    assert(math.abs(math.abs(vecs(0)(hi)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(vecs(0)(hi) - vecs(1)(hi)) < 1e-12)
  }

  test("cov aggregate is partition-count invariant up to last-ulp") {
    val df = cloud(dim = 3, n = 140)
    val m1 = Pca.fit(df.repartition(1), "vec", 2)
    val m8 = Pca.fit(df.repartition(8), "vec", 2)
    m1.mean.zip(m8.mean).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    m1.eigenvalues.zip(m8.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-7 * (1 + math.abs(a)), s"$a vs $b") }
  }
}

/** Per-dimension standardization: exact moments on planted data,
  * zero-variance guard, loud wrong-dim, partition invariance. */
class StandardizeSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Embeddings

  test("planted dims recover mean/std; constant dim standardizes to 0") {
    // dim0: values 0,2 -> mean 1, std 1; dim1: constant 5 -> std 0;
    // dim2: values -3,3 -> mean 0, std 3
    val df = Seq(
      (1L, Seq(0.0f, 5.0f, -3.0f)), (2L, Seq(2.0f, 5.0f, 3.0f)))
      .toDF("id", "v")
    val m = Embeddings.standardizeFit(df, "v")
    assert(m.n == 2)
    assert(m.mean.toSeq == Seq(1.0, 5.0, 0.0))
    assert(m.std.toSeq == Seq(1.0, 0.0, 3.0))
    val z = Embeddings.standardizeApply(df, "id", "v", m)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(z((1L, 0)) == -1.0 && z((2L, 0)) == 1.0)
    assert(z((1L, 1)) == 0.0 && z((2L, 1)) == 0.0)
    assert(z((1L, 2)) == -1.0 && z((2L, 2)) == 1.0)
  }

  test("wrong-dimension vectors raise loudly") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f))).toDF("id", "v")
    val m = Embeddings.standardizeFit(df, "v")
    val bad = Seq((3L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    intercept[Exception] {
      Embeddings.standardizeApply(bad, "id", "v", m).collect()
    }
  }

  test("standardized corpus has per-dim mean ~0 and std ~1") {
    val rows = (1L to 200L).map(i =>
      (i, Seq(((i * 7) % 23).toFloat, ((i * 13) % 5).toFloat * 100f)))
    val df = rows.toDF("id", "v")
    val m = Embeddings.standardizeFit(df, "v")
    val stats = Embeddings.standardizeApply(df, "id", "v", m)
      .groupBy("pos").agg(avg("z").as("mu"),
        sqrt(avg(col("z") * col("z"))).as("sd"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    stats.foreach { case (p, mu, sd) =>
      assert(math.abs(mu) < 1e-9, s"pos $p mean $mu")
      assert(math.abs(sd - 1.0) < 1e-9, s"pos $p std $sd")
    }
  }
}
