package graft

import org.apache.spark.sql.functions._
import graft.operators.Regression

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  private def planted = (0L until 200L).map { i =>
    val x1 = (i * 17) % 31; val x2 = (i * 29) % 23
    (i, x1, x2, 3 + 2 * x1 - x2) // exactly linear
  }.toDF("id", "x1", "x2", "y")

  test("exact normal equations recover a planted linear relation") {
    val m = Regression.fitLinearExact(planted, Seq("x1", "x2"), "y")
    assert(math.abs(m.weights(0) - 3.0) < 1e-9)
    assert(math.abs(m.weights(1) - 2.0) < 1e-9)
    assert(math.abs(m.weights(2) + 1.0) < 1e-9)
  }

  test("linear fit is bit-identical across partitionings (exact sums)") {
    val a = Regression.fitLinearExact(planted.repartition(13), Seq("x1", "x2"), "y")
    val b = Regression.fitLinearExact(planted.repartition(2), Seq("x1", "x2"), "y")
    assert(a.weights.toSeq == b.weights.toSeq)
  }

  test("gaussian-elimination path (4 features) recovers planted weights") {
    val df = (0L until 300L).map { i =>
      val x = Array((i * 7) % 13, (i * 11) % 17, (i * 13) % 19, (i * 3) % 7)
      (i, x(0), x(1), x(2), x(3), 1 + x(0) - 2 * x(1) + 3 * x(2) - x(3))
    }.toDF("id", "x1", "x2", "x3", "x4", "y")
    val m = Regression.fitLinearExact(df, Seq("x1", "x2", "x3", "x4"), "y")
    val exp = Seq(1.0, 1.0, -2.0, 3.0, -1.0)
    m.weights.toSeq.zip(exp).foreach { case (w, e) =>
      assert(math.abs(w - e) < 1e-7, s"$w vs $e") }
  }

  test("logistic GD separates a separable set and is rounding-deterministic") {
    val df = (0L until 200L).map { i =>
      val pos = i % 2 == 0
      (i, if (pos) 2.0 + (i % 5) * 0.1 else -2.0 - (i % 5) * 0.1,
        if (pos) 1.0 else 0.0)
    }.toDF("id", "x", "y")
    val m1 = Regression.fitLogisticGD(df.repartition(7), Seq(col("x")),
      col("y"), iterations = 5, lr = 1.0)
    val m2 = Regression.fitLogisticGD(df.repartition(3), Seq(col("x")),
      col("y"), iterations = 5, lr = 1.0)
    assert(m1.weights.toSeq == m2.weights.toSeq) // per-iteration round resync
    assert(m1.weights(1) > 0.1) // positive slope separates the classes
    val scored = df.select(col("y"),
      Regression.logisticScore(m1, Seq(col("x"))).as("s"))
      .groupBy("y").agg(avg("s").as("m")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(scored(1.0) > 0.7 && scored(0.0) < 0.3)
  }
}

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  test("separable corpus classifies perfectly; unseen words only smooth") {
    val docs = Seq(
      (1L, "apple apple pie", "fruit"), (2L, "apple juice", "fruit"),
      (3L, "apple apple apple", "fruit"),
      (4L, "steel beam girder", "metal"), (5L, "steel steel rivet", "metal"),
      (6L, "girder beam beam", "metal"),
      // held-in test rows whose vocabulary leans one way + one stray word
      (7L, "apple pie zzz", "fruit"), (8L, "steel girder zzz", "metal"))
      .toDF("doc_id", "text", "label")
    val r = graft.operators.NaiveBayes
      .trainScore(docs, "doc_id", "text", "label")
    val pred = r.select("doc_id", "predicted").distinct()
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    val truth = docs.collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(pred == truth, pred.toString)
    // exactly one predicted class per doc, repeated on each class row
    assert(r.groupBy("doc_id").agg(countDistinct("predicted").as("k"))
      .filter(col("k") =!= 1).count() == 0)
    // every doc scored against every class
    assert(r.count() == 8 * 2)
  }

  test("empty documents produce no rows; rounded-argmax ties break by name") {
    val docs = Seq((1L, "x", "a"), (2L, "x", "b"),
        (3L, "   ", "a"), (4L, "", "b"))
      .toDF("doc_id", "text", "label")
    val r = graft.operators.NaiveBayes
      .trainScore(docs, "doc_id", "text", "label").collect()
    assert(!r.exists(x => x.getLong(0) == 3L || x.getLong(0) == 4L))
    // docs 1 and 2 have identical evidence AND symmetric priors → tied
    // rounded scores → both predict class "a" (name ascending)
    assert(r.filter(_.getLong(0) == 1L).forall(_.getString(3) == "a"))
    assert(r.filter(_.getLong(0) == 2L).forall(_.getString(3) == "a"))
  }

  test("a class whose training docs are all empty still scores (pure smoothing)") {
    val docs = Seq((1L, "x x y", "a"), (2L, "", "b"))
      .toDF("doc_id", "text", "label")
    val r = graft.operators.NaiveBayes
      .trainScore(docs, "doc_id", "text", "label").collect()
    // doc 1 scored against BOTH classes — b's likelihoods are α/(0+αV)
    assert(r.count(_.getLong(0) == 1L) == 2, r.mkString(";"))
    // evidence favors the class that actually contains the tokens
    assert(r.filter(_.getLong(0) == 1L).forall(_.getString(3) == "a"))
  }
}

/** Per-group exact trend slopes: planted line recovered exactly,
  * degenerate groups emit den = 0, partition invariance. */
class GroupTrendSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("a planted noise-free line recovers its slope exactly") {
    // group 1: y = 3x + 7 over x = 0..9 -> slope fraction reduces to 3
    // group 2: y = -2x + 100 -> slope -2
    val rows = (0L until 10L).flatMap(x =>
      Seq((1L, x, 3 * x + 7), (2L, x, -2 * x + 100)))
    val got = graft.operators.Regression.groupTrend(
        rows.toDF("g", "x", "y"), "g", col("x"), col("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    for ((g, slope) <- Seq(1L -> 3L, 2L -> -2L)) {
      val (num, den) = got(g)
      assert(den > 0 && num == slope * den, s"group $g: $num/$den")
    }
  }

  test("single-point and constant-x groups emit slope_den = 0") {
    val rows = Seq((1L, 5L, 10L), (2L, 3L, 1L), (2L, 3L, 9L))
    val got = graft.operators.Regression.groupTrend(
        rows.toDF("g", "x", "y"), "g", col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) == 0L && got(2L) == 0L)
  }

  test("nulls excluded; results partition-invariant") {
    val rows = (0 until 300).map(i =>
      (i % 7L, Option(i.toLong), if (i % 13 == 0) None else Some(i * 3L % 101)))
    val df = rows.toDF("g", "x", "y")
    def all(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Regression.groupTrend(d, "g", col("x"), col("y"))
        .collect().map(_.toSeq).sortBy(_.toString)
    assert(all(df) === all(df.repartition(13)))
  }
}

/** Exact correlation structure: perfect/anti/zero correlations land on
  * exact integer identities. */
class CorrMatrixSpec extends SparkSpec {
  import spark.implicits._

  test("perfect, anti and independent pairs hit exact identities") {
    // b = 2a (rho=1), c = -a (rho=-1), d alternates independent of a
    val rows = (1L to 40L).map(i => (i, 2 * i, -i, if (i % 2 == 0) 1L else -1L))
    val out = graft.operators.Regression.corrMatrixExact(
        rows.toDF("a", "b", "c", "d"), Seq("a", "b", "c", "d"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val (nab, dia, dib) = out(("a", "b"))
    assert(nab * nab == dia * dib && nab > 0, "rho(a,2a) must be exactly 1")
    val (nac, da2, dc2) = out(("a", "c"))
    assert(nac * nac == da2 * dc2 && nac < 0, "rho(a,-a) must be exactly -1")
    val (naa, _, _) = out(("a", "a"))
    assert(naa == da2, "diagonal num equals its den")
  }

  test("null rows are excluded from every moment") {
    val rows = Seq((Some(1L), Some(2L)), (None, Some(9L)), (Some(3L), None),
      (Some(2L), Some(4L)))
    val out = graft.operators.Regression.corrMatrixExact(
        rows.toDF("x", "y"), Seq("x", "y"))
      .collect()
    assert(out.forall(_.getLong(2) == 2L), "only the 2 complete rows count")
  }
}
