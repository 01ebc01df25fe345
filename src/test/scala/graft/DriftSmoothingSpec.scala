package graft

import org.apache.spark.sql.functions._

import graft.operators.{Profile, Timeseries}

/** Exact two-sample KS distance: hand-checked CDF arithmetic, the loud
  * bounded-domain guard, and partition invariance. */
class KsDriftSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked: A={1,2,3}, B={3,4} gives D = 4/6 at bin 2") {
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "a"), (3.0, "b"), (4.0, "b"))
      .toDF("v", "side")
    val r = Profile.ksDrift(df, "v", "side", "a", "b", scale = 1.0).collect()
    assert(r.length === 1)
    val row = r.head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4)) === ((3L, 2L, 4L, 6L, 2L)))
  }

  test("identical distributions give d_num = 0") {
    val df = (1 to 50).flatMap(i => Seq((i.toDouble, "a"), (i.toDouble, "b")))
      .toDF("v", "side")
    val row = Profile.ksDrift(df, "v", "side", "a", "b").collect().head
    assert(row.getLong(2) === 0L)
  }

  test("partition-invariant") {
    val df = (1 to 500).map(i => ((i % 37).toDouble / 7, if (i % 3 == 0) "a" else "b"))
      .toDF("v", "side")
    val a = Profile.ksDrift(df, "v", "side", "a", "b").collect().head.toSeq
    val b = Profile.ksDrift(df.repartition(11), "v", "side", "a", "b")
      .collect().head.toSeq
    assert(a === b)
  }

  test("a side with no rows (or an empty input) fails loudly") {
    val oneSided = (1 to 20).map(i => (i.toDouble, "a")).toDF("v", "side")
    intercept[Exception] {
      Profile.ksDrift(oneSided, "v", "side", "a", "b").collect()
    }
    val empty = Seq.empty[(Double, String)].toDF("v", "side")
    intercept[Exception] {
      Profile.ksDrift(empty, "v", "side", "a", "b").collect()
    }
  }

  test("loud failure past maxBins instead of a silent one-task sort") {
    val df = (1 to 100).map(i => (i.toDouble, if (i % 2 == 0) "a" else "b"))
      .toDF("v", "side")
    val e = intercept[Exception] {
      Profile.ksDrift(df, "v", "side", "a", "b", scale = 1.0, maxBins = 10)
        .collect()
    }
    assert(e.getMessage != null)
  }
}

/** Exact half-life EWMA: hand-checked weights, null renormalization,
  * horizon-1 identity, partition invariance. */
class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Option[Long])], horizon: Int) =
    Timeseries.ewmaHalfLife(
        rows.toDF("k", "t", "v"), "k", "t", "t", col("v"), horizon)
      .orderBy("t").select("t", "ewma_num", "ewma_den")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("hand-checked horizon-3 weights 4/2/1 with head renormalization") {
    val rows = Seq((1L, 1L, Some(10L)), (1L, 2L, Some(20L)),
      (1L, 3L, Some(30L)), (1L, 4L, Some(40L)))
    assert(run(rows, 3) === Seq(
      (1L, 40L, 4L),                      // 4*10
      (2L, 100L, 6L),                     // 4*20 + 2*10
      (3L, 170L, 7L),                     // 4*30 + 2*20 + 1*10
      (4L, 240L, 7L)))                    // 4*40 + 2*30 + 1*20
  }

  test("null value occupies its lag slot but renormalizes away") {
    val rows = Seq((1L, 1L, Some(10L)), (1L, 2L, None), (1L, 3L, Some(30L)))
    assert(run(rows, 3) === Seq(
      (1L, 40L, 4L),
      (2L, 20L, 2L),                      // only the lag-1 value present
      (3L, 130L, 5L)))                    // 4*30 + skip + 1*10
  }

  test("horizon 1 is the identity fraction v/1") {
    val rows = Seq((1L, 1L, Some(7L)), (1L, 2L, Some(9L)))
    assert(run(rows, 1) === Seq((1L, 7L, 1L), (2L, 9L, 1L)))
  }

  test("keys are independent and results partition-invariant") {
    val rows = (1L to 200L).map(i => (i % 5, i, Some(i * 3 % 41)))
    val df = rows.toDF("k", "t", "v")
    val a = Timeseries.ewmaHalfLife(df, "k", "t", "t", col("v"), 8)
      .select("k", "t", "ewma_num", "ewma_den").collect()
      .map(_.toSeq).sortBy(_.toString)
    val b = Timeseries.ewmaHalfLife(df.repartition(17), "k", "t", "t", col("v"), 8)
      .select("k", "t", "ewma_num", "ewma_den").collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(a === b)
  }

  test("horizon bounds are enforced") {
    val df = Seq((1L, 1L, 1L)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      Timeseries.ewmaHalfLife(df, "k", "t", "t", col("v"), 63)
    }
    intercept[IllegalArgumentException] {
      Timeseries.ewmaHalfLife(df, "k", "t", "t", col("v"), 0)
    }
  }
}

/** CUSUM closed form pinned against the textbook recurrence. */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def run(vals: Seq[Long], target: Long, threshold: Long) =
    Timeseries.cusum(
        vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
          .toDF("k", "t", "v"),
        "k", "t", "t", col("v"), target, threshold)
      .orderBy("t")
      .select("cusum_up", "cusum_down", "is_shift_up", "is_shift_down")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
      .toSeq

  private def reference(vals: Seq[Long], target: Long): Seq[(Long, Long)] = {
    var up = 0L; var down = 0L
    vals.map { v =>
      up = math.max(0L, up + (v - target))
      down = math.max(0L, down - (v - target))
      (up, down)
    }
  }

  test("matches the max(0, S + r) recurrence on a mixed series") {
    val vals = Seq(5L, 9L, 2L, 2L, 14L, 14L, 14L, 1L, 1L, 1L, 1L, 7L)
    val got = run(vals, target = 7L, threshold = 10L)
    val ref = reference(vals, 7L)
    assert(got.map(g => (g._1, g._2)) === ref)
    assert(got.map(_._3) === ref.map(_._1 > 10L))
    assert(got.map(_._4) === ref.map(_._2 > 10L))
  }

  test("planted level shift fires the up flag only after the shift") {
    val vals = Seq.fill(10)(100L) ++ Seq.fill(10)(130L)
    val got = run(vals, target = 100L, threshold = 50L)
    assert(got.take(10).forall(!_._3))
    assert(got.last._3)
    // fires at the 12th overall point: 2 post-shift points x 30 = 60 > 50
    assert(got(11)._3 && !got(10)._3)
  }

  test("partition-invariant") {
    val rows = (1L to 300L).map(i => (i % 7, i, (i * 13) % 101))
    val df = rows.toDF("k", "t", "v")
    def all(d: org.apache.spark.sql.DataFrame) =
      Timeseries.cusum(d, "k", "t", "t", col("v"), 50L, 100L)
        .select("k", "t", "cusum_up", "cusum_down").collect()
        .map(_.toSeq).sortBy(_.toString)
    assert(all(df) === all(df.repartition(13)))
  }
}

/** Rank-symmetric preference pairing: hand-checked pairs, margin filter,
  * odd-group middle exclusion. */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], margin: Long) =
    graft.operators.Preference.pairs(
        rows.toDF("g", "id", "score"), "g", "id", col("score"), margin)
      .orderBy("g", "pair_rank")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq

  test("odd group: best pairs worst, middle element unpaired") {
    val rows = Seq(("p", 1L, 100L), ("p", 2L, 90L), ("p", 3L, 80L),
      ("p", 4L, 20L), ("p", 5L, 10L))
    assert(run(rows, 0L) === Seq(
      ("p", 1L, 5L, 90L, 1), ("p", 2L, 4L, 70L, 2)))
  }

  test("margin drops near-tied pairs; equal scores never pair") {
    val rows = Seq(("p", 1L, 100L), ("p", 2L, 90L), ("p", 3L, 20L),
      ("p", 4L, 10L), ("q", 7L, 50L), ("q", 8L, 50L))
    assert(run(rows, 75L) === Seq(("p", 1L, 4L, 90L, 1)))
    assert(run(rows, 0L).filter(_._1 == "q").isEmpty)
  }

  test("ties rank by id so the pairing is deterministic") {
    val rows = Seq(("p", 3L, 50L), ("p", 1L, 50L), ("p", 2L, 40L),
      ("p", 4L, 10L))
    // desc rank: id1(50), id3(50), id2(40), id4(10)
    assert(run(rows, 0L) === Seq(
      ("p", 1L, 4L, 40L, 1), ("p", 3L, 2L, 10L, 2)))
  }

  test("singleton groups and null scores produce nothing") {
    val df = Seq((Some("p"), Some(1L), Some(10L)),
      (Some("q"), Some(2L), Some(5L)), (Some("q"), Some(3L), None))
      .toDF("g", "id", "score")
    val got = graft.operators.Preference.pairs(df, "g", "id", col("score"))
      .collect()
    assert(got.isEmpty)
  }
}

/** Deterministic KMV sketch: exact-mode identity, estimator accuracy on a
  * planted overlap, pure-function determinism. */
class ThetaSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Theta

  test("union smaller than k means the estimate is exact by construction") {
    val a = (1L to 30L).toDF("v")
    val b = (21L to 50L).toDF("v") // overlap 21..30 = 10
    val est = Theta.intersectEstimate(
        Theta.sketch(a, "v", 64), Theta.sketch(b, "v", 64), 64)
      .collect().head
    assert(est.getLong(0) == 4294967296L, "theta must be the full range")
    assert(est.getLong(1) == 10L && est.getLong(2) == 10L)
  }

  test("planted 50% overlap estimates within KMV tolerance") {
    val a = (1L to 4000L).toDF("v")
    val b = (2001L to 6000L).toDF("v") // true intersection 2000
    val est = Theta.intersectEstimate(
        Theta.sketch(a, "v", 256), Theta.sketch(b, "v", 256), 256)
      .collect().head.getLong(2)
    // sigma ~ |I|/sqrt(k*J) ~ 2000/sqrt(256*0.33) ~ 215; allow 4 sigma
    assert(math.abs(est - 2000L) < 900L, s"estimate $est")
  }

  test("sketches and estimates are partition-invariant pure functions") {
    val a = (1L to 1000L).map(i => i * 7 % 997).toDF("v")
    val b = (1L to 1000L).map(i => i * 13 % 997).toDF("v")
    def run(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      Theta.intersectEstimate(
        Theta.sketch(x, "v", 64), Theta.sketch(y, "v", 64), 64)
        .collect().head.toSeq
    assert(run(a, b) === run(a.repartition(17), b.repartition(5)))
  }

  test("empty intersection still returns the one-row contract") {
    val a = (1L to 100L).toDF("v")
    val b = (1000L to 1100L).toDF("v")
    val rows = Theta.intersectEstimate(
      Theta.sketch(a, "v", 32), Theta.sketch(b, "v", 32), 32).collect()
    assert(rows.length == 1 && rows.head.getLong(1) == 0L &&
      rows.head.getLong(2) == 0L)
  }
}
