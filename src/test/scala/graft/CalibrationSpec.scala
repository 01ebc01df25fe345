package graft

import org.apache.spark.sql.functions._
import graft.operators.{Privacy, Regression}

/** Calibration bins/ECE and k-anonymity suppression. */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed calibration: bins, conf, acc, ece") {
    // bin 1: score .1 label 1 -> conf .1, acc 1;  bin 2: .2/0 -> .2, 0
    // bin 9: scores .95, 1.0 labels 1,1 -> conf .975, acc 1
    val df = Seq((0.1, 1L), (0.2, 0L), (0.95, 1L), (1.0, 1L))
      .toDF("score", "label")
    val r = Regression.calibrationBins(df, "score", "label", nBins = 10)
      .collect().map(x => x.getAs[Long]("bin") -> x).toMap
    assert(r.keySet == Set(1L, 2L, 9L))
    assert(r(1L).getAs[Double]("conf") == 0.1 &&
      r(1L).getAs[Double]("acc") == 1.0)
    assert(r(2L).getAs[Double]("conf") == 0.2 &&
      r(2L).getAs[Double]("acc") == 0.0)
    assert(r(9L).getAs[Double]("conf") == 0.975 &&
      r(9L).getAs[Double]("acc") == 1.0)
    // ece = (900000 + 200000 + 50000) / (4 * 1e6) = 0.2875
    assert(r(1L).getAs[Double]("ece") == 0.2875)
  }

  test("score 1.0 lands in the top bin; out-of-range is refused") {
    val ok = Regression.calibrationBins(
      Seq((1.0, 1L)).toDF("score", "label"), "score", "label", 10)
    assert(ok.collect().head.getAs[Long]("bin") == 9L)
    val bad = Regression.calibrationBins(
      Seq((1.2, 1L)).toDF("score", "label"), "score", "label", 10)
    intercept[Exception] { bad.collect() }
  }

  test("perfectly calibrated degenerate case has ece 0") {
    val df = Seq((0.0, 0L), (0.0, 0L), (1.0, 1L)).toDF("score", "label")
    val r = Regression.calibrationBins(df, "score", "label", 10).collect()
    assert(r.forall(_.getAs[Double]("ece") == 0.0))
  }

  test("kAnonymitySuppress keeps only crowds of k and attaches sizes") {
    val df = (1 to 12).map(i => (i.toLong, "a", "x"))
      .++(Seq((100L, "b", "x"), (101L, "b", "x")))
      .toDF("id", "region", "kind")
    val kept = Privacy.kAnonymitySuppress(df, Seq("region", "kind"), k = 3)
      .collect()
    assert(kept.length == 12)
    assert(kept.forall(r => r.getAs[String]("region") == "a" &&
      r.getAs[Long]("group_n") == 12L))
  }

  test("null quasi tuples are crowds too (null-safe grouping)") {
    val df = Seq((1L, null: String), (2L, null: String), (3L, null: String),
      (4L, "solo")).toDF("id", "region")
    val kept = Privacy.kAnonymitySuppress(df, Seq("region"), k = 3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L))
  }

  test("stats audit marks both sides of the bar") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    val st = Privacy.kAnonymityStats(df, Seq("g"), k = 2)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n"), r.getAs[Boolean]("anonymous"))).toMap
    assert(st == Map("a" -> ((2L, true)), "b" -> ((1L, false))))
  }
}

/** Exact tie-corrected AUC. */
class AucSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Regression

  private def auc(rows: Seq[(Double, Long)]): (Long, Long, Any) = {
    val r = Regression.aucExact(rows.toDF("score", "label"),
      "score", "label").collect().head
    (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"), r.get(2))
  }

  test("perfect separation gives 1, inverted gives 0") {
    assert(auc(Seq((0.9, 1L), (0.8, 1L), (0.2, 0L))) == ((2L, 1L, 1.0)))
    assert(auc(Seq((0.1, 1L), (0.9, 0L))) == ((1L, 1L, 0.0)))
  }

  test("hand-computed with ties: equal scores earn half credit") {
    // pairs: (p=.8 vs n=.8) tie -> 0.5; (p=.8 vs n=.2) win -> 1
    // (p=.5 vs n=.8) loss -> 0; (p=.5 vs n=.2) win -> 1
    // AUC = 2.5 / 4 = 0.625
    assert(auc(Seq((0.8, 1L), (0.5, 1L), (0.8, 0L), (0.2, 0L)))
      == ((2L, 2L, 0.625)))
  }

  test("all-one-class is undefined, not 0.5-faked") {
    assert(auc(Seq((0.9, 1L), (0.1, 1L)))._3 == null)
  }

  test("random scores vs matching labels land near chance vs skill") {
    val rnd = (0 until 400).map { i =>
      val s = ((i * 2654435761L) % 1000L) / 1000.0
      (s, if (((i * 40503L) % 997L) / 997.0 < s) 1L else 0L)
    }
    val skillful = auc(rnd)._3.asInstanceOf[Double]
    assert(skillful > 0.6, s"score-correlated labels must beat chance: $skillful")
  }
}

/** Operating-point metrics. */
class ConfusionSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Regression

  test("hand-computed confusion at 0.5, boundary score counts positive") {
    val df = Seq((0.9, 1L), (0.5, 0L), (0.4, 1L), (0.1, 0L))
      .toDF("score", "label")
    val r = Regression.confusionAtThreshold(df, "score", "label", 0.5)
      .collect().head
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("tn"), r.getAs[Long]("fn")) == ((1L, 1L, 1L, 1L)))
    assert(r.getAs[Double]("precision") == 0.5)
    assert(r.getAs[Double]("recall") == 0.5)
    assert(r.getAs[Double]("f1") == 0.5)
    assert(r.getAs[Double]("accuracy") == 0.5)
  }

  test("degenerate denominators report null, not a convention") {
    val allNeg = Seq((0.1, 0L), (0.2, 0L)).toDF("score", "label")
    val r = Regression.confusionAtThreshold(allNeg, "score", "label", 0.5)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("precision")))
    assert(r.isNullAt(r.fieldIndex("recall")))
    assert(r.getAs[Double]("accuracy") == 1.0)
  }

  test("f1 is the exact integer rational") {
    // tp=2 fp=1 fn=0 -> f1 = 4/5
    val df = Seq((0.9, 1L), (0.8, 1L), (0.7, 0L)).toDF("score", "label")
    val r = Regression.confusionAtThreshold(df, "score", "label", 0.5)
      .collect().head
    assert(r.getAs[Double]("f1") == 0.8)
  }

  test("confusionSweep equals per-threshold confusionAtThreshold, one pass") {
    val df = Seq((0.9, 1L), (0.5, 0L), (0.4, 1L), (0.1, 0L), (0.75, 1L))
      .toDF("score", "label")
    val ts = Seq(0.1, 0.5, 0.8)
    val sweep = Regression.confusionSweep(df, "score", "label", ts)
      .collect().map(r => r.getAs[Long]("t_micro") ->
        (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("tn"),
          r.getAs[Long]("fn"))).toMap
    ts.foreach { t =>
      val one = Regression.confusionAtThreshold(df, "score", "label", t)
        .collect().head
      assert(sweep(math.round(t * 1000000L)) ==
        ((one.getAs[Long]("tp"), one.getAs[Long]("fp"),
          one.getAs[Long]("tn"), one.getAs[Long]("fn"))),
        s"threshold $t diverges")
    }
    // ONE aggregate: no per-threshold scan of the input
    val plan = Regression.confusionSweep(df, "score", "label", ts)
      .queryExecution.optimizedPlan.toString
    assert("LocalRelation|Scan".r.findAllIn(plan).length <= 2, plan)
    intercept[IllegalArgumentException] {
      Regression.confusionSweep(df, "score", "label", Seq(0.5, 0.5))
    }
  }
}

/** Crawl-to-crawl diff. */
class CrawlDiffSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Frontier

  test("all four statuses, hand-computed") {
    val prev = Seq(("a", "h1"), ("b", "h2"), ("c", "h3")).toDF("u", "h")
    val cur = Seq(("a", "h1"), ("b", "HX"), ("d", "h4")).toDF("u", "h")
    val r = Frontier.crawlDiff(prev, cur, "u", "h")
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r == Map("a" -> "unchanged", "b" -> "changed",
      "c" -> "removed", "d" -> "added"))
  }

  test("null hashes are refused loudly, not misread as absence") {
    val prev = Seq(("a", null.asInstanceOf[String])).toDF("u", "h")
    val cur = Seq(("a", "h1")).toDF("u", "h")
    intercept[Exception] {
      Frontier.crawlDiff(prev, cur, "u", "h").collect()
    }
  }

  test("incrementalReprocess equals from-scratch; only the delta reprocesses") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val prev = Seq(("a", "one two"), ("b", "three"), ("c", "gone soon"))
      .toDF("u", "text")
    val cur = Seq(("a", "one two"), ("b", "three CHANGED"), ("d", "brand new doc"))
      .toDF("u", "text")
    val processed = new java.util.concurrent.atomic.AtomicInteger(0)
    def clean(df: DataFrame): DataFrame = {
      processed.incrementAndGet()
      df.select(col("u"), size(split(trim(col("text")), "\\s+")).as("n"))
    }
    val diff = Frontier.crawlDiff(
      prev.select(col("u"), md5(col("text")).as("h")),
      cur.select(col("u"), md5(col("text")).as("h")), "u", "h")
    val prevClean = clean(prev)
    val inc = Frontier.incrementalReprocess(prevClean, cur, diff, "u")(clean)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val scratch = clean(cur)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(inc == scratch, s"incremental $inc != scratch $scratch")
    assert(!inc.contains("c"), "removed keys must vanish")
    // the delta frame really is the only thing process() saw the second time
    val todo = cur.join(diff.filter(col("status").isin("added", "changed"))
      .select(col("url").as("u")), Seq("u"), "left_semi")
      .select("u").as[String].collect().toSet
    assert(todo == Set("b", "d"), s"delta must be exactly added+changed: $todo")
  }
}
