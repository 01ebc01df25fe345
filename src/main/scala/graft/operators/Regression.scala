package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed supervised training for data curation: quality probes fit at
  * corpus scale with ONE pass (exact linear) or a few passes (logistic GD),
  * then applied as a broadcast scoring expression. The expensive part — the
  * sufficient-statistics aggregation — is a map-side partially-aggregated
  * reduce of O(k²) numbers; the driver only solves a k×k system. This is the
  * canonical Spark training shape (same as MLlib's normal-equation solver),
  * re-expressed with exact arithmetic so results are partition-order
  * independent and replayable.
  */
object Regression {

  /** A fitted linear model: `weights(0)` is the intercept, `weights(i)` the
    * coefficient of the i-th feature column. */
  final case class LinearModel(weights: Array[Double])

  /** Least-squares linear probe fit by EXACT normal equations over integer
    * features: every Gram-matrix and moment entry is a sum of per-row Long
    * products accumulated as DECIMAL(38,0) — exact for any row count and
    * partitioning (no float-summation order anywhere) — and the driver
    * solves the (k+1)×(k+1) system from those exact sums. With ≤ 2 features
    * the solve is the fixed Cramer cofactor expansion (bit-reproducible and
    * SQL-replayable: the ml1 oracle runs the same formula); larger k falls
    * back to Gaussian elimination with partial pivoting (deterministic, but
    * not contractually bit-replayable — use the GD path if you need more
    * features in a gated pipeline).
    *
    * Feature columns must be integral (int/long) — pre-bucket continuous
    * features (`floor(x * scale)`), which is what a curation probe wants
    * anyway. Per-row products must fit a Long: |feature| < ~3e9. Labels may
    * be any numeric (0/1 for a class probe, a quality score for a rating
    * probe); they are summed exactly as decimals too only when integral —
    * fractional labels go through DECIMAL(38,6) quantization (documented
    * 1e-6 resolution).
    *
    * 100 TB: one scan, one partial-agg reduce of (k+1)(k+2)/2 + (k+1)
    * decimals; no shuffle of data rows at all. */
  def fitLinearExact(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String): LinearModel = {
    require(featureCols.nonEmpty, "need at least one feature column")
    val k = featureCols.length + 1
    val xs: Seq[Column] =
      lit(1L) +: featureCols.map(c => col(c).cast("long"))
    val y = col(labelCol).cast(DecimalType(38, 6))
    def exact(c: Column): Column = sum(c.cast(DecimalType(38, 0)))
    val gramCols = for { j <- 0 until k; l <- j until k }
      yield exact(xs(j) * xs(l)).as(s"s_${j}_$l")
    val momentCols = (0 until k).map(j =>
      sum((xs(j).cast(DecimalType(38, 6)) * y).cast(DecimalType(38, 6)))
        .as(s"b_$j"))
    val row = df.agg((gramCols ++ momentCols).head,
      (gramCols ++ momentCols).tail: _*).head()
    def d(i: Int): Double = row.getDecimal(i).doubleValue()
    val a = Array.ofDim[Double](k, k)
    var ix = 0
    for (j <- 0 until k; l <- j until k) {
      a(j)(l) = d(ix); a(l)(j) = d(ix); ix += 1
    }
    val b = (0 until k).map(j => d(ix + j)).toArray
    LinearModel(solve(a, b))
  }

  /** Solve A w = b. k ≤ 3: fixed Cramer cofactor expansion (the exact
    * expression sequence the ml1 oracle replays — do not reorder). */
  private[operators] def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    a.length match {
      case 1 => Array(b(0) / a(0)(0))
      case 2 =>
        val det = a(0)(0) * a(1)(1) - a(0)(1) * a(1)(0)
        Array((b(0) * a(1)(1) - a(0)(1) * b(1)) / det,
          (a(0)(0) * b(1) - b(0) * a(1)(0)) / det)
      case 3 =>
        val (s00, s01, s02) = (a(0)(0), a(0)(1), a(0)(2))
        val (s11, s12, s22) = (a(1)(1), a(1)(2), a(2)(2))
        val (b0, b1, b2) = (b(0), b(1), b(2))
        val det = s00 * (s11 * s22 - s12 * s12) -
          s01 * (s01 * s22 - s12 * s02) +
          s02 * (s01 * s12 - s11 * s02)
        val n0 = b0 * (s11 * s22 - s12 * s12) -
          s01 * (b1 * s22 - s12 * b2) +
          s02 * (b1 * s12 - s11 * b2)
        val n1 = s00 * (b1 * s22 - s12 * b2) -
          b0 * (s01 * s22 - s12 * s02) +
          s02 * (s01 * b2 - b1 * s02)
        val n2 = s00 * (s11 * b2 - b1 * s12) -
          s01 * (s01 * b2 - b1 * s02) +
          b0 * (s01 * s12 - s11 * s02)
        Array(n0 / det, n1 / det, n2 / det)
      case _ => gaussSolve(a.map(_.clone()), b.clone())
    }
  }

  private def gaussSolve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = a.length
    for (piv <- 0 until n) {
      var p = piv
      for (r <- piv + 1 until n) if (math.abs(a(r)(piv)) > math.abs(a(p)(piv))) p = r
      val (ta, tb) = (a(p), b(p)); a(p) = a(piv); a(piv) = ta; b(p) = b(piv); b(piv) = tb
      require(a(piv)(piv) != 0.0, "singular normal equations — drop a collinear feature")
      for (r <- piv + 1 until n) {
        val f = a(r)(piv) / a(piv)(piv)
        for (c <- piv until n) a(r)(c) -= f * a(piv)(c)
        b(r) -= f * b(piv)
      }
    }
    val w = new Array[Double](n)
    for (r <- n - 1 to 0 by -1) {
      var s = b(r)
      for (c <- r + 1 until n) s -= a(r)(c) * w(c)
      w(r) = s / a(r)(r)
    }
    w
  }

  /** The broadcast scoring expression for a fitted linear model:
    * `w0 + w1·x1 + … + wk·xk`, accumulated left-to-right (the fixed order
    * the oracle replays). Pure codegen arithmetic over in-row columns —
    * zero shuffle, scores 100 TB at scan speed. */
  def linearScore(model: LinearModel, features: Seq[Column]): Column = {
    require(features.length + 1 == model.weights.length,
      s"model has ${model.weights.length - 1} features, got ${features.length}")
    features.zipWithIndex.foldLeft(lit(model.weights(0)): Column) {
      case (acc, (f, i)) => acc + lit(model.weights(i + 1)) * f.cast("double")
    }
  }

  /** A fitted logistic model (weights(0) = intercept), weights rounded to
    * `roundTo` decimals — part of the contract, not cosmetics (see
    * [[fitLogisticGD]]). */
  final case class LogisticModel(weights: Array[Double], roundTo: Int)

  /** Logistic-regression quality classifier fit by `iterations` rounds of
    * full-batch gradient descent: per iteration ONE distributed aggregation
    * computes the gradient `g_j = Σ (σ(w·x_i) − y_i)·x_ij` (map-side
    * partial agg, k+1 doubles over the wire), then the driver applies
    * `w ← round(w − lr·g/n, roundTo)`.
    *
    * The per-iteration ROUNDING is the determinism contract: float gradient
    * sums depend on partition order and `exp` differs across engines in the
    * last ulp, so raw weights drift by ~1e-13 between runs/engines — far
    * below `roundTo = 6`, so rounding RESYNCS the weights to identical
    * values everywhere after every iteration and errors never compound.
    * Feature expressions should be normalized to O(1) magnitude (e.g.
    * `n_chars / 100.0`) or the sigmoid saturates.
    *
    * 100 TB: `iterations` scans, each reducing to k+1 numbers; nothing else
    * moves. Cache the projected feature frame before calling if the source
    * scan is expensive. */
  def fitLogisticGD(
      df: DataFrame,
      featureCols: Seq[Column],
      labelCol: Column,
      iterations: Int = 3,
      lr: Double = 0.5,
      roundTo: Int = 6): LogisticModel = {
    val k = featureCols.length + 1
    // project the features ONCE and cache the narrow (k+1 doubles) frame:
    // every GD iteration is a full pass, and re-evaluating the feature
    // expressions per pass re-pays their cost ×iterations (tokenizing
    // kernels dominate — observed 2.4 s → feature-cached a fraction of
    // that on t78's 15-iteration trainer). At 100 TB the cached frame is
    // the narrow projection, never the corpus; MEMORY_AND_DISK spills.
    val proj = df.select(
      (featureCols.map(_.cast("double")).zipWithIndex.map {
        case (x, i) => x.as(s"__x${i + 1}") } :+
        labelCol.cast("double").as("__y")): _*)
    proj.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val xs: Seq[Column] =
        lit(1.0) +: (1 to featureCols.length).map(i => col(s"__x$i"))
      val y = col("__y")
      val n = proj.count().toDouble
      var w = Array.fill(k)(0.0)
      for (_ <- 1 to iterations) {
        val margin = xs.zipWithIndex.foldLeft(lit(0.0): Column) {
          case (acc, (x, i)) => acc + lit(w(i)) * x
        }
        val resid = lit(1.0) / (lit(1.0) + exp(-margin)) - y
        val grads = proj.agg(sum(resid * xs.head).as("g0"),
          xs.tail.zipWithIndex.map { case (x, i) =>
            sum(resid * x).as(s"g${i + 1}") }: _*).head()
        val scale = math.pow(10, roundTo)
        w = w.indices.map { j =>
          val v = w(j) - lr * grads.getDouble(j) / n
          // round the BINARY double exactly as SQL round(x, 6) does — half
          // away from zero on v·1e6 (the Mixing idiom; a BigDecimal detour
          // would round the shortest decimal string instead)
          (if (v < 0) -math.round(-v * scale) else math.round(v * scale))
            .toDouble / scale
        }.toArray
      }
      LogisticModel(w, roundTo)
    } finally { proj.unpersist(); () }
  }

  /** Broadcast sigmoid scorer: `round(σ(w·x), roundTo)` — rounded because
    * `exp` is the one non-portable op in the pipeline (last-ulp differences
    * across libm implementations). */
  def logisticScore(model: LogisticModel, features: Seq[Column]): Column = {
    require(features.length + 1 == model.weights.length,
      s"model has ${model.weights.length - 1} features, got ${features.length}")
    val margin = features.zipWithIndex.foldLeft(lit(model.weights(0)): Column) {
      case (acc, (f, i)) => acc + lit(model.weights(i + 1)) * f.cast("double")
    }
    round(lit(1.0) / (lit(1.0) + exp(-margin)), model.roundTo)
  }

  /** EXACT pairwise correlation structure over integral measure columns:
    * for every pair (i ≤ j) the Pearson numerator `n·Σxy − Σx·Σy` and the
    * two squared-denominator factors `n·Σx² − (Σx)²`, all BIGINT — so
    * corr² comparisons ("is |ρ| above 0.8") are exact integer
    * cross-multiplications (`num² · t_den ≥ t_num · denx · deny` for a
    * rational t = t_num/t_den), and the float ρ = num/√(denx·deny) is a
    * display-time division. ONE aggregation carries k + k(k+1)/2 sums —
    * no shuffle of rows, no per-pair passes (the [[groupTrend]] design
    * lifted to the full moment matrix). Columns must be pre-scaled
    * integers; overflow bound as groupTrend's. Returns one row per pair:
    * (col_i, col_j, n, num, den_i, den_j). */
  def corrMatrixExact(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two measure columns")
    require(cols.distinct.size == cols.size, "columns must be unique")
    val xs = cols.map(c => col(c).cast("long"))
    val filtered = df.filter(xs.map(_.isNotNull).reduce(_ && _))
    val sumCols =
      Seq(count(lit(1)).as("__n")) ++
        cols.indices.map(i => sum(xs(i)).as(s"__s$i")) ++
        (for (i <- cols.indices; j <- cols.indices if j >= i)
          yield sum(xs(i) * xs(j)).as(s"__p${i}_$j"))
    val agg0 = filtered.agg(sumCols.head, sumCols.tail: _*)
    // an input with no complete rows makes every moment undefined — fail
    // loudly rather than emit n=0 rows whose null num/den read as "not
    // correlated" downstream (the ksDrift convention; guard LEFT of +)
    val agg = agg0.withColumn("__n",
      coalesce(assert_true(col("__n") > 0,
        lit("corrMatrixExact: no rows with all measure columns non-null " +
          "— the correlation structure is undefined")).cast("long"),
        lit(0L)) + col("__n"))
    val pairRows = for (i <- cols.indices; j <- cols.indices if j >= i) yield
      struct(lit(cols(i)).as("col_i"), lit(cols(j)).as("col_j"),
        col("__n").as("n"),
        (col("__n") * col(s"__p${i}_$j") - col(s"__s$i") * col(s"__s$j"))
          .as("num"),
        (col("__n") * col(s"__p${i}_$i") - col(s"__s$i") * col(s"__s$i"))
          .as("den_i"),
        (col("__n") * col(s"__p${j}_$j") - col(s"__s$j") * col(s"__s$j"))
          .as("den_j"))
    agg.select(explode(array(pairRows: _*)).as("__pair")).select("__pair.*")
  }

  /** Per-GROUP OLS trend slope as an EXACT integer fraction: for each
    * group, the least-squares slope of y over x is
    * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` — both sides emitted as BIGINTs
    * (`slope_num`, `slope_den`), so "is this user's spend trending up"
    * is `slope_num > 0` (den ≥ 0 always) and a threshold test
    * `slope > t` is the cross-multiplied `slope_num > t·slope_den` —
    * the q51/q54 design applied to trend detection; consumers divide
    * only for display.
    *
    * `xExpr`/`yExpr` must be integral (epoch days, cents, …). Groups
    * with a single point (or all-equal x) have `slope_den = 0` —
    * undefined trend, emitted as-is for the caller to filter, never
    * silently dropped. Overflow bound: `n·Σ|xy| < 2⁶³` — center x per
    * group upstream if your x magnitudes are large (the Σ terms shrink
    * quadratically with centering).
    *
    * Spark shape: ONE partially-aggregated groupBy carrying five
    * BIGINTs per group — no window, no self-join, map-side combined. */
  def groupTrend(
      df: DataFrame,
      groupCol: String,
      xExpr: Column,
      yExpr: Column): DataFrame =
    df.filter(xExpr.isNotNull && yExpr.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(xExpr).as("__sx"), sum(yExpr).as("__sy"),
        sum(xExpr * yExpr).as("__sxy"), sum(xExpr * xExpr).as("__sxx"))
      .select(col(groupCol), col("n"),
        (col("n") * col("__sxy") - col("__sx") * col("__sy"))
          .as("slope_num"),
        (col("n") * col("__sxx") - col("__sx") * col("__sx"))
          .as("slope_den"))

  /** Reliability diagram + expected calibration error (Guo et al. 2017)
    * for a scored classifier — the measurement a trained quality/spam
    * filter ([[fitLogisticGD]], the t78 shape) needs before its scores
    * can gate a corpus: per equal-width score bin, confidence
    * (mean score) vs accuracy (positive rate), plus the n-weighted
    * |conf − acc| total.
    *
    * Exactness contract: scores are taken at 6-decimal resolution
    * (cast to decimal(18,6) — micro-units), so every per-bin sum is an
    * EXACT integer in any engine whatever the summation order, and
    * `ece = Σ_b |S_b − 10⁶·P_b| / (10⁶·N)` has an exact integer
    * numerator; only the final single divisions round. ONE
    * hash-aggregate over (bin, micro-score) rows — bins are the output
    * bound. Returns one row per non-empty bin:
    * `(bin, n, n_pos, conf, acc, ece)` with the scalar `ece` repeated
    * per row (it rides a one-row broadcast). Scores outside [0, 1]
    * are a caller bug and refused via an ANSI-safe range check. */
  /** Exact ROC-AUC via the Mann-Whitney rank statistic with the
    * standard tie correction: over all (positive, negative) pairs,
    * `AUC = (#[s⁺ > s⁻] + ½·#[s⁺ = s⁻]) / (P·N)`. Computed without
    * materializing pairs: scores quantize to 6-decimal micro-units
    * (the [[calibrationBins]] exactness contract), group to DISTINCT
    * score rows, and one ordered prefix sum gives each score's
    * negatives-below — the doubled numerator
    * `Σ p_s·(2·negBelow_s + neg_s)` is an exact integer in any
    * engine; only the final division rounds.
    *
    * The ordered window runs over DISTINCT micro-scores — at most
    * 10⁶+1 rows whatever the corpus, so the single-partition sort is
    * bounded by construction, not by data (the same argument as the
    * calibration bins). A class with zero members makes AUC undefined
    * — reported as null, never 0.5-faked. Returns one row
    * `(n_pos, n_neg, auc)`. */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val micro = (col(scoreCol).cast("decimal(18,6)") * 1000000L).cast("long")
    val g = df
      .select(micro.as("__s"), col(labelCol).cast("long").as("__y"))
      .groupBy("__s")
      .agg(count(lit(1)).as("__n"), sum("__y").as("__p"))
      .withColumn("__neg", col("__n") - col("__p"))
    val w = Window.orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("__negBelow", coalesce(sum("__neg").over(w), lit(0L)))
      .agg(
        sum(col("__p") * (col("__negBelow") * 2 + col("__neg"))).as("__num2"),
        sum("__p").as("n_pos"), sum("__neg").as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        round(when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
          .otherwise(col("__num2").cast("double") /
            (col("n_pos") * col("n_neg") * 2L)), 6).as("auc"))
  }

  /** Confusion counts and the derived precision/recall/F1/accuracy at a
    * decision threshold — the operating-point companion to [[aucExact]]
    * (which integrates over all thresholds) and [[calibrationBins]].
    * The threshold compares in 6-decimal micro-units (score ≥ t is
    * positive), so the split is exact in any engine; F1 uses the
    * integer-rational form `2·tp / (2·tp + fp + fn)`, and every
    * derived metric with a zero denominator reports null rather than
    * an arbitrary convention. ONE aggregate; returns a single row
    * `(tp, fp, tn, fn, precision, recall, f1, accuracy)`. */
  def confusionAtThreshold(df: DataFrame, scoreCol: String,
      labelCol: String, threshold: Double): DataFrame = {
    val tMicro = math.round(threshold * 1000000L)
    val micro = (col(scoreCol).cast("decimal(18,6)") * 1000000L)
      .cast("long")
    val pred = (micro >= tMicro).cast("long")
    val y = (col(labelCol).cast("long") > 0).cast("long")
    def rat(num: Column, den: Column): Column =
      round(when(den === 0, lit(null))
        .otherwise(num.cast("double") / den), 6)
    df.agg(
        sum(pred * y).as("tp"),
        sum(pred * (lit(1L) - y)).as("fp"),
        sum((lit(1L) - pred) * (lit(1L) - y)).as("tn"),
        sum((lit(1L) - pred) * y).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        rat(col("tp"), col("tp") + col("fp")).as("precision"),
        rat(col("tp"), col("tp") + col("fn")).as("recall"),
        rat(col("tp") * 2, col("tp") * 2 + col("fp") + col("fn")).as("f1"),
        rat(col("tp") + col("tn"),
          col("tp") + col("fp") + col("tn") + col("fn")).as("accuracy"))
  }

  /** The operating CURVE in one pass — [[confusionAtThreshold]] swept
    * over K thresholds with a single aggregate: per threshold, four
    * conditional sums land as agg columns (map-side partial combine, 4K
    * counters per partition — K is a handful of operating points), then
    * the one-row result unpivots to K rows driver-free. Thresholds
    * report as exact 6-decimal micro-units (`t_micro`) so the split —
    * and the output key — never touches a float boundary; the derived
    * ratios follow the [[confusionAtThreshold]] conventions (round 6,
    * null on zero denominators). Returns one row per threshold:
    * `(t_micro, tp, fp, tn, fn, precision, recall, f1, accuracy)`.
    * This is how you pick a filter threshold: ml5's AUC says whether
    * the scorer ranks, this table says where to cut. */
  def confusionSweep(df: DataFrame, scoreCol: String, labelCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val micros = thresholds.map(t => math.round(t * 1000000L))
    require(micros.distinct.size == micros.size,
      s"duplicate thresholds (at 6-decimal resolution): $thresholds")
    val micro = (col(scoreCol).cast("decimal(18,6)") * 1000000L)
      .cast("long")
    val y = (col(labelCol).cast("long") > 0).cast("long")
    val aggs = micros.zipWithIndex.flatMap { case (tM, i) =>
      val pred = (micro >= tM).cast("long")
      Seq(
        sum(pred * y).as(s"__tp$i"),
        sum(pred * (lit(1L) - y)).as(s"__fp$i"),
        sum((lit(1L) - pred) * (lit(1L) - y)).as(s"__tn$i"),
        sum((lit(1L) - pred) * y).as(s"__fn$i"))
    }
    def rat(num: Column, den: Column): Column =
      round(when(den === 0, lit(null))
        .otherwise(num.cast("double") / den), 6)
    val rows = micros.zipWithIndex.map { case (tM, i) =>
      struct(lit(tM).as("t_micro"),
        col(s"__tp$i").as("tp"), col(s"__fp$i").as("fp"),
        col(s"__tn$i").as("tn"), col(s"__fn$i").as("fn"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.t_micro").as("t_micro"),
        col("__r.tp").as("tp"), col("__r.fp").as("fp"),
        col("__r.tn").as("tn"), col("__r.fn").as("fn"))
      .select(col("t_micro"), col("tp"), col("fp"), col("tn"), col("fn"),
        rat(col("tp"), col("tp") + col("fp")).as("precision"),
        rat(col("tp"), col("tp") + col("fn")).as("recall"),
        rat(col("tp") * 2, col("tp") * 2 + col("fp") + col("fn")).as("f1"),
        rat(col("tp") + col("tn"),
          col("tp") + col("fp") + col("tn") + col("fn")).as("accuracy"))
  }

  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2; got $nBins")
    val micro = (col(scoreCol).cast("decimal(18,6)") * 1000000L)
      .cast("long")
    val guarded = when(micro >= 0L && micro <= 1000000L, micro)
      .otherwise(raise_error(concat(
        lit(s"calibrationBins: $scoreCol out of [0,1]: "),
        col(scoreCol).cast("string"))))
    val bins = df
      .select(least(floor(guarded * nBins / 1000000L), lit(nBins - 1L))
          .cast("long").as("bin"),
        guarded.as("__m"),
        col(labelCol).cast("long").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("n_pos"),
        sum(col("__m")).as("__s"))
    val tot = bins.agg(
      sum(abs(col("__s") - col("n_pos") * 1000000L)).as("__num"),
      sum(col("n")).as("__nn"))
    bins.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("__s").cast("double") / (col("n") * 1000000L), 6)
          .as("conf"),
        round(col("n_pos").cast("double") / col("n"), 6).as("acc"),
        round(col("__num").cast("double") / (col("__nn") * 1000000L), 6)
          .as("ece"))
  }
}
