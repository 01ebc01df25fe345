package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the "what does this table look like"
  * companion to [[graft.api.Graft.tableStats]] (file-level) and
  * [[Expect]] (pass/fail contracts): per-column summaries and value
  * histograms, each in ONE pass, for ingestion review, drift monitoring
  * and join-planning sanity checks.
  */
object Profile {

  /** One-pass numeric summary: per column `(column, n_rows, n_nulls,
    * min, max, mean)`, rows in the caller's column order. Means are
    * exact-decimal sums divided AFTER the double cast (deterministic
    * under any aggregation order — the q1/dsum convention; 2-decimal
    * measures stay exact, higher-precision inputs round at the cast like
    * every decimal gate). All requested columns must be numeric —
    * profiling a string column as numeric is a caller bug surfaced at
    * analysis, not a NaN row.
    *
    * Spark shape: identical to [[Expect.audit]] — every column
    * contributes a handful of codegen'd counters to ONE partial-
    * aggregated scan; the exchange moves 5×columns values per task and
    * the per-column explode happens on the single final row. */
  def summary(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "summary needs at least one column")
    require(cols.distinct.size == cols.size, "columns must be unique")
    // cast("double") on a string column passes analysis and silently
    // yields null stats under non-ANSI mode — check the actual types
    cols.foreach { c =>
      val dt = df.schema.find(_.name == c)
        .getOrElse(throw new IllegalArgumentException(s"column $c not found"))
        .dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"summary profiles numeric columns only; $c is $dt")
    }
    val counters =
      count(lit(1)).as("__n") +:
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn$i"),
          min(col(c).cast("double")).as(s"__mn$i"),
          max(col(c).cast("double")).as(s"__mx$i"),
          sum(col(c).cast("decimal(30,6)")).as(s"__sm$i"))
      }
    val one = df.agg(counters.head, counters.tail: _*)
    val rows = array(cols.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("__ord"), lit(c).as("column"),
        col(s"__nn$i").as("n_nulls"), col(s"__mn$i").as("min"),
        col(s"__mx$i").as("max"),
        (col(s"__sm$i").cast("double") /
          (col("__n") - col(s"__nn$i"))).as("mean"))
    }: _*)
    one.select(col("__n"), explode(rows).as("__c"))
      .select(col("__c.column").as("column"), col("__n").as("n_rows"),
        coalesce(col("__c.n_nulls"), lit(0L)).as("n_nulls"),
        col("__c.min").as("min"), col("__c.max").as("max"),
        col("__c.mean").as("mean"), col("__c.__ord").as("__ord"))
      .orderBy("__ord")
      .drop("__ord")
  }

  /** Two-table drift comparison: [[summary]] of `a` and `b` joined per
    * column — `(column, n_rows_a/b, n_nulls_a/b, min_a/b, max_a/b,
    * mean_a/b)` — the "what changed between yesterday's table and
    * today's" review in TWO single-pass scans (one per table; each is the
    * audit-counter shape, so the exchange moves a handful of longs per
    * task regardless of table size). Columns must exist in both frames;
    * pair with [[graft.operators.Collocations]]' KL drift for
    * distribution-level movement and `Dedup.corpusDiff` for row-level. */
  def compare(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val sa = summary(a, cols)
    val sb = summary(b, cols)
    sa.select(col("column"), col("n_rows").as("n_rows_a"),
        col("n_nulls").as("n_nulls_a"), col("min").as("min_a"),
        col("max").as("max_a"), col("mean").as("mean_a"))
      .join(sb.select(col("column"), col("n_rows").as("n_rows_b"),
        col("n_nulls").as("n_nulls_b"), col("min").as("min_b"),
        col("max").as("max_b"), col("mean").as("mean_b")), "column")
  }

  /** 2-D equi-width histogram over `[loX, hiX) × [loY, hiY)` — the
    * heatmap / correlation-structure companion to [[histogram]]: one row
    * per non-empty cell `(bx, by, x_lo, x_hi, y_lo, y_hi, n)`, the same
    * −1/`buckets` out-of-range sentinels per axis. Still ONE aggregation;
    * the shuffle is the (bucketsX+2)·(bucketsY+2) cell table. */
  def histogram2d(
      df: DataFrame,
      cx: String, loX: Double, hiX: Double, bucketsX: Int,
      cy: String, loY: Double, hiY: Double, bucketsY: Int): DataFrame = {
    require(bucketsX >= 1 && bucketsY >= 1, "buckets must be >= 1")
    require(loX < hiX && loY < hiY, "need lo < hi on both axes")
    val wx = (hiX - loX) / bucketsX
    val wy = (hiY - loY) / bucketsY
    def bucket(c: String, lo: Double, hi: Double, w: Double, n: Int) =
      when(col(c).cast("double") < lo, lit(-1L))
        .when(col(c).cast("double") >= hi, lit(n.toLong))
        .otherwise(floor((col(c).cast("double") - lo) / w).cast("long"))
    df.filter(col(cx).isNotNull && col(cy).isNotNull)
      .groupBy(bucket(cx, loX, hiX, wx, bucketsX).as("bx"),
        bucket(cy, loY, hiY, wy, bucketsY).as("by"))
      .agg(count(lit(1)).as("n"))
      .select(col("bx"), col("by"),
        (lit(loX) + col("bx") * wx).as("x_lo"),
        (lit(loX) + (col("bx") + 1) * wx).as("x_hi"),
        (lit(loY) + col("by") * wy).as("y_lo"),
        (lit(loY) + (col("by") + 1) * wy).as("y_hi"),
        col("n"))
  }

  /** Equi-width histogram of a numeric column over `[lo, hi)`: one row
    * per NON-EMPTY bucket, `(bucket, bucket_lo, bucket_hi, n)`, bucket
    * index `floor((x − lo)/width)`. Values outside `[lo, hi)` land in
    * the sentinel buckets −1 (below) and `buckets` (above) rather than
    * silently vanishing — an audit that drops out-of-range rows hides
    * exactly what it should surface. Bucket arithmetic is plain IEEE
    * double subtract/divide/floor, bit-identical across engines.
    *
    * ONE aggregation: map-side partial counts per bucket, `buckets+2`
    * possible groups — the shuffle is the bucket table, not the data. */
  def histogram(
      df: DataFrame,
      c: String,
      lo: Double,
      hi: Double,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / buckets
    val b = when(col(c).cast("double") < lo, lit(-1L))
      .when(col(c).cast("double") >= hi, lit(buckets.toLong))
      .otherwise(floor((col(c).cast("double") - lo) / width).cast("long"))
    df.filter(col(c).isNotNull)
      .groupBy(b.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (lit(lo) + col("bucket") * width).as("bucket_lo"),
        (lit(lo) + (col("bucket") + 1) * width).as("bucket_hi"),
        col("n"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between the `valueCol`
    * distributions of two slices — the "did this feature drift between
    * snapshots/sources" test as ONE exact number. Values are quantized to
    * `floor(value·scale)` bins (both engines' double multiply+floor agree
    * bit-for-bit), and the statistic is kept as an EXACT integer pair:
    * `d_num = max over bins |cumA·n_b − cumB·n_a|`, `d_den = n_a·n_b`,
    * so D = d_num/d_den with no float comparison anywhere — the decision
    * "did D exceed the threshold" can never flip across engines or
    * partitionings (the q51 design transposed to CDFs). `at_bin` reports
    * the SMALLEST bin attaining the max (deterministic tiebreak).
    *
    * Spark shape: one partially-aggregated (bin, side) counting shuffle —
    * the data shuffles as bin counts, never rows. The running CDF is a
    * global-order window over the BIN TABLE, which the quantization
    * contract bounds: the guard fails loudly past `maxBins` distinct bins
    * (the rrfFuse cap convention) rather than silently one-task-sorting
    * an unbounded domain; pick `scale` so the value range lands within
    * bins, not the other way around. Overflow: `cum·n` products stay in
    * BIGINT while each side holds under ~3e9 rows per 1.0 of the other's
    * count — at larger scales pre-aggregate per shard or downscale.
    *
    * Returns ONE row: (n_a, n_b, d_num, d_den, at_bin). Fails loudly if
    * either side has no rows (or the input is empty) — the statistic is
    * undefined there, and a silent 0-row/0-denominator result would read
    * as "no drift". */
  def ksDrift(
      df: DataFrame,
      valueCol: String,
      sideCol: String,
      sideA: String,
      sideB: String,
      scale: Double = 100.0,
      maxBins: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perBin = df
      .filter(col(sideCol).isin(sideA, sideB) && col(valueCol).isNotNull)
      .select(floor(col(valueCol).cast("double") * lit(scale))
        .cast("long").as("__bin"), col(sideCol).as("__side"))
      .groupBy("__bin")
      .agg(sum(when(col("__side") === sideA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__side") === sideB, 1L).otherwise(0L)).as("__cb"))
    // a side with no rows makes the statistic undefined (d_den = 0); an
    // empty input would silently return zero rows — both fail loudly
    // instead, at broadcast-build time (the assert folds into n_a so it
    // can never be pruned unevaluated)
    // guard on the LEFT of the +: with a fully-empty input the sums are
    // null, and codegen's null short-circuit would skip a right-hand
    // guard entirely (the binaryTopK lesson); assert_true(null) raises,
    // covering empty input and an empty side with one check
    val totals = perBin.agg(sum("__ca").as("__na"), sum("__cb").as("__nb"))
      .select((coalesce(assert_true(
          col("__na") > 0 && col("__nb") > 0,
          lit("ksDrift: a side has no rows (or the input is empty) — " +
            "the KS statistic is undefined")).cast("long"), lit(0L))
          + col("__na"))
        .as("__na"),
        col("__nb"))
    val w = Window.orderBy("__bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binRank = Window.orderBy("__bin")
    // loud bounded-domain guard, folded into a kept column so it is
    // never pruned unevaluated (the rrfFuse cap convention)
    val guard = coalesce(assert_true(row_number().over(binRank) <= maxBins,
      lit(s"ksDrift: more than $maxBins distinct bins — the global-order " +
        "CDF window needs a bounded domain; coarsen `scale` or raise " +
        "maxBins explicitly")).cast("long"), lit(0L))
    val d = perBin
      .withColumn("__cuma", sum("__ca").over(w) + guard)
      .withColumn("__cumb", sum("__cb").over(w))
      .crossJoin(broadcast(totals))
      .select(col("__bin"),
        abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na"))
          .as("__dnum"),
        col("__na"), col("__nb"))
    val top = d.agg(max("__dnum").as("__m"))
    val atBin = d.crossJoin(broadcast(top))
      .filter(col("__dnum") === col("__m"))
      .agg(min("__bin").as("at_bin"))
    // totals DRIVES the final row: it always has exactly one row, so the
    // guard evaluates even when the bin table is empty (an empty streamed
    // side would let AQE skip building a broadcast guard entirely)
    totals.crossJoin(broadcast(top)).crossJoin(broadcast(atBin))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        col("__m").as("d_num"), (col("__na") * col("__nb")).as("d_den"),
        col("at_bin"))
  }
}
