package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (latest right row with rightTime <= leftTime per key),
  * implemented with the union + last-value-carry-forward technique:
  *
  *   1. tag and union both inputs on (key, time) — ONE shuffle, keyed by the
  *      join key, instead of a range cross-join;
  *   2. sort within each key partition by (time, tag) with right rows first
  *      at equal timestamps (inclusive semantics);
  *   3. carry the last non-null right payload forward with an unbounded
  *      preceding window;
  *   4. keep only left rows.
  *
  * Cost is a single sort-merge pass — the same plan shape a native as-of
  * join operator would produce, with no data explosion, so it scales to
  * arbitrarily large inputs as long as single keys fit a partition (salt
  * keys upstream if one key dominates).
  *
  * Right rows sharing (key, time) must be pre-deduplicated by the caller for
  * a deterministic result (the reference point for our oracle: DuckDB ASOF
  * JOIN has the same requirement).
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      leftKey: String,
      rightKey: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq

    val taggedLeft = left
      .withColumn("__key", col(leftKey))
      .withColumn("__time", col(leftTime))
      .withColumn("__is_right", lit(0))

    // the whole right payload travels as ONE struct: a single
    // last(ignoreNulls) then carries all payload columns from the SAME
    // matched right row, so a legitimately-NULL payload field survives
    // instead of being back-filled from an older row (no row tearing)
    val taggedRight = right.select(
      col(rightKey).as("__key"), col(rightTime).as("__time"),
      lit(1).as("__is_right"),
      struct(payloadCols.map(col): _*).as("__payload"))

    // unionByName fills the columns each side lacks (left data columns on
    // right rows; the payload struct on left rows) with typed nulls
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    // right rows (tag 1) sort before left rows (tag 0) at equal time =>
    // a right row at exactly leftTime is visible (inclusive <=)
    val w = Window.partitionBy("__key")
      .orderBy(col("__time").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // the struct is non-null on every right row (even when its fields are
    // null), so this picks the latest right row as a unit
    unioned
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select((leftCols.map(col) ++
        payloadCols.map(c => col(s"__carried.$c").as(c))): _*)
  }

  /** TOLERANCE-bounded backward as-of (pandas `merge_asof(tolerance=…)`
    * parity): the usual latest-right-row-at-or-before match, but a match
    * STALER than `toleranceSeconds` is nulled — "the last sensor reading,
    * unless it's too old to trust". Composition: ONE [[asofJoin]] pass
    * carrying the matched right row's own time alongside the payload,
    * then a codegen'd staleness mask — no extra shuffle, the same
    * one-merge cost as the unbounded join. `rightTime` must not collide
    * with a left column (it rides through the payload struct); both time
    * columns must be timestamp-typed (micros arithmetic decides
    * staleness, inclusive at exactly the tolerance). */
  def asofJoinTolerance(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      leftKey: String,
      rightKey: String,
      payloadCols: Seq[String],
      toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds > 0,
      s"toleranceSeconds must be positive, got $toleranceSeconds")
    require(!left.columns.contains(rightTime),
      s"right time column '$rightTime' collides with a left column — " +
        "alias one side first")
    val withRt = asofJoin(left, right, leftTime, rightTime, leftKey,
      rightKey, payloadCols :+ rightTime)
    val fresh = col(rightTime).isNotNull &&
      (unix_micros(col(rightTime)) >=
        unix_micros(col(leftTime)) - lit(toleranceSeconds * 1000000L))
    withRt.select((left.columns.toSeq.map(col) ++
      payloadCols.map(c => when(fresh, col(c)).as(c))): _*)
  }

  /** NEAREST-match as-of: each left row takes the right row minimizing
    * the absolute time distance (backward wins exact-distance ties) —
    * the sensor-alignment variant where "the closest reading" beats "the
    * last reading" ([[asofJoin]]'s backward contract). Composition: one
    * backward pass and one forward pass (the same merge on NEGATED
    * microsecond timestamps), joined back on `leftId` (a unique left row
    * key, the caller contract that makes the recombination well-defined)
    * picking the closer match per row. Costs exactly two as-of merges —
    * each the one-shuffle shape documented on [[asofJoin]] — plus two
    * id-keyed joins of payload-width frames.
    *
    * The right side must be unique per (key, time) like every as-of here;
    * both time columns must be timestamp-typed (micros arithmetic decides
    * distance). */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      leftTime: String,
      rightTime: String,
      leftKey: String,
      rightKey: String,
      payloadCols: Seq[String]): DataFrame = {
    require(!payloadCols.contains("__rus"), "payload name __rus is reserved")
    Seq("__id", "__pb", "__pf", "__pick", "__lus").foreach(r =>
      require(!left.columns.contains(r), s"left column name $r is reserved"))
    val lu = left.withColumn("__lus", unix_micros(col(leftTime)))
    val ru = right.withColumn("__rus", unix_micros(col(rightTime)))
    val pay = payloadCols :+ "__rus"
    val back = asofJoin(lu, ru, leftTime, rightTime, leftKey, rightKey, pay)
      .select(col(leftId).as("__id"), struct(pay.map(col): _*).as("__pb"))
    val luN = lu.withColumn("__nlus", -col("__lus"))
    val ruN = ru.withColumn("__nrus", -col("__rus"))
    val fwd = asofJoin(luN, ruN, "__nlus", "__nrus", leftKey, rightKey, pay)
      .select(col(leftId).as("__id"), struct(pay.map(col): _*).as("__pf"))
    val chosen = when(col("__pb.__rus").isNull, col("__pf"))
      .when(col("__pf.__rus").isNull, col("__pb"))
      .when(col("__lus") - col("__pb.__rus") <= col("__pf.__rus") - col("__lus"),
        col("__pb"))
      .otherwise(col("__pf"))
    lu.join(back, lu(leftId) === back("__id"), "left").drop("__id")
      .join(fwd, lu(leftId) === fwd("__id"), "left").drop("__id")
      .withColumn("__pick", chosen)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"__pick.$c").as(c)): _*)
  }

  /** Same semantics as [[asofJoin]] (backward inclusive, left-outer), as the
    * native whole-operator plan node ([[graft.plans.AsofJoinExec]]): one
    * hash exchange per side, partition-local sorts, and a streaming merge
    * with O(1) state — no union materialization, no window carry-forward,
    * and the left (key, time) ordering is preserved for downstream
    * operators. Key and time columns must have identical types on both
    * sides (cast before calling). The planner strategy is registered on
    * `left`'s session on first use (idempotent); sessions built with
    * `spark.sql.extensions=graft.GraftExtensions` already have it. */
  def asofJoinNative(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      leftKey: String,
      rightKey: String,
      payloadCols: Seq[String]): DataFrame = {
    import graft.plans.{AsofJoinNode, AsofJoinPushdown, AsofJoinStrategy}
    import org.apache.spark.sql.GraftInternals
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsofJoinPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsofJoinPushdown
    // fresh exprIds via aliases (self-join safe) + early manual pruning:
    // no column-pruning rule descends into the custom node, so the right
    // side enters it already narrowed to key/time/payload
    val rightSel = right.select(
      col(rightKey).as("__r_key") +: col(rightTime).as("__r_time") +:
        payloadCols.map(c => col(c).as("__r_" + c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightSel.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val (lk, lt) = (attr(lPlan, leftKey), attr(lPlan, leftTime))
    val (rk, rt) = (attr(rPlan, "__r_key"), attr(rPlan, "__r_time"))
    require(lk.dataType == rk.dataType,
      s"key types must match: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"time types must match: ${lt.dataType} vs ${rt.dataType} (cast first)")
    GraftInternals.ofRows(spark, AsofJoinNode(lPlan, rPlan, lk, rk, lt, rt))
      .select(left.columns.toSeq.map(col) ++
        payloadCols.map(c => col("__r_" + c).as(c)): _*)
  }

  /** Stream-capable as-of ENRICHMENT against a bounded dimension: each left
    * row gains the payload of the LATEST dim row with dimTime <= leftTime
    * for its key (backward inclusive, left outer — asofJoin semantics) via
    * a broadcast sorted lookup + per-row binary search. ZERO shuffles,
    * ZERO streaming state: the dim collects once at plan time (the same
    * bounded-side contract as any broadcast join) into per-key sorted
    * arrays, and every row probes in O(log |key's dim rows|) map-side.
    *
    * This is the missing streaming shape: Structured Streaming's
    * stream-static joins cannot express "latest ≤ ts" (no window over the
    * stream mid-query, and a plain join would fan out per dim row), but a
    * row-wise mapPartitions is streaming-safe in append mode — the gate
    * runs THIS over the events stream and compares against DuckDB's batch
    * ASOF JOIN. Works identically on batch frames.
    *
    * Times compare in microseconds (timestamps), days→micros (dates), or
    * as-is (integrals); key/time types may differ between sides as long as
    * both normalize (e.g. timestamp left vs date dim). Dim rows sharing
    * (key, time) must be pre-deduplicated (same contract as asofJoin /
    * DuckDB ASOF). The dim snapshot is taken ONCE per (re)start of the
    * query — restart the stream to refresh it.
    *
    * The dim collects to the DRIVER (that is what makes the operator
    * stateless and shuffle-free), so it is capped at `maxDimRows`
    * (default 1M) — exceeding it fails with a clear message instead of
    * an opaque driver OOM mid-collect; raise it only alongside driver
    * memory, or use [[asofJoin]]/[[asofJoinNative]], which shuffle and
    * scale with the cluster instead of the driver. */
  def asofEnrichBroadcast(
      left: DataFrame,
      dim: DataFrame,
      leftTime: String,
      dimTime: String,
      leftKey: String,
      dimKey: String,
      payloadCols: Seq[String],
      maxDimRows: Int = 1000000): DataFrame = {
    import org.apache.spark.sql.types._
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    require(maxDimRows >= 1 && maxDimRows < Int.MaxValue,
      "maxDimRows must be in [1, Int.MaxValue)")
    require(!left.columns.contains("__k") && !left.columns.contains("__t"),
      "input already has a '__k'/'__t' column — rename it first (withColumn " +
        "would replace it and shift the probe ordinals)")
    // the payload is APPENDED to the left schema: a name collision would
    // produce a frame with duplicate columns that fails only downstream
    val resolver = left.sparkSession.sessionState.analyzer.resolver
    val colliding = payloadCols.filter(p => left.columns.exists(resolver(_, p)))
    require(colliding.isEmpty,
      s"payload column(s) ${colliding.mkString(", ")} already exist on the " +
        "left side — alias them on the dim or drop/rename them on the left " +
        "so the enriched schema carries each name once")

    def micros(df: DataFrame, c: String): org.apache.spark.sql.Column =
      df.schema(c).dataType match {
        case TimestampType => unix_micros(col(c))
        // dates and NTZ timestamps promote through cast("timestamp") — the
        // SESSION-timezone midnight/instant, exactly Spark's own cast (and
        // DuckDB ASOF's coercion); a raw days→micros conversion would pin
        // day boundaries to UTC and silently shift matches in non-UTC
        // sessions
        case TimestampNTZType | DateType => unix_micros(col(c).cast("timestamp"))
        case ByteType | ShortType | IntegerType | LongType => col(c).cast("long")
        case other => throw new IllegalArgumentException(
          s"unsupported as-of time type for $c: $other")
      }

    // dim → driver: per-key time-sorted arrays (the broadcast-dim contract).
    // limit(cap + 1) bounds the collect ITSELF — a count-first probe would
    // cost an extra job and an unguarded collect is exactly the OOM the
    // cap exists to prevent
    val dimRows = dim
      .select(col(dimKey).cast("string").as("__k") +: micros(dim, dimTime).as("__t") +:
        payloadCols.map(col): _*)
      .filter(col("__k").isNotNull && col("__t").isNotNull)
      .limit(maxDimRows + 1)
      .collect()
    require(dimRows.length <= maxDimRows,
      s"asofEnrichBroadcast dim has more than maxDimRows=$maxDimRows rows — " +
        "the dim collects to the driver; raise maxDimRows alongside driver " +
        "memory, shrink the dim (project/filter first), or use asofJoin/" +
        "asofJoinNative which scale with the cluster")
    val lookup: Map[String, (Array[Long], Array[Array[Any]])] =
      dimRows.groupBy(_.getString(0)).map { case (k, rows) =>
        val sorted = rows.sortBy(_.getLong(1))
        k -> (sorted.map(_.getLong(1)),
          sorted.map(r => Array.tabulate[Any](payloadCols.length)(i => r.get(i + 2))))
      }
    val bc = left.sparkSession.sparkContext.broadcast(lookup)

    val payloadFields = payloadCols.map(c =>
      dim.schema(c).copy(nullable = true))
    val outSchema = StructType(left.schema.fields ++ payloadFields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val nLeft = left.schema.length
    val nPay = payloadCols.length

    left
      .withColumn("__k", col(leftKey).cast("string"))
      .withColumn("__t", micros(left, leftTime))
      .mapPartitions { rows =>
        val m = bc.value
        rows.map { r =>
          val out = new Array[Any](nLeft + nPay)
          var i = 0
          while (i < nLeft) { out(i) = r.get(i); i += 1 }
          val k = r.getString(nLeft) // __k
          if (!r.isNullAt(nLeft) && !r.isNullAt(nLeft + 1)) {
            val t = r.getLong(nLeft + 1) // __t
            m.get(k).foreach { case (times, pays) =>
              val pos = java.util.Arrays.binarySearch(times, t)
              val idx = if (pos >= 0) pos else -pos - 2 // last time <= t
              if (idx >= 0) {
                val p = pays(idx)
                var j = 0
                while (j < nPay) { out(nLeft + j) = p(j); j += 1 }
              }
            }
          }
          org.apache.spark.sql.Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
        }
      }(enc)
  }
}
