package graft.index

import java.io.ByteArrayInputStream

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Per-FILE Bloom sidecars: point-lookup file skipping for DATA columns —
  * the membership complement of the zone maps' min/max range pruning
  * (`Graft.zoneMap` handles "was this range written here", blooms handle
  * "was this exact key written here", which min/max cannot answer for
  * high-cardinality keys scattered across the domain).
  *
  * Layout: `<table>/_graft_bloom/<column>/` holds one row per data file
  * `(file, n_rows, bloom BINARY)`. The underscore prefix keeps the
  * sidecar invisible to every scan (Spark's file index and graft's
  * discovery both skip `_`/`.` names).
  *
  * 100 TB shape: building is one `_metadata.file_path`-grouped
  * aggregation — the bloom OR-merge is commutative, so map-side partial
  * aggregation ships one bounded buffer per (task × file). Lookup never
  * collects blooms to the driver: the sidecar (one row per FILE — small,
  * but at a million files no longer driver-trivial) is filtered
  * DISTRIBUTED by a native might-contain expression, and only the
  * surviving file paths (bounded by the true match count + fpp stragglers)
  * reach the driver to form the pruned scan.
  *
  * Staleness fails CLOSED: the reader lists the table's current data
  * files (metadata-only) and refuses if any is missing from the sidecar —
  * a file appended after the build would otherwise be silently skipped,
  * which is a wrong ANSWER, not a slow one. Rebuild after appends, or
  * scope builds per ingest batch.
  */
object BloomSidecar {

  private[index] def sidecarPath(url: String, column: String) =
    s"$url/_graft_bloom/$column"

  /** The single put/might-contain canonicalization both sides share:
    * integral types through putLong, strings through their UTF-8 bytes.
    * One place, so the write and read paths cannot diverge. */
  private def requireSupported(dt: DataType, what: String): Unit =
    require(dt == LongType || dt == IntegerType || dt == StringType,
      s"$what: bloom sidecars support BIGINT/INT/STRING keys, got $dt")

  /** One rendering for a file URI whichever surface produced it:
    * `_metadata.file_path` URL-encodes special characters while
    * `inputFiles`/Path.toString may not, and file:/ vs file:/// varies —
    * decode through URI when the string parses as one, then normalize
    * through hadoop Path. */
  private[index] def normPath(s: String): String =
    try new Path(new java.net.URI(s)).toString
    catch { case _: Exception => new Path(s).toString }

  /** Build (or rebuild) the sidecar for `column` over every data file of
    * the parquet table at `url` — INCLUDING zero-row files (an empty
    * write partition or an empty streaming micro-batch leaves
    * schema-only part files; they carry an empty bloom so the staleness
    * check stays consistent and lookups skip them naturally). Returns
    * the number of files covered. */
  def write(
      spark: SparkSession,
      url: String,
      column: String,
      fpp: Double = 0.01,
      expectedPerFile: Long = 4L * 1024 * 1024): Int = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val df = spark.read.parquet(url)
    val dt = df.schema(column).dataType
    requireSupported(dt, "bloom write")
    val grouped = df
      .select(col("_metadata.file_path").as("file"), col(column).as("__k"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        GraftInternals.column(BloomAgg(
          GraftInternals.expression(col("__k")),
          expectedPerFile, fpp).toAggregateExpression()).as("bloom"))
    // zero-row files never produce a grouped row — append them with an
    // empty bloom (deterministic: nothing was ever put; lookups skip them
    // naturally). Detected by comparing NORMALIZED renderings (the file
    // index and _metadata can render the same URI differently); only the
    // file-name strings are collected, never blooms.
    val rowFiles = grouped.select("file").collect()
      .map(r => normPath(r.getString(0))).toSet
    val zeroRow = df.inputFiles.filterNot(f => rowFiles.contains(normPath(f)))
    val emptyBloom = {
      val bos = new java.io.ByteArrayOutputStream()
      BloomFilter.create(expectedPerFile, fpp).writeTo(bos)
      bos.toByteArray
    }
    import spark.implicits._
    val side = grouped.unionByName(
      zeroRow.toSeq.map(f => (f, 0L, emptyBloom))
        .toDF("file", "n_rows", "bloom"))
    side.coalesce(1).write.mode("overwrite")
      .parquet(sidecarPath(url, column))
    spark.read.parquet(sidecarPath(url, column)).count().toInt
  }

  /** The file paths that MAY contain any of `values` (plus every file
    * holding only nulls is excluded; bloom never sees nulls). Refuses on a
    * stale sidecar — see the class doc. */
  def candidateFiles(
      spark: SparkSession,
      url: String,
      column: String,
      values: Seq[Any]): Seq[String] = {
    require(values.nonEmpty, "need at least one lookup value")
    val side = spark.read.parquet(sidecarPath(url, column))
    // staleness check: every CURRENT data file must be covered. The
    // current list comes from the driver-side file index (inputFiles —
    // a listing, NO scan job); both sides normalize through normPath
    // because the file index and _metadata.file_path can render the same
    // URI differently (file:/ vs file:///, percent-encoding)
    val covered = side.select("file").collect()
      .map(r => normPath(r.getString(0))).toSet
    val current = spark.read.parquet(url).inputFiles.map(normPath)
    val missing = current.filterNot(covered)
    require(missing.isEmpty,
      s"bloom sidecar for $column is STALE: ${missing.length} data files " +
        s"are not covered (first: ${missing.headOption.getOrElse("")}) — " +
        "rebuild with BloomSidecar.write; skipping them would drop rows")
    val valueArr = array(values.map(v => lit(v)): _*)
    side.filter(GraftInternals.column(BloomMightContainAny(
        GraftInternals.expression(col("bloom")),
        GraftInternals.expression(valueArr))))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Point-lookup read: scan ONLY the candidate files, then apply the
    * exact IN filter (the bloom is a pruning hint, never the answer). */
  def readWithSkip(
      spark: SparkSession,
      url: String,
      column: String,
      values: Seq[Any]): DataFrame = {
    val files = candidateFiles(spark, url, column, values)
    val base = spark.read.parquet(url)
    if (files.isEmpty) base.filter(lit(false))
    else spark.read.schema(base.schema).parquet(files: _*)
      .filter(col(column).isin(values: _*))
  }
}

/** Commutative Bloom OR-merge aggregate over one key column (per-group =
  * per-file here). Buffer = `org.apache.spark.util.sketch.BloomFilter`
  * (public Spark API); nulls are skipped (a bloom answers "might this
  * non-null key be present"). */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects BIGINT/INT/STRING, got ${other.sql}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buffer.putLong(l)
      case i: Int => buffer.putLong(i.toLong)
      case s: UTF8String => buffer.putBinary(s.getBytes)
      case other => throw new IllegalStateException(
        s"bloom_agg: unexpected value type ${other.getClass}")
    }
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = {
    val bos = new java.io.ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
  override def prettyName: String = "bloom_agg"
}

/** `bloom_might_contain_any(bloom, array<values>)` — true iff the bloom
  * MIGHT contain any element. Evaluated over the sidecar (one row per
  * file), so the per-row deserialize is O(#files), never O(#rows) —
  * which is also why CodegenFallback costs nothing here: the expression
  * never sits in a corpus-scan hot path. */
case class BloomMightContainAny(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType | IntegerType | StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_any expects (BINARY, ARRAY<key>), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(bloomBytes: Any, values: Any): Any = {
    val bf = BloomFilter.readFrom(
      new ByteArrayInputStream(bloomBytes.asInstanceOf[Array[Byte]]))
    val arr = values.asInstanceOf[ArrayData]
    val et = right.dataType.asInstanceOf[ArrayType].elementType
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val hit = et match {
          case LongType => bf.mightContainLong(arr.getLong(i))
          case IntegerType => bf.mightContainLong(arr.getInt(i).toLong)
          case StringType => bf.mightContainBinary(arr.getUTF8String(i).getBytes)
          case other => throw new IllegalStateException(s"unexpected $other")
        }
        if (hit) return true
      }
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainAny =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bloom_might_contain_any"
}
