package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst aggregate — the
  * (b)-tier extension path for AGGREGATION: a `TypedImperativeAggregate`
  * participates in partial aggregation, so every map task condenses its rows
  * into one bounded `capacity`-counter summary and only those summaries
  * cross the shuffle. Frequent-token / frequent-value analysis over 100 TB
  * therefore moves O(groups × capacity) bytes, not O(rows) — the same
  * map-side-combine shape as `count`, with a sketch instead of a scalar.
  *
  * Guarantee (classic Misra–Gries): every retained item's estimate
  * undercounts its true frequency by at most N/(capacity+1), where N is the
  * items observed by that summary, and any item with true count >
  * N/(capacity+1) is guaranteed retained. Merging two summaries adds their
  * counters and, when over capacity, subtracts the (capacity+1)-th largest
  * count from all (Agarwal et al., "Mergeable Summaries", PODS'12) — the
  * error bound stays additive in the merged N, so the result is
  * partitioning-invariant in its guarantee (not bit-identical, as with any
  * mergeable sketch; with `capacity` >= distinct items it IS exact and
  * partitioning-invariant, which is what the oracle gate pins).
  *
  * Input: a string column (one item per row) or an array-of-strings column
  * (token lists — each element counts, null elements skipped, so callers
  * aggregate tokenized text WITHOUT an explode).
  *
  * Result: the `topK` items as `array<struct<item,count>>`, ordered by
  * (count desc, item asc) — deterministic under ties.
  */
case class MisraGriesAgg(
    child: Expression,
    topK: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(topK > 0, "heavy_hitters: topK must be positive")
  require(capacity >= topK,
    s"heavy_hitters: capacity ($capacity) must be >= topK ($topK)")

  private def isArrayInput: Boolean = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters expects STRING or ARRAY<STRING> input, got ${other.sql}")
  }

  override def dataType: DataType = MisraGriesAgg.resultType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(m: mutable.HashMap[String, Long], item: String): Unit =
    m.get(item) match {
      case Some(c) => m.update(item, c + 1)
      case None if m.size < capacity => m.update(item, 1L)
      case None =>
        // decrement-all: the O(capacity) step that buys the N/(capacity+1)
        // bound; amortized O(1) per input because each decrement pass
        // consumes `capacity` prior increments
        m.mapValuesInPlace((_, v) => v - 1)
        m.filterInPlace((_, v) => v > 0)
    }

  override def update(
      buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      if (isArrayInput) {
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (!arr.isNullAt(i)) add(buffer, arr.getUTF8String(i).toString)
          i += 1
        }
      } else add(buffer, v.asInstanceOf[UTF8String].toString)
    }
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, v) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + v)
    }
    if (buffer.size > capacity) {
      // subtract the (capacity+1)-th largest count from every counter: at
      // most `capacity` items stay strictly positive, and the subtraction
      // adds at most that count to each survivor's undercount — the
      // mergeable-summaries bound
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val t = counts(counts.length - (capacity + 1))
      buffer.mapValuesInPlace((_, v) => v - t)
      buffer.filterInPlace((_, v) => v > 0)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val top = buffer.toArray
      .sortBy { case (k, v) => (-v, k) }
      .take(topK)
      .map { case (k, v) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(k), v))
      }
    new GenericArrayData(top.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, v) =>
      val b = k.getBytes("UTF-8") // not writeUTF: items may exceed 64 KiB
      out.writeInt(b.length); out.write(b); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
  override def prettyName: String = "heavy_hitters"
}

object MisraGriesAgg {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
}

object HeavyHitters {

  /** Column form: `heavyHitters(col, k, capacity)` aggregates to the top-k
    * `array<struct<item,count>>`. Use inside `agg(...)` like any aggregate. */
  def heavyHitters(c: Column, topK: Int, capacity: Int = 4096): Column =
    GraftInternals.column(
      MisraGriesAgg(GraftInternals.expression(c), topK, capacity)
        .toAggregateExpression())
}
