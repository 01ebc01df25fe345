package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `collect_list` with a hard cap on retained elements — the bounded-state
  * collect that makes per-group attribution skew-safe. A plain
  * `collect_list` builds the FULL value list for every group, so one hot
  * group (a boilerplate span shared by millions of documents) accumulates a
  * multi-million-element aggregation buffer on a single task — the exact
  * straggler/OOM a 100 TB job cannot afford. `capped_collect` keeps at most
  * `cap` elements per group in every partial AND merged buffer, so the
  * worst-case state per group is `cap` elements regardless of group size,
  * and partial aggregation (map-side combine) ships only capped buffers
  * across the shuffle.
  *
  * Contract: for a group with `count <= cap` rows the result is the complete
  * (unordered) value set — this is the case [[graft.operators.Dedup.spanStats]]
  * relies on, where lists are only consumed for groups already known (via an
  * exact side count) to be under the cap. For a group with more rows the
  * result is SOME `cap` of them, partition-order dependent — callers must
  * treat over-cap lists as samples, never as complete sets. Pair with an
  * exact `count` in the same `agg(...)` to distinguish the two cases.
  *
  * Nulls are skipped (as in `collect_list`). Supported element types:
  * int / long / string (id-shaped columns).
  */
case class CappedCollectAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(cap > 0, "capped_collect: cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"capped_collect expects INT, BIGINT or STRING input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(
      buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buffer.size < cap) {
      val v = child.eval(input)
      if (v != null) buffer += (v match {
        // copy: unsafe-row-backed strings share a reused buffer
        case s: UTF8String => s.clone()
        case other => other
      })
    }
    buffer
  }

  override def merge(
      buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    var i = 0
    while (buffer.size < cap && i < other.size) {
      buffer += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: mutable.ArrayBuffer[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    child.dataType match {
      case LongType => buffer.foreach(v => out.writeLong(v.asInstanceOf[Long]))
      case IntegerType => buffer.foreach(v => out.writeInt(v.asInstanceOf[Int]))
      case StringType => buffer.foreach { v =>
        val b = v.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      }
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.ArrayBuffer[Any](n)
    var i = 0
    child.dataType match {
      case LongType => while (i < n) { buf += in.readLong(); i += 1 }
      case IntegerType => while (i < n) { buf += in.readInt(); i += 1 }
      case StringType => while (i < n) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        buf += UTF8String.fromBytes(b)
        i += 1
      }
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectAgg =
    copy(child = newChild)
  override def prettyName: String = "capped_collect"
}

object CappedCollect {

  /** Column form: `cappedCollect(col, cap)` aggregates to at most `cap`
    * values as `array<childType>`. Use inside `agg(...)`; pair with an
    * exact `count` to know whether the list is complete. */
  def cappedCollect(c: Column, cap: Int): Column =
    GraftInternals.column(
      CappedCollectAgg(GraftInternals.expression(c), cap)
        .toAggregateExpression())
}
