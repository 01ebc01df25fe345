package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise-mean aggregation over a vector column as a native Catalyst
  * aggregate — the pooling primitive (chunk embeddings → document
  * embedding, cluster members → centroid refresh) done WITHOUT a
  * posexplode: a `TypedImperativeAggregate` rides partial aggregation, so
  * each map task condenses its rows into one (dim doubles + count) buffer
  * and only those cross the shuffle — O(groups × dim) bytes instead of the
  * exploded O(rows × dim) rows a posexplode→groupBy(pos) plan shuffles.
  *
  * Dimension mismatches RAISE (the repo's loud-failure convention for the
  * silently-wrong-cosine class of bugs); null rows and null vectors are
  * skipped; an all-null group evaluates to null. Sums are doubles in
  * iterator order — like every float aggregate the result is
  * last-ulp-sensitive to partitioning, so gates round (the e3 contract).
  */
case class VectorAvgAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAvgAgg.State]
  with UnaryLike[Expression] {

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_avg expects ARRAY<FLOAT|DOUBLE|INT|BIGINT> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): VectorAvgAgg.State =
    new VectorAvgAgg.State(null, 0L)

  override def update(buffer: VectorAvgAgg.State, input: InternalRow): VectorAvgAgg.State = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buffer.sums == null) buffer.sums = new Array[Double](n)
      require(buffer.sums.length == n,
        s"vector_avg: dimension mismatch in group — saw ${buffer.sums.length} " +
          s"then $n; pooling vectors of different dimensionality silently " +
          "corrupts every downstream cosine, refusing")
      val et = elemType
      var i = 0
      while (i < n) {
        // null ELEMENTS are refused rather than treated as zero: a vector
        // with holes is a corrupt row, and zeros would shift the mean
        require(!arr.isNullAt(i),
          s"vector_avg: null element at position $i — corrupt vector row")
        buffer.sums(i) += (et match {
          case FloatType => arr.getFloat(i).toDouble
          case DoubleType => arr.getDouble(i)
          case IntegerType => arr.getInt(i).toDouble
          case _ => arr.getLong(i).toDouble
        })
        i += 1
      }
      buffer.count += 1
    }
    buffer
  }

  override def merge(buffer: VectorAvgAgg.State, other: VectorAvgAgg.State): VectorAvgAgg.State = {
    if (other.sums != null) {
      if (buffer.sums == null) {
        buffer.sums = other.sums.clone()
        buffer.count = other.count
      } else {
        require(buffer.sums.length == other.sums.length,
          s"vector_avg: dimension mismatch across partitions — " +
            s"${buffer.sums.length} vs ${other.sums.length}")
        var i = 0
        while (i < buffer.sums.length) {
          buffer.sums(i) += other.sums(i); i += 1
        }
        buffer.count += other.count
      }
    }
    buffer
  }

  override def eval(buffer: VectorAvgAgg.State): Any =
    if (buffer.sums == null || buffer.count == 0L) null
    else {
      val out = new Array[Any](buffer.sums.length)
      var i = 0
      while (i < buffer.sums.length) {
        out(i) = buffer.sums(i) / buffer.count; i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(buffer: VectorAvgAgg.State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buffer.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buffer.sums.length)
      var i = 0
      while (i < buffer.sums.length) { out.writeDouble(buffer.sums(i)); i += 1 }
      out.writeLong(buffer.count)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorAvgAgg.State = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    if (n < 0) new VectorAvgAgg.State(null, 0L)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = in.readDouble(); i += 1 }
      new VectorAvgAgg.State(sums, in.readLong())
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorAvgAgg =
    copy(child = newChild)
  override def prettyName: String = "vector_avg"
}

object VectorAvgAgg {
  /** Mutable (sums, count); sums is allocated lazily on the first vector so
    * the aggregate needs no up-front dimension parameter. */
  final class State(var sums: Array[Double], var count: Long)

  /** Column form: `vectorAvg(col)` inside `agg(...)`. */
  def vectorAvg(c: Column): Column =
    GraftInternals.column(
      VectorAvgAgg(GraftInternals.expression(c)).toAggregateExpression())
}
