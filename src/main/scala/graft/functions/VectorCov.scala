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

/** Second-moment aggregation over a vector column as ONE native Catalyst
  * aggregate: `(n, Σx, upper-triangle of Σ x xᵀ)` — everything a PCA /
  * covariance fit needs, without a dim²-per-row posexplode. Like
  * [[VectorAvgAgg]] the partial buffers ride map-side combine, so the
  * shuffle carries `O(partitions × dim²/2)` doubles instead of any
  * function of the row count — the only shape that survives a 100 TB
  * corpus (the row data never leaves its mapper).
  *
  * `maxDim` bounds the buffer: a fat vector column would silently
  * allocate dim² doubles per group; past the bound we refuse loudly
  * (the repo's convention for quadratic-blowup hazards).
  *
  * Determinism: sums are doubles in iterator order — last-ulp sensitive
  * to partitioning like every float aggregate; downstream consumers
  * (e.g. [[graft.operators.Pca]]) must persist the fitted result and
  * replay from the persisted values rather than re-fit (the fixture
  * contract every approximate/model gate uses).
  */
case class VectorCovAgg(
    child: Expression,
    maxDim: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorCovAgg.State]
  with UnaryLike[Expression] {

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_cov expects ARRAY<FLOAT|DOUBLE|INT|BIGINT> input, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false)),
    StructField("prods", ArrayType(DoubleType, containsNull = false))))
  override def nullable: Boolean = true

  override def createAggregationBuffer(): VectorCovAgg.State =
    new VectorCovAgg.State(null, null, 0L)

  override def update(buffer: VectorCovAgg.State, input: InternalRow): VectorCovAgg.State = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      require(n <= maxDim,
        s"vector_cov: dimension $n exceeds maxDim=$maxDim — the covariance " +
          "buffer is O(dim²); raise maxDim explicitly if this is intended")
      if (buffer.sums == null) {
        buffer.sums = new Array[Double](n)
        buffer.prods = new Array[Double](n * (n + 1) / 2)
      }
      require(buffer.sums.length == n,
        s"vector_cov: dimension mismatch in group — saw ${buffer.sums.length} " +
          s"then $n; mixing dimensionalities corrupts the fit, refusing")
      val et = elemType
      val x = new Array[Double](n)
      var i = 0
      while (i < n) {
        require(!arr.isNullAt(i),
          s"vector_cov: null element at position $i — corrupt vector row")
        x(i) = et match {
          case FloatType => arr.getFloat(i).toDouble
          case DoubleType => arr.getDouble(i)
          case IntegerType => arr.getInt(i).toDouble
          case _ => arr.getLong(i).toDouble
        }
        buffer.sums(i) += x(i)
        i += 1
      }
      var k = 0
      i = 0
      while (i < n) {
        var j = i
        while (j < n) {
          buffer.prods(k) += x(i) * x(j)
          k += 1; j += 1
        }
        i += 1
      }
      buffer.count += 1
    }
    buffer
  }

  override def merge(buffer: VectorCovAgg.State, other: VectorCovAgg.State): VectorCovAgg.State = {
    if (other.sums != null) {
      if (buffer.sums == null) {
        buffer.sums = other.sums.clone()
        buffer.prods = other.prods.clone()
        buffer.count = other.count
      } else {
        require(buffer.sums.length == other.sums.length,
          s"vector_cov: dimension mismatch across partitions — " +
            s"${buffer.sums.length} vs ${other.sums.length}")
        var i = 0
        while (i < buffer.sums.length) { buffer.sums(i) += other.sums(i); i += 1 }
        i = 0
        while (i < buffer.prods.length) { buffer.prods(i) += other.prods(i); i += 1 }
        buffer.count += other.count
      }
    }
    buffer
  }

  override def eval(buffer: VectorCovAgg.State): Any =
    if (buffer.sums == null || buffer.count == 0L) null
    else InternalRow(buffer.count,
      new GenericArrayData(buffer.sums.map(x => x: Any)),
      new GenericArrayData(buffer.prods.map(x => x: Any)))

  override def serialize(buffer: VectorCovAgg.State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buffer.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buffer.sums.length)
      buffer.sums.foreach(out.writeDouble)
      buffer.prods.foreach(out.writeDouble)
      out.writeLong(buffer.count)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorCovAgg.State = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    if (n < 0) new VectorCovAgg.State(null, null, 0L)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = in.readDouble(); i += 1 }
      val prods = new Array[Double](n * (n + 1) / 2)
      i = 0
      while (i < prods.length) { prods(i) = in.readDouble(); i += 1 }
      new VectorCovAgg.State(sums, prods, in.readLong())
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorCovAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorCovAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorCovAgg =
    copy(child = newChild)
  override def prettyName: String = "vector_cov"
}

object VectorCovAgg {
  /** Mutable (Σx, upper-tri Σxxᵀ, n); allocated lazily on the first row. */
  final class State(var sums: Array[Double], var prods: Array[Double], var count: Long)

  /** Column form: `vectorCov(col)` inside `agg(...)` — yields a struct
    * `(n BIGINT, sums ARRAY<DOUBLE>, prods ARRAY<DOUBLE>)` where `prods`
    * is the row-major upper triangle of the second-moment matrix. */
  def vectorCov(c: Column, maxDim: Int = 1024): Column =
    GraftInternals.column(
      VectorCovAgg(GraftInternals.expression(c), maxDim).toAggregateExpression())
}
