package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL-style mergeable quantile sketch (Karnin, Lang, Liberty, "Optimal
  * Quantile Approximation in Streams", FOCS'16) as a native Catalyst
  * aggregate — the same partial-aggregation shape as
  * [[MisraGriesAgg]]: every map task folds its rows into one bounded
  * multi-level compactor summary, only summaries cross the shuffle, and
  * summaries merge associatively. Quantiles over 100 TB therefore move
  * O(groups × k·log(n/k)) bytes, not O(rows) — versus an exact
  * `percentile` whose state is ALL values per group.
  *
  * Structure: geometrically-capacitied compactor levels (level `i` holds
  * items of weight `2^i`; capacity `max(2, ceil(k·(2/3)^(H-1-i)))`, top
  * level `k`). A full level sorts and promotes every second item to the
  * level above, discarding the rest — rank error per compaction is at most
  * the item weight, summing to the KLL bound. This implementation uses a
  * DETERMINISTIC alternating offset per level instead of the paper's
  * random coin: Spark re-executes tasks on failure and speculative retry,
  * and a nondeterministic aggregate can return different results for the
  * same query — determinism is worth the (worst-case, still
  * O(k·log²(n/k))-bounded) loss of the randomized guarantee. Like every
  * mergeable sketch, results in the COMPACTING regime depend on the merge
  * tree, so they are partitioning-stable in their error bound, not
  * bit-identical; with `k >= n` no compaction ever fires, the sketch holds
  * every value, and the result is EXACT and partitioning-invariant — the
  * regime the oracle gate pins.
  *
  * `eval` answers the continuous (interpolated) quantile over the weighted
  * value multiset — at position `t = q·(n-1)` over the sorted expansion,
  * linear interpolation between the covering values — which in the exact
  * regime is precisely the standard `quantile_cont` / `percentile_cont`
  * definition. Nulls and NaNs are skipped; an empty group yields null.
  *
  * With one requested quantile the result is a bare DOUBLE (the SQL form
  * `kll_quantile(col, k, q)`); with several it is `array<double>` in
  * request order.
  */
case class KllQuantilesAgg(
    child: Expression,
    k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState]
  with UnaryLike[Expression] {

  require(k >= 8, s"kll_quantile: k must be >= 8, got $k")
  require(qs.nonEmpty, "kll_quantile: at least one quantile is required")
  require(qs.forall(q => q >= 0.0 && q <= 1.0),
    s"kll_quantile: quantiles must be in [0, 1], got $qs")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantile expects DOUBLE input (cast numerics), got ${other.sql}")
  }

  override def dataType: DataType =
    if (qs.length == 1) DoubleType
    else ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buffer: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buffer.update(d)
    }
    buffer
  }

  override def merge(buffer: KllState, other: KllState): KllState = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllState): Any = {
    if (buffer.n == 0) return null
    val out = buffer.quantiles(qs.toArray)
    if (qs.length == 1) out(0)
    else new GenericArrayData(out.map(Double.box(_): Any))
  }

  override def serialize(buffer: KllState): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KllState = KllState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_quantile"
}

/** Mutable compactor-levels state. Level i holds weight-2^i items,
  * unsorted until compaction/eval. `coins` carries one deterministic
  * alternation bit per level. */
final class KllState(val k: Int) {
  var n: Long = 0L
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  var coins: Long = 0L

  private def capacity(i: Int): Int = {
    val h = levels.length
    math.max(2, math.ceil(k * math.pow(2.0 / 3.0, (h - 1 - i).toDouble)).toInt)
  }

  def update(v: Double): Unit = {
    levels(0) += v
    n += 1
    compactPending()
  }

  def merge(other: KllState): Unit = {
    n += other.n
    var i = 0
    while (i < other.levels.length) {
      if (i >= levels.length) levels += ArrayBuffer.empty[Double]
      levels(i) ++= other.levels(i)
      i += 1
    }
    compactPending()
  }

  private def compactPending(): Unit = {
    var i = 0
    while (i < levels.length) {
      if (levels(i).length > capacity(i)) { compact(i); i = math.max(0, i - 1) }
      else i += 1
    }
  }

  /** Sort level i, promote every second item (deterministic alternating
    * offset) to level i+1, keep the odd leftover in place. */
  private def compact(i: Int): Unit = {
    if (i + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
    val lvl = levels(i)
    val arr = lvl.toArray
    java.util.Arrays.sort(arr)
    val even = arr.length - (arr.length % 2)
    val offset = ((coins >> i) & 1L).toInt
    coins ^= (1L << i)
    val up = levels(i + 1)
    var j = offset
    while (j < even) { up += arr(j); j += 2 }
    lvl.clear()
    if (even < arr.length) lvl += arr(arr.length - 1) // odd leftover keeps weight
  }

  /** Continuous (interpolated) quantiles over the weighted multiset. */
  def quantiles(qs: Array[Double]): Array[Double] = {
    var m = 0
    levels.foreach(l => m += l.length)
    val vals = new Array[Double](m)
    val weights = new Array[Long](m)
    var p = 0
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      val l = levels(i)
      var j = 0
      while (j < l.length) { vals(p) = l(j); weights(p) = w; p += 1; j += 1 }
      i += 1
    }
    // indirect sort by value
    val idx = Array.range(0, m).sortBy(vals(_))
    val sv = idx.map(vals(_))
    val sw = idx.map(weights(_))
    val total = sw.sum // == n (compaction preserves total weight)
    qs.map { q =>
      val t = q * (total - 1).toDouble
      val lo = valueAtPosition(sv, sw, math.floor(t).toLong)
      val hi = valueAtPosition(sv, sw, math.ceil(t).toLong)
      val frac = t - math.floor(t)
      lo + frac * (hi - lo)
    }
  }

  /** Value covering 0-based position `pos` of the sorted weighted expansion
    * (item j occupies positions [cum_j, cum_j + w_j)). */
  private def valueAtPosition(sv: Array[Double], sw: Array[Long], pos: Long): Double = {
    var c = 0L
    var j = 0
    while (j < sv.length) {
      c += sw(j)
      if (pos < c) return sv(j)
      j += 1
    }
    sv(sv.length - 1)
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeLong(n)
    out.writeLong(coins)
    out.writeInt(levels.length)
    levels.foreach { l =>
      out.writeInt(l.length)
      l.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }
}

object KllState {
  def deserialize(bytes: Array[Byte]): KllState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val st = new KllState(in.readInt())
    st.n = in.readLong()
    st.coins = in.readLong()
    val h = in.readInt()
    var i = 0
    while (i < h) {
      if (i >= st.levels.length) st.levels += ArrayBuffer.empty[Double]
      val sz = in.readInt()
      val l = st.levels(i)
      l.sizeHint(sz)
      var j = 0
      while (j < sz) { l += in.readDouble(); j += 1 }
      i += 1
    }
    st
  }
}

object KllSketch {

  /** Column form: quantiles (request order) as `array<double>`; numerics
    * are cast to double. Exact (and partitioning-invariant) when
    * `k >= group size`; otherwise KLL-bounded approximate. */
  def kllQuantiles(c: Column, k: Int, qs: Seq[Double]): Column =
    GraftInternals.column(
      KllQuantilesAgg(GraftInternals.expression(c.cast("double")), k, qs)
        .toAggregateExpression())

  /** Single-quantile form (bare DOUBLE) — the SQL surface
    * `kll_quantile(col, k, q)`. */
  def kllQuantile(c: Column, k: Int, q: Double): Column =
    GraftInternals.column(
      KllQuantilesAgg(GraftInternals.expression(c.cast("double")), k, Seq(q))
        .toAggregateExpression())
}
