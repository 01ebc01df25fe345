package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, DoubleType, FloatType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Whole-operator as-of join as a first-class plan node — the (c)-tier
  * extension path: logical node → planner strategy → physical operator,
  * registered through `SparkSessionExtensions` (see
  * [[graft.GraftExtensions]]) or `spark.experimental.extraStrategies`.
  *
  * Semantics: backward inclusive as-of, left-outer — for every left row,
  * the LATEST right row of the same key with rightTime <= leftTime; nulls
  * for unmatched left rows. Right rows sharing (key, time) must be
  * pre-deduplicated for a deterministic result; null keys never match and
  * null times are ignored (both documented limits of the composition-based
  * [[graft.operators.AsofJoin.asofJoin]] too).
  *
  * 100 TB shape: both sides hash-cluster on the join key (the SAME exchange
  * a shuffle join would pay — EnsureRequirements co-partitions them) and
  * sort partition-locally by (key, time); the merge itself is one streaming
  * pass per partition with O(1) state — the right side is never buffered
  * beyond the single current candidate row, so a billion-row right side
  * costs no memory. Versus the union+window composition this skips the
  * union materialization and the window's carry-forward struct, and
  * preserves the left side's (key, time) order for downstream operators
  * (`outputOrdering` is declared, so a following key-window or merge skips
  * its sort).
  *
  * Row-path cost: when keys and times are direct attributes (the common
  * case — and what the public API produces), the merge reads BOUND ORDINALS
  * off the incoming UnsafeRows with primitive comparators (no per-row
  * `UnsafeProjection`, no boxing for int/long/timestamp/date keys and
  * times); the only per-row projection left is the codegen'd result
  * projection every join operator pays. Non-attribute key/time expressions
  * fall back to a per-side interpreted projection path with identical
  * semantics. Memory and cold-start favor the native node (no union, no
  * window frame buffer), and when a side arrives already partitioned by the
  * key its exchange is elided entirely — the composition's union can never
  * reuse a single-side partitioning.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // same co-partitioning contract as SortMergeJoinExec: EnsureRequirements
  // inserts (or reuses) one hash exchange per side and keeps them compatible
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the merge streams left rows through unchanged, so the left ordering
  // survives — downstream per-key windows/merges need no re-sort
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val leftOut = left.output
    val rightOut = right.output
    val lKey = leftKey; val rKey = rightKey
    val lTime = leftTime; val rTime = rightTime
    val outAttrs = output
    val lkIdx = AsofJoinExec.ordinalOf(lKey, leftOut)
    val rkIdx = AsofJoinExec.ordinalOf(rKey, rightOut)
    val ltIdx = AsofJoinExec.ordinalOf(lTime, leftOut)
    val rtIdx = AsofJoinExec.ordinalOf(rTime, rightOut)
    val allBound = lkIdx >= 0 && rkIdx >= 0 && ltIdx >= 0 && rtIdx >= 0
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // per-partition accessor: bound-ordinal primitive reads when the four
      // key/time expressions are direct attributes, projection fallback else
      val access =
        if (allBound)
          AsofJoinExec.boundAccess(lkIdx, rkIdx, ltIdx, rtIdx,
            lKey.dataType, lTime.dataType)
        else
          AsofJoinExec.projectedAccess(lKey, rKey, lTime, rTime, leftOut, rightOut)
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      // bind against NULLABLE right attributes: unmatched left rows carry a
      // null right row, and BoundReference takes its nullability from the
      // input schema — binding against the child's original non-nullable
      // attrs would elide the null checks and read garbage zeros
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        private var curRight: InternalRow = null
        // latest-match right row, held in a REUSED buffer: the first
        // acceptance allocates via copy() (copyFrom requires a byte[]-backed
        // target), every later one recycles the backing array via
        // UnsafeRow.copyFrom — a fresh copy() per accepted row would
        // allocate a byte[] for most of the right side. The candidate's key
        // is read back out of this buffer, so no separate key copy exists.
        private var candBuf: UnsafeRow = null
        private var candidate: InternalRow = null // candBuf once set

        advanceRight()

        private def advanceRight(): Unit =
          curRight = if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lrow = lIter.next()
          val lkNull = access.lKeyNull(lrow)
          var ltNull = true
          if (!lkNull) {
            ltNull = access.lTimeNull(lrow)
            // advance the right cursor to the last key-equal row with
            // time <= left time; O(|right partition|) total across all
            // left rows — the cursor never rewinds
            var continue = curRight != null && !ltNull
            while (continue) {
              // null right keys sort first ascending: treat as cmp < 0
              val cmp =
                if (access.rKeyNull(curRight)) -1
                else access.cmpKey(curRight, lrow)
              if (cmp < 0) {
                advanceRight()
                continue = curRight != null
              } else if (cmp == 0) {
                if (access.rTimeNull(curRight)) {
                  advanceRight() // null-time right rows never match
                  continue = curRight != null
                } else if (access.cmpTime(curRight, lrow) <= 0) {
                  curRight match {
                    case r: UnsafeRow =>
                      if (candBuf == null) candBuf = r.copy()
                      else candBuf.copyFrom(r)
                      candidate = candBuf
                    case _ => // non-unsafe child rows: fall back to a copy
                      candidate = curRight.copy()
                  }
                  advanceRight()
                  continue = curRight != null
                } else continue = false
              } else continue = false
            }
          }
          // the candidate's key is never null (accepted only on cmp == 0
          // against a non-null left key), so cmpKey is safe here
          val matched = !lkNull && !ltNull && candidate != null &&
            access.cmpKey(candidate, lrow) == 0
          if (matched) numMatched += 1
          numOutputRows += 1
          resultProj(joined(lrow, if (matched) candidate else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinExec {

  /** Row access for the merge loop: null probes on each side plus
    * right-vs-left comparators for key and time. Instances are built
    * per-partition (projections are not shareable across threads). */
  private[plans] abstract class MergeAccess {
    def lKeyNull(l: InternalRow): Boolean
    def lTimeNull(l: InternalRow): Boolean
    def rKeyNull(r: InternalRow): Boolean
    def rTimeNull(r: InternalRow): Boolean
    /** right row's key vs left row's key, ascending-order sign */
    def cmpKey(r: InternalRow, l: InternalRow): Int
    /** right row's time vs left row's time, ascending-order sign */
    def cmpTime(r: InternalRow, l: InternalRow): Int
  }

  /** Ordinal of `e` in `out` when it is a direct attribute, -1 otherwise. */
  private[plans] def ordinalOf(e: Expression, out: Seq[Attribute]): Int = e match {
    case a: Attribute => out.indexWhere(_.exprId == a.exprId)
    case _ => -1
  }

  /** Primitive comparator on bound ordinals when the type allows an unboxed
    * read (the int/long/timestamp/date family plus float/double), else an
    * interpreted ordering over direct `get` reads — both skip the per-row
    * UnsafeProjection entirely. Callers null-check before comparing. */
  private def cmpFn(dt: DataType, ri: Int, li: Int): (InternalRow, InternalRow) => Int =
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        (r, l) => java.lang.Long.compare(r.getLong(ri), l.getLong(li))
      case IntegerType | DateType =>
        (r, l) => java.lang.Integer.compare(r.getInt(ri), l.getInt(li))
      case ShortType =>
        (r, l) => java.lang.Short.compare(r.getShort(ri), l.getShort(li))
      case ByteType =>
        (r, l) => java.lang.Byte.compare(r.getByte(ri), l.getByte(li))
      case DoubleType =>
        (r, l) => java.lang.Double.compare(r.getDouble(ri), l.getDouble(li))
      case FloatType =>
        (r, l) => java.lang.Float.compare(r.getFloat(ri), l.getFloat(li))
      case other => // strings (collation-aware), decimals, …
        val ord = TypeUtils.getInterpretedOrdering(other)
        (r, l) => ord.compare(r.get(ri, other), l.get(li, other))
    }

  private[plans] def boundAccess(
      lkIdx: Int, rkIdx: Int, ltIdx: Int, rtIdx: Int,
      keyDt: DataType, timeDt: DataType): MergeAccess = {
    val keyCmp = cmpFn(keyDt, rkIdx, lkIdx)
    val timeCmp = cmpFn(timeDt, rtIdx, ltIdx)
    new MergeAccess {
      override def lKeyNull(l: InternalRow): Boolean = l.isNullAt(lkIdx)
      override def lTimeNull(l: InternalRow): Boolean = l.isNullAt(ltIdx)
      override def rKeyNull(r: InternalRow): Boolean = r.isNullAt(rkIdx)
      override def rTimeNull(r: InternalRow): Boolean = r.isNullAt(rtIdx)
      override def cmpKey(r: InternalRow, l: InternalRow): Int = keyCmp(r, l)
      override def cmpTime(r: InternalRow, l: InternalRow): Int = timeCmp(r, l)
    }
  }

  /** Fallback for computed key/time expressions: per-side single-field
    * projections (codegen'd by `UnsafeProjection.create`) + a natural row
    * ordering — semantically identical to the bound path, paid only when
    * the caller joins on a non-attribute expression. */
  private[plans] def projectedAccess(
      lKey: Expression, rKey: Expression, lTime: Expression, rTime: Expression,
      leftOut: Seq[Attribute], rightOut: Seq[Attribute]): MergeAccess = {
    val lKeyProj = UnsafeProjection.create(Seq(lKey), leftOut)
    val rKeyProj = UnsafeProjection.create(Seq(rKey), rightOut)
    val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
    val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
    val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKey.dataType))
    val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
    // each projection reuses its own output buffer; compares read the two
    // buffers immediately, before either projection runs again
    new MergeAccess {
      override def lKeyNull(l: InternalRow): Boolean = lKeyProj(l).isNullAt(0)
      override def lTimeNull(l: InternalRow): Boolean = lTimeProj(l).isNullAt(0)
      override def rKeyNull(r: InternalRow): Boolean = rKeyProj(r).isNullAt(0)
      override def rTimeNull(r: InternalRow): Boolean = rTimeProj(r).isNullAt(0)
      override def cmpKey(r: InternalRow, l: InternalRow): Int =
        keyOrd.compare(rKeyProj(r), lKeyProj(l))
      override def cmpTime(r: InternalRow, l: InternalRow): Int =
        timeOrd.compare(rTimeProj(r), lTimeProj(l))
    }
  }
}
