package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit hash of EVERY sliding `minLen`-word window, computed by a
  * doubling ladder in O(len · log minLen) long-mixes — the position
  * stream for arbitrary-length exact-substring dedup
  * ([[graft.operators.Dedup.dropRepeatedRuns]], the Lee et al. 2022
  * ExactSubstr recipe at word granularity).
  *
  * Why not [[ShingleHashSetImpl.windowHashes]]: that kernel CHAINS the
  * n word hashes per window — O(len · n) mixes, the right trade at the
  * minhash scales (n ≤ ~8) but 50 mixes per position at the
  * ExactSubstr standard's 50-token windows. The ladder builds
  * power-of-two block hashes level by level (`h_k(i) =
  * mix(h_{k-1}(i), h_{k-1}(i + 2^{k-1}))`, each level one in-place
  * ascending pass — the forward dependency reads only indices above
  * the write cursor) and emits the arbitrary-length window as the mix
  * of the two overlapping 2^J blocks that cover it (the sparse-table
  * range trick: `[i, i+2^J)` and `[i+m-2^J, i+m)`). Equal word windows
  * hash equal BY CONSTRUCTION; unequal windows collide at ~2⁻⁶⁴ like
  * every 64-bit content key in this library (a collision cuts a
  * non-duplicate span — never corrupts text mid-word).
  *
  * Contract differences from the shingle kernels, both deliberate:
  * documents shorter than `minLen` emit an EMPTY array (a short doc
  * cannot contain a ≥ minLen run; whole-short-doc duplication is
  * [[graft.operators.Dedup.exact]]'s job, matching
  * [[graft.operators.Dedup.dropRepeatedSpans]]), and hash VALUES are
  * not comparable to the chained-shingle kernels' (opaque keys —
  * only equality within one operator run matters). Null words hash as
  * empty strings (the tokenizer never emits nulls). */
case class RunWindowHashExpr(child: Expression, minLen: Int)
    extends UnaryExpression {

  require(minLen >= 1, "minLen must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"run_window_hashes expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    RunHashImpl.windowHashes(input.asInstanceOf[ArrayData], minLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RunHashImpl.windowHashes($c, $minLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "run_window_hashes"
}

object RunWindowHashExpr {
  def apply(words: Column, minLen: Int): Column =
    GraftInternals.column(RunWindowHashExpr(
      GraftInternals.expression(words), minLen))
}

/** Static kernel — one static call from both interpreted eval and the
  * generated code (the [[ShingleHashSetImpl]] convention). */
object RunHashImpl {
  private val Seed = 1013L

  def windowHashes(words: ArrayData, minLen: Int): ArrayData = {
    val len = words.numElements()
    if (len < minLen) return new GenericArrayData(Array.empty[Long])
    // level 0: per-word hash of the UTF8 bytes, computed once
    val h = new Array[Long](len)
    var i = 0
    while (i < len) {
      if (words.isNullAt(i)) h(i) = XXH64.hashLong(0L, Seed)
      else {
        val s = words.getUTF8String(i)
        h(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, Seed)
      }
      i += 1
    }
    // doubling levels up to the largest 2^J <= minLen; ascending
    // in-place is safe (reads h(i + step) with i + step > write cursor)
    var block = 1
    while (block * 2 <= minLen) {
      val step = block
      block *= 2
      var j = 0
      val last = len - block
      while (j <= last) {
        h(j) = XXH64.hashLong(h(j + step), h(j))
        j += 1
      }
    }
    // arbitrary-length window [p, p+minLen) = mix of the two (possibly
    // overlapping) 2^J blocks at p and p + minLen - 2^J
    val off = minLen - block
    val count = len - minLen + 1
    val out = new Array[Long](count)
    var p = 0
    while (p < count) {
      out(p) = XXH64.hashLong(h(p + off), h(p))
      p += 1
    }
    new GenericArrayData(out)
  }
}
