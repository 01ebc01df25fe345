package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused words → DISTINCT shingle-hash set (31-bit domain) in one pass.
  *
  * The composable formulation — build each n-gram as a space-joined STRING
  * (`transform(sequence…, concat_ws(slice…))`), xxhash64 it, pmod it,
  * `array_distinct` it — allocates ~len strings and three intermediate
  * arrays per row; at sf0.1 that is ~1.5M string allocations per consumer
  * of the minhash pipeline. This expression hashes each word's bytes once
  * (XXH64) and chains the n window hashes with XXH64.hashLong — O(len·n)
  * long mixes, zero string building — then sorts in place to emit the
  * distinct set. Dedup semantics are unchanged (the LSH pipeline operates
  * on OPAQUE shingle hashes — only equality of hash sets matters, and
  * identical word windows still produce identical hashes); the hash VALUES
  * differ from the string formulation, so persisted signatures/pair lists
  * from releases before this kernel must be regenerated, like the
  * [[graft.operators.Dedup]] abs-fix note.
  *
  * Mirrors [[TextFunctions.shingles]] window semantics: documents shorter
  * than n collapse to ONE whole-document hash; an empty words array yields
  * the hash of the empty window (matching the `[""]`-shingle the string
  * form produces). Null words hash as empty strings (concat_ws-skip
  * analog; the tokenizer never emits nulls).
  */
case class ShingleHashSetExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_set expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashSetImpl.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashSetImpl.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashSetExpr {
  def apply(words: Column, n: Int): Column =
    GraftInternals.column(ShingleHashSetExpr(
      GraftInternals.expression(words), n))
}

/** Fused 64-bit SimHash of a words array (same window-hash kernel as
  * [[ShingleHashSetExpr]], every occurrence voting): replaces a four-pass
  * HOF pipeline (per-shingle 64-int bit arrays + zip_with aggregate) with
  * one loop and a single 64-int accumulator. */
case class SimHash64Expr(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashSetImpl.simhash(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashSetImpl.simhash($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expr {
  def apply(words: Column, n: Int): Column =
    GraftInternals.column(SimHash64Expr(GraftInternals.expression(words), n))
}

/** Static kernel — called from both the interpreted eval and the generated
  * code (a single static call keeps the loop in one JIT-compiled method). */
object ShingleHashSetImpl {
  private val P = (1L << 31) - 1
  private val Seed = 42L

  /** Raw 64-bit window hashes, one per shingle position, NOT deduplicated —
    * shared by the distinct-set path (which reduces to the 31-bit domain
    * and dedups) and the SimHash path (which needs every occurrence's full
    * 64 bits for the bit votes). */
  private[functions] def windowHashes(words: ArrayData, n: Int): Array[Long] = {
    val len = words.numElements()
    // per-word hash of the UTF8 bytes, computed once
    val wh = new Array[Long](len)
    var i = 0
    while (i < len) {
      if (words.isNullAt(i)) wh(i) = XXH64.hashLong(0L, Seed)
      else {
        val s = words.getUTF8String(i)
        wh(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
      }
      i += 1
    }
    val count = if (len < n) 1 else len - n + 1
    val win = if (len < n) len else n
    val out = new Array[Long](count)
    var p = 0
    while (p < count) {
      var h = Seed
      var j = 0
      while (j < win) { h = XXH64.hashLong(wh(p + j), h); j += 1 }
      out(p) = h
      p += 1
    }
    out
  }

  def compute(words: ArrayData, n: Int): ArrayData = {
    val raw = windowHashes(words, n)
    val count = raw.length
    val out = new Array[Long](count)
    var p = 0
    while (p < count) {
      val v = raw(p) % P
      out(p) = if (v < 0) v + P else v
      p += 1
    }
    // distinct via in-place sort (shingle order is irrelevant downstream:
    // signatures take minima, jaccard takes set ops)
    java.util.Arrays.sort(out)
    var u = 0
    var q = 0
    while (q < count) {
      if (q == 0 || out(q) != out(q - 1)) { out(u) = out(q); u += 1 }
      q += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, u))
  }

  /** 64-bit SimHash over the (non-distinct) window hashes: per-bit ±1
    * votes, sign fold. One pass, one 64-int local accumulator. */
  def simhash(words: ArrayData, n: Int): Long = {
    val raw = windowHashes(words, n)
    val votes = new Array[Int](64)
    var p = 0
    while (p < raw.length) {
      val h = raw(p)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      p += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }
}
