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

/** Static kernel — called from both the interpreted eval and the generated
  * code (a single static call keeps the loop in one JIT-compiled method). */
object ShingleHashSetImpl {
  private val P = (1L << 31) - 1
  private val Seed = 42L

  def compute(words: ArrayData, n: Int): ArrayData = {
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
      val v = h % P
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
}
