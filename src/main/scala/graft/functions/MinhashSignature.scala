package graft.functions

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature: all `numHashes` minima of the affine family
  * h_j(x) = (a_j·x + b_j) mod p over one pass of the input hash array.
  *
  * The composable form — `array(array_min(transform(hashes, …)) × 64)` —
  * re-traverses the input once per hash function and allocates an
  * intermediate ArrayData per traversal; measured at sf0.1 it is the single
  * most expensive stage of the LSH dedup pipeline (~2 s of a ~2.8 s query).
  * This expression fuses the 64 traversals into one tight generated loop
  * with a single primitive long[] accumulator and no intermediates, and
  * stays inside whole-stage codegen. Arithmetic is IDENTICAL to the HOF
  * form ((a·x+b) mod p with the same seeded (a,b) family — see
  * [[graft.operators.Dedup.hashFamily]]), so signatures are bit-equal
  * (property-tested) and persisted pair lists stay comparable.
  *
  * Null semantics mirror the HOF form: null input array → null; null
  * elements are ignored; an empty (or all-null) array yields an array of
  * `numHashes` nulls (what `array_min` returns on empty input).
  */
case class MinhashSignatureExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  private val P = (1L << 31) - 1 // Mersenne prime 2^31-1, matches Dedup

  // same draw order as Dedup.hashFamily: a then b per hash function
  private lazy val (famA, famB): (Array[Long], Array[Long]) = {
    val rnd = new Random(seed)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      a(j) = (rnd.nextLong() & Long.MaxValue) % (P - 1) + 1
      b(j) = (rnd.nextLong() & Long.MaxValue) % P
      j += 1
    }
    (a, b)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val x = arr.getLong(i)
        var j = 0
        while (j < numHashes) {
          var v = (x * famA(j) + famB(j)) % P
          if (v < 0) v += P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (any) new GenericArrayData(mins)
    else new GenericArrayData(new Array[Any](numHashes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", famA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", famB, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      s"""
        int $n = $arr.numElements();
        long[] $mins = new long[$numHashes];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        boolean $any = false;
        for (int $i = 0; $i < $n; $i++) {
          if (!$arr.isNullAt($i)) {
            $any = true;
            long $x = $arr.getLong($i);
            for (int $j = 0; $j < $numHashes; $j++) {
              long $v = ($x * $aRef[$j] + $bRef[$j]) % ${P}L;
              if ($v < 0) $v += ${P}L;
              if ($v < $mins[$j]) $mins[$j] = $v;
            }
          }
        }
        ${ev.value} = $any
          ? new org.apache.spark.sql.catalyst.util.GenericArrayData($mins)
          : new org.apache.spark.sql.catalyst.util.GenericArrayData(
              new Object[$numHashes]);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSignatureExpr {
  /** Column form: array<long> signature of a 31-bit-domain hash array. */
  def apply(hashes: Column, numHashes: Int, seed: Long): Column =
    GraftInternals.column(MinhashSignatureExpr(
      GraftInternals.expression(hashes), numHashes, seed))
}
