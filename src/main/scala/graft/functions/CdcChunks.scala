package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split text where a rolling hash of the
  * trailing `window` codepoints hits `hash % divisor == 0` — boundaries
  * depend only on LOCAL content, so an insertion or deletion re-aligns
  * within ~window characters instead of shifting every later boundary
  * (the property fixed-window chunking fundamentally lacks, and the
  * reason CDC is the standard for dedup-stable chunking).
  *
  * The hash is an explicit polynomial fold over CODEPOINTS —
  * `h = (h·257 + cp) mod 1e9+7` across the window — chosen over any
  * library hash precisely so an external engine can replay boundaries
  * verbatim (the oracle recomputes each window's fold in SQL; a rolling
  * update and a fresh fold are the same fully-reduced integer, so the
  * kernel may roll in O(1) per position while the replay folds in
  * O(window)). Boundaries are considered at end-positions
  * `window-1 .. n-2` (0-based): never at the last char, so no empty
  * trailing chunk; text shorter than the window (or empty) is one
  * chunk. */
case class CdcChunksExpr(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  require(window >= 2 && window <= 1024, s"window in [2, 1024], got $window")
  require(divisor >= 2, s"divisor >= 2, got $divisor")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CdcImpl.chunks(input.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CdcImpl.chunks($c, $window, $divisor);
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunks"
}

object CdcChunksExpr {
  def apply(text: Column, window: Int, divisor: Int): Column =
    GraftInternals.column(
      CdcChunksExpr(GraftInternals.expression(text), window, divisor))
}

object CdcImpl {

  private val P = 1000000007L
  private val B = 257L

  /** O(n) rolling evaluation; each position's value equals the direct
    * O(window) fold of its window mod P, which is what the oracle
    * recomputes. */
  def chunks(text: UTF8String, window: Int, divisor: Int): GenericArrayData = {
    val s = text.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n <= window) return new GenericArrayData(Array[Any](text))
    // B^(window-1) mod P, for the rolling drop of the outgoing codepoint
    var bw = 1L
    var i = 0
    while (i < window - 1) { bw = bw * B % P; i += 1 }
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    i = 0
    while (i < n - 1) { // never a boundary at the last char
      h =
        if (i < window) (h * B + cps(i)) % P
        else ((h - cps(i - window) * bw % P + P) % P * B + cps(i)) % P
      if (i >= window - 1 && h % divisor == 0) bounds += i
      i += 1
    }
    // codepoint index -> string offset only matters for non-BMP text;
    // build chunks by walking codepoints so offsets stay aligned
    val starts = 0 +: bounds.map(_ + 1)
    val ends = bounds.map(_ + 1) :+ n
    val out = new Array[Any](starts.length)
    var k = 0
    while (k < starts.length) {
      val sb = new java.lang.StringBuilder
      var j = starts(k)
      while (j < ends(k)) { sb.appendCodePoint(cps(j)); j += 1 }
      out(k) = UTF8String.fromString(sb.toString)
      k += 1
    }
    new GenericArrayData(out)
  }
}
