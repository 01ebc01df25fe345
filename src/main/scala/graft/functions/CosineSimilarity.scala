package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftInternals
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Codegen'd cosine similarity over two numeric arrays (float or double
  * elements) — the hot kernel of ANN search and embedding dedup.
  *
  * Versus the composable `zip_with + aggregate` formulation this fuses three
  * array traversals into one loop with zero intermediate ArrayData
  * allocations, and stays inside whole-stage codegen. The accumulation is a
  * sequential left-fold in double, bit-identical to the higher-order-function
  * version (verified by property test), so swapping implementations cannot
  * change query results.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t =>
          t == FloatType || t == DoubleType || t == IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double|int> inputs, got $other")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
      case FloatType => arr.getFloat(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case _ => arr.getDouble(i)
    }
    val lt = elemType(left)
    val rt = elemType(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = get(x, lt, i)
      val yi = get(y, rt, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType): String = t match {
      case FloatType => "getFloat"
      case IntegerType => "getInt"
      case _ => "getDouble"
    }
    val lGet = getter(elemType(left))
    val rGet = getter(elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double xi = (double) $a.$lGet($i);
          double yi = (double) $b.$rGet($i);
          $dot += xi * yi; $na += xi * xi; $nb += yi * yi;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column form. */
  def apply(a: Column, b: Column): Column =
    GraftInternals.column(CosineSimilarity(
      GraftInternals.expression(a), GraftInternals.expression(b)))

  /** Register `cosine_sim` for SQL users on this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
}
