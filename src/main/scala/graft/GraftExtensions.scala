package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration of graft's custom Catalyst expressions, via the
  * standard extension point: pass
  * `spark.sql.extensions=graft.GraftExtensions` at session build (or
  * `.withExtensions(new GraftExtensions)`), after which plain SQL text can
  * call the functions — no Scala import needed. [[GraftExtensions.register]]
  * does the same for an already-running session.
  *
  * The expressions stay fully codegen'd (doGenCode), so SQL-text callers get
  * the same fused kernels as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // whole-operator plan nodes (the (c)-tier extension path)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsofJoinPushdown)
  }
}

object GraftExtensions {

  private def twoArg(name: String, className: String,
      make: (Expression, Expression) => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(className, name),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$name expects exactly two arguments")
        make(children(0), children(1))
      })

  /** (identifier, info, builder) triples — the shape both
    * `SparkSessionExtensions.injectFunction` and `FunctionRegistry
    * .registerFunction` consume. */
  val functions = Seq(
    twoArg("cosine_sim", "graft.functions.CosineSimilarity",
      graft.functions.CosineSimilarity(_, _)))

  /** Register on a live session (equivalent to having built it with the
    * extensions class). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
