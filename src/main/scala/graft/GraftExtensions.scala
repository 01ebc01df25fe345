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

  /** Builder for kernels parameterized by literal ints after the column:
    * `name(col, n)` / `name(col, n, seed)`. */
  private def colIntArgs(name: String, className: String,
      make: (Expression, Seq[Long]) => Expression,
      minInts: Int, maxInts: Int) =
    (FunctionIdentifier(name),
      new ExpressionInfo(className, name),
      (children: Seq[Expression]) => {
        // kept as Long: a BIGINT literal (e.g. a 64-bit seed) must not be
        // silently truncated; int-valued positions range-check at use
        val ints = children.drop(1).map {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case other => throw new IllegalArgumentException(
            s"$name expects literal integer parameters, got $other")
        }
        require(ints.length >= minInts && ints.length <= maxInts,
          s"$name expects a column plus $minInts-$maxInts literal ints")
        make(children.head, ints)
      })

  private def intExact(name: String, param: String)(v: Long): Int = {
    require(v >= Int.MinValue && v <= Int.MaxValue,
      s"$name: $param must fit in a 32-bit int, got $v")
    v.toInt
  }

  /** (identifier, info, builder) triples — the shape both
    * `SparkSessionExtensions.injectFunction` and `FunctionRegistry
    * .registerFunction` consume. The scalar kernels stay fully codegen'd;
    * `heavy_hitters` is a TypedImperativeAggregate (object-hash aggregation
    * with partial merge — the right execution mode for sketch state). */
  private def oneArg(name: String, className: String,
      make: Expression => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(className, name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name expects exactly one argument")
        make(children.head)
      })

  val functions = Seq(
    oneArg("unicode_fold", "graft.functions.UnicodeFoldExpr",
      graft.functions.UnicodeFoldExpr(_)),
    twoArg("cosine_sim", "graft.functions.CosineSimilarity",
      graft.functions.CosineSimilarity(_, _)),
    colIntArgs("shingle_hash_set", "graft.functions.ShingleHashSetExpr",
      (c, is) => graft.functions.ShingleHashSetExpr(c,
        intExact("shingle_hash_set", "n")(is.head)), 1, 1),
    colIntArgs("simhash64", "graft.functions.SimHash64Expr",
      (c, is) => graft.functions.SimHash64Expr(c,
        intExact("simhash64", "n")(is.head)), 1, 1),
    colIntArgs("word_spans", "graft.functions.WordSpansExpr",
      (c, is) => graft.functions.WordSpansExpr(c,
        intExact("word_spans", "n")(is.head)), 1, 1),
    colIntArgs("word_shingles", "graft.functions.WordShinglesExpr",
      (c, is) => graft.functions.WordShinglesExpr(c,
        intExact("word_shingles", "n")(is.head)), 1, 1),
    oneArg("words", "graft.functions.WordsExpr",
      graft.functions.WordsExpr(_)),
    oneArg("max_token_freq", "graft.functions.MaxTokenFreqExpr",
      graft.functions.MaxTokenFreqExpr(_)),
    colIntArgs("char_ngrams", "graft.functions.CharNgramsExpr",
      (c, is) => graft.functions.CharNgramsExpr(c,
        intExact("char_ngrams", "maxN")(is.head)), 1, 1),
    colIntArgs("minhash_sig", "graft.functions.MinhashSignatureExpr",
      (c, is) => graft.functions.MinhashSignatureExpr(c,
        intExact("minhash_sig", "numHashes")(is.head),
        if (is.length > 1) is(1) else 42L), 1, 2),
    // aggregate: the analyzer wraps a bare AggregateFunction in its
    // AggregateExpression, so the builder returns the function itself
    colIntArgs("heavy_hitters", "graft.functions.MisraGriesAgg",
      (c, is) => graft.functions.MisraGriesAgg(c,
        intExact("heavy_hitters", "topK")(is.head),
        if (is.length > 1) intExact("heavy_hitters", "capacity")(is(1)) else 4096), 1, 2),
    oneArg("vector_avg", "graft.functions.VectorAvgAgg",
      graft.functions.VectorAvgAgg(_)),
    // aggregate with a fractional parameter: kll_quantile(col, k, q)
    (FunctionIdentifier("kll_quantile"),
      new ExpressionInfo("graft.functions.KllQuantilesAgg", "kll_quantile"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "kll_quantile expects (column, k literal int, q literal double)")
        import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
        val k = children(1) match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) => intExact("kll_quantile", "k")(v)
          case other => throw new IllegalArgumentException(
            s"kll_quantile expects a literal integer k, got $other")
        }
        val q = children(2) match {
          case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case Literal(v: Double, _) => v
          case Literal(v: Int, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"kll_quantile expects a literal numeric q, got $other")
        }
        graft.functions.KllQuantilesAgg(
          Cast(children.head, org.apache.spark.sql.types.DoubleType), k, Seq(q))
      }))

  /** Register on a live session (equivalent to having built it with the
    * extensions class). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
