package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer support for [[AsofJoinNode]] — the rule leg of the extension
  * stack (`injectOptimizerRule` in [[graft.GraftExtensions]],
  * `experimental.extraOptimizations` on live sessions). Catalyst's own
  * PushDownPredicates / join elimination cannot see a custom node, so
  * without this rule every filter above an as-of join stalls there and the
  * scans read everything.
  *
  * Four moves, all left-outer-safe:
  *  - conjuncts referencing ONLY left attributes push into the left child
  *    (each output row corresponds to exactly one left row, so filtering
  *    before ≡ filtering after on left columns);
  *  - conjuncts over the left KEY alone are ALSO transposed onto the right
  *    key and pushed right (key pruning): any predicate p is safe to mirror
  *    because a right row failing p(rk) could only match a left row with
  *    lk = rk, which fails p(lk) and is gone — and right-side filtering
  *    never turns a matched left row into an unmatched one for rows that
  *    survive;
  *  - UPPER bounds on the left TIME mirror onto the right time (backward
  *    as-of: a match needs rightTime <= leftTime, so a right row with
  *    rightTime > C can only match left rows with leftTime > C — all dead
  *    under `leftTime <= C`). For time-partitioned right tables this is the
  *    difference between scanning a window and scanning all of history.
  *    Lower bounds do NOT mirror (a backward as-of may reach arbitrarily
  *    far into the right side's past);
  *  - a Project consuming ONLY left attributes ELIMINATES the node entirely
  *    (left-row-preserving join elimination — the same property Catalyst
  *    exploits for unreferenced outer joins): the node emits exactly one
  *    row per left row in left order, so if no right column survives, the
  *    right side need not be scanned at all. ColumnPruning inserts the
  *    empty Project under a bare `count(*)`, so aggregates that ignore the
  *    payload pay only the left scan.
  *
  * After this rule fires, the standard batch keeps pushing the now-lower
  * filters into the scans (parquet PushedFilters / partition pruning).
  */
object AsofJoinPushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** Upper bounds implied on the right time by a conjunct over the left
    * time. `lt = C` implies `rt <= C`; strictness is preserved for `<`. */
  private def mirrorTimeBound(
      c: Expression, lt: Attribute, rt: Attribute): Option[Expression] = c match {
    case LessThan(a: Attribute, v) if a.semanticEquals(lt) && v.foldable =>
      Some(LessThan(rt, v))
    case LessThanOrEqual(a: Attribute, v) if a.semanticEquals(lt) && v.foldable =>
      Some(LessThanOrEqual(rt, v))
    case EqualTo(a: Attribute, v) if a.semanticEquals(lt) && v.foldable =>
      Some(LessThanOrEqual(rt, v))
    case GreaterThan(v, a: Attribute) if a.semanticEquals(lt) && v.foldable =>
      Some(LessThan(rt, v))
    case GreaterThanOrEqual(v, a: Attribute) if a.semanticEquals(lt) && v.foldable =>
      Some(LessThanOrEqual(rt, v))
    case EqualTo(v, a: Attribute) if a.semanticEquals(lt) && v.foldable =>
      Some(LessThanOrEqual(rt, v))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // left-row-preserving elimination: nothing above needs a right column
    case p @ Project(_, j: AsofJoinNode)
        if p.references.subsetOf(j.left.outputSet) =>
      p.copy(child = j.left)

    case f @ Filter(cond, j: AsofJoinNode) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (leftOnly, rest) = conjuncts.partition(c =>
        c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val keyOnly = (j.leftKey, j.rightKey) match {
          case (lk: Attribute, rk: Attribute) =>
            leftOnly.filter(_.references == AttributeSet(lk :: Nil)).map(_.transform {
              case a: Attribute if a.semanticEquals(lk) => rk
            })
          case _ => Nil
        }
        val timeBounds = (j.leftTime, j.rightTime) match {
          case (lt: Attribute, rt: Attribute) =>
            leftOnly.flatMap(mirrorTimeBound(_, lt, rt))
          case _ => Nil
        }
        val newLeft = Filter(leftOnly.reduce(And), j.left)
        val newRight = (keyOnly ++ timeBounds).reduceOption(And)
          .map(Filter(_, j.right)).getOrElse(j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
