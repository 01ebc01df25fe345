package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown through [[AsofJoinNode]] — the optimizer-rule leg of
  * the extension stack (`injectOptimizerRule` in [[graft.GraftExtensions]],
  * `experimental.extraOptimizations` on live sessions). Catalyst's own
  * PushDownPredicates cannot see a custom node, so without this rule every
  * filter above an as-of join stalls there and the scans read everything.
  *
  * Two moves, both left-outer-safe:
  *  - conjuncts referencing ONLY left attributes push into the left child
  *    (each output row corresponds to exactly one left row, so filtering
  *    before ≡ filtering after on left columns);
  *  - conjuncts over the left KEY alone are ALSO transposed onto the right
  *    key and pushed right (key pruning): any predicate p is safe to mirror
  *    because a right row failing p(rk) could only match a left row with
  *    lk = rk, which fails p(lk) and is gone — and right-side filtering
  *    never turns a matched left row into an unmatched one for rows that
  *    survive. Payload/time predicates stay above (null-extension).
  *
  * After this rule fires, the standard batch keeps pushing the now-lower
  * filters into the scans (parquet PushedFilters / partition pruning).
  */
object AsofJoinPushdown extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
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
        val newLeft = Filter(leftOnly.reduce(And), j.left)
        val newRight = keyOnly.reduceOption(And)
          .map(Filter(_, j.right)).getOrElse(j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
