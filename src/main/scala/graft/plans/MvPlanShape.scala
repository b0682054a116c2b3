package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The MV plan-shape matcher, shared by [[MvAggregateRewrite]] (serving)
  * and [[MvAdvisor]] (workload analysis) — one matcher, so the advisor
  * recommends exactly the shapes the rule can later serve.
  *
  * [[strip]] peels Project/Filter/Window/Join links down to the parquet
  * relations, accumulating filter conditions, windows, inner-equi-join
  * pairs, and RENAMES — Projects whose items are attributes or aliases
  * of deterministic expressions peel with `output exprId → definition`
  * recorded, so user renames (`SELECT dim AS d`) and the optimizer's
  * pulled-out grouping expressions (`month(col) AS _groupingexpression`)
  * both resolve back to base-side expressions through [[substFn]]. Inner
  * joins whose condition is a conjunction of attribute equalities peel
  * with the pairs recorded (for inner joins, a filter below the join ≡
  * the same filter above it, so conds accumulate uniformly). False on
  * any other node. (`WindowGroupLimit` is the optimizer's rank-limit
  * pushdown under a `rn = 1` filter — semantics live in the filter, so
  * it peels silently.)
  */
object MvPlanShape {

  private[plans] def strip(
      p: LogicalPlan,
      conds: mutable.Buffer[(Expression, Int)],
      windows: mutable.Buffer[Window],
      renames: mutable.Map[ExprId, Expression],
      rels: mutable.Buffer[LogicalRelation],
      pairs: mutable.Buffer[(Attribute, Attribute)]): Boolean = p match {
    case Project(pl, c) if pl.forall {
      case _: AttributeReference => true
      case Alias(e, _) => e.deterministic
      case _ => false
    } =>
      pl.foreach {
        case a @ Alias(e, _) => renames(a.exprId) = e
        case _ => ()
      }
      strip(c, conds, windows, renames, rels, pairs)
    case Filter(cond, c) =>
      // Filters tag the number of windows already seen ABOVE them: a
      // filter BELOW a window is not interchangeable with one above it
      // (the window computes over the filtered subset), and consumers
      // must be able to tell them apart.
      conds += ((cond, windows.size))
      strip(c, conds, windows, renames, rels, pairs)
    case w: Window =>
      windows += w; strip(w.child, conds, windows, renames, rels, pairs)
    case wgl: WindowGroupLimit =>
      strip(wgl.child, conds, windows, renames, rels, pairs)
    case Join(l, r, Inner, Some(cond), _) =>
      val eqs = splitConjunction(cond).map {
        case EqualTo(a: Attribute, b: Attribute) => Some((a, b))
        case _ => None
      }
      eqs.forall(_.isDefined) && {
        pairs ++= eqs.flatten
        strip(l, conds, windows, renames, rels, pairs) &&
          strip(r, conds, windows, renames, rels, pairs)
      }
    case lr: LogicalRelation => rels += lr; true
    case _ => false
  }

  private[plans] def splitConjunction(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunction(l) ++ splitConjunction(r)
    case other => Seq(other)
  }

  /** The alias-inlining substitution over a recorded rename map (chains
    * terminate — a definition can only reference attributes from below
    * its project).
    */
  private[plans] def substFn(
      renames: collection.Map[ExprId, Expression]): Expression => Expression = {
    def subst(e: Expression): Expression = e.transformUp {
      case a: Attribute if renames.contains(a.exprId) => subst(renames(a.exprId))
    }
    subst
  }
}
