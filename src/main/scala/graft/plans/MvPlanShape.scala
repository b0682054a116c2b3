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

  private def lower(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  /** The `_graft_rn` output attribute of `w` IF `w` is exactly the
    * table's latest-per-key resolve window: a single `row_number()` over
    * (merge-key scope) ordered by (precombine, tiebreaks..., commit
    * time) descending nulls-last. Shared by the MV rewrite and the
    * point-lookup rewrite — both must recognize the resolve shape the
    * same way, or a plan one serves the other could misread.
    */
  private[plans] def resolveRnOf(
      w: Window, spec: graft.table.KeyedTableSpec): Option[Attribute] =
    w.windowExpressions match {
      case Seq(a @ Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(ps, os, _)), _)) =>
        val expectedScope = (if (spec.globalKeys) spec.keyCols
          else spec.keyCols ++ spec.partitionCols).map(lower)
        val gotScope = ps.flatMap {
          case at: Attribute => Some(lower(at.name))
          case _ => None
        }
        val expectedOrder =
          (spec.precombineCol +: spec.tiebreakCols)
            .map(c => (lower(c), Descending, NullsLast)) :+
          ((lower(graft.table.KeyedTable.CommitTimeCol), Descending, NullsLast))
        val gotOrder = os.flatMap {
          case SortOrder(at: Attribute, dir, no, _) => Some((lower(at.name), dir, no))
          case _ => None
        }
        if (gotScope.length == ps.length && gotOrder.length == os.length &&
          gotScope == expectedScope && gotOrder == expectedOrder)
          Some(a.toAttribute)
        else None
      case _ => None
    }

  private[plans] def isRnEqOne(cond: Expression, rn: Attribute): Boolean =
    cond match {
      case EqualTo(a: Attribute, Literal(v, _)) => a.exprId == rn.exprId && v == 1
      case EqualTo(Literal(v, _), a: Attribute) => a.exprId == rn.exprId && v == 1
      case _ => false
    }
}
