package graft.plans

import java.util.Locale

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

import graft.table.MaterializedView
import graft.table.MaterializedView.MvDef

/** Rewrites aggregates over a base table onto a registered materialized
  * rollup ([[MaterializedView]]) when every piece is derivable — the
  * query-rewrite half of MV support, as a logical optimizer rule.
  *
  * Matches `Aggregate` whose child is Project/Filter links over a single
  * parquet `LogicalRelation` of a registered base path, with grouping and
  * filter columns ⊆ the MV's dimensions and every aggregate call
  * derivable from stored measures (see [[MaterializedView]]'s safety
  * model: exact-expression matching, re-sum/re-min/re-max/count-as-sum,
  * staleness guard). The rewritten plan keeps the ORIGINAL output
  * attribute ids (grouping outputs and aliases are re-issued under their
  * old exprIds), so parent operators resolve untouched.
  *
  * Runs inside the operator-optimization fixed point: after one rewrite
  * the aggregate reads the MV path, which is not a registered base, so
  * the rule no-ops on re-entry. Declines are always safe — the query
  * just runs against the base table.
  */
class MvAggregateRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MaterializedView.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  private def lower(s: String): String = s.toLowerCase(Locale.ROOT)

  /** Peel Project(attrs-only)/Filter links down to the single parquet
    * relation, accumulating filter conditions; None on any other node.
    */
  private def strip(
      p: LogicalPlan,
      conds: mutable.Buffer[Expression]): Option[LogicalRelation] = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      strip(c, conds)
    case Filter(cond, c) =>
      conds += cond; strip(c, conds)
    case lr: LogicalRelation => Some(lr)
    case _ => None
  }

  private def findMv(root: Path): Option[MvDef] = {
    // String compare against the path qualified ONCE at registration —
    // no Hadoop conf/FileSystem work per Aggregate node.
    val r = root.toString
    MaterializedView.all.find(_.qualifiedBase == r)
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val conds = mutable.Buffer.empty[Expression]
    for {
      lr <- strip(agg.child, conds)
      fsRel <- lr.relation match {
        case f: HadoopFsRelation => Some(f)
        case _ => None
      }
      root <- fsRel.location.rootPaths match {
        case Seq(one) => Some(one)
        case _ => None
      }
      mv <- findMv(root)
      dims = mv.groupCols.map(lower).toSet
      if agg.groupingExpressions.forall {
        case a: Attribute => dims.contains(lower(a.name))
        case _ => false
      }
      if conds.forall(c =>
        c.deterministic && c.references.forall(r => dims.contains(lower(r.name))))
      if agg.aggregateExpressions.forall(_.deterministic)
      // Staleness: one directory-status call, same discipline as the
      // catalog registry's mtime guard. Base changed since build → decline.
      if MaterializedView.baseMtime(spark, mv.basePath) == mv.baseMtime
      rewritten <- rewriteOnto(agg, conds.toSeq, mv)
    } yield rewritten
  }

  private def rewriteOnto(
      agg: Aggregate,
      conds: Seq[Expression],
      mv: MvDef): Option[LogicalPlan] = {
    // Fresh analyzed scan of the rollup; column pruning still runs (we
    // are inside the operator-optimization fixed point). LAZY so a
    // decline on the measure lookups (the common near-miss) pays no
    // rollup analysis / file listing.
    lazy val mvPlan = spark.read.parquet(mv.mvPath).queryExecution.analyzed
    lazy val mvAttr: Map[String, Attribute] =
      mvPlan.output.map(a => lower(a.name) -> a).toMap

    def deriveAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      def resum(measureCol: Option[String], mk: Attribute => AggregateFunction) =
        measureCol.flatMap(mvAttr.get).map { a =>
          val re = mk(a).toAggregateExpression()
          if (re.dataType == ae.dataType) re else Cast(re, ae.dataType)
        }
      ae.aggregateFunction match {
        case Sum(inner, _) =>
          resum(mv.sums.get(MaterializedView.normalize(inner)), Sum(_))
        case Min(inner) =>
          resum(mv.mins.get(MaterializedView.normalize(inner)), Min(_))
        case Max(inner) =>
          resum(mv.maxs.get(MaterializedView.normalize(inner)), Max(_))
        case c: Count if c.children.forall(e => e.foldable && e.eval() != null) =>
          // count(*) / count(1): the per-group row count is the SUM of the
          // stored partial counts; coalesce keeps the empty-input global
          // aggregate at 0 (and restores count's non-null contract). The
          // non-null fold guard matters: COUNT(NULL) is 0 by definition,
          // not the row count.
          mv.countCol.flatMap(mvAttr.get).map { a =>
            Coalesce(Seq(
              Cast(Sum(a).toAggregateExpression(), LongType), Literal(0L)))
          }
        case _ => None
      }
    }

    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => deriveAgg(ae)
      case a: AttributeReference => mvAttr.get(lower(a.name))
      case leaf if leaf.children.isEmpty => Some(leaf)
      case other =>
        val kids = other.children.map(rewriteExpr)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
    }

    // Keep original output attribute ids: grouping outputs and aliases are
    // re-issued under their existing exprIds over the MV-side expressions.
    val newAeOpt = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        mvAttr.get(lower(a.name)).map(m => Alias(m, a.name)(exprId = a.exprId))
      case al: Alias =>
        rewriteExpr(al.child).map(c =>
          Alias(c, al.name)(
            exprId = al.exprId, qualifier = al.qualifier,
            explicitMetadata = al.explicitMetadata))
      case _ => None
    }
    if (newAeOpt.exists(_.isEmpty)) return None

    val newGe = agg.groupingExpressions.map {
      case a: Attribute => mvAttr(lower(a.name))
      case e => e // unreachable: guarded attributes-only above
    }
    val newChild = conds
      .map(_.transform { case a: AttributeReference => mvAttr(lower(a.name)) })
      .reduceOption(And)
      .map(Filter(_, mvPlan)).getOrElse(mvPlan)
    logInfo(s"MV rewrite: aggregate over ${mv.basePath} served from " +
      s"rollup '${mv.name}' (${mv.mvPath})")
    Some(Aggregate(newGe, newAeOpt.map(_.get), newChild))
  }
}
