package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

import graft.table.KeyedTable

/** Serves `ORDER BY col [ASC|DESC] LIMIT k` over a keyed table's
  * declarative read through the column-stats sidecar — the third member
  * of the stats-serving family ([[PointLookupRewrite]] points,
  * [[RangePruneRewrite]] ranges, this rule sorted limits): the "latest
  * N" query every time-series table serves (`ORDER BY ts DESC LIMIT
  * 100`) opens only the files that can hold a top-k row instead of
  * feeding a full scan into the cluster-wide TakeOrdered. The bound is
  * the standard stats top-k argument
  * ([[KeyedTable.topKCandidateFiles]]): walking files by min descending
  * until the accumulated non-null count reaches k proves the kth value
  * is at least that walk's last min, so files whose max falls below it
  * cannot contribute. On a table clustered by the sort column the kept
  * set is O(k / rows-per-file) files; unclustered, the stats still
  * answer, they just skip less.
  *
  * Matches `GlobalLimit(k, LocalLimit(k, Sort(...)))` — optionally with
  * a deterministic `Project` between limit and sort — whose sort child
  * strips to a single parquet relation rooted at a REGISTERED keyed
  * table ([[KeyedTable.specRegistry]]); the LEADING sort key must be a
  * stats-covered ordered column. Trailing tiebreak keys ride untouched:
  * only the scan's file set changes, the full Sort + Limit stay as the
  * residual, so boundary ties resolve exactly as they would unpruned.
  *
  * Declines: `retainHistory` tables (a pruned resolve could resurrect
  * superseded versions), filters/windows/joins below the sort (a
  * filter breaks the row-count accumulation that justifies the bound —
  * a prefix file's rows might not satisfy it), non-global sorts, k ≤ 0,
  * and sidecars indexing fewer than k non-null values. Same
  * registry-gated plan-time cost and natural idempotency as the range
  * rule (a swapped scan no longer roots at the registered path).
  */
class TopKPruneRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val memo = new DeclineMemo[Any]

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (KeyedTable.specRegistry.isEmpty) return plan
    plan.transformUp {
      case lim: GlobalLimit =>
        try tryRewrite(lim).getOrElse(lim)
        catch { case scala.util.control.NonFatal(_) => lim }
    }
  }

  private def projOk(pl: Seq[NamedExpression]): Boolean = pl.forall {
    case _: AttributeReference => true
    case Alias(e, _) => e.deterministic
    case _ => false
  }

  private def tryRewrite(lim: GlobalLimit): Option[LogicalPlan] = {
    val (k, sort) = lim match {
      case Limit(IntegerLiteral(n), s: Sort) => (n, s)
      case Limit(IntegerLiteral(n), Project(pl, s: Sort)) if projOk(pl) =>
        (n, s)
      case _ => return None
    }
    if (k <= 0 || !sort.global || sort.order.isEmpty) return None

    val conds = mutable.Buffer.empty[(Expression, Int)]
    val windows = mutable.Buffer.empty[Window]
    val renames = mutable.Map.empty[ExprId, Expression]
    val rels = mutable.Buffer.empty[LogicalRelation]
    val pairs = mutable.Buffer.empty[(Attribute, Attribute)]
    if (!MvPlanShape.strip(sort.child, conds, windows, renames, rels, pairs))
      return None
    if (conds.nonEmpty || windows.nonEmpty || pairs.nonEmpty ||
      rels.length != 1) return None
    val lr = rels.head
    val fsRel = lr.relation match {
      case h: HadoopFsRelation => h
      case _ => return None
    }
    val root = fsRel.location.rootPaths match {
      case Seq(one) => one.toString
      case _ => return None
    }
    val spec = Option(KeyedTable.specRegistry.get(root)).getOrElse(return None)
    if (spec.retainHistory) return None

    val relIds = lr.output.map(_.exprId).toSet
    val head = sort.order.head
    val attr = MvPlanShape.substFn(renames)(head.child) match {
      case a: Attribute if relIds.contains(a.exprId) &&
        KeyedTable.statsOrderedType(a.dataType) &&
        !a.name.startsWith("_graft_") => a
      case _ => return None
    }
    val desc = head.direction == Descending
    val nullsFirst = head.nullOrdering == NullsFirst

    val table = KeyedTable(spec)
    memo.gated((root, attr.name, k, desc, nullsFirst)) {
      table.topKCandidateFiles(spark, attr.name, k.toLong, desc, nullsFirst)
        .flatMap { case (files, _) =>
          val total = fsRel.location.inputFiles.length
          if (files.length >= total) None
          else {
            val partSchema = Option(fsRel.partitionSchema).filter(_.nonEmpty)
            val pruned = new InMemoryFileIndex(
              spark, files, Map("basePath" -> root), partSchema)
            logInfo(s"top-k rewrite: $root scan pruned to ${files.length} " +
              s"of $total files for ORDER BY ${attr.name} " +
              (if (desc) "DESC" else "ASC") + s" LIMIT $k")
            Some(lim.transformUp {
              case l: LogicalRelation if l eq lr =>
                l.copy(relation = fsRel.copy(location = pruned)(spark))
            })
          }
        }
    }
  }
}
