package graft.plans

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types._

import graft.table.KeyedTable

/** Serves RANGE predicates on a keyed table's declarative read plan
  * through the column-stats sidecar — the planner-side half of
  * [[KeyedTable.readPruned]], completing the pushdown family
  * ([[PointLookupRewrite]] serves point probes, this rule serves
  * ranges): a user writing `table.read(spark).filter($"ts" between
  * (lo, hi))` gets the file-skipping scan the explicit API performs,
  * with no special API. This is Hudi/Iceberg column-stats data skipping
  * done where Spark does file skipping — the logical scan's `FileIndex`
  * is swapped for one holding only the files whose recorded [min, max]
  * intersects EVERY range conjunct; the filter stays as the residual
  * (stats admit false positives, never false negatives), exactly like
  * partition pruning leaves its predicate.
  *
  * Matches `Filter` whose stripped child is a single parquet relation
  * rooted at a REGISTERED keyed-table path ([[KeyedTable.specRegistry]],
  * warmed by `read` — zero filesystem work on unrelated plans) with at
  * least one literal range conjunct (`>=`, `>`, `<=`, `<`, `=`, either
  * orientation) on an ORDERED column — integers, floats, dates,
  * timestamps, decimals, strings ([[KeyedTable.statsOrderedType]], the
  * same set Iceberg/Hudi record column bounds for; a `WHERE ts BETWEEN`
  * over a clustered time-series table is the canonical customer of this
  * rule). Conjuncts on the same column
  * intersect; conjuncts over several columns prune conjunctively — over
  * a Z-ordered layout ([[KeyedTable.clusterZOrder]]) each file is a
  * rectangle in the clustered key space, so a 2-D probe multiplies the
  * per-dimension skip rates. Non-range conjuncts simply stay residual:
  * serving on a SUBSET of the conjunction is sound because a dropped
  * file holds no row satisfying that subset, hence none satisfying the
  * whole filter.
  *
  * Soundness bounds (the same ones [[KeyedTable.readPruned]] enforces):
  * non-resolving (plain copy-on-write) tables only — on a
  * `retainHistory` table, resolving latest-per-key over a pruned file
  * subset could resurrect versions superseded by rows outside the
  * range — and no window functions below the filter (removing files
  * under an arbitrary window would change its frames). An evolved
  * table's scan roots at generation dirs, never at the registered path,
  * so it cannot match. Freshness needs no timeline proof: the sidecar
  * follows exists ⇒ current (every data write deletes it before the
  * write lands), so a present sidecar covers every data file.
  *
  * Plan-time cost is one metadata-sized sidecar read, gated behind the
  * registry hit and a literal range conjunct; re-application is
  * naturally idempotent because the swapped relation no longer roots at
  * the registered path.
  */
class RangePruneRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val memo = new DeclineMemo[Any]

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (KeyedTable.specRegistry.isEmpty) return plan
    plan.transformUp {
      case f: Filter =>
        try tryRewrite(f).getOrElse(f)
        catch { case scala.util.control.NonFatal(_) => f }
    }
  }

  /** The shape half of the match, sidecar-IO-free — shared with
    * [[IndexAdvisor]], so the advisor recommends exactly the stats
    * builds this rule can later serve (one matcher, like
    * [[PointLookupRewrite.probeShapes]] for the point family).
    */
  private[plans] final case class RangeMatch(
      f: Filter, lr: LogicalRelation, fsRel: HadoopFsRelation, root: String,
      spec: graft.table.KeyedTableSpec, ranges: Seq[graft.table.ColumnRange],
      nullPreds: Seq[(String, Boolean)], inLists: Seq[(String, Seq[Any])])

  /** Every range shape in `plan` this rule would serve if column stats
    * existed (no sidecar IO, no filesystem work beyond the registry).
    * On an already-served plan the Filter no longer roots at the
    * registered path, so served ranges naturally drop out.
    */
  private[plans] def rangeShapes(plan: LogicalPlan): Seq[RangeMatch] =
    if (KeyedTable.specRegistry.isEmpty) Nil
    else plan.collect { case f: Filter =>
      try matchRange(f) catch { case scala.util.control.NonFatal(_) => None }
    }.flatten

  private def tryRewrite(f: Filter): Option[LogicalPlan] =
    matchRange(f).flatMap { m =>
      val key = (m.root, m.ranges.toVector, m.nullPreds.toVector,
        m.inLists.map { case (c, vs) => (c, vs.toVector) }.toVector)
      memo.gated(key)(serveRange(m))
    }

  private def matchRange(f: Filter): Option[RangeMatch] = {
    val conds = mutable.Buffer.empty[(Expression, Int)]
    val windows = mutable.Buffer.empty[Window]
    val renames = mutable.Map.empty[ExprId, Expression]
    val rels = mutable.Buffer.empty[LogicalRelation]
    val pairs = mutable.Buffer.empty[(Attribute, Attribute)]
    if (!MvPlanShape.strip(f, conds, windows, renames, rels, pairs)) return None
    if (pairs.nonEmpty || rels.length != 1 || windows.nonEmpty) return None
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
    val subst = MvPlanShape.substFn(renames)
    val relIds = lr.output.map(_.exprId).toSet

    val split = conds.toSeq.flatMap { case (c, _) =>
      MvPlanShape.splitConjunction(c)
    }
    if (split.exists(!_.deterministic)) return None

    def relAttrOf(e: Expression): Option[Attribute] = subst(e) match {
      case a: Attribute if relIds.contains(a.exprId) &&
        graft.table.KeyedTable.statsOrderedType(a.dataType) &&
        !a.name.startsWith("_graft_") => Some(a)
      case _ => None
    }
    // Literal bounds and null predicates through the SHARED extraction
    // ([[RangeConjuncts]] — one matcher for every column-stats
    // consumer): bounds in the column's own type with per-side
    // strictness flags, same-column conjuncts intersected with the
    // type's own interpreted ordering. Null predicates prune through
    // the per-file null counts (cnt vs nn_<col>): `IS NULL` drops files
    // with no null in the column, `IS NOT NULL` drops all-null files —
    // per-row facts on a copy-on-write table, so the
    // subset-of-conjunction argument covers them too; Catalyst's
    // inferred `isnotnull` guards around every range ride for free.
    // Unconsumed conjuncts simply stay residual (subset serving).
    // IN/InSet conjuncts serve as multi-point containment over the same
    // stats (OR of per-value [min <= v <= max]) -- the declarative
    // low-cardinality filter (`lang IN ('en','de')`) when no index
    // sidecar exists; PointLookupRewrite runs first and takes the probe
    // whenever the exact index family can serve it.
    val ex = RangeConjuncts.extract(split, relAttrOf)
    if (ex.ranges.isEmpty && ex.nullPreds.isEmpty && ex.inLists.isEmpty)
      return None
    Some(RangeMatch(
      f, lr, fsRel, root, spec, ex.ranges, ex.nullPreds, ex.inLists))
  }

  /** The serving half: one sidecar read + the scan swap. */
  private def serveRange(m: RangeMatch): Option[LogicalPlan] = {
    val table = KeyedTable(m.spec)
    table.rangeCandidateFilesTyped(spark, m.ranges, m.nullPreds, m.inLists)
      .flatMap { case (files, _) =>
      val total = m.fsRel.location.inputFiles.length
      if (files.length >= total) None
      else {
        val partSchema = Option(m.fsRel.partitionSchema).filter(_.nonEmpty)
        val pruned = new InMemoryFileIndex(
          spark, files, Map("basePath" -> m.root), partSchema)
        logInfo(s"range-prune rewrite: ${m.root} scan pruned to " +
          s"${files.length} of $total files via column stats on " +
          (m.ranges.map(_.column) ++ m.inLists.map(_._1)).mkString(", "))
        // Same relation, same output attributes — only the file set
        // changes, so nothing above needs exprId surgery.
        Some(m.f.transformUp {
          case l: LogicalRelation if l eq m.lr =>
            l.copy(relation = m.fsRel.copy(location = pruned)(spark))
        })
      }
    }
  }
}
