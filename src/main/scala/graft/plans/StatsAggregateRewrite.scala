package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, max, min, sum}
import org.apache.spark.sql.types._

import graft.table.KeyedTable

/** Answers `min`/`max`/`count` aggregates from the column-stats sidecar
  * alone — aggregate pushdown to table metadata, the move Iceberg/Hudi
  * make when `SELECT min(ts), max(ts), count(*)` lands on a 100 TB
  * table: the answer is a fold over per-file stats (one metadata-sized
  * read), not a full scan. The matched `Aggregate` is replaced by a
  * [[LocalRelation]] carrying the aggregate's own output attributes, so
  * nothing above changes. Grouping is admitted when every grouping
  * expression is a PARTITION column: each data file lives in exactly
  * one partition directory, so the sidecar's recorded per-file
  * partition tuple (`p_<col>`) folds per group exactly — the BI
  * dashboard's per-partition rollup served from metadata.
  *
  * Matches an `Aggregate` whose stripped child is a single parquet
  * relation rooted at a REGISTERED keyed-table path
  * ([[KeyedTable.specRegistry]]) — no windows or joins, and filters
  * only when every conjunct is a literal point predicate (or inferred
  * isnotnull) on a PARTITION column: partition conjuncts select whole
  * files exactly, so the fold over the selected sidecar rows IS the
  * aggregate over the filtered table, nothing residual — and
  * whose every aggregate is one of `min(col)` / `max(col)` (any ORDERED
  * stats type — integers, floats, dates, timestamps, decimals, strings;
  * [[KeyedTable.statsOrderedType]], matching what
  * [[KeyedTable.recordColumnStats]] records; string bounds must
  * additionally be stored untruncated — see the serve-time guard),
  * `sum(col)` (INTEGRAL columns only — the one type whose per-file sums
  * fold bit-exactly), `count(*)`/`count(1)` (served from per-file
  * `cnt`), or `count(col)` (served from `nn_<col>`); no DISTINCT, no
  * FILTER clauses. Any other
  * aggregate declines the whole node — partial serving would still
  * scan. Group counts beyond [[StatsAggregateRewrite.MaxGroups]]
  * decline (a LocalRelation is driver-resident; a group explosion
  * belongs in a real scan).
  *
  * Soundness: non-resolving (plain copy-on-write) tables only — on a
  * `retainHistory` table stored rows are versions, so file stats
  * over-count superseded versions. Freshness is the sidecar's exists ⇒
  * current invariant (every data write deletes it before the write
  * lands): a present sidecar covers exactly the current data files. The
  * per-file fold is exact, not approximate — `min` over file minima
  * equals `min` over rows (`min`/`max` ignore nulls on both levels, an
  * all-null file contributes a null minimum which the fold ignores),
  * counts add, and partition-grouped folds partition the file set.
  * Bounds are stored in each column's own type; pre-typed sidecars
  * stored integral bounds as longs, which narrow back losslessly on
  * serve.
  *
  * Plan-time cost is one metadata-sized sidecar read, gated behind the
  * registry hit and the all-servable aggregate list; idempotent because
  * the produced LocalRelation contains no relation to re-match.
  */
class StatsAggregateRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import StatsAggregateRewrite.MaxGroups

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (KeyedTable.specRegistry.isEmpty) return plan
    plan.transformUp {
      case a: Aggregate =>
        try serve(a).getOrElse(a)
        catch { case scala.util.control.NonFatal(_) => a }
    }
  }

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def lower(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  /** What one output expression needs from the sidecar fold. */
  private sealed trait Need
  private case class GroupOf(column: String, t: DataType, gi: Int) extends Need
  private case class MinOf(column: String, t: DataType) extends Need
  private case class MaxOf(column: String, t: DataType) extends Need
  private case class SumOf(column: String) extends Need
  private case object CountAll extends Need
  private case class CountCol(column: String) extends Need

  private sealed trait PartFilter
  private case class PartIn(column: String, t: DataType, values: Seq[Any])
    extends PartFilter
  private case class PartNotNull(column: String) extends PartFilter

  /** The shape half of the match, sidecar-IO-free. */
  private final case class AggMatch(
      a: Aggregate, spec: graft.table.KeyedTableSpec, needs: Seq[Need],
      groupAttrs: Seq[Attribute], partFilters: Seq[PartFilter])

  /** Every servable-aggregate shape in `plan`, as (table spec, the data
    * columns needing recorded stats) — shared with [[IndexAdvisor]], so
    * the advisor recommends exactly the stats builds this rule can
    * later serve (the one-matcher discipline). A count(*)-only shape
    * reports no columns; any build records the `cnt` it needs. Served
    * plans drop out naturally: the produced LocalRelation holds no
    * relation to re-match.
    */
  private[plans] def aggShapes(
      plan: LogicalPlan): Seq[(graft.table.KeyedTableSpec, Seq[String])] =
    if (KeyedTable.specRegistry.isEmpty) Nil
    else plan.collect { case ag: Aggregate =>
      (try matchAgg(ag) catch { case scala.util.control.NonFatal(_) => None })
        .map { m =>
          (m.spec, m.needs.collect {
            case MinOf(c, _) => c
            case MaxOf(c, _) => c
            case SumOf(c)    => c
            case CountCol(c) => c
          }.distinct)
        }
    }.flatten

  private def serve(a: Aggregate): Option[LogicalPlan] =
    matchAgg(a).flatMap(serveAgg)

  private def matchAgg(a: Aggregate): Option[AggMatch] = {
    if (a.aggregateExpressions.isEmpty) return None
    val conds = mutable.Buffer.empty[(Expression, Int)]
    val windows = mutable.Buffer.empty[Window]
    val renames = mutable.Map.empty[ExprId, Expression]
    val rels = mutable.Buffer.empty[LogicalRelation]
    val pairs = mutable.Buffer.empty[(Attribute, Attribute)]
    if (!MvPlanShape.strip(a.child, conds, windows, renames, rels, pairs))
      return None
    if (windows.nonEmpty || pairs.nonEmpty || rels.length != 1) return None
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

    def relAttrOf(e: Expression): Option[Attribute] = subst(e) match {
      case at: Attribute if relIds.contains(at.exprId) &&
        !at.name.startsWith("_graft_") => Some(at)
      case _ => None
    }

    // Grouping: every expression must be a partition-column attribute.
    val partCols = spec.partitionCols.map(lower).toSet
    val groupAttrs: Seq[Attribute] = a.groupingExpressions.map { e =>
      relAttrOf(e).filter(at => partCols.contains(lower(at.name)))
        .getOrElse(return None)
    }

    // Filters: every conjunct must be a literal point predicate (or the
    // optimizer's inferred isnotnull) on a PARTITION column — partition
    // conjuncts select whole files exactly (the sidecar's per-file
    // partition tuple is a constant), so the fold over the selected
    // sidecar rows IS the aggregate over the filtered table; nothing
    // residual remains. Any other predicate declines.
    def partFilterOf(e: Expression): Option[PartFilter] = {
      def attrOf(x: Expression): Option[Attribute] =
        relAttrOf(x).filter(at => partCols.contains(lower(at.name)))
      e match {
        case EqualTo(x, l: Literal) if l.value != null =>
          attrOf(x).map(at => PartIn(at.name, at.dataType, Seq(l.value)))
        case EqualTo(l: Literal, x) if l.value != null =>
          attrOf(x).map(at => PartIn(at.name, at.dataType, Seq(l.value)))
        case In(x, vs) if vs.forall {
          case Literal(v, _) => v != null
          case _ => false
        } => attrOf(x).map(at =>
          PartIn(at.name, at.dataType, vs.map(_.asInstanceOf[Literal].value)))
        case InSet(x, hset) if !hset.contains(null) =>
          attrOf(x).map(at => PartIn(at.name, at.dataType, hset.toSeq))
        case IsNotNull(x) => attrOf(x).map(at => PartNotNull(at.name))
        case _ => None
      }
    }
    val splitConds = conds.toSeq.flatMap { case (c, _) =>
      MvPlanShape.splitConjunction(c)
    }
    if (splitConds.exists(!_.deterministic)) return None
    val partFilters: Seq[PartFilter] =
      splitConds.map(c => partFilterOf(c).getOrElse(return None))
    val groupIdx: Map[ExprId, Int] =
      groupAttrs.zipWithIndex.map { case (at, i) => at.exprId -> i }.toMap

    def groupNeedOf(e: Expression): Option[GroupOf] = subst(e) match {
      case at: Attribute => groupIdx.get(at.exprId)
        .map(i => GroupOf(at.name, at.dataType, i))
      case _ => None
    }
    val needs: Seq[Need] = a.aggregateExpressions.map {
      case at: Attribute => groupNeedOf(at).getOrElse(return None)
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          // Min/Max fold exactly for every ORDERED stats type: min over
          // per-file minima equals min over rows (same interpreted
          // ordering at both levels, nulls ignored at both levels).
          // Strings additionally require the stored bounds untruncated —
          // checked at serve time via the sidecar's `trunc_<col>` flags.
          case Min(e) =>
            relAttrOf(e)
              .filter(at => KeyedTable.statsOrderedType(at.dataType))
              .map(at => MinOf(at.name, at.dataType)).getOrElse(return None)
          case Max(e) =>
            relAttrOf(e)
              .filter(at => KeyedTable.statsOrderedType(at.dataType))
              .map(at => MaxOf(at.name, at.dataType)).getOrElse(return None)
          // Sum(integral) ONLY folds bit-exactly: long addition is
          // associative mod 2^64, the same arithmetic Spark's own
          // partial+final Sum performs, and the output is LongType for
          // every integral input. FP sums are order-sensitive and
          // decimal sums change precision per fold level — a sum over
          // any non-integral column declines the whole node to a scan.
          case s: Sum =>
            relAttrOf(s.child).filter(at => integral(at.dataType))
              .map(at => SumOf(at.name)).getOrElse(return None)
          case Count(Seq(Literal(v, _))) if v != null => CountAll
          case Count(Seq(e)) =>
            relAttrOf(e).map(at => CountCol(at.name)).getOrElse(return None)
          case _ => return None
        }
      case Alias(e, _) => groupNeedOf(e).getOrElse(return None)
      case _ => return None
    }
    Some(AggMatch(a, spec, needs, groupAttrs, partFilters))
  }

  /** The serving half: one sidecar read + the LocalRelation fold. */
  private def serveAgg(m: AggMatch): Option[LogicalPlan] = {
    val AggMatch(a, spec, needs, groupAttrs, partFilters) = m
    val table = KeyedTable(spec)
    table.colStatsFrame(spark).flatMap { st =>
      // Sidecar columns are named with the column string passed to
      // recordColumnStats / the spec's partition cols; resolve
      // case-insensitively like the analyzer.
      def statCol(prefix: String, c: String): Option[String] =
        st.columns.find(_.equalsIgnoreCase(s"${prefix}_$c"))
      val groupStatCols = groupAttrs.map(at => statCol("p", at.name))
      // Partition filters select sidecar rows (whole files) exactly.
      val filterStatCols = partFilters.map {
        case PartIn(c, _, _)  => statCol("p", c)
        case PartNotNull(c) => statCol("p", c)
      }
      if (filterStatCols.exists(_.isEmpty)) return None
      val stSel = partFilters.zip(filterStatCols.map(_.get)).foldLeft(st) {
        case (df, (PartIn(_, t, vs), pc)) =>
          val toScala = CatalystTypeConverters.createToScalaConverter(t)
          df.filter(col(pc).isin(vs.map(toScala): _*))
        case (df, (PartNotNull(_), pc)) => df.filter(col(pc).isNotNull)
      }
      val folds: Seq[Option[org.apache.spark.sql.Column]] = needs.collect {
        case MinOf(c, _) => statCol("min", c).map(s => min(col(s)))
        case MaxOf(c, _) => statCol("max", c).map(s => max(col(s)))
        case SumOf(c)    => statCol("sum", c).map(s => sum(col(s)))
        case CountAll =>
          if (st.columns.contains("cnt")) Some(sum(col("cnt"))) else None
        case CountCol(c) => statCol("nn", c).map(s => sum(col(s)))
      }
      // String min/max serve only from EXACT stored bounds: any selected
      // file whose bounds were truncated (`trunc_<col>` — the Iceberg
      // prefix convention) makes the stored value a bound, not the
      // answer, so the whole node declines to a scan. One guard fold per
      // string column, appended after the value folds; a sidecar missing
      // the flag column predates the convention and declines too.
      val guardCols: Seq[Option[String]] = needs.collect {
        case MinOf(c, StringType) => statCol("trunc", c)
        case MaxOf(c, StringType) => statCol("trunc", c)
      }.distinct
      if (folds.exists(_.isEmpty) || groupStatCols.exists(_.isEmpty) ||
          guardCols.exists(_.isEmpty)) None
      else {
        val valueExprs = folds.flatten.zipWithIndex
          .map { case (c, i) => c.as(s"v$i") }
        val guardExprs = guardCols.flatten.zipWithIndex
          .map { case (g, i) => max(col(g)).as(s"g$i") }
        val exprs = valueExprs ++ guardExprs
        val folded =
          if (groupStatCols.isEmpty) stSel.agg(exprs.head, exprs.tail: _*)
          else stSel.groupBy(groupStatCols.flatten.map(col): _*)
            .agg(exprs.head, exprs.tail: _*)
        val rows = folded.limit(MaxGroups + 1).collect()
        if (rows.length > MaxGroups) return None
        val nGuards = guardExprs.length
        val truncated = rows.exists { row =>
          (0 until nGuards).exists { gi =>
            val at = row.length - nGuards + gi
            !row.isNullAt(at) && row.getBoolean(at)
          }
        }
        if (truncated) return None
        val nGroups = groupStatCols.length
        val toCatalyst = groupAttrs.map(at =>
          CatalystTypeConverters.createToCatalystConverter(at.dataType))
        // Agg needs read the fold row at nGroups + their own position
        // among agg needs (needs order = output order; group needs read
        // their grouping slot).
        val aggPos: Map[Int, Int] = {
          var j = 0
          needs.zipWithIndex.flatMap {
            case (_: GroupOf, _) => None
            case (_, i) => val p = j; j += 1; Some(i -> p)
          }.toMap
        }
        val data = rows.toIndexedSeq.map { row =>
          val values: Seq[Any] = needs.zipWithIndex.map {
            case (GroupOf(_, _, gi), _) => toCatalyst(gi)(row.get(gi))
            case (n, i) =>
              val at = nGroups + aggPos(i)
              val v: Any = if (row.isNullAt(at)) null else row.get(at)
              n match {
                case MinOf(_, t) => toCatalystStat(v, t)
                case MaxOf(_, t) => toCatalystStat(v, t)
                case SumOf(_)    => v // sum over no rows is null, like Spark
                // count over zero files is 0, never null
                case _ => if (v == null) 0L else v
              }
          }
          InternalRow.fromSeq(values)
        }
        logInfo(s"stats-aggregate rewrite: ${spec.path} answered from the " +
          s"column-stats sidecar (${rows.length} group rows, no scan)")
        Some(LocalRelation(a.output, data, false))
      }
    }
  }

  /** Scala-side fold value → Catalyst value in the column's own type.
    * New sidecars store min/max NATIVELY (the fold value converts
    * directly); pre-typed sidecars stored integral bounds as longs, so a
    * boxed Long narrows back to the column's integral type.
    */
  private def toCatalystStat(v: Any, t: DataType): Any = v match {
    case null => null
    case l: java.lang.Long => t match {
      case ByteType    => l.byteValue
      case ShortType   => l.shortValue
      case IntegerType => l.intValue
      case LongType    => l.longValue
      case _ => CatalystTypeConverters.createToCatalystConverter(t)(l)
    }
    case other => CatalystTypeConverters.createToCatalystConverter(t)(other)
  }
}

object StatsAggregateRewrite {
  /** Grouped serves are driver-resident LocalRelations — beyond this
    * many groups the answer belongs in a real scan, not the plan.
    */
  val MaxGroups = 4096
}
