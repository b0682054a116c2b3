package graft.plans

import java.util.Locale

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

import graft.table.KeyedTable

/** Serves GROUPED top-k — `row_number()/rank() OVER (PARTITION BY cat
  * ORDER BY col DESC) ≤ N` over a keyed table's declarative read —
  * through the column-stats sidecar: the leaderboard / "latest N per
  * category" query every 100 TB event table serves. The global rule
  * ([[TopKPruneRewrite]]) covers `ORDER BY … LIMIT k`; this one covers
  * the per-group twin, which Spark executes as a Window (+ the
  * optimizer's WindowGroupLimit pushdown) over the FULL scan.
  *
  * Soundness rests on each walked file belonging to exactly ONE group:
  * trivially true for TABLE PARTITION group keys (the hive directory),
  * and per-file provable for CLUSTERED DATA group keys via the
  * single-valued test (min = max ∧ nn = cnt — q180's classification; a
  * leaderboard `PARTITION BY lang` over the lang-clustered corpus then
  * walks each language's run). Files spanning groups — or holding the
  * NULL group — are always kept and excluded from the walk, which only
  * UNDER-counts the cumulative sums: bounds weaken, keeping more
  * files, never fewer. The sidecar's per-file group key (partition
  * tuple / stored single value) groups the walked set exactly and the
  * standard stats top-k argument applies PER GROUP — walk a group's
  * files by recorded min descending (asc mirrors), accumulate non-null
  * counts until ≥ N: those rows all rank ahead of anything below the
  * last walked file's min `L_g`, so a file with max < L_g cannot hold
  * a rank-≤-N row of that group. Dropped
  * rows sort STRICTLY below every kept tie, so the residual Window over
  * the kept rows assigns ranks 1..N exactly as the full scan would
  * (ties at the bound are kept by the non-strict comparison; a total
  * ordering — unique tiebreak — makes the output deterministic, same
  * contract as the global rule). A group with fewer than N non-null
  * rows proves no bound and keeps ALL its files. Nulls sorting toward
  * the head keep every null-carrying file of the group. RANK rides the
  * same bound (rank ≤ N implies at most N−1 rows strictly ahead, hence
  * value ≥ the group's Nth row value); DENSE_RANK does not (unbounded
  * rows per rank) and declines.
  *
  * Matches `Filter` whose one below-plan window is a single
  * row_number/rank over (a subset of the table's partition columns)
  * ordered first by a stats-covered column, whose rank conjunct is
  * `rk ≤ N` / `rk < N+1` / `rk = N` at depth 0. Partition point/IN
  * conjuncts compose (they drop whole groups — surviving groups' ranks
  * are unchanged whether they sit above or below the window); any OTHER
  * conjunct BELOW the window declines (it would filter rows before
  * ranking and break the count bound), while non-rank conjuncts above
  * the window stay residual (they only filter ranked output). Same
  * registry gate, decline memo, and natural idempotency as the rest of
  * the pushdown family; `retainHistory` declines (a pruned resolve
  * could resurrect superseded versions — and the resolve window itself
  * is [[PointLookupRewrite]]/[[RangePruneRewrite]]'s subject, not a
  * leaderboard).
  */
class GroupTopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val memo = new DeclineMemo[Any]

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (KeyedTable.specRegistry.isEmpty) return plan
    plan.transformUp {
      case f: Filter =>
        try tryRewrite(f).getOrElse(f)
        catch { case scala.util.control.NonFatal(_) => f }
    }
  }

  private[plans] final case class GroupTopKMatch(
      f: Filter, lr: LogicalRelation, fsRel: HadoopFsRelation, root: String,
      spec: graft.table.KeyedTableSpec, groupCols: Seq[String],
      groupIsPart: Seq[Boolean],
      sortCol: String, n: Int, desc: Boolean, nullsFirst: Boolean,
      partFilters: Seq[PartitionConjuncts.PartFilter]) {
    /** Grouping columns that are DATA columns — classified per file by
      * the single-valued test, the layout property clustering decides
      * (so the advisor must not blanket-recommend these shapes).
      */
    def dataGroupCols: Seq[String] =
      groupCols.zip(groupIsPart).collect { case (c, false) => c }
  }

  /** Every grouped-top-k shape in `plan` this rule would serve if
    * column stats existed (no sidecar IO) — shared with
    * [[IndexAdvisor]], the one-matcher discipline.
    */
  private[plans] def groupTopKShapes(plan: LogicalPlan): Seq[GroupTopKMatch] =
    if (KeyedTable.specRegistry.isEmpty) Nil
    else plan.collect { case f: Filter =>
      try matchShape(f) catch { case scala.util.control.NonFatal(_) => None }
    }.flatten

  private def tryRewrite(f: Filter): Option[LogicalPlan] =
    matchShape(f).flatMap { m =>
      memo.gated((m.root, m.groupCols, m.sortCol, m.n, m.desc, m.nullsFirst,
        m.partFilters.toVector)) {
        serve(m)
      }
    }

  /** The window's single rank expression over table-partition keys or
    * stats-ordered DATA columns, ordered first by `col`, or None.
    */
  private def rankOf(
      w: Window, spec: graft.table.KeyedTableSpec,
      relAttrOf: Expression => Option[Attribute])
      : Option[(Attribute, Seq[(String, Boolean)], Attribute, Boolean, Boolean)] =
    w.windowExpressions match {
      case Seq(a @ Alias(
          WindowExpression(fn, WindowSpecDefinition(ps, os, _)), _))
          if fn.isInstanceOf[RowNumber] || fn.isInstanceOf[Rank] =>
        val partColsL =
          spec.partitionCols.map(_.toLowerCase(Locale.ROOT)).toSet
        val groups: Seq[(String, Boolean)] = ps.map(e => relAttrOf(e) match {
          case Some(at) if partColsL.contains(
            at.name.toLowerCase(Locale.ROOT)) => (at.name, true)
          // A DATA group column rides the single-valued classification
          // at serve time (q180's layout test); it needs recorded
          // min/max/nn, hence a stats-ordered type.
          case Some(at) if KeyedTable.statsOrderedType(at.dataType) =>
            (at.name, false)
          case _ => return None
        })
        os.headOption.flatMap {
          case SortOrder(child, dir, no, _) =>
            relAttrOf(child)
              .filter(at => KeyedTable.statsOrderedType(at.dataType))
              .map(at => (a.toAttribute, groups, at,
                dir == Descending, no == NullsFirst))
          case _ => None
        }
      case _ => None
    }

  private def matchShape(f: Filter): Option[GroupTopKMatch] = {
    val conds = mutable.Buffer.empty[(Expression, Int)]
    val windows = mutable.Buffer.empty[Window]
    val renames = mutable.Map.empty[ExprId, Expression]
    val rels = mutable.Buffer.empty[LogicalRelation]
    val pairs = mutable.Buffer.empty[(Attribute, Attribute)]
    if (!MvPlanShape.strip(f, conds, windows, renames, rels, pairs))
      return None
    if (pairs.nonEmpty || rels.length != 1) return None
    val w = windows.toSeq match {
      case Seq(one) => one
      case _ => return None
    }
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
      case a: Attribute if relIds.contains(a.exprId) &&
        !a.name.startsWith("_graft_") => Some(a)
      case _ => None
    }
    val (rk, groupPairs, sortAttr, desc, nullsFirst) =
      rankOf(w, spec, relAttrOf).getOrElse(return None)
    val (groupCols, groupIsPart) = groupPairs.unzip

    // The rank bound: rk ≤ N / rk < N+1 / rk = N, above the window.
    def boundOf(e: Expression): Option[Int] = e match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(n))
        if a.exprId == rk.exprId => Some(n)
      case LessThan(a: Attribute, IntegerLiteral(n))
        if a.exprId == rk.exprId => Some(n - 1)
      case EqualTo(a: Attribute, IntegerLiteral(n))
        if a.exprId == rk.exprId => Some(n)
      case GreaterThanOrEqual(IntegerLiteral(n), a: Attribute)
        if a.exprId == rk.exprId => Some(n)
      case _ => None
    }
    val splitD = conds.toSeq.flatMap { case (c, d) =>
      MvPlanShape.splitConjunction(c).map((_, d))
    }
    if (splitD.exists(!_._1.deterministic)) return None
    val partColsL = spec.partitionCols.map(_.toLowerCase(Locale.ROOT)).toSet
    def partFilterOf(e: Expression) = PartitionConjuncts.of(
      e,
      x => relAttrOf(x)
        .filter(at => partColsL.contains(at.name.toLowerCase(Locale.ROOT))))
    val bounds = splitD.collect { case (c, 0) if boundOf(c).isDefined =>
      boundOf(c).get
    }
    if (bounds.isEmpty) return None
    val n = bounds.min
    if (n <= 0) return None
    // Partition conjuncts compose at any depth (whole groups drop);
    // anything else BELOW the window breaks the count bound.
    val partFilters = splitD.flatMap(p => partFilterOf(p._1))
    if (splitD.exists { case (c, d) =>
      d != 0 && partFilterOf(c).isEmpty && boundOf(c).isEmpty
    }) return None
    Some(GroupTopKMatch(f, lr, fsRel, root, spec,
      groupCols, groupIsPart, sortAttr.name, n, desc, nullsFirst,
      partFilters))
  }

  /** The IO half: one metadata-sized sidecar job computes every group's
    * bound and the kept file set at once.
    */
  private def serve(m: GroupTopKMatch): Option[LogicalPlan] = {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{col, lit, max => fmax, sum}
    val table = KeyedTable(m.spec)
    table.colStatsFrame(spark).flatMap { st =>
      def statCol(prefix: String, c: String): Option[String] =
        st.columns.find(_.equalsIgnoreCase(s"${prefix}_$c"))
      if (!st.columns.contains("cnt")) return None
      val (mnS, mxS, nnS) = (statCol("min", m.sortCol),
        statCol("max", m.sortCol), statCol("nn", m.sortCol))
      if (mnS.isEmpty || mxS.isEmpty || nnS.isEmpty) return None
      // A file's group key: its partition tuple for hive columns, its
      // ONE stored value (min = max) for clustered data columns.
      val groupStatCols = m.groupCols.zip(m.groupIsPart).map {
        case (c, true)  => statCol("p", c)
        case (c, false) => statCol("min", c)
      }
      if (groupStatCols.exists(_.isEmpty)) return None
      // CLASSIFIABLE: single-valued (and null-free) in every data group
      // column — such a file belongs to exactly one group, so the
      // per-group count walk may use its rows (min = max under string
      // truncation still forces the exact value: stored lower ≤ real ≤
      // stored upper, and truncation makes lower < upper strictly).
      // Every OTHER file spans groups (or holds the NULL group): it is
      // ALWAYS KEPT, and its rows are excluded from the walk — the
      // cumulative counts only UNDER-count, so bounds weaken and keep
      // more files, never fewer. Pure partition groupings classify
      // every file (the original rule, unchanged).
      val dataClassPreds = m.groupCols.zip(m.groupIsPart).collect {
        case (c, false) =>
          (statCol("min", c), statCol("max", c), statCol("nn", c)) match {
            case (Some(gmn), Some(gmx), Some(gnn)) =>
              col(gnn) === col("cnt") && col(gmn) === col(gmx) &&
                col("cnt") > 0
            case _ => return None
          }
      }
      val classifiable = dataClassPreds.reduceOption(_ && _).getOrElse(lit(true))
      val filterStatCols = m.partFilters.map {
        case PartitionConjuncts.PartIn(c, _, _) => statCol("p", c)
        case PartitionConjuncts.PartNotNull(c)  => statCol("p", c)
      }
      if (filterStatCols.exists(_.isEmpty)) return None

      val stSel = PartitionConjuncts.select(
        st, m.partFilters.zip(filterStatCols.map(_.get)))
      val (mn, mx, nn) = (col(mnS.get), col(mxS.get), col(nnS.get))
      val gCols = groupStatCols.map(c => col(c.get))
      val walkKey = if (m.desc) mn else mx
      val w = W.partitionBy(gCols: _*).orderBy(
        if (m.desc) walkKey.desc_nulls_last else walkKey.asc_nulls_last)
      KeyedTable.withMetaConf(spark) {
        try {
          val total = st.count().toInt
          val stClass = stSel.filter(classifiable)
          // Per-group bound: the FIRST file crossing N in the walk
          // order carries the group's bound value — in desc order that
          // is the LARGEST walk key among crossing files (asc: the
          // smallest). Only classifiable files walk.
          val crossed = stClass
            .withColumn("_graft_cum", sum(nn).over(
              w.rowsBetween(W.unboundedPreceding, W.currentRow)))
            .filter(col("_graft_cum") >= m.n && nn > 0)
          val boundAgg =
            if (m.desc) fmax(walkKey)
            else org.apache.spark.sql.functions.min(walkKey)
          val bounds = crossed
            .groupBy(gCols: _*).agg(boundAgg.as("_graft_bound"))
          // Keep: files whose range can reach the group bound, every
          // file of an UNBOUNDED group (< N non-null rows — no bound
          // provable), null-carrying files when nulls rank first, and
          // every UNCLASSIFIABLE file (spans groups / holds the NULL
          // group).
          val joined = stClass.join(bounds,
            groupStatCols.map(_.get), "left")
          val reach =
            if (m.desc) mx >= col("_graft_bound")
            else mn <= col("_graft_bound")
          val keepPred = col("_graft_bound").isNull || reach ||
            (if (m.nullsFirst) col("cnt") > nn else lit(false))
          val unclassified =
            if (dataClassPreds.isEmpty) Array.empty[String]
            else stSel.filter(!classifiable || classifiable.isNull)
              .select("file").collect().map(_.getString(0))
          val files = (joined.filter(keepPred).select("file")
            .collect().map(_.getString(0)) ++ unclassified).toSeq
          if (files.length >= total) None
          else {
            val paths = files.map(abs =>
              new org.apache.hadoop.fs.Path(new java.net.URI(abs)))
            val partSchema =
              Option(m.fsRel.partitionSchema).filter(_.nonEmpty)
            val pruned = new InMemoryFileIndex(
              spark, paths, Map("basePath" -> m.root), partSchema)
            logInfo(s"group-top-k rewrite: ${m.root} scan pruned to " +
              s"${files.length} of $total files for rank ≤ ${m.n} per " +
              s"(${m.groupCols.mkString(", ")}) by ${m.sortCol} " +
              (if (m.desc) "DESC" else "ASC"))
            Some(m.f.transformUp {
              case l: LogicalRelation if l eq m.lr =>
                l.copy(relation = m.fsRel.copy(location = pruned)(spark))
            })
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }
}
