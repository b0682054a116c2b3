package graft.plans

import java.util.Locale

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{approx_count_distinct, col, count, expr, lit, xxhash64}

import graft.functions.KmvDistinct.kmvDistinct
import graft.table.MaterializedView
import graft.table.MaterializedView.MvDef

/** Workload-driven MV recommendation — the serving-layer design loop
  * automated: given the queries a user actually runs, propose the ONE
  * rollup per base table that serves all of them (union of their
  * dimension and measure needs), sized so the rewrite rule
  * ([[MvAggregateRewrite]]) fires on every analyzed query.
  *
  * Analysis walks each query's ANALYZED plan with the same shape matcher
  * the rule uses ([[MvPlanShape]]) — an advisor that matched more than
  * the rule serves would recommend rollups that never fire. Scope: flat
  * parquet bases and STAR JOINS (one fact inner-equi-joined with
  * dimension relations — queries merge into one recommendation only
  * when their join structure is identical), measures the rule derives
  * (sum/min/max/count/avg), groupings and filter sides that are plain
  * columns or deterministic derived expressions (recorded as expression
  * dims). Queries outside that scope (windows, snowflakes, distinct
  * aggregates) are reported in `skipped`, not silently dropped — they
  * keep running against the base.
  */
object MvAdvisor {

  /** One recommended rollup: every field feeds
    * [[MaterializedView.create]] directly (measure/dim SQL is the same
    * normalized rendering the registry stores).
    */
  final case class Recommendation(
      basePath: String,
      groupCols: Seq[String],
      exprDims: Seq[(String, String)], // mv col -> normalized base sql
      sums: Seq[(String, String)],
      mins: Seq[(String, String)],
      maxs: Seq[(String, String)],
      counts: Seq[(String, String)],
      queriesCovered: Int,
      // Star workloads: the dimension links (dimPath, factCol, dimCol);
      // empty = flat base. Queries merge into one recommendation only
      // when their join structure is identical.
      joins: Seq[(String, String, String)] = Nil)

  final case class Advice(
      recommendations: Seq[Recommendation],
      skipped: Seq[String]) // human-readable reasons, one per skipped query

  private def lower(s: String): String = s.toLowerCase(Locale.ROOT)

  /** Per-query shape; merged per (base, join structure) in [[analyze]]. */
  private final case class Shape(
      basePath: String,
      dims: Set[String],
      exprDims: Set[String],
      sums: Set[String],
      mins: Set[String],
      maxs: Set[String],
      counts: Set[String],
      joins: Seq[(String, String, String)])

  private def shapeOf(df: DataFrame): Either[String, Shape] = {
    val aggs = df.queryExecution.analyzed.collect { case a: Aggregate => a }
    val agg = aggs match {
      case Seq(one) => one
      case Seq() => return scala.Left("no aggregate in plan")
      case _ => return scala.Left("multiple aggregates in plan (subqueries)")
    }
    val conds = mutable.Buffer.empty[(Expression, Int)]
    val windows = mutable.Buffer.empty[
      org.apache.spark.sql.catalyst.plans.logical.Window]
    val renames = mutable.Map.empty[ExprId, Expression]
    val rels = mutable.Buffer.empty[LogicalRelation]
    val pairs = mutable.Buffer.empty[(Attribute, Attribute)]
    if (!MvPlanShape.strip(agg.child, conds, windows, renames, rels, pairs))
      return scala.Left("plan shape outside the rewrite's matcher")
    if (windows.nonEmpty)
      return scala.Left("windows not in advisor scope")
    if (rels.isEmpty || (rels.length == 1) != pairs.isEmpty)
      return scala.Left("unmatched join/relation structure")
    def rootOf(lr: LogicalRelation): Either[String, String] =
      lr.relation match {
        case f: HadoopFsRelation => f.location.rootPaths match {
          case Seq(one) => scala.Right(one.toString)
          case _ => scala.Left("multi-root scan")
        }
        case _ => scala.Left("non-filesystem relation")
      }
    val subst = MvPlanShape.substFn(renames)
    def substAttr(a: Attribute): Option[Attribute] = subst(a) match {
      case ar: Attribute => Some(ar)
      case _ => None
    }

    // Star detection: one fact participating in EVERY pair, each other
    // relation a dimension in exactly one pair — the shape createJoined
    // builds and the rewrite's candidateJoined matches.
    val (root, joins) =
      if (rels.length == 1) {
        rootOf(rels.head) match {
          case scala.Right(r) => (r, Nil)
          case scala.Left(e) => return scala.Left(e)
        }
      } else {
        val owner: Map[ExprId, LogicalRelation] =
          rels.flatMap(lr => lr.output.map(_.exprId -> lr)).toMap
        val sides = pairs.toSeq.map { case (a, b) =>
          (for {
            x <- substAttr(a); y <- substAttr(b)
            rx <- owner.get(x.exprId); ry <- owner.get(y.exprId)
          } yield ((x, rx), (y, ry))) match {
            case Some(s) => s
            case None => return scala.Left("join key is not a plain column")
          }
        }
        val byRel = sides.flatMap(s => Seq(s._1._2, s._2._2))
          .groupBy(identity).view.mapValues(_.length).toMap
        val fact = rels.find(r => byRel.getOrElse(r, 0) == pairs.length)
          .getOrElse(return scala.Left("not a star join (no common fact)"))
        val dimRels = rels.filterNot(_ eq fact)
        if (dimRels.exists(r => byRel.getOrElse(r, 0) != 1))
          return scala.Left("not a star join (dim in several conditions)")
        val links = sides.map { case ((x, rx), (y, ry)) =>
          val (fa, da, dr) =
            if (rx eq fact) (x, y, ry)
            else if (ry eq fact) (y, x, rx)
            else return scala.Left("not a star join (dim-dim condition)")
          rootOf(dr) match {
            case scala.Right(dp) => (dp, lower(fa.name), lower(da.name))
            case scala.Left(e) => return scala.Left(e)
          }
        }.sortBy(identity)
        rootOf(fact) match {
          case scala.Right(r) => (r, links)
          case scala.Left(e) => return scala.Left(e)
        }
      }
    def norm(e: Expression): String = MaterializedView.normalize(subst(e))

    val dims = mutable.Set.empty[String]
    val edims = mutable.Set.empty[String]
    def addDimExpr(e: Expression): Either[String, Unit] = subst(e) match {
      case a: Attribute => dims += lower(a.name); scala.Right(())
      case d if d.deterministic && d.references.nonEmpty =>
        edims += MaterializedView.normalize(d); scala.Right(())
      case _ => scala.Left(s"non-deterministic dimension expression: ${e.sql}")
    }
    agg.groupingExpressions.foreach { g =>
      addDimExpr(g) match { case scala.Left(r) => return scala.Left(r); case _ => () }
    }
    // Filter sides: a comparison against literals dimensionalizes its
    // non-literal side; anything else dimensionalizes its referenced
    // columns (conservative — a wider rollup, never a non-serving one).
    conds.map(_._1).flatMap(MvPlanShape.splitConjunction).foreach { c =>
      if (!c.deterministic) return scala.Left(s"non-deterministic filter: ${c.sql}")
      val sides: Seq[Expression] = c match {
        case b: BinaryComparison if b.right.foldable => Seq(b.left)
        case b: BinaryComparison if b.left.foldable => Seq(b.right)
        case In(v, list) if list.forall(_.foldable) => Seq(v)
        case IsNotNull(e) => Seq(e)
        case IsNull(e) => Seq(e)
        case other => other.references.toSeq
      }
      sides.foreach { s =>
        addDimExpr(s) match { case scala.Left(r) => return scala.Left(r); case _ => () }
      }
    }

    val sums = mutable.Set.empty[String]
    val mins = mutable.Set.empty[String]
    val maxs = mutable.Set.empty[String]
    val counts = mutable.Set.empty[String]
    val aggCalls = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    aggCalls.foreach { ae =>
      if (ae.isDistinct || ae.filter.isDefined)
        return scala.Left(s"underivable aggregate: ${ae.sql}")
      ae.aggregateFunction match {
        case Sum(inner, _) => sums += norm(inner)
        case Min(inner) => mins += norm(inner)
        case Max(inner) => maxs += norm(inner)
        case c: Count if c.children.forall(e => e.foldable && e.eval() != null) =>
          () // served by the always-included row count
        case Count(Seq(inner)) if !inner.foldable => counts += norm(inner)
        case Average(inner, _) =>
          sums += norm(inner); counts += norm(inner)
        case other => return scala.Left(s"underivable aggregate: ${other.sql}")
      }
    }
    scala.Right(Shape(root, dims.toSet, edims.toSet,
      sums.toSet, mins.toSet, maxs.toSet, counts.toSet, joins))
  }

  /** Short deterministic column name for a measure/dim SQL rendering. */
  private def colName(prefix: String, sql: String, taken: mutable.Set[String]): String = {
    val stem = lower(sql).filter(_.isLetterOrDigit).take(16)
    var name = s"${prefix}_$stem"
    var i = 1
    while (taken.contains(name)) { name = s"${prefix}_${stem}_$i"; i += 1 }
    taken += name
    name
  }

  private def collectShapes(
      queries: Seq[DataFrame]): (Seq[Shape], Seq[String]) = {
    val shapes = mutable.Buffer.empty[Shape]
    val skipped = mutable.Buffer.empty[String]
    queries.zipWithIndex.foreach { case (q, i) =>
      // shapeOf normalizes (which eval()s foldable subtrees) — a workload
      // query whose foldable expression throws at evaluation must land in
      // `skipped`, not abort the analysis of every other query.
      (try shapeOf(q)
      catch {
        case scala.util.control.NonFatal(e) =>
          scala.Left(s"analysis failed: ${e.getMessage}")
      }) match {
        case scala.Right(s) => shapes += s
        case scala.Left(reason) => skipped += s"query $i: $reason"
      }
    }
    (shapes.toSeq, skipped.toSeq)
  }

  /** Merge one group of shapes (same base + join structure) into a
    * single recommendation.
    */
  private def recommend(
      base: String, joins: Seq[(String, String, String)],
      ss: Seq[Shape]): Recommendation = {
    val taken = mutable.Set.empty[String]
    def named(prefix: String, sqls: Set[String]): Seq[(String, String)] =
      sqls.toSeq.sorted.map(s => colName(prefix, s, taken) -> s)
    Recommendation(
      base,
      ss.flatMap(_.dims).distinct.sorted.toSeq,
      named("d", ss.flatMap(_.exprDims).toSet),
      named("sum", ss.flatMap(_.sums).toSet),
      named("min", ss.flatMap(_.mins).toSet),
      named("max", ss.flatMap(_.maxs).toSet),
      named("cnt", ss.flatMap(_.counts).toSet),
      ss.length,
      joins)
  }

  def analyze(queries: Seq[DataFrame]): Advice = {
    val (shapes, skipped) = collectShapes(queries)
    val recs = shapes.groupBy(s => (s.basePath, s.joins)).toSeq
      .sortBy { case ((base, joins), _) => (base, joins.mkString("|")) }
      .map { case ((base, joins), ss) => recommend(base, joins, ss.toSeq) }
    Advice(recs, skipped)
  }

  // ---- cost model ------------------------------------------------------

  /** One recommendation with its MEASURED serving cost: the estimated
    * distinct dim-tuple count of its rollup (KMV sketch over the base)
    * against the base row count. `estRollupRows = -1` means the group
    * could not be costed (the recommendation still serves).
    */
  final case class Costed(
      rec: Recommendation, baseRows: Long, estRollupRows: Long) {
    /** Rollup/base size ratio — near 1 means the dim union nearly keys
      * the table and the rollup would hardly compress. NaN when the
      * group could not be costed: "unknown" must never read as "free"
      * to a caller sorting or thresholding on the ratio (NaN compares
      * false against every threshold, and sorts last under
      * Ordering.Double.TotalOrdering's descending sort).
      */
    def ratio: Double =
      if (baseRows <= 0 || estRollupRows < 0) Double.NaN
      else estRollupRows.toDouble / baseRows
  }

  final case class CostedAdvice(
      recommendations: Seq[Costed], skipped: Seq[String])

  private val KmvK = 1024 // exact below 1024 groups, ~3% beyond — a size gate

  /** Partition-count ceiling for advised-rollup hive layout (see
    * [[createRecommended]]): above it, a partitioned rollup costs more
    * in directory listings and tiny files than it saves in pruning.
    */
  private val MaxLeadPartitions = 256L

  /** The frame a group's rollup would aggregate: flat scan or star join. */
  private def baseFrame(
      spark: SparkSession, base: String,
      joins: Seq[(String, String, String)]): DataFrame =
    joins.foldLeft(spark.read.parquet(base)) { case (acc, (dp, fc, dc)) =>
      acc.join(spark.read.parquet(dp), col(fc) === col(dc), "inner")
    }

  private def dimTuple(ss: Seq[Shape]): Column =
    xxhash64(
      (ss.flatMap(_.dims).distinct.sorted.map(col) ++
        ss.flatMap(_.exprDims).distinct.sorted.map(expr)): _*)

  /** [[analyze]], plus a measured cost gate: one aggregate pass over each
    * group's base estimates the base row count, the merged dim-union's
    * distinct tuple count, and each member query's own — all as KMV
    * sketches riding one scan (k longs per partition per sketch, never a
    * distinct shuffle). A group whose union rollup would exceed
    * `maxRatio · baseRows` is SPLIT: shapes are greedily binned largest-
    * first, a bin accepting a shape while the sum of member estimates (a
    * valid upper bound on the union) stays inside the budget; each bin
    * becomes its own recommendation and its ACTUAL union is re-measured
    * in a second pass, so the reported ratio is a measurement, not the
    * greedy bound. A single query whose own dims nearly key the table
    * still gets a (flagged-by-ratio) bin — its queries need those dims;
    * the operator decides. At 100 TB this is the difference between a
    * serving layer that compresses and one that silently re-materializes
    * the fact table because two unrelated dashboards shared an advisor
    * run.
    */
  def analyzeCosted(
      spark: SparkSession,
      queries: Seq[DataFrame],
      maxRatio: Double = 0.5): CostedAdvice = {
    require(maxRatio > 0, "maxRatio must be positive")
    val (shapes, skipped) = collectShapes(queries)
    val costed = shapes.groupBy(s => (s.basePath, s.joins)).toSeq
      .sortBy { case ((base, joins), _) => (base, joins.mkString("|")) }
      .flatMap { case ((base, joins), ssB) =>
        val ss = ssB.toSeq
        try {
          val frame = baseFrame(spark, base, joins)
          val aggCols =
            count(lit(1)).as("n") +:
            kmvDistinct(dimTuple(ss), KmvK).as("u") +:
            ss.indices.map(i =>
              kmvDistinct(dimTuple(Seq(ss(i))), KmvK).as(s"s$i"))
          val row = frame.agg(aggCols.head, aggCols.tail: _*).collect()(0)
          val n = row.getLong(0)
          val u = row.getLong(1)
          if (n == 0 || u.toDouble / n <= maxRatio)
            Seq(Costed(recommend(base, joins, ss), n, u))
          else {
            val est = ss.indices.map(i => row.getLong(2 + i))
            val budget = (maxRatio * n).toLong
            val bins = mutable.Buffer.empty[(mutable.Buffer[Int], Long)]
            ss.indices.sortBy(i => -est(i)).foreach { i =>
              bins.indexWhere(_._2 + est(i) <= budget) match {
                case -1 => bins += ((mutable.Buffer(i), est(i)))
                case j =>
                  val (members, tot) = bins(j)
                  members += i
                  bins(j) = (members, tot + est(i))
              }
            }
            val binCols = bins.toSeq.zipWithIndex.map { case ((m, _), j) =>
              kmvDistinct(dimTuple(m.toSeq.map(ss)), KmvK).as(s"b$j")
            }
            val row2 = frame.agg(binCols.head, binCols.tail: _*).collect()(0)
            bins.toSeq.zipWithIndex.map { case ((m, _), j) =>
              Costed(
                recommend(base, joins, m.toSeq.map(ss)), n, row2.getLong(j))
            }
          }
        } catch {
          // A dim rendering that does not parse back, a vanished file —
          // the cost gate is an optimization; the recommendation stands.
          case scala.util.control.NonFatal(_) =>
            Seq(Costed(recommend(base, joins, ss), -1L, -1L))
        }
      }
    CostedAdvice(costed, skipped)
  }

  /** Materialize one recommendation (flat or star base; the row count is
    * always stored — count(*) queries and future incremental paths need
    * it).
    */
  def createRecommended(
      spark: SparkSession,
      rec: Recommendation,
      name: String,
      mvPath: String): MvDef = {
    def cols(xs: Seq[(String, String)]): Seq[(String, Column)] =
      xs.map { case (c, sql) => c -> expr(sql) }
    if (rec.joins.isEmpty) {
      // Advised rollups partition-prune out of the box: persist
      // hive-partitioned by the leading plain dim (the q144 machinery),
      // so a dim-filtered serve opens only its partition dirs. A dim
      // whose values don't round-trip through a directory name
      // (type-inferring "01", value-normalizing "") is refused by
      // create's round-trip check — fall back to flat storage rather
      // than fail the recommendation.
      def flatCreate(partCols: Seq[String]) = MaterializedView.create(
        spark, name, rec.basePath, mvPath,
        groupCols = rec.groupCols,
        sums = cols(rec.sums),
        mins = cols(rec.mins),
        maxs = cols(rec.maxs),
        countCol = Some("cnt"),
        counts = cols(rec.counts),
        exprDims = cols(rec.exprDims),
        partitionBy = partCols)
      rec.groupCols.headOption match {
        case Some(lead) =>
          // Partitioning is a prune win only while the dim stays
          // dir-countable: a near-key dim (the split-bin case) would
          // explode into thousands of tiny hive dirs — at scale that
          // trades one scan for a listing problem. One column-pruned
          // sketch pass gates it (create scans the base anyway).
          val nLead = spark.read.parquet(rec.basePath)
            .agg(approx_count_distinct(col(lead)).as("n"))
            .collect()(0).getLong(0)
          if (nLead > MaxLeadPartitions) flatCreate(Nil)
          else
            try flatCreate(Seq(lead))
            catch { case _: IllegalArgumentException => flatCreate(Nil) }
        case None => flatCreate(Nil)
      }
    } else
      MaterializedView.createJoined(
        spark, name, rec.basePath, mvPath,
        joins = rec.joins,
        groupCols = rec.groupCols,
        sums = cols(rec.sums),
        mins = cols(rec.mins),
        maxs = cols(rec.maxs),
        countCol = Some("cnt"),
        counts = cols(rec.counts),
        exprDims = cols(rec.exprDims))
  }
}
