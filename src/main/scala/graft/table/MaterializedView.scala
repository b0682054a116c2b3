package graft.table

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression}
import org.apache.spark.sql.functions._

/** Aggregate materialized views with automatic query rewrite — the
  * "summary table" half of a lakehouse serving layer. `create` computes
  * and persists a grouped rollup of a parquet base table; the optimizer
  * rule [[graft.plans.MvAggregateRewrite]] (installed by
  * `GraftExtensions`) then rewrites any matching aggregate over the BASE
  * table onto the rollup. At 100 TB the rewrite is the difference between
  * scanning the fact table and scanning a few thousand summary rows —
  * the same contract as Hive/BigQuery/Materialize MV rewrite, expressed
  * as a Catalyst `Rule[LogicalPlan]`.
  *
  * Rewrite safety model:
  *   - DERIVABILITY — a query aggregate is rewritten only when its exact
  *     input expression is registered: `sum(e)` → `sum(sum_e)` (re-sum of
  *     partial sums), `count(*)`/`count(1)` → `coalesce(sum(cnt), 0)`,
  *     `min(e)`/`max(e)` → `min(min_e)`/`max(max_e)`. Matching is by the
  *     NORMALIZED SQL rendering of the resolved input expression, so
  *     `sum(CAST(l_quantity AS DECIMAL(18,4)))` matches only an MV that
  *     stored that very cast. Grouping and filter columns must be a
  *     subset of the MV's dimension columns (group-subset rollup is what
  *     partial re-aggregation makes legal). Anything else declines.
  *   - STALENESS — the registry remembers the base directory's
  *     modification time at build; the rule re-reads it (ONE file-status
  *     call, the same guard discipline as `GraftCatalog.replayIfStale`)
  *     and declines when the base has changed since. A stale MV is never
  *     consulted silently.
  *   - Registration is process-scoped (a `TrieMap` keyed by the base
  *     path), mirroring a session catalog's MV metadata; `drop` removes.
  */
object MaterializedView {

  /** Identity signature of one base data file: length + modification
    * time. Both must match for a file to count as "unchanged" — size
    * alone is blind to an in-place rewrite that happens to land on the
    * same byte count (same blind spot a dir mtime has for child-content
    * changes).
    */
  final case class FileSig(len: Long, mtime: Long)

  final case class MvDef(
      name: String,
      basePath: String,
      mvPath: String,
      groupCols: Seq[String],
      sums: Map[String, String],   // normalized input sql → mv column
      mins: Map[String, String],
      maxs: Map[String, String],
      countCol: Option[String],
      baseMtime: Long,
      // Data-file inventory (name → length+mtime) of the base at build/
      // refresh — what [[refresh]] diffs to find appended files. Sums/
      // counts/mins/maxs are all append-mergeable, so "recorded ⊆
      // current, signatures equal" is exactly the condition under which
      // an incremental merge is sound; anything else (delete, rewrite —
      // including a same-size in-place rewrite, which the mtime half
      // catches) falls back to rebuild.
      files: Map[String, FileSig] = Map.empty,
      // Filesystem-qualified rendering of basePath, computed ONCE at
      // registration so the rewrite rule's per-Aggregate path match is a
      // string compare — no Hadoop conf/FileSystem allocation per plan
      // node.
      qualifiedBase: String = "")

  private val registry = TrieMap.empty[String, MvDef]

  def isEmpty: Boolean = registry.isEmpty
  def all: Iterable[MvDef] = registry.values
  def lookup(basePath: String): Option[MvDef] = registry.get(basePath)
  def drop(basePath: String): Unit = registry.remove(basePath)

  /** Normalized rendering of a resolved expression: attribute references
    * collapse to their bare lowercase name, so plan-side and
    * registration-side renderings compare equal regardless of exprIds or
    * qualifiers.
    */
  def normalize(e: Expression): String = e.transform {
    case a: Attribute =>
      AttributeReference(a.name.toLowerCase(java.util.Locale.ROOT), a.dataType,
        a.nullable)()
  }.sql

  /** Filesystem-qualified rendering of a path (scheme + authority). */
  def qualify(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(p).toString
  }

  /** Resolve a measure input Column against the base and return its
    * normalized-SQL registry key — validating at CREATE time that the
    * rendering survives the round trip the lifecycle depends on:
    * [[refresh]] reconstructs the measure via `expr(normalizedSql)` from
    * the sidecar, so an expression whose `.sql` does not parse back (or
    * resolves to something else) must fail HERE with a clear message, not
    * at first refresh.
    */
  private def measureKey(base: DataFrame, c: Column): String = {
    def resolvedSql(col: Column): String = {
      val analyzed = base.select(col).queryExecution.analyzed
      normalize(analyzed.expressions.head match {
        case a: Alias => a.child
        case e => e
      })
    }
    val sql = resolvedSql(c)
    val back =
      try resolvedSql(expr(sql))
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(
            s"MV measure input renders as `$sql`, which does not parse/" +
              "resolve back against the base — refresh could never " +
              "reconstruct it. Use an expression with a stable SQL " +
              s"rendering. (${e.getMessage})", e)
      }
    require(back == sql,
      s"MV measure input is not round-trip stable: `$sql` re-resolves as " +
        s"`$back`; refresh would compute a different measure than create")
    sql
  }

  /** Directory modification time of the base — bumped by any file
    * create/delete on local and HDFS schemes; one status call.
    */
  def baseMtime(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .getFileStatus(p).getModificationTime
  }

  /** Data-file inventory of the base (name → length); `_`/`.`-prefixed
    * entries (sidecars, _SUCCESS, staging) excluded. A single-file base
    * (the fixture layout) inventories itself.
    */
  private def listDataFiles(
      spark: SparkSession, path: String): Map[String, FileSig] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val st = fs.getFileStatus(p)
    if (st.isFile) Map(p.getName -> FileSig(st.getLen, st.getModificationTime))
    else {
      val entries = fs.listStatus(p).toSeq
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
      // FLAT bases only (what the fixtures ship and what create() itself
      // writes): a hive-partitioned base hides subdirectory changes from
      // both the root-mtime staleness guard and this inventory, which
      // would make the rewrite serve stale answers SILENTLY. Refusing at
      // registration turns the blind spot into an explicit unsupported
      // case (partitioned bases want KeyedTable's commit timeline as the
      // change signal, not directory stats).
      val dirs = entries.filter(_.isDirectory)
      require(dirs.isEmpty,
        s"MaterializedView supports flat parquet bases only; $path has " +
          s"subdirectories ${dirs.map(_.getPath.getName).take(3).mkString(",")}")
      entries.filter(_.isFile)
        .map(s => s.getPath.getName -> FileSig(s.getLen, s.getModificationTime))
        .toMap
    }
  }

  /** Compute, persist, and register the rollup. `sums`/`mins`/`maxs` map
    * MV column name → input Column over the base; `countCol` stores
    * `count(1)`.
    */
  def create(
      spark: SparkSession,
      name: String,
      basePath: String,
      mvPath: String,
      groupCols: Seq[String],
      sums: Seq[(String, Column)] = Nil,
      mins: Seq[(String, Column)] = Nil,
      maxs: Seq[(String, Column)] = Nil,
      countCol: Option[String] = None): MvDef = {
    val base = spark.read.parquet(basePath)
    // Resolve + round-trip-validate every measure key BEFORE any write,
    // so an unsupported measure expression fails eagerly and leaves
    // nothing behind.
    val sumKeys = sums.map { case (n, c) => measureKey(base, c) -> n }.toMap
    val minKeys = mins.map { case (n, c) => measureKey(base, c) -> n }.toMap
    val maxKeys = maxs.map { case (n, c) => measureKey(base, c) -> n }.toMap
    val aggCols =
      sums.map { case (n, c) => sum(c).as(n) } ++
      mins.map { case (n, c) => min(c).as(n) } ++
      maxs.map { case (n, c) => max(c).as(n) } ++
      countCol.map(n => count(lit(1)).as(n)).toSeq
    require(aggCols.nonEmpty, "an MV needs at least one measure")
    require(name.nonEmpty && groupCols.nonEmpty,
      "an MV needs a name and at least one dimension column " +
        "(the sidecar format has no empty-field encoding)")
    base.groupBy(groupCols.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .write.mode("overwrite").parquet(mvPath)
    val d = MvDef(
      name, basePath, mvPath, groupCols,
      sumKeys, minKeys, maxKeys,
      countCol,
      baseMtime(spark, basePath),
      listDataFiles(spark, basePath),
      qualify(spark, basePath))
    writeSidecar(spark, d)
    registry.put(basePath, d)
    d
  }

  /** Bring a stale rollup current. Append-only change (every recorded
    * file still present with its recorded size) → aggregate ONLY the
    * appended files and merge: sums/counts add, mins/maxs take
    * least/greatest — per-group cost scales with the DELTA, not the
    * base. Any other change (delete, rewrite-in-place) → full rebuild,
    * announced via the returned `incremental` flag. Either way the
    * sidecar and registry re-arm with the new mtime + inventory, so
    * [[graft.plans.MvAggregateRewrite]] serves again.
    */
  def refresh(spark: SparkSession, mvPath: String): (MvDef, Boolean) = {
    val d = attach(spark, mvPath) // sidecar is the source of truth
    val current = listDataFiles(spark, d.basePath)
    val appendOnly = d.files.nonEmpty &&
      d.files.forall { case (n, sig) => current.get(n).contains(sig) }
    val delta = current.keySet -- d.files.keySet
    val dims = d.groupCols
    def aggOf(df: DataFrame): DataFrame = {
      val aggCols =
        d.sums.map { case (sql, c) => sum(expr(sql)).as(c) }.toSeq ++
        d.mins.map { case (sql, c) => min(expr(sql)).as(c) }.toSeq ++
        d.maxs.map { case (sql, c) => max(expr(sql)).as(c) }.toSeq ++
        d.countCol.map(c => count(lit(1)).as(c)).toSeq
      df.groupBy(dims.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    }
    val merged =
      if (appendOnly && delta.isEmpty) None // mtime-only change: re-arm
      else if (appendOnly) {
        val deltaAgg = aggOf(spark.read.parquet(
          delta.toSeq.map(n => s"${d.basePath}/$n"): _*))
        val old = spark.read.parquet(mvPath)
        // Full-outer on dims: groups new to the delta appear, untouched
        // groups pass through, shared groups merge measure-wise.
        val on = dims.map(c => old(c) <=> deltaAgg(c)).reduce(_ && _)
        val dimCols = dims.map(c => coalesce(old(c), deltaAgg(c)).as(c))
        val oldTypes = old.schema.fields.map(f => f.name -> f.dataType).toMap
        // coalesce(a+b, a, b): a group absent on one side passes through,
        // present-on-both adds — and an all-NULL-input sum STAYS NULL
        // (coalescing to 0 here would diverge from what a direct
        // aggregate or a fresh rebuild returns). The cast pins the sum
        // column's decimal precision across refreshes (addition widens
        // by one digit per merge otherwise).
        val measureCols =
          d.sums.values.toSeq.map(c =>
            coalesce(old(c) + deltaAgg(c), old(c), deltaAgg(c))
              .cast(oldTypes(c)).as(c)) ++
          d.mins.values.toSeq.map(c =>
            coalesce(least(old(c), deltaAgg(c)), old(c), deltaAgg(c)).as(c)) ++
          d.maxs.values.toSeq.map(c =>
            coalesce(greatest(old(c), deltaAgg(c)), old(c), deltaAgg(c)).as(c)) ++
          d.countCol.toSeq.map(c =>
            coalesce(old(c) + deltaAgg(c), old(c), deltaAgg(c)).as(c))
        Some(old.join(deltaAgg, on, "full_outer")
          .select(dimCols ++ measureCols: _*))
      } else Some(aggOf(spark.read.parquet(d.basePath)))
    val d2 = d.copy(
      baseMtime = baseMtime(spark, d.basePath),
      files = current)
    merged match {
      case Some(m) =>
        // Stage the new rollup WITH its sidecar, then swap. A crash after
        // the delete leaves a complete staged copy one rename away; a
        // crash after the rename leaves a complete rollup + sidecar (no
        // window where the data exists but attach() cannot read it).
        // Single-writer dev flow; multi-writer would ride KeyedTable's
        // FS lock.
        val staged = mvPath + "_refresh_tmp"
        m.write.mode("overwrite").parquet(staged)
        writeSidecar(spark, d2.copy(mvPath = staged))
        val p = new Path(mvPath)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(p, true)
        fs.rename(new Path(staged), p)
      case None =>
        writeSidecar(spark, d2) // mtime-only re-arm
    }
    registry.put(d2.basePath, d2)
    (d2, appendOnly)
  }

  // -------------------------------------------------------------------
  // Persistence: the definition travels WITH the rollup as a `_graft_mv`
  // sidecar (underscore-prefixed → invisible to parquet listing), the
  // same travels-with-the-data discipline as KeyedTable's `_graft_*`
  // sidecars and GraftCatalog's registry. A fresh session `attach`es the
  // rollup path and gets rewrites without re-running create — the
  // metadata half a metastore would hold.
  // -------------------------------------------------------------------

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def sidecarPath(mvPath: String) = new Path(mvPath, "_graft_mv")

  private def writeSidecar(spark: SparkSession, d: MvDef): Unit = {
    val lines = Seq(
      s"name\t${enc(d.name)}",
      s"base\t${enc(d.basePath)}",
      s"mtime\t${d.baseMtime}",
      s"dims\t${d.groupCols.map(enc).mkString(",")}") ++
      d.sums.map { case (sql, c) => s"sum\t${enc(c)}\t${enc(sql)}" } ++
      d.mins.map { case (sql, c) => s"min\t${enc(c)}\t${enc(sql)}" } ++
      d.maxs.map { case (sql, c) => s"max\t${enc(c)}\t${enc(sql)}" } ++
      d.countCol.map(c => s"count\t${enc(c)}").toSeq ++
      d.files.toSeq.sortBy(_._1)
        .map { case (n, sig) => s"file\t${enc(n)}\t${sig.len}\t${sig.mtime}" }
    val p = sidecarPath(d.mvPath)
    val out = p.getFileSystem(spark.sessionState.newHadoopConf())
      .create(p, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Register the rollup at `mvPath` from its sidecar (fresh-session
    * discovery). The recorded base mtime rides along, so a base modified
    * since the build still declines rewrites.
    */
  def attach(spark: SparkSession, mvPath: String): MvDef = {
    val p = sidecarPath(mvPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    var name = ""; var base = ""; var mtime = 0L
    var dims = Seq.empty[String]; var countCol: Option[String] = None
    val sums = Map.newBuilder[String, String]
    val mins = Map.newBuilder[String, String]
    val maxs = Map.newBuilder[String, String]
    val files = Map.newBuilder[String, FileSig]
    text.split('\n').filter(_.nonEmpty).foreach { line =>
      line.split('\t') match {
        case Array("name", v) => name = dec(v)
        case Array("base", v) => base = dec(v)
        case Array("mtime", v) => mtime = v.toLong
        case Array("dims", v) => dims = v.split(',').toSeq.map(dec)
        case Array("sum", c, sql) => sums += dec(sql) -> dec(c)
        case Array("min", c, sql) => mins += dec(sql) -> dec(c)
        case Array("max", c, sql) => maxs += dec(sql) -> dec(c)
        case Array("count", c) => countCol = Some(dec(c))
        case Array("file", n, len, mt) =>
          files += dec(n) -> FileSig(len.toLong, mt.toLong)
        case Array("file", n, len) =>
          // Pre-mtime sidecar: an impossible signature, so the first
          // refresh classifies the change as non-append and rebuilds —
          // the safe direction for a format upgrade.
          files += dec(n) -> FileSig(len.toLong, -1L)
        case other => throw new IllegalArgumentException(
          s"malformed _graft_mv line: ${other.mkString("\\t")}")
      }
    }
    require(base.nonEmpty && dims.nonEmpty, s"incomplete _graft_mv at $p")
    val d = MvDef(name, base, mvPath, dims,
      sums.result(), mins.result(), maxs.result(), countCol, mtime,
      files.result(), qualify(spark, base))
    registry.put(base, d)
    d
  }

  // ---------------------------------------------------------------------
  // q128: build a rollup over lineitem, then run a plain aggregate on the
  // BASE table — the rewrite rule must serve it from the rollup (the plan
  // assertion lives in MvRewriteSpec; the oracle computes the same
  // aggregate straight from lineitem, so correctness holds whichever
  // path planned).
  // ---------------------------------------------------------------------

  // Previous invocation's scratch rollup — deleted at the next call, so a
  // bench loop holds at most one live temp dir instead of one per rep.
  @volatile private var lastRevenueWork: Option[java.nio.file.Path] = None

  /** Open-order revenue by priority, served through a
    * (o_orderstatus, o_orderpriority) rollup of orders. The query groups
    * by a strict SUBSET of the dimensions with a dimension-only filter —
    * the rollup-then-re-aggregate shape MV rewrite exists for.
    *
    * Registry hygiene: the rewrite is PINNED — the plan is optimized once
    * while the MV is registered, the registration is dropped, and the
    * already-rewritten plan is re-wrapped. A process running many queries
    * (the bench main, the verify main) never has this MV capture a LATER
    * derivable aggregate over the same orders base, so other queries'
    * measured plans stay exactly what they'd be standalone.
    */
  def mvRewriteRevenue(spark: SparkSession, dir: String): DataFrame = {
    lastRevenueWork.foreach { p =>
      org.apache.commons.io.FileUtils.deleteQuietly(p.toFile); ()
    }
    val base = s"$dir/orders.parquet"
    val work = Files.createTempDirectory("graft_mv_")
    lastRevenueWork = Some(work)
    create(
      spark, "orders_by_status_priority", base, s"$work/mv",
      groupCols = Seq("o_orderstatus", "o_orderpriority"),
      sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
      countCol = Some("cnt"))
    try {
      val q = spark.read.parquet(base)
        .filter(col("o_orderstatus") === "O")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
            .as("sum_price"),
          count(lit(1)).as("n_orders"))
      // Optimize WITH the registry armed (the rewrite fires here), then
      // pin the rewritten plan; re-optimization at action time no-ops on
      // it (the aggregate now reads the rollup path, not a registered
      // base).
      org.apache.spark.sql.GraftSqlBridge.ofRows(
        spark, q.queryExecution.optimizedPlan)
    } finally drop(base)
  }
}
