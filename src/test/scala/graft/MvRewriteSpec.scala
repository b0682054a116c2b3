package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.table.MaterializedView

/** [[graft.plans.MvAggregateRewrite]]: a derivable aggregate over a
  * registered base must plan as a scan of the ROLLUP (not the base), give
  * the identical result, and decline on staleness or underivable shapes.
  */
class MvRewriteSpec extends SparkTestBase {

  private def scannedPaths(df: DataFrame): Seq[String] =
    graft.plans.PlanWalk.scannedFiles(df)

  private def userQuery(base: String): DataFrame =
    spark.read.parquet(base)
      .filter(col("o_orderstatus") === "O")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
          .as("sum_price"),
        count(lit(1)).as("n_orders"))

  private def rows(df: DataFrame): Set[(String, Double, Long)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

  // A private DIRECTORY-shaped copy of the single-file base (a dir of
  // part files is the at-scale layout anyway) so tests can mutate it.
  private def copyBase(): String = {
    val work = Files.createTempDirectory("graft_mvspec_")
    val dst = work.resolve("orders.parquet")
    Files.createDirectories(dst)
    Files.copy(Paths.get(sf0001, "orders.parquet"),
      dst.resolve("part-00000.snappy.parquet"),
      StandardCopyOption.COPY_ATTRIBUTES)
    dst.toString
  }

  test("derivable aggregate is served from the rollup, same result") {
    val base = copyBase()
    val expected = rows(userQuery(base)) // planned BEFORE registration
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    try {
      MaterializedView.create(
        spark, "spec_mv", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      val served = userQuery(base)
      val paths = scannedPaths(served)
      assert(paths.exists(_.contains("/mv")),
        s"expected a rollup scan, got: $paths")
      assert(!paths.exists(_.contains("orders.parquet")),
        s"base must not be scanned: $paths")
      assert(rows(served) == expected)
    } finally MaterializedView.drop(base)
  }

  test("append-stale MV serves HYBRID: rollup + delta files only, fresh answer") {
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    try {
      MaterializedView.create(
        spark, "spec_mv_stale", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      val beforeAppend = rows(userQuery(base)) // MV-served
      Thread.sleep(1100) // local-fs mtime can be second-granular
      // Append a new data file: the stored rollup alone no longer
      // matches — the rule serves rollup ∪ partial-rollup(delta) at
      // plan time (no refresh), reading ONLY the appended file from
      // the base.
      val existing = Files.list(Paths.get(base))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(existing, Paths.get(base, "part-extra.snappy.parquet"))
      val after = userQuery(base)
      val paths = scannedPaths(after)
      assert(paths.exists(_.contains("/mv")),
        s"hybrid serve must scan the rollup: $paths")
      assert(paths.exists(_.contains("part-extra")),
        s"hybrid serve must scan the appended delta file: $paths")
      assert(!paths.exists(p =>
        p.contains("part-00000") || p.endsWith("orders.parquet")),
        s"hybrid serve must NOT rescan the pre-rollup base files: $paths")
      // The answer is the FRESH one (doubled vs the stale rollup's).
      assert(rows(after) != beforeAppend)
      assert(rows(after) == directRows(base))
      // min/max and avg also hybrid-serve (append-only ⇒ sound).
      val mm = spark.read.parquet(base)
        .groupBy(col("o_orderstatus"))
        .agg(max(expr("CAST(o_totalprice AS DECIMAL(18,4))")).as("mx"))
      // (max not stored on this MV → declines to base; the point is it
      // stays CORRECT, not that every aggregate is served)
      assert(mm.collect().nonEmpty)
      // A NON-append change (in-place modify) still declines.
      Thread.sleep(1100)
      java.nio.file.Files.setLastModifiedTime(
        Paths.get(base).resolve("part-00000.snappy.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      val declined = userQuery(base)
      assert(scannedPaths(declined).exists(_.endsWith("orders.parquet")),
        "a modified base file is not append-shaped: decline to the base")
      assert(rows(declined) == directRows(base))
    } finally MaterializedView.drop(base)
  }

  test("single-phase GROUP BY ROLLUP/CUBE serves from the rollup (Expand rewrite)") {
    val base = copyBase()
    def qRollup = spark.read.parquet(base)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double").as("p"))
    def qCube = spark.read.parquet(base)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    def qGid = spark.read.parquet(base)
      .rollup(col("o_orderstatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
    def qFiltered = spark.read.parquet(base)
      .filter(col("o_orderstatus") === "O")
      .rollup(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    def rset(df: DataFrame) = df.collect().map { r =>
      (0 until r.length).map(i => if (r.isNullAt(i)) None else Some(r.get(i)))
    }.toSet
    val (expR, expC, expG, expF) =
      (rset(qRollup), rset(qCube), rset(qGid), rset(qFiltered))
    val mvPath = Files.createTempDirectory("graft_mv_gs_").toString + "/mv"
    try {
      MaterializedView.create(
        spark, "spec_mv_gs", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      for ((q, exp, what) <- Seq(
        (qRollup, expR, "rollup"), (qCube, expC, "cube"),
        (qGid, expG, "grouping_id"), (qFiltered, expF, "filtered"))) {
        val paths = scannedPaths(q)
        assert(paths.exists(_.contains("/mv")),
          s"$what: expected a rollup scan, got: $paths")
        assert(!paths.exists(_.contains("orders.parquet")),
          s"$what: base must not be scanned under the SINGLE-PHASE shape: $paths")
        assert(rset(q) == exp, s"$what: served answer drifted")
      }
      // Decline: a measure the rollup does not store stays on the base.
      val qBad = spark.read.parquet(base)
        .rollup(col("o_orderstatus"))
        .agg(sum(col("o_orderkey")).as("s"))
      assert(scannedPaths(qBad).exists(_.contains("orders.parquet")),
        "an underivable grouping-sets measure must decline to the base")
    } finally MaterializedView.drop(base)
  }

  test("partitioned rollup: dim-filtered serves partition-prune the MV scan") {
    val base = copyBase()
    val expected = rows(userQuery(base))
    val mvPath = Files.createTempDirectory("graft_mv_part_").toString + "/mv"
    try {
      MaterializedView.create(
        spark, "spec_mv_part", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"),
        partitionBy = Seq("o_orderstatus"))
      val served = userQuery(base) // filter o_orderstatus = 'O'
      val found = scala.collection.mutable.Buffer
        .empty[org.apache.spark.sql.execution.FileSourceScanExec]
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            found += f; ()
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case _ =>
        }
        p.children.foreach(walk)
      }
      walk(served.queryExecution.executedPlan)
      val scans = found.filter(
        _.relation.location.rootPaths.exists(_.toString.contains("/mv")))
      assert(scans.nonEmpty, "expected the rollup scan")
      assert(scans.forall(_.partitionFilters.nonEmpty),
        s"the dim filter must partition-prune the rollup scan: " +
          scans.map(_.partitionFilters).mkString("; "))
      assert(rows(served) == expected)
      // Round-trip survives a refresh (the merged rollup re-partitions).
      val (d, inc) = MaterializedView.refresh(spark, mvPath)
      assert(d.partCols == Seq("o_orderstatus") && inc)
      assert(rows(userQuery(base)) == expected)
    } finally MaterializedView.drop(base)
  }

  test("partitioning on a type-drifting dim is refused at create") {
    val work = Files.createTempDirectory("graft_mv_drift_")
    val basePath = work.resolve("t.parquet").toString
    spark.createDataFrame(Seq(("01", 1.0), ("02", 2.0), ("01", 3.0)))
      .toDF("code", "v").write.parquet(basePath)
    val e = intercept[IllegalArgumentException] {
      MaterializedView.create(
        spark, "spec_mv_drift", basePath, work.resolve("mv").toString,
        groupCols = Seq("code"),
        sums = Seq("sum_v" -> col("v")),
        countCol = Some("cnt"),
        partitionBy = Seq("code")) // "01" reads back as int 1
    }
    assert(e.getMessage.contains("round-trip"), e.getMessage)
    MaterializedView.drop(basePath)
  }

  test("coarse rollup refreshes FROM the finer one; the base is never scanned") {
    val base = copyBase()
    val finePath = Files.createTempDirectory("graft_mv_h_").toString + "/fine"
    val coarsePath = new java.io.File(finePath).getParent + "/coarse"
    try {
      MaterializedView.create(
        spark, "h_fine", base, finePath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      MaterializedView.create(
        spark, "h_coarse", base, coarsePath,
        groupCols = Seq("o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      // Append a copy of the base file; a stale finer must be refused.
      Files.copy(Paths.get(base, "part-00000.snappy.parquet"),
        Paths.get(base, "part-00001.snappy.parquet"))
      val eStale = intercept[IllegalArgumentException] {
        MaterializedView.refreshFromFiner(spark, coarsePath, finePath)
      }
      assert(eStale.getMessage.contains("stale"), eStale.getMessage)
      MaterializedView.refresh(spark, finePath)

      // The hierarchy refresh: every file scan it runs must be the finer
      // rollup (or the coarse being rewritten) — never the base.
      val scans = scala.collection.mutable.Buffer.empty[String]
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit = {
          def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
            p match {
              case f: org.apache.spark.sql.execution.FileSourceScanExec =>
                scans.synchronized {
                  scans ++= f.relation.location.rootPaths.map(_.toString); ()
                }
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                walk(a.executedPlan)
              case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                walk(s.plan)
              case c: org.apache.spark.sql.execution.CommandResultExec =>
                walk(c.commandPhysicalPlan)
              case _ =>
            }
            p.children.foreach(walk); p.subqueries.foreach(walk)
          }
          walk(qe.executedPlan)
        }
        override def onFailure(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        val (d2, inc) = MaterializedView.refreshFromFiner(spark, coarsePath, finePath)
        assert(inc)
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (scans.synchronized(scans.isEmpty) && System.nanoTime() < deadline)
          Thread.sleep(50)
      } finally spark.listenerManager.unregister(listener)
      val got = scans.synchronized(scans.toList)
      assert(got.exists(_.contains("/fine")),
        s"the hierarchy refresh must scan the finer rollup: $got")
      assert(!got.exists(_.contains("orders.parquet")),
        s"the hierarchy refresh must NEVER scan the base: $got")

      // The refreshed coarse rollup serves the doubled base exactly.
      val q = spark.read.parquet(base)
        .groupBy(col("o_orderpriority"))
        .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
          .as("sum_price"), count(lit(1)).as("n_orders"))
      val paths = scannedPaths(q)
      assert(paths.exists(_.contains("/coarse")),
        s"the coarse rollup must serve: $paths")
      assert(!paths.exists(_.contains("orders.parquet")), s"$paths")
      val direct = {
        MaterializedView.drop(base)
        val r = rows(q)
        MaterializedView.attach(spark, finePath)
        MaterializedView.attach(spark, coarsePath)
        r
      }
      assert(rows(q) == direct)
    } finally MaterializedView.drop(base)
  }

  test("underivable shapes decline: unknown measure, non-dim grouping") {
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    try {
      MaterializedView.create(
        spark, "spec_mv_decline", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      // Different sum expression → decline.
      val otherMeasure = spark.read.parquet(base)
        .groupBy(col("o_orderpriority"))
        .agg(sum(expr("CAST(o_custkey AS DECIMAL(18,4))")).as("s"))
      assert(scannedPaths(otherMeasure).exists(_.contains("orders.parquet")))
      // Grouping outside the dimension set → decline.
      val otherDims = spark.read.parquet(base)
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).as("s"))
      assert(scannedPaths(otherDims).exists(_.contains("orders.parquet")))
      // Filter on a non-dimension column → decline.
      val otherFilter = spark.read.parquet(base)
        .filter(col("o_custkey") > 100)
        .groupBy(col("o_orderpriority"))
        .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).as("s"))
      assert(scannedPaths(otherFilter).exists(_.contains("orders.parquet")))
    } finally MaterializedView.drop(base)
  }

  test("sidecar attach restores rewrite in a fresh session (registry cleared)") {
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    try {
      MaterializedView.create(
        spark, "spec_mv_attach", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      val expected = rows(userQuery(base))
      MaterializedView.drop(base) // simulate a fresh session's empty registry
      assert(scannedPaths(userQuery(base)).exists(_.contains("orders.parquet")),
        "dropped registration must stop serving")
      val d = MaterializedView.attach(spark, mvPath)
      assert(d.basePath == base && d.sums.nonEmpty && d.countCol.contains("cnt"))
      val served = userQuery(base)
      assert(scannedPaths(served).exists(_.contains("/mv")),
        "attach must restore the rollup serve")
      assert(rows(served) == expected)
    } finally MaterializedView.drop(base)
  }

  test("append-only refresh merges the delta and re-arms the rewrite") {
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    try {
      MaterializedView.create(
        spark, "spec_mv_refresh", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      Thread.sleep(1100)
      val existing = Files.list(Paths.get(base))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(existing, Paths.get(base, "part-appended.snappy.parquet"))
      assert(scannedPaths(userQuery(base)).exists(_.contains("part-appended")),
        "pre-refresh the append-stale rollup hybrid-serves over the delta")
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(incremental, "pure append must take the incremental path")
      val served = userQuery(base)
      assert(scannedPaths(served).exists(_.contains("/mv")) &&
        !scannedPaths(served).exists(_.contains("part-appended")),
        "refresh must fold the delta back into a rollup-only serve")
      assert(rows(served) == directRows(base),
        "incrementally refreshed rollup must equal the direct aggregate")
    } finally MaterializedView.drop(base)
  }

  test("non-append change falls back to full rebuild") {
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    try {
      MaterializedView.create(
        spark, "spec_mv_rebuild", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      Thread.sleep(1100)
      // Rewrite-in-place: shrink an existing part file (size change).
      val victim = Paths.get(base).resolve("part-00000.snappy.parquet")
      val half = spark.read.parquet(base)
        .filter(col("o_orderkey") % 2 === 0)
      val stage = Files.createTempDirectory("graft_mv_half_").toString
      half.coalesce(1).write.mode("overwrite").parquet(stage)
      val newFile = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(newFile, victim,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(!incremental, "a modified file must force the rebuild path")
      val served = userQuery(base)
      assert(scannedPaths(served).exists(_.contains("/mv")))
      assert(rows(served) == directRows(base))
    } finally MaterializedView.drop(base)
  }

  test("same-size in-place rewrite is classified non-append (mtime signal)") {
    // A rewrite that keeps a file's name AND byte count is invisible to a
    // name→size inventory; the per-file mtime in the signature catches it
    // and forces the safe rebuild path instead of an unsound delta merge.
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    try {
      MaterializedView.create(
        spark, "spec_mv_mtime", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      Thread.sleep(1100) // local-fs mtime can be second-granular
      val victim = Paths.get(base).resolve("part-00000.snappy.parquet")
      java.nio.file.Files.setLastModifiedTime(victim,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(!incremental,
        "an unchanged-size touched file must force the rebuild path")
      assert(rows(userQuery(base)) == directRows(base))
    } finally MaterializedView.drop(base)
  }

  test("measure inputs that don't round-trip through SQL fail at create") {
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    try {
      // A Scala-side UDF has no SQL rendering refresh could reparse.
      val opaque = udf((d: Double) => d * 2).apply(col("o_totalprice"))
      val e = intercept[Exception] {
        MaterializedView.create(
          spark, "spec_mv_roundtrip", base, mvPath,
          groupCols = Seq("o_orderstatus"),
          sums = Seq("s" -> opaque))
      }
      assert(!new java.io.File(mvPath).exists(),
        "a failed create must not leave a rollup behind")
      assert(MaterializedView.lookup(base).isEmpty,
        "a failed create must not register")
    } finally MaterializedView.drop(base)
  }

  // Direct (un-served) answer: compute on a session with the MV dropped.
  private def directRows(base: String): Set[(String, Double, Long)] = {
    val saved = MaterializedView.lookup(base)
    MaterializedView.drop(base)
    try rows(userQuery(base))
    finally saved.foreach(d => MaterializedView.attach(spark, d.mvPath))
  }

  test("rewrite under parent operators: join + sort above the aggregate still resolve") {
    // The rule re-issues output attributes under their ORIGINAL exprIds;
    // this is the invariant that lets parents (joins, sorts, projects
    // built against the pre-rewrite plan) resolve untouched. Pin it with
    // consumers above the Aggregate.
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    try {
      val prios = spark.createDataFrame(
        Seq(Tuple1("1-URGENT"), Tuple1("3-MEDIUM"))).toDF("o_orderpriority")
      def composed = userQuery(base)
        .join(prios, "o_orderpriority")
        .orderBy(col("sum_price").desc)
        .select(col("o_orderpriority"), col("n_orders"))
      val direct = composed.collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      MaterializedView.create(
        spark, "spec_mv_parent", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      val served = composed
      assert(scannedPaths(served).exists(_.contains("/mv")),
        "aggregate under a join/sort must still serve from the rollup")
      assert(served.collect().toSeq.map(r => (r.getString(0), r.getLong(1))) == direct)
    } finally MaterializedView.drop(base)
  }

  test("aliased dims rewrite: SELECT dim AS d ... GROUP BY d serves from the rollup") {
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    def aliased = spark.read.parquet(base)
      .select(col("o_orderpriority").as("prio"), col("o_orderstatus").as("st"),
        col("o_totalprice"))
      .filter(col("st") === "O")
      .groupBy(col("prio"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
        .as("sum_price"),
        count(lit(1)).as("n_orders"))
    val direct = aliased.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    try {
      MaterializedView.create(
        spark, "spec_mv_alias", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      val served = aliased
      assert(scannedPaths(served).exists(_.contains("/mv")),
        "an alias-of-attribute project must not block the rewrite")
      assert(served.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet == direct)
      assert(served.columns.toSeq == Seq("prio", "sum_price", "n_orders"),
        "output names must be the query's aliases, not the base columns")
      // A COMPUTED alias over a stored dim now serves too (generalized
      // grouping rewrite — the expression recomputes from the rollup's
      // dim column); one over a NON-dim column still declines.
      def computed = spark.read.parquet(base)
        .select(concat(col("o_orderpriority"), lit("!")).as("prio"),
          col("o_totalprice"))
        .groupBy(col("prio"))
        .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).as("s"))
      assert(scannedPaths(computed).exists(_.contains("/mv")))
      def nonDim = spark.read.parquet(base)
        .select(concat(col("o_custkey"), lit("!")).as("ck"),
          col("o_totalprice"))
        .groupBy(col("ck"))
        .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).as("s"))
      assert(scannedPaths(nonDim).exists(_.contains("orders.parquet")))
    } finally MaterializedView.drop(base)
  }

  test("avg/count(col) derive from stored (sum, count); subset dims re-aggregate") {
    val direct = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy(col("lang"))
      .agg(avg(col("n_chars")).as("avg_chars"),
        sum(col("n_chars")).as("sum_chars"),
        count(col("n_chars")).as("n_with_len"),
        count(lit(1)).as("n_docs"))
      .collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val served = MaterializedView.mvAvgDocLen(spark, sf0001)
    assert(scannedPaths(served).exists(_.contains("/mv")),
      "avg query must be served from the rollup")
    val got = served.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == direct, "derived avg must be bit-identical to the direct avg")
  }

  test("decimal avg derives bit-exactly (Average's own sum/count types)") {
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    def q = spark.read.parquet(base)
      .groupBy(col("o_orderpriority"))
      .agg(avg(expr("CAST(o_totalprice AS DECIMAL(18,4))")).as("avg_price"))
    val direct = q.collect()
      .map(r => (r.getString(0), r.getDecimal(1))).toSet
    try {
      MaterializedView.create(
        spark, "spec_mv_avg_dec", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_p" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        counts = Seq("cnt_p" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      val served = q
      assert(scannedPaths(served).exists(_.contains("/mv")))
      assert(served.collect().map(r => (r.getString(0), r.getDecimal(1))).toSet
        == direct)
    } finally MaterializedView.drop(base)
  }

  test("avg over NULLs divides by the NON-NULL count; avg declines without it") {
    val work = Files.createTempDirectory("graft_mv_nulls_")
    val base = work.toString + "/vals.parquet"
    spark.createDataFrame(Seq(
      ("a", java.lang.Long.valueOf(10L)), ("a", null.asInstanceOf[java.lang.Long]),
      ("a", java.lang.Long.valueOf(20L)), ("b", null.asInstanceOf[java.lang.Long])))
      .toDF("g", "v").coalesce(1).write.parquet(base)
    def q = spark.read.parquet(base).groupBy(col("g"))
      .agg(avg(col("v")).as("avg_v"), count(col("v")).as("n_v"))
    val direct = q.collect().map(r =>
      (r.getString(0), if (r.isNullAt(1)) null else r.getDouble(1), r.getLong(2))).toSet
    val mvPath = work.toString + "/mv"
    try {
      MaterializedView.create(
        spark, "spec_mv_nulls", base, mvPath,
        groupCols = Seq("g"),
        sums = Seq("sum_v" -> col("v")),
        counts = Seq("cnt_v" -> col("v")),
        countCol = Some("cnt"))
      val served = q
      assert(scannedPaths(served).exists(_.contains("/mv")))
      assert(served.collect().map(r =>
        (r.getString(0), if (r.isNullAt(1)) null else r.getDouble(1), r.getLong(2))).toSet
        == direct) // group b: avg NULL, count 0 — NOT divided by row count
      // Without a stored count(v), avg(v) must decline (count(*) is NOT a
      // legal divisor under NULLs).
      MaterializedView.drop(base)
      val mv2 = work.toString + "/mv2"
      MaterializedView.create(
        spark, "spec_mv_nulls2", base, mv2,
        groupCols = Seq("g"),
        sums = Seq("sum_v" -> col("v")),
        countCol = Some("cnt"))
      assert(scannedPaths(q).exists(_.contains("vals.parquet")),
        "avg without a non-null count measure must stay on the base")
    } finally MaterializedView.drop(base)
  }

  test("multi-MV selection: cheapest serving rollup wins; fallback when it can't serve") {
    val base = copyBase()
    val work = Files.createTempDirectory("graft_mv_multi_").toString
    try {
      MaterializedView.create(
        spark, "fine", base, s"$work/mv_fine",
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_p" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      MaterializedView.create(
        spark, "coarse", base, s"$work/mv_coarse",
        groupCols = Seq("o_orderstatus"),
        sums = Seq("sum_p" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      assert(MaterializedView.lookupAll(base).length == 2,
        "both rollups must register side by side")
      // Servable by BOTH → the smaller (coarse) rollup must be scanned.
      def byStatus = spark.read.parquet(base)
        .groupBy(col("o_orderstatus"))
        .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
          .as("s"), count(lit(1)).as("n"))
      val p1 = scannedPaths(byStatus)
      assert(p1.exists(_.contains("mv_coarse")),
        s"cost-ordered selection must pick the smaller rollup: $p1")
      assert(!p1.exists(_.contains("mv_fine")) &&
        !p1.exists(_.contains("orders.parquet")), s"$p1")
      // Servable only by the FINE rollup → selection falls through to it.
      def byPrio = spark.read.parquet(base)
        .groupBy(col("o_orderpriority"))
        .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
          .as("s"))
      val p2 = scannedPaths(byPrio)
      assert(p2.exists(_.contains("mv_fine")),
        s"only the fine rollup can serve o_orderpriority: $p2")
      assert(!p2.exists(_.contains("orders.parquet")), s"$p2")
      // Answers match the direct aggregates.
      val direct = {
        val saved = MaterializedView.lookupAll(base)
        MaterializedView.drop(base)
        try (byStatus.collect().toSet, byPrio.collect().toSet)
        finally saved.foreach(d => MaterializedView.attach(spark, d.mvPath))
      }
      assert(byStatus.collect().toSet == direct._1)
      assert(byPrio.collect().toSet == direct._2)
      // drop(base) clears BOTH registrations.
      MaterializedView.drop(base)
      assert(MaterializedView.lookupAll(base).isEmpty)
    } finally MaterializedView.drop(base)
  }

  test("q134 query shape: result equals direct aggregation at sf0.001") {
    val direct = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(sum(expr("CAST(l_quantity AS DECIMAL(18,4))")).cast("double")
        .as("sum_qty"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val served = MaterializedView.mvSelectCheapest(spark, sf0001)
    val got = served.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == direct)
  }

  test("expression dims: derived groupings/filters match as subtrees; subset re-aggregates") {
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    def byMonth = spark.read.parquet(base)
      .filter(month(col("o_orderdate")) <= 6)
      .groupBy(month(col("o_orderdate")).as("od_month"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
        .as("sum_price"), count(lit(1)).as("n_orders"))
    val direct = byMonth.collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
    try {
      MaterializedView.create(
        spark, "spec_mv_time", base, mvPath,
        groupCols = Nil,
        sums = Seq("sum_p" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"),
        exprDims = Seq(
          "od_year" -> year(col("o_orderdate")),
          "od_month" -> month(col("o_orderdate"))))
      val served = byMonth
      assert(scannedPaths(served).exists(_.contains("/mv")),
        "derived-dim grouping + filter must serve from the rollup")
      assert(served.collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet == direct)
      // Grouping by a DIFFERENT derived expression still declines.
      val byDay = spark.read.parquet(base)
        .groupBy(dayofmonth(col("o_orderdate")).as("od_day"))
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(byDay).exists(_.contains("orders.parquet")),
        "an unregistered derived dim must stay on the base")
    } finally MaterializedView.drop(base)
  }

  test("expression-dim sidecar round-trips; refresh recomputes derived dims") {
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    def q = spark.read.parquet(base)
      .groupBy(year(col("o_orderdate")).as("od_year"))
      .agg(count(lit(1)).as("n_orders"))
    try {
      MaterializedView.create(
        spark, "spec_mv_time_rt", base, mvPath,
        groupCols = Nil,
        sums = Seq("sum_p" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"),
        exprDims = Seq("od_year" -> year(col("o_orderdate"))))
      MaterializedView.drop(base)
      val d = MaterializedView.attach(spark, mvPath)
      assert(d.exprDims.values.toSet == Set("od_year"))
      assert(scannedPaths(q).exists(_.contains("/mv")),
        "attach must restore derived-dim serving")
      // Append-only refresh recomputes the derived dims from the sidecar
      // SQL and merges on them.
      Thread.sleep(1100)
      val existing = Files.list(Paths.get(base))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(existing, Paths.get(base, "part-appended.snappy.parquet"))
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(incremental)
      val served = q
      assert(scannedPaths(served).exists(_.contains("/mv")))
      val got = served.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val directRows = {
        MaterializedView.drop(base)
        try q.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
        finally { MaterializedView.attach(spark, mvPath); () }
      }
      assert(got == directRows)
    } finally MaterializedView.drop(base)
  }

  test("computed groupings over plain dims serve (generalized grouping rewrite)") {
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    // Group by an EXPRESSION over a stored dim: computable from the
    // rollup, so it must serve (re-aggregated by the derived value).
    def q = spark.read.parquet(base)
      .groupBy(concat(col("o_orderstatus"), lit("!")).as("s"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
        .as("sum_price"))
    val direct = q.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    try {
      MaterializedView.create(
        spark, "spec_mv_computed", base, mvPath,
        groupCols = Seq("o_orderstatus"),
        sums = Seq("sum_p" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      val served = q
      assert(scannedPaths(served).exists(_.contains("/mv")),
        "an expression over stored dims must serve from the rollup")
      assert(served.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
        == direct)
    } finally MaterializedView.drop(base)
  }

  test("string-date derived dims get no null mirror: isnotnull over garbage declines") {
    // month(cast(string AS date)) NULLs unparseable NON-null input, so
    // `isnotnull(raw)` is NOT answerable from the derived dim — rows
    // holding garbage must survive an isnotnull filter.
    val work = Files.createTempDirectory("graft_mv_strdate_")
    val base = work.toString + "/ev.parquet"
    spark.createDataFrame(Seq(
      ("2024-01-03", 1L), ("2024-02-07", 2L), ("n/a", 3L),
      (null.asInstanceOf[String], 4L)))
      .toDF("d_str", "v").coalesce(1).write.parquet(base)
    // try_cast: ANSI's plain string→date cast THROWS on garbage; the
    // null-ing variant is where the mirror hazard lives.
    def q = spark.read.parquet(base)
      .filter(col("d_str").isNotNull)
      .groupBy(month(expr("TRY_CAST(d_str AS DATE)")).as("m"))
      .agg(count(lit(1)).as("n"))
    val direct = q.collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getLong(1)))
      .toSet
    val mvPath = work.toString + "/mv"
    try {
      val d = MaterializedView.create(
        spark, "spec_mv_strdate", base, mvPath,
        groupCols = Nil,
        sums = Seq("sum_v" -> col("v")),
        countCol = Some("cnt"),
        exprDims = Seq("m" -> month(expr("TRY_CAST(d_str AS DATE)"))))
      assert(d.nullMirrors.isEmpty,
        "a string→date cast must not qualify as a null mirror")
      val served = q
      assert(scannedPaths(served).exists(_.contains("ev.parquet")),
        "isnotnull over the raw string column must decline to the base")
      assert(q.collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getLong(1)))
        .toSet == direct)
      assert(direct.contains((None, 1L)),
        "sanity: the garbage row groups under month NULL and must survive")
      // WITHOUT the isnotnull filter the derived-dim grouping still
      // serves from the rollup.
      val plain = spark.read.parquet(base)
        .groupBy(month(expr("TRY_CAST(d_str AS DATE)")).as("m"))
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(plain).exists(_.contains("/mv")))
    } finally MaterializedView.drop(base)
  }

  test("q137 query shape: result equals direct aggregation at sf0.001") {
    val direct = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(month(col("o_orderdate")) <= 6)
      .groupBy(month(col("o_orderdate")).as("od_month"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
        .as("sum_price"), count(lit(1)).as("n_orders"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
    val viaMv = MaterializedView.mvMonthlyRevenue(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaMv == direct)
  }

  test("grouping sets compose: two-phase ROLLUP's inner aggregate serves from the MV") {
    val base = s"$sf0001/lineitem.parquet"
    def twoPhase = spark.read.parquet(base)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n0"),
        sum(expr("CAST(l_quantity AS DECIMAL(18,4))")).as("q0"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("n0")).as("n"), sum(col("q0")).cast("double").as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
    val direct = twoPhase.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val work = Files.createTempDirectory("graft_mv_gsets_").toString
    try {
      MaterializedView.create(
        spark, "spec_gsets", base, s"$work/mv",
        groupCols = Seq("l_returnflag", "l_linestatus"),
        sums = Seq("sum_q" -> expr("CAST(l_quantity AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      val served = twoPhase
      val paths = scannedPaths(served)
      assert(paths.exists(_.contains("/mv")),
        s"the rollup phase must consume the SERVED base grain: $paths")
      assert(!paths.exists(_.contains("lineitem.parquet")),
        s"the base must not be scanned: $paths")
      assert(served.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet == direct)
    } finally MaterializedView.drop(base)
  }

  test("q140 query shape: result equals direct grouping-sets aggregate at sf0.001") {
    val direct = graft.operators.Relational.rollupCounts(spark, sf0001)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val viaMv = MaterializedView.mvRollupServe(spark, sf0001)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaMv == direct)
  }

  test("distinct-insensitive aggregates over dims serve without stored measures") {
    val base = copyBase()
    val mvPath = Files.createTempDirectory("graft_mv_out_").toString + "/mv"
    // count(distinct dim), min/max(dim) — the distinct set / extremes of
    // a dim over the rollup rows equal those over the base.
    def q = spark.read.parquet(base)
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_orderpriority")).as("n_prio"),
        min(col("o_orderpriority")).as("min_prio"),
        max(col("o_orderpriority")).as("max_prio"),
        sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
          .as("sum_price"))
    val direct = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getDouble(4))).toSet
    try {
      MaterializedView.create(
        spark, "spec_mv_distinct", base, mvPath,
        groupCols = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_p" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
        countCol = Some("cnt"))
      val served = q
      assert(scannedPaths(served).exists(_.contains("/mv")),
        "distinct/min/max over dims must serve from the rollup")
      assert(served.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3),
          r.getDouble(4))).toSet == direct)
      // count(distinct NON-dim) must still decline.
      val nonDim = spark.read.parquet(base)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n"))
      assert(scannedPaths(nonDim).exists(_.contains("orders.parquet")))
      // avg(dim) is row-count-weighted — must decline too.
      val avgDim = spark.read.parquet(base)
        .groupBy(col("o_orderstatus"))
        .agg(avg(col("o_custkey")).as("a"))
      assert(scannedPaths(avgDim).exists(_.contains("orders.parquet")))
    } finally MaterializedView.drop(base)
  }

  test("q128 query shape: result equals direct aggregation at sf0.001") {
    val direct = rows(userQuery(s"$sf0001/orders.parquet"))
    val viaMv = rows(MaterializedView.mvRewriteRevenue(spark, sf0001))
    assert(viaMv == direct)
    MaterializedView.drop(s"$sf0001/orders.parquet")
  }
}
