package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.table.{KeyedTable, KeyedTableSpec, MaterializedView}

/** Materialized views over KEYED tables: rewrite admissibility for the
  * merge-on-read resolve shape, commit-timeline staleness, and the
  * commit-class-aware refresh paths (state-delta merge, COW append merge,
  * layout no-op, destructive rebuild, group death, evolution refusal).
  */
class KeyedMvSpec extends SparkTestBase {

  private def scannedPaths(df: DataFrame): Seq[String] =
    graft.plans.PlanWalk.scannedFiles(df)

  private val schema = StructType(Seq(
    StructField("user_id", IntegerType),
    StructField("event_type", StringType),
    StructField("ts_us", LongType),
    StructField("event_id", IntegerType),
    StructField("value", DoubleType)))

  private def batch(rows: (Int, String, Long, Int, java.lang.Double)*): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3, r._4, r._5)).asJava, schema)
  }

  private def morTable(global: Boolean = false): KeyedTable = {
    val tmp = Files.createTempDirectory("graft_kmv_").toString
    KeyedTable(KeyedTableSpec(
      path = s"$tmp/events_keyed",
      keyCols = Seq("user_id"),
      precombineCol = "ts_us",
      tiebreakCols = Seq("event_id"),
      partitionCols = Seq("event_type"),
      globalKeys = global,
      retainHistory = true))
  }

  private def cowTable(): KeyedTable = {
    val tmp = Files.createTempDirectory("graft_kmv_cow_").toString
    KeyedTable(KeyedTableSpec(
      path = s"$tmp/events_keyed",
      keyCols = Seq("user_id"),
      precombineCol = "ts_us",
      tiebreakCols = Seq("event_id"),
      partitionCols = Seq("event_type")))
  }

  private val c0 = batch(
    (1, "click", 100L, 1, 10.0),
    (2, "click", 100L, 2, 20.0),
    (3, "view", 100L, 3, 30.0),
    (4, "view", 100L, 4, null))

  // Updates keys 1 and 3 (one to a null value), inserts key 5.
  private val c1 = batch(
    (1, "click", 200L, 5, 15.0),
    (3, "view", 200L, 6, null),
    (5, "view", 200L, 7, 50.0))

  private def mvOver(
      t: KeyedTable,
      mins: Seq[(String, org.apache.spark.sql.Column)] = Nil): String = {
    val mvPath = new java.io.File(t.spec.path).getParent + "/rollup_mv"
    MaterializedView.createKeyed(
      spark, "by_type", t, mvPath,
      groupCols = Seq("event_type"),
      sums = Seq("sum_v" -> expr("CAST(value AS DECIMAL(18,4))")),
      mins = mins,
      countCol = Some("n_rows"))
    mvPath
  }

  private def q(t: KeyedTable): DataFrame =
    t.read(spark).groupBy(col("event_type")).agg(
      sum(expr("CAST(value AS DECIMAL(18,4))")).cast("double").as("sum_v"),
      count(lit(1)).as("n_rows"))

  private def rows(df: DataFrame): Set[(String, Option[Double], Long)] =
    df.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2))).toSet

  private def direct(t: KeyedTable): Set[(String, Option[Double], Long)] = {
    val saved = MaterializedView.lookup(t.spec.path)
    MaterializedView.drop(t.spec.path)
    try rows(q(t))
    finally saved.foreach(d => MaterializedView.attach(spark, d.mvPath))
  }

  test("MoR resolve-shape aggregate serves from the rollup; raw scan declines") {
    val t = morTable()
    t.upsert(spark, c0, commitTime = "c0")
    val expected = rows(q(t))
    val mvPath = mvOver(t)
    try {
      val served = q(t)
      val paths = scannedPaths(served)
      assert(paths.exists(_.contains("rollup_mv")), s"expected rollup scan: $paths")
      assert(!paths.exists(_.contains("events_keyed")),
        s"base must not be scanned: $paths")
      assert(rows(served) == expected)
      // A RAW scan sees superseded versions — no resolve window, so the
      // rewrite must decline even though the path matches.
      val raw = spark.read.parquet(t.spec.path)
        .groupBy(col("event_type"))
        .agg(sum(expr("CAST(value AS DECIMAL(18,4))")).as("s"))
      val rawPaths = scannedPaths(raw)
      assert(rawPaths.exists(_.contains("events_keyed")),
        s"raw-scan aggregate must stay on the base: $rawPaths")
    } finally MaterializedView.drop(t.spec.path)
  }

  test("upsert staleness declines; state-delta refresh re-arms, bit-exact") {
    val t = morTable()
    t.upsert(spark, c0, commitTime = "c0")
    val mvPath = mvOver(t)
    try {
      t.upsert(spark, c1, commitTime = "c1")
      assert(scannedPaths(q(t)).exists(_.contains("events_keyed")),
        "post-upsert the MV is stale and must decline")
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(incremental, "an upsert delta on MoR must merge incrementally")
      val served = q(t)
      assert(scannedPaths(served).exists(_.contains("rollup_mv")))
      assert(rows(served) == direct(t))
      // null-count discipline: group `view` now has key3=null, key4=null,
      // key5=50 → sum 50; key counts stay exact.
      assert(rows(served).contains(("view", Some(50.0), 3L)))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("retraction can NULL a group's sum (non-null count discipline)") {
    val t = morTable()
    t.upsert(spark, batch((9, "solo", 100L, 1, 7.0)), commitTime = "c0")
    val mvPath = mvOver(t)
    try {
      // The group's only non-null value is updated to NULL: sum must
      // become NULL (not 0), count stays 1.
      t.upsert(spark, batch((9, "solo", 200L, 2, null)), commitTime = "c1")
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(incremental)
      assert(rows(q(t)) == Set(("solo", None, 1L)))
      assert(rows(q(t)) == direct(t))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("global-key relocation kills an emptied group (group death)") {
    val t = morTable(global = true)
    t.upsert(spark, batch((1, "x", 100L, 1, 5.0), (2, "y", 100L, 2, 6.0)),
      commitTime = "c0")
    val mvPath = mvOver(t)
    try {
      // Key 1 relocates from partition x to y: group x must VANISH from
      // the refreshed rollup, exactly as it has no row in the direct
      // aggregate.
      t.upsert(spark, batch((1, "y", 200L, 3, 5.5)), commitTime = "c1")
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(incremental)
      val got = rows(q(t))
      assert(got == direct(t))
      assert(!got.exists(_._1 == "x"), s"emptied group must be dropped: $got")
    } finally MaterializedView.drop(t.spec.path)
  }

  test("min/max updates recompute only the touched groups (partition-pruned)") {
    val t = morTable()
    t.upsert(spark, c0, commitTime = "c0")
    val mvPath = mvOver(t, mins = Seq("min_v" -> expr("CAST(value AS DECIMAL(18,4))")))
    try {
      // Key 1's value 10 (the click minimum) is RAISED to 15: the stored
      // min is retracted — not derivable from the rollup alone, so the
      // refresh recomputes the TOUCHED group ('click') from the base,
      // leaving 'view' rows stitched through untouched. The recompute
      // scan must partition-prune to the touched partition (the MV dim
      // IS the table partition column).
      t.upsert(spark, batch((1, "click", 200L, 5, 15.0)), commitTime = "c1")
      val allScans = scala.collection.mutable.Buffer.empty[
        (String, org.apache.spark.sql.execution.FileSourceScanExec)]
      val events = scala.collection.mutable.Buffer.empty[String]
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          events.synchronized {
            events += s"$funcName:${qe.executedPlan.getClass.getSimpleName}"; ()
          }
          def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
            p match {
              case f: org.apache.spark.sql.execution.FileSourceScanExec =>
                allScans.synchronized { allScans += ((funcName, f)); () }
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                walk(a.executedPlan)
              case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                // Post-execution AQE wraps materialized stages; their
                // plans are NOT in `children`.
                walk(s.plan)
              case c: org.apache.spark.sql.execution.CommandResultExec =>
                // The refresh's base scan runs inside the parquet WRITE
                // command, whose executed plan hangs off this wrapper.
                walk(c.commandPhysicalPlan)
              case _ =>
            }
            p.children.foreach(walk); p.subqueries.foreach(walk)
          }
          walk(qe.executedPlan)
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      def baseScans = allScans.synchronized {
        allScans.collect {
          case (_, f) if f.relation.location.rootPaths
            .exists(_.toString.contains("events_keyed")) => f
        }.toList
      }
      spark.listenerManager.register(listener)
      val incremental =
        try {
          val (_, inc) = MaterializedView.refresh(spark, mvPath)
          // Listener delivery is async; poll until the refresh's base
          // scan shows up (bounded — fails the assertion below if not).
          val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
          while (baseScans.isEmpty && System.nanoTime() < deadline)
            Thread.sleep(50)
          inc
        } finally spark.listenerManager.unregister(listener)
      assert(incremental,
        "a min/max update refreshes via group-scoped recompute, not rebuild")
      val pruned = baseScans
      assert(pruned.nonEmpty,
        "the group recompute must scan the base; saw only: " +
          allScans.synchronized(allScans.map { case (fn, f) =>
            fn -> f.relation.location.rootPaths.mkString(",")
          }.toList).mkString("; ") +
          " events: " + events.synchronized(events.toList).mkString(", "))
      assert(pruned.forall(_.partitionFilters.nonEmpty),
        s"the recompute's base scan must carry partition filters: " +
          pruned.map(_.partitionFilters).mkString("; "))
      val mv = spark.read.parquet(mvPath)
      assert(mv.filter(col("event_type") === "click")
        .select(col("min_v").cast("double")).collect()
        .map(_.getDouble(0)).toSeq == Seq(15.0))
      // The untouched group's stored extreme survives the stitch.
      assert(mv.filter(col("event_type") === "view")
        .select(col("min_v").cast("double")).collect()
        .map(_.getDouble(0)).toSeq == Seq(30.0))
      assert(rows(q(t)) == direct(t))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("min/max group death under global relocation (group-scoped path)") {
    val t = morTable(global = true)
    t.upsert(spark, batch((1, "x", 100L, 1, 5.0), (2, "y", 100L, 2, 6.0)),
      commitTime = "c0")
    val mvPath = mvOver(t, mins = Seq("min_v" -> expr("CAST(value AS DECIMAL(18,4))")))
    try {
      // Key 1 relocates x → y: both groups are touched; x empties (no
      // row from the recompute, anti-side drops its old row) and y's min
      // re-derives from the base.
      t.upsert(spark, batch((1, "y", 200L, 3, 5.5)), commitTime = "c1")
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(incremental)
      val got = rows(q(t))
      assert(got == direct(t))
      assert(!got.exists(_._1 == "x"), s"emptied group must be dropped: $got")
      val minY = spark.read.parquet(mvPath)
        .filter(col("event_type") === "y")
        .select(col("min_v").cast("double")).collect()
      assert(minY.map(_.getDouble(0)).toSeq == Seq(5.5))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("insert-only MoR delta merges min/max soundly (no rebuild)") {
    val t = morTable()
    t.upsert(spark, c0, commitTime = "c0")
    val mvPath = mvOver(t, mins = Seq("min_v" -> expr("CAST(value AS DECIMAL(18,4))")))
    try {
      t.upsert(spark, batch((6, "click", 200L, 8, 3.0)), commitTime = "c1")
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(incremental, "a pure-insert delta merges even with min/max")
      val mv = spark.read.parquet(mvPath)
        .filter(col("event_type") === "click")
        .select(col("min_v").cast("double")).collect()
      assert(mv.map(_.getDouble(0)).toSeq == Seq(3.0))
      assert(rows(q(t)) == direct(t))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("COW inserts append-merge; a COW upsert rebuilds") {
    val t = cowTable()
    t.upsert(spark, c0, commitTime = "c0")
    val mvPath = mvOver(t)
    try {
      t.insert(spark, batch((7, "click", 150L, 9, 2.0)), commitTime = "c1")
      val (_, inc1) = MaterializedView.refresh(spark, mvPath)
      assert(inc1, "COW inserts are pure appends: incremental")
      assert(rows(q(t)) == direct(t))
      t.upsert(spark, batch((2, "click", 300L, 10, 25.0)), commitTime = "c2")
      val (_, inc2) = MaterializedView.refresh(spark, mvPath)
      assert(!inc2, "a COW upsert folds versions into files: rebuild")
      assert(rows(q(t)) == direct(t))
      // COW read has no resolve window; the rewrite must still serve it.
      assert(scannedPaths(q(t)).exists(_.contains("rollup_mv")))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("keyed hybrid serve: unrefreshed inserts serve rollup + delta files only") {
    val t = cowTable()
    t.upsert(spark, c0, commitTime = "c0")
    val mvPath = mvOver(t)
    try {
      t.insert(spark, batch((7, "click", 150L, 9, 2.0)), commitTime = "c1")
      // NO refresh: freshness must come from the hybrid serve, its delta
      // scan driven by the commit→files index.
      val served = q(t)
      val paths = scannedPaths(served)
      assert(paths.exists(_.contains("rollup_mv")),
        s"hybrid serve must scan the rollup: $paths")
      val deltaFiles = KeyedTable.addedFilesSince(spark, t.spec.path, "c0").get
        .map(f => s"${t.spec.path}/$f")
      val basePaths = paths.filter(_.contains("events_keyed"))
      assert(basePaths.nonEmpty, "the delta partial-rollup must scan files")
      basePaths.foreach(p => assert(deltaFiles.exists(p.endsWith),
        s"base scan outside the index'd delta set: $p"))
      assert(rows(served) == direct(t),
        "hybrid answers must equal the direct post-insert aggregate")
      // An UPSERT commit folds old versions into rewritten files — not
      // append-shaped, so hybrid declines and the query runs on the base.
      t.upsert(spark, batch((2, "click", 300L, 10, 25.0)), commitTime = "c2")
      val declined = q(t)
      assert(scannedPaths(declined).exists(_.contains("events_keyed")))
      assert(rows(declined) == direct(t))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("keyed hybrid serve declines on a MoR base (appends can supersede)") {
    val t = morTable()
    t.upsert(spark, c0, commitTime = "c0")
    val mvPath = mvOver(t)
    try {
      // A MoR "insert" appends VERSIONS: key 1 is superseded, which is a
      // retraction the additive hybrid union cannot express — must
      // decline to the base, stay correct.
      t.insert(spark, batch((1, "click", 300L, 11, 99.0)), commitTime = "c1")
      val served = q(t)
      assert(scannedPaths(served).exists(_.contains("events_keyed")),
        "a stale MoR MV must decline, never serve a wrong hybrid")
      assert(rows(served) == direct(t))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("layout commits re-arm with zero data work") {
    val t = morTable()
    t.upsert(spark, c0, commitTime = "c0")
    val mvPath = mvOver(t)
    try {
      t.compact(spark)
      assert(scannedPaths(q(t)).exists(_.contains("events_keyed")),
        "a layout commit still advances the timeline: decline until refresh")
      val before = new java.io.File(mvPath).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(incremental)
      val after = new java.io.File(mvPath).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
      assert(before == after, "a layout-only refresh must not rewrite the rollup")
      assert(scannedPaths(q(t)).exists(_.contains("rollup_mv")))
      assert(rows(q(t)) == direct(t))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("delete is rebuild-class") {
    val t = morTable()
    t.upsert(spark, c0, commitTime = "c0")
    val mvPath = mvOver(t)
    try {
      t.delete(spark, batch((3, "view", 0L, 0, null)).select("user_id", "event_type"))
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(!incremental, "physical erasure destroys preimages: rebuild")
      assert(rows(q(t)) == direct(t))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("partition evolution refuses refresh with an actionable error") {
    val t = morTable(global = true)
    t.upsert(spark, c0, commitTime = "c0")
    val mvPath = mvOver(t)
    try {
      t.evolvePartitioning(spark, Seq("event_type", "user_id"))
      val e = intercept[IllegalArgumentException] {
        MaterializedView.refresh(spark, mvPath)
      }
      assert(e.getMessage.contains("evolve"))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("sidecar round-trips the keyed definition (fresh-session attach)") {
    val t = morTable()
    t.upsert(spark, c0, commitTime = "c0")
    val mvPath = mvOver(t)
    try {
      val expected = rows(q(t))
      MaterializedView.drop(t.spec.path)
      val d = MaterializedView.attach(spark, mvPath)
      assert(d.keyedSpec.contains(t.spec))
      assert(d.baseCommit.nonEmpty && d.counts.nonEmpty)
      val served = q(t)
      assert(scannedPaths(served).exists(_.contains("rollup_mv")))
      assert(rows(served) == expected)
    } finally MaterializedView.drop(t.spec.path)
  }

  test("mixed commit-id formats refresh correctly (timeline order, not string order)") {
    // Seed with an explicit "c0"-style id, then commit the update batch
    // under a GENERATED id ("2026…"), which sorts BEFORE "c0" as a
    // string. The state-delta boundary must follow timeline order, or
    // the newer versions land in the before-image and the refresh
    // silently writes nothing while re-arming as fresh. A table whose
    // DATA ids are format-mixed resolves through the seq-mapped
    // tie-break, whose window shape the rewrite rule deliberately does
    // not match — the contract here is CORRECTNESS (refresh exact,
    // query exact), with MV serving safely declined.
    val t = morTable()
    t.upsert(spark, c0, commitTime = "c0")
    val mvPath = mvOver(t)
    try {
      t.upsert(spark, c1) // default-format commit id
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(incremental)
      assert(rows(q(t)) == direct(t),
        "mixed-format ids must not corrupt the incremental delta")
      assert(rows(q(t)).contains(("view", Some(50.0), 3L)))
      // The refreshed ROLLUP itself carries the exact post-upsert state
      // (what a consistent-id session would have served).
      val mvRows = spark.read.parquet(mvPath)
        .select(col("event_type"), col("sum_v").cast("double"), col("n_rows"))
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2))).toSet
      assert(mvRows == direct(t))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("duplicate commit ids are refused; default ids are monotonic") {
    val t = morTable()
    t.upsert(spark, c0, commitTime = "c0")
    val e = intercept[IllegalArgumentException] {
      t.upsert(spark, c1, commitTime = "c0")
    }
    assert(e.getMessage.contains("distinct id"))
    val ids = (1 to 5).map(_ => KeyedTable.defaultCommitTime())
    assert(ids == ids.sorted && ids.distinct == ids,
      s"default ids must be strictly monotonic: $ids")
  }

  test("expression dims on a keyed base survive the signed-delta refresh") {
    val t = morTable()
    t.upsert(spark, c0, commitTime = "c0")
    val mvPath = new java.io.File(t.spec.path).getParent + "/rollup_mv"
    // Derived dim: a coarse time bucket of the precombine column.
    MaterializedView.createKeyed(
      spark, "by_bucket", t, mvPath,
      groupCols = Seq("event_type"),
      sums = Seq("sum_v" -> expr("CAST(value AS DECIMAL(18,4))")),
      countCol = Some("n_rows"),
      exprDims = Seq("ts_bucket" -> expr("CAST(ts_us DIV 100 AS BIGINT)")))
    def q2 = t.read(spark)
      .groupBy(col("event_type"),
        expr("CAST(ts_us DIV 100 AS BIGINT)").as("ts_bucket"))
      .agg(sum(expr("CAST(value AS DECIMAL(18,4))")).cast("double").as("sum_v"),
        count(lit(1)).as("n_rows"))
    def rows2 = q2.collect().map(r =>
      (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3))).toSet
    try {
      assert(scannedPaths(q2).exists(_.contains("rollup_mv")),
        "derived-dim grouping over the resolved read must serve")
      // c1 updates move keys across ts buckets (ts 100 → 200): the
      // signed-delta merge must retract from the old bucket and add to
      // the new one, recomputing the derived dim on both images.
      t.upsert(spark, c1, commitTime = "c1")
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(incremental)
      val got = rows2
      val directRows = {
        val saved = MaterializedView.lookupAll(t.spec.path)
        MaterializedView.drop(t.spec.path)
        try rows2
        finally saved.foreach(d => MaterializedView.attach(spark, d.mvPath))
      }
      assert(got == directRows,
        "signed-delta refresh must be exact across derived-dim buckets")
      assert(scannedPaths(q2).exists(_.contains("rollup_mv")))
    } finally MaterializedView.drop(t.spec.path)
  }

  test("q131 query shape: refreshed keyed MV equals the direct aggregate") {
    val viaMv = MaterializedView.mvKeyedRefresh(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val ev = graft.sources.Tables.eventsUs(spark, sf0001)
    val latest = KeyedTable(KeyedTableSpec(
      "unused", Seq("user_id"), "ts_us", Seq("event_id"), Seq("event_type")))
      .dedupLatest(ev)
    val expect = latest.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_rows"),
      sum(expr("CAST(value AS DECIMAL(18,4))")).cast("double").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaMv == expect)
  }

  test("single-phase ROLLUP/CUBE over a keyed MoR base serves from the rollup") {
    val t = morTable()
    t.upsert(spark, c0, commitTime = "c0")
    t.upsert(spark, c1, commitTime = "c1")
    def qR = t.read(spark)
      .rollup(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(expr("CAST(value AS DECIMAL(18,4))")).cast("double").as("sum_v"))
    def qGid = t.read(spark)
      .cube(col("event_type"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"))
    def rset(df: DataFrame) = df.collect().map { r =>
      (0 until r.length).map(i => if (r.isNullAt(i)) None else Some(r.get(i)))
    }.toSet
    val (expR, expG) = (rset(qR), rset(qGid))
    mvOver(t)
    try {
      for ((q, exp, what) <- Seq((qR, expR, "rollup"), (qGid, expG, "cube+gid"))) {
        val paths = scannedPaths(q)
        assert(paths.exists(_.contains("rollup_mv")),
          s"$what: expected the keyed rollup to serve the grouping sets: $paths")
        assert(!paths.exists(_.contains("events_keyed")),
          s"$what: base must not be scanned under the single-phase shape: $paths")
        assert(rset(q) == exp, s"$what: served answer drifted")
      }
      // A RAW scan (no resolve window) must keep declining.
      val raw = spark.read.parquet(t.spec.path)
        .rollup(col("event_type"))
        .agg(sum(expr("CAST(value AS DECIMAL(18,4))")).as("s"))
      assert(scannedPaths(raw).exists(_.contains("events_keyed")),
        "raw-scan grouping sets must stay on the base")
    } finally MaterializedView.drop(t.spec.path)
  }
}
