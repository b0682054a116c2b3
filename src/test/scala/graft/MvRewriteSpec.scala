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

  test("a changed base declines the rewrite (staleness guard)") {
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
      // Append a new data file: the stored rollup no longer matches.
      val existing = Files.list(Paths.get(base))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(existing, Paths.get(base, "part-extra.snappy.parquet"))
      val after = userQuery(base)
      val paths = scannedPaths(after)
      assert(paths.exists(_.contains("orders.parquet")),
        s"stale MV must decline; scanned: $paths")
      // The fresh base answer (doubled counts) differs from the stale MV's.
      assert(rows(after) != beforeAppend,
        "post-append result should differ from the stale rollup's answer")
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
      assert(scannedPaths(userQuery(base)).exists(_.contains("orders.parquet")),
        "stale rollup must decline before refresh")
      val (_, incremental) = MaterializedView.refresh(spark, mvPath)
      assert(incremental, "pure append must take the incremental path")
      val served = userQuery(base)
      assert(scannedPaths(served).exists(_.contains("/mv")),
        "refresh must re-arm the rollup serve")
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

  test("q128 query shape: result equals direct aggregation at sf0.001") {
    val direct = rows(userQuery(s"$sf0001/orders.parquet"))
    val viaMv = rows(MaterializedView.mvRewriteRevenue(spark, sf0001))
    assert(viaMv == direct)
    MaterializedView.drop(s"$sf0001/orders.parquet")
  }
}
