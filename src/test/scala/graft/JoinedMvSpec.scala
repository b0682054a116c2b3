package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.table.MaterializedView

/** Materialized views over STAR JOINS ([[MaterializedView.createJoined]]
  * + the join-matching arm of [[graft.plans.MvAggregateRewrite]]): the
  * same join + aggregate written directly must collapse to a rollup scan
  * (no fact scan, no join), freshness must watch every source, and
  * refresh must be fact-append incremental / dim-change rebuild.
  */
class JoinedMvSpec extends SparkTestBase {

  private def scannedPaths(df: DataFrame): Seq[String] =
    graft.plans.PlanWalk.scannedFiles(df)

  // Private dir-shaped copies so tests can mutate them.
  private def copyTables(): (String, String) = {
    val work = Files.createTempDirectory("graft_jmv_")
    def cp(t: String): String = {
      val dst = work.resolve(s"$t.parquet")
      Files.createDirectories(dst)
      Files.copy(Paths.get(sf0001, s"$t.parquet"),
        dst.resolve("part-00000.snappy.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES)
      dst.toString
    }
    (cp("orders"), cp("customer"))
  }

  private def joinAgg(fact: String, dim: String): DataFrame =
    spark.read.parquet(fact)
      .join(spark.read.parquet(dim),
        col("o_custkey") === col("c_custkey"), "inner")
      .filter(col("o_orderstatus") === "O")
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
          .as("sum_price"),
        count(lit(1)).as("n_orders"))

  private def rows(df: DataFrame): Set[(String, Double, Long)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

  private def mkMv(fact: String, dim: String, name: String = "jmv"): String = {
    val mvPath = Files.createTempDirectory("graft_jmv_out_").toString + "/mv"
    MaterializedView.createJoined(
      spark, name, fact, mvPath,
      joins = Seq((dim, "o_custkey", "c_custkey")),
      groupCols = Seq("c_mktsegment", "o_orderstatus"),
      sums = Seq("sum_price_d" -> expr("CAST(o_totalprice AS DECIMAL(18,4))")),
      countCol = Some("cnt"))
    mvPath
  }

  private def direct(fact: String, dim: String): Set[(String, Double, Long)] = {
    val saved = MaterializedView.lookupAll(fact)
    MaterializedView.drop(fact)
    try rows(joinAgg(fact, dim))
    finally saved.foreach(d => MaterializedView.attach(spark, d.mvPath))
  }

  test("join + aggregate collapses to a rollup scan (join elided), same result") {
    val (fact, dim) = copyTables()
    val expected = rows(joinAgg(fact, dim)) // planned BEFORE registration
    try {
      mkMv(fact, dim)
      val served = joinAgg(fact, dim)
      val paths = scannedPaths(served)
      assert(paths.exists(_.contains("/mv")), s"expected rollup scan: $paths")
      assert(!paths.exists(_.contains("orders.parquet")) &&
        !paths.exists(_.contains("customer.parquet")),
        s"neither join side may be scanned: $paths")
      assert(rows(served) == expected)
      // The reversed equality (c_custkey = o_custkey) is the same join.
      val reversed = spark.read.parquet(fact)
        .join(spark.read.parquet(dim),
          col("c_custkey") === col("o_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(reversed).exists(_.contains("/mv")),
        "join-side order must not matter")
    } finally MaterializedView.drop(fact)
  }

  test("decline shapes: fact alone, wrong join key, non-equi extra, outer join") {
    val (fact, dim) = copyTables()
    try {
      mkMv(fact, dim)
      // An aggregate over the FACT alone must not be served by a joined
      // rollup (its rows are multiplied/filtered by the join).
      val factOnly = spark.read.parquet(fact)
        .groupBy(col("o_orderstatus"))
        .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).as("s"))
      assert(scannedPaths(factOnly).exists(_.contains("orders.parquet")))
      // A different join key is a different relation.
      val wrongKey = spark.read.parquet(fact)
        .join(spark.read.parquet(dim),
          col("o_orderkey") === col("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(wrongKey).exists(_.contains("orders.parquet")))
      // An extra non-equi join predicate is a different relation.
      val nonEqui = spark.read.parquet(fact)
        .join(spark.read.parquet(dim),
          col("o_custkey") === col("c_custkey") &&
            col("o_totalprice") > col("c_acctbal"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(nonEqui).exists(_.contains("orders.parquet")))
      // Outer joins keep unmatched rows the rollup never saw.
      val outer = spark.read.parquet(fact)
        .join(spark.read.parquet(dim),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(outer).exists(_.contains("orders.parquet")))
      // A filter on a non-dimension column declines.
      val nonDimFilter = joinAgg(fact, dim).queryExecution // shape ok
      val filtered = spark.read.parquet(fact)
        .join(spark.read.parquet(dim),
          col("o_custkey") === col("c_custkey"), "inner")
        .filter(col("c_acctbal") > 0)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(filtered).exists(_.contains("orders.parquet")))
    } finally MaterializedView.drop(fact)
  }

  test("freshness watches EVERY source: a dim change declines until refresh") {
    val (fact, dim) = copyTables()
    try {
      mkMv(fact, dim)
      assert(scannedPaths(joinAgg(fact, dim)).exists(_.contains("/mv")))
      Thread.sleep(1100) // local-fs mtime can be second-granular
      val existing = Files.list(Paths.get(dim))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(existing, Paths.get(dim, "part-extra.snappy.parquet"))
      assert(scannedPaths(joinAgg(fact, dim))
        .exists(_.contains("orders.parquet")),
        "a changed dim must decline the rewrite")
    } finally MaterializedView.drop(fact)
  }

  test("append-stale star MV hybrid-serves: rollup + (delta fact ⋈ dim)") {
    val (fact, dim) = copyTables()
    try {
      mkMv(fact, dim)
      Thread.sleep(1100)
      val factFile = Files.list(Paths.get(fact))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(factFile, Paths.get(fact, "part-extra.snappy.parquet"))
      val served = joinAgg(fact, dim)
      val paths = scannedPaths(served)
      assert(paths.exists(_.contains("/mv")), s"$paths")
      assert(paths.exists(_.contains("part-extra")),
        s"hybrid must read the appended fact file: $paths")
      assert(!paths.exists(_.contains("part-00000")),
        s"hybrid must not rescan pre-rollup fact files: $paths")
      assert(rows(served) == direct(fact, dim),
        "hybrid answer must equal the post-append direct join aggregate")
    } finally MaterializedView.drop(fact)
  }

  test("fact-append refresh is incremental; a dim change rebuilds") {
    val (fact, dim) = copyTables()
    val mvPath = mkMv(fact, dim)
    try {
      Thread.sleep(1100)
      val factFile = Files.list(Paths.get(fact))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(factFile, Paths.get(fact, "part-appended.snappy.parquet"))
      val (_, inc1) = MaterializedView.refresh(spark, mvPath)
      assert(inc1, "a pure fact append must merge incrementally")
      val served = joinAgg(fact, dim)
      assert(scannedPaths(served).exists(_.contains("/mv")))
      assert(rows(served) == direct(fact, dim),
        "fact-append incremental refresh must equal the direct join aggregate")
      Thread.sleep(1100)
      val dimFile = Files.list(Paths.get(dim))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(dimFile, Paths.get(dim, "part-dim2.snappy.parquet"))
      val (_, inc2) = MaterializedView.refresh(spark, mvPath)
      assert(!inc2, "a dim change can rewrite every group: rebuild")
      val served2 = joinAgg(fact, dim)
      assert(scannedPaths(served2).exists(_.contains("/mv")))
      assert(rows(served2) == direct(fact, dim))
    } finally MaterializedView.drop(fact)
  }

  test("sidecar round-trips the join links (fresh-session attach)") {
    val (fact, dim) = copyTables()
    val mvPath = mkMv(fact, dim)
    try {
      val expected = rows(joinAgg(fact, dim))
      MaterializedView.drop(fact)
      assert(scannedPaths(joinAgg(fact, dim))
        .exists(_.contains("orders.parquet")))
      val d = MaterializedView.attach(spark, mvPath)
      assert(d.links.map(l => (l.dimPath, l.factCol, l.dimCol)) ==
        Seq((dim, "o_custkey", "c_custkey")))
      assert(d.links.head.dimFiles.nonEmpty,
        "the dim inventory must survive the round trip")
      val served = joinAgg(fact, dim)
      assert(scannedPaths(served).exists(_.contains("/mv")))
      assert(rows(served) == expected)
    } finally MaterializedView.drop(fact)
  }

  test("cross-wired star joins decline; colliding column names refuse at create") {
    val work = Files.createTempDirectory("graft_jmv_wire_")
    import spark.implicits._
    val fact = work.resolve("fact.parquet").toString
    Seq((1L, 10L, 5.0), (2L, 20L, 7.0))
      .toDF("cust_id", "prod_id", "v").write.parquet(fact)
    val customers = work.resolve("customers.parquet").toString
    Seq((1L, "gold"), (2L, "basic"))
      .toDF("c_id", "c_tier").write.parquet(customers)
    val products = work.resolve("products.parquet").toString
    Seq((10L, "toy"), (20L, "tool"))
      .toDF("p_id", "p_kind").write.parquet(products)
    val mvPath = work.resolve("mv").toString
    try {
      MaterializedView.createJoined(
        spark, "wired", fact, mvPath,
        joins = Seq((customers, "cust_id", "c_id"), (products, "prod_id", "p_id")),
        groupCols = Seq("c_tier", "p_kind"),
        sums = Seq("sum_v" -> col("v")),
        countCol = Some("cnt"))
      // The REGISTERED wiring serves.
      val good = spark.read.parquet(fact)
        .join(spark.read.parquet(customers), col("cust_id") === col("c_id"))
        .join(spark.read.parquet(products), col("prod_id") === col("p_id"))
        .groupBy(col("c_tier")).agg(sum(col("v")).as("s"))
      assert(scannedPaths(good).exists(_.contains("/mv")))
      // The OPPOSITE wiring (cust_id ⋈ products, prod_id ⋈ customers) is
      // a different relation with the same name multiset — must decline.
      val crossed = spark.read.parquet(fact)
        .join(spark.read.parquet(customers), col("prod_id") === col("c_id"))
        .join(spark.read.parquet(products), col("cust_id") === col("p_id"))
        .groupBy(col("c_tier")).agg(sum(col("v")).as("s"))
      assert(scannedPaths(crossed).exists(_.contains("fact.parquet")),
        "a cross-wired join must not be served from the rollup")
      // Reversed side registration fails fast.
      val e1 = intercept[IllegalArgumentException] {
        MaterializedView.createJoined(
          spark, "reversed", fact, work.resolve("mv2").toString,
          joins = Seq((customers, "c_id", "cust_id")),
          groupCols = Seq("c_tier"), sums = Seq("s" -> col("v")))
      }
      assert(e1.getMessage.contains("factCol"))
      // A fact/dim column-name collision fails fast (dims and measures
      // resolve by bare name across the star).
      val dup = work.resolve("dup.parquet").toString
      Seq((1L, "x")).toDF("cust_id", "d").write.parquet(dup)
      val e2 = intercept[IllegalArgumentException] {
        MaterializedView.createJoined(
          spark, "collide", fact, work.resolve("mv3").toString,
          joins = Seq((dup, "cust_id", "cust_id")),
          groupCols = Seq("d"), sums = Seq("s" -> col("v")))
      }
      assert(e2.getMessage.contains("unique column names"))
    } finally MaterializedView.drop(fact)
  }

  test("an in-place dim-file rewrite declines the serve (signatures, not dir mtime)") {
    val (fact, dim) = copyTables()
    try {
      mkMv(fact, dim)
      assert(scannedPaths(joinAgg(fact, dim)).exists(_.contains("/mv")))
      Thread.sleep(1100)
      // Overwrite the dim part file IN PLACE: same name, dir mtime
      // unchanged (no create/delete) — only the per-file signature sees
      // it.
      val victim = Files.list(Paths.get(dim))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val halved = spark.read.parquet(dim).limit(50)
      val stage = Files.createTempDirectory("graft_jmv_half_").toString
      halved.coalesce(1).write.mode("overwrite").parquet(stage)
      val newFile = Files.list(Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(newFile, victim,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val after = joinAgg(fact, dim)
      assert(scannedPaths(after).exists(_.contains("orders.parquet")),
        "a rewritten dim file must decline the rollup serve")
      assert(rows(after) == direct(fact, dim))
    } finally MaterializedView.drop(fact)
  }

  test("q136 query shape: result equals direct join aggregation at sf0.001") {
    val directRows = rows(joinAgg(
      s"$sf0001/orders.parquet", s"$sf0001/customer.parquet"))
    val viaMv = rows(MaterializedView.mvJoinRevenue(spark, sf0001))
    assert(viaMv == directRows)
  }

  test("single-phase ROLLUP/CUBE over the star serves from the joined rollup") {
    val (fact, dim) = copyTables()
    def joined = spark.read.parquet(fact)
      .join(spark.read.parquet(dim),
        col("o_custkey") === col("c_custkey"), "inner")
    def qR = joined
      .rollup(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double").as("p"))
    def qGid = joined
      .cube(col("c_mktsegment"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
    def rset(df: DataFrame) = df.collect().map { r =>
      (0 until r.length).map(i => if (r.isNullAt(i)) None else Some(r.get(i)))
    }.toSet
    val (expR, expG) = (rset(qR), rset(qGid))
    try {
      mkMv(fact, dim)
      for ((q, exp, what) <- Seq((qR, expR, "rollup"), (qGid, expG, "cube+gid"))) {
        val paths = scannedPaths(q)
        assert(paths.exists(_.contains("/mv")),
          s"$what: the star grouping sets must serve from the joined rollup: $paths")
        assert(!paths.exists(p =>
          p.contains("orders.parquet") || p.contains("customer.parquet")),
          s"$what: neither join side may be scanned: $paths")
        assert(rset(q) == exp, s"$what: served answer drifted")
      }
      // Decline: a measure the joined rollup does not store.
      val qBad = joined.rollup(col("c_mktsegment"))
        .agg(sum(col("o_orderkey")).as("s"))
      assert(scannedPaths(qBad).exists(_.contains("orders.parquet")),
        "an underivable star grouping-sets measure must decline")
    } finally MaterializedView.drop(fact)
  }
}
