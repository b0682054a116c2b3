package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.MvAdvisor
import graft.table.MaterializedView

/** [[MvAdvisor]]: workload analysis must recommend exactly the rollup
  * whose materialization makes every analyzed query serve from it, and
  * must report (not silently drop) out-of-scope queries.
  */
class MvAdvisorSpec extends SparkTestBase {

  private def scannedPaths(df: DataFrame): Seq[String] =
    graft.plans.PlanWalk.scannedFiles(df)

  private def base = s"$sf0001/orders.parquet"

  private def qStatus = spark.read.parquet(base)
    .groupBy(col("o_orderstatus"))
    .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
      .as("sum_price"), count(lit(1)).as("n_orders"))
  private def qAvg = spark.read.parquet(base)
    .groupBy(col("o_orderpriority"))
    .agg(avg(expr("CAST(o_totalprice AS DECIMAL(18,4))")).as("avg_price"))
  private def qMonth = spark.read.parquet(base)
    .filter(month(col("o_orderdate")) <= 6)
    .groupBy(month(col("o_orderdate")).as("od_month"))
    .agg(count(lit(1)).as("n_orders"))

  test("one recommendation covers the workload; materializing serves all queries") {
    val advice = MvAdvisor.analyze(Seq(qStatus, qAvg, qMonth))
    assert(advice.skipped.isEmpty, advice.skipped.mkString("; "))
    assert(advice.recommendations.length == 1)
    val rec = advice.recommendations.head
    assert(rec.groupCols == Seq("o_orderpriority", "o_orderstatus"))
    assert(rec.exprDims.length == 1, "month(o_orderdate) as a derived dim")
    assert(rec.sums.length == 1 && rec.counts.length == 1,
      "avg needs the (sum, count) pair; qStatus's sum is the same measure")
    assert(rec.queriesCovered == 3)

    val direct = (qStatus.collect().toSet, qAvg.collect().toSet,
      qMonth.collect().toSet)
    val work = Files.createTempDirectory("graft_advisor_").toString
    MvAdvisor.createRecommended(spark, rec, "advised", s"$work/mv")
    try {
      for ((q, label) <- Seq((qStatus, "status"), (qAvg, "avg"), (qMonth, "month"))) {
        val paths = scannedPaths(q)
        assert(paths.exists(_.contains("/mv")),
          s"workload query '$label' must serve from the rollup: $paths")
        assert(!paths.exists(_.contains("orders.parquet")), s"$label: $paths")
      }
      assert(qStatus.collect().toSet == direct._1)
      assert(qAvg.collect().toSet == direct._2)
      assert(qMonth.collect().toSet == direct._3)
      // The materialized recommendation is hive-partitioned by the
      // leading dim out of the box, and a dim-filtered serve
      // partition-prunes the rollup scan.
      val mvDirs = new java.io.File(s"$work/mv").listFiles().toSeq
        .map(_.getName).filter(n => !n.startsWith("_") && !n.startsWith("."))
      assert(mvDirs.nonEmpty && mvDirs.forall(_.startsWith("o_orderpriority=")),
        s"advised rollup must be hive-partitioned by the leading dim: $mvDirs")
      val filtered = spark.read.parquet(rec.basePath)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderpriority"))
        .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
          .as("sum_price"))
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
      walk(filtered.queryExecution.executedPlan)
      val scans = found.filter(
        _.relation.location.rootPaths.exists(_.toString.contains("/mv")))
      assert(scans.nonEmpty, "the filtered query must serve from the rollup")
      assert(scans.forall(_.partitionFilters.nonEmpty),
        s"the dim filter must partition-prune the advised rollup scan: " +
          scans.map(_.partitionFilters).mkString("; "))
    } finally MaterializedView.drop(rec.basePath)
  }

  test("out-of-scope queries are reported, in-scope ones still covered") {
    val qDistinct = spark.read.parquet(base)
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"))
    val advice = MvAdvisor.analyze(Seq(qStatus, qDistinct))
    assert(advice.skipped.length == 1 &&
      advice.skipped.head.contains("underivable"),
      advice.skipped.mkString("; "))
    assert(advice.recommendations.length == 1)
    assert(advice.recommendations.head.queriesCovered == 1)
  }

  test("cost gate splits an exploding dim union; both rollups serve their halves") {
    // o_orderkey is unique: the union rollup (status, orderkey) would be
    // base-sized (ratio ≈ 1), so the gate must split — the near-key query
    // gets its own (ratio-flagged) rollup, the cheap one stays cheap.
    def qLow = spark.read.parquet(base)
      .groupBy(col("o_orderstatus"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).as("s"))
    def qHigh = spark.read.parquet(base)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"))
    val costed = MvAdvisor.analyzeCosted(spark, Seq(qLow, qHigh), maxRatio = 0.5)
    assert(costed.skipped.isEmpty, costed.skipped.mkString("; "))
    assert(costed.recommendations.length == 2,
      s"expected a split, got ${costed.recommendations}")
    val Seq(cHigh, cLow) = costed.recommendations.sortBy(-_.ratio)
    assert(cHigh.rec.groupCols == Seq("o_orderkey") && cHigh.ratio > 0.9,
      s"near-key rollup must be flagged by its measured ratio: $cHigh")
    assert(cLow.rec.groupCols == Seq("o_orderstatus") && cLow.ratio < 0.05,
      s"the cheap rollup must stay cheap: $cLow")
    assert(costed.recommendations.map(_.rec.queriesCovered).sum == 2)
    assert(costed.recommendations.forall(_.baseRows == 1500L))

    // Materialize both; each workload query serves from ITS rollup.
    val work = Files.createTempDirectory("graft_advsplit_").toString
    MvAdvisor.createRecommended(spark, cLow.rec, "adv_low", s"$work/mv_low")
    MvAdvisor.createRecommended(spark, cHigh.rec, "adv_high", s"$work/mv_high")
    try {
      val expLow = {
        val p = scannedPaths(qLow)
        assert(p.exists(_.contains("mv_low")) && !p.exists(_.contains("orders.parquet")), s"$p")
        qLow.collect().toSet
      }
      val pHigh = scannedPaths(qHigh)
      assert(pHigh.exists(_.contains("mv_high")) &&
        !pHigh.exists(_.contains("orders.parquet")), s"$pHigh")
      // Answers equal the direct plans (computed after drop).
      MaterializedView.drop(base)
      assert(qLow.collect().toSet == expLow)
    } finally MaterializedView.drop(base)
  }

  test("a compressing union passes the gate un-split, ratio measured") {
    def qStatusC = spark.read.parquet(base)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    def qPrio = spark.read.parquet(base)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val costed = MvAdvisor.analyzeCosted(spark, Seq(qStatusC, qPrio), maxRatio = 0.5)
    assert(costed.recommendations.length == 1)
    val c = costed.recommendations.head
    assert(c.rec.groupCols == Seq("o_orderpriority", "o_orderstatus"))
    assert(c.baseRows == 1500L && c.estRollupRows <= 15L && c.ratio < 0.05,
      s"15 (status × priority) tuples over 1500 rows: $c")
  }

  test("star workload: one joined recommendation; materializing serves both join queries") {
    val dim = s"$sf0001/customer.parquet"
    def jSeg = spark.read.parquet(base)
      .join(spark.read.parquet(dim),
        col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
        .as("sum_price"))
    def jStatus = spark.read.parquet(base)
      .join(spark.read.parquet(dim),
        col("c_custkey") === col("o_custkey"), "inner") // reversed sides
      .filter(col("o_orderstatus") === "O")
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val advice = MvAdvisor.analyze(Seq(jSeg, jStatus, qStatus))
    assert(advice.skipped.isEmpty, advice.skipped.mkString("; "))
    // Two recommendations: the star (2 queries) and the flat (1 query).
    assert(advice.recommendations.length == 2)
    val star = advice.recommendations.find(_.joins.nonEmpty).get
    val flat = advice.recommendations.find(_.joins.isEmpty).get
    assert(star.joins.map { case (p, f, d) => (f, d) } ==
      Seq(("o_custkey", "c_custkey")))
    assert(star.groupCols == Seq("c_mktsegment", "o_orderstatus"))
    assert(star.queriesCovered == 2 && flat.queriesCovered == 1)
    val direct = (jSeg.collect().toSet, jStatus.collect().toSet)
    val work = Files.createTempDirectory("graft_advisor_star_").toString
    MvAdvisor.createRecommended(spark, star, "advised_star", s"$work/mv")
    try {
      for ((q, label) <- Seq((jSeg, "seg"), (jStatus, "status"))) {
        val paths = scannedPaths(q)
        assert(paths.exists(_.contains("/mv")),
          s"star query '$label' must serve from the joined rollup: $paths")
        assert(!paths.exists(_.contains("orders.parquet")) &&
          !paths.exists(_.contains("customer.parquet")), s"$label: $paths")
      }
      assert(jSeg.collect().toSet == direct._1)
      assert(jStatus.collect().toSet == direct._2)
    } finally MaterializedView.drop(star.basePath)
  }

  test("q141 query shape: result equals direct join aggregation at sf0.001") {
    val direct = spark.read.parquet(base)
      .join(spark.read.parquet(s"$sf0001/customer.parquet"),
        col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double")
        .as("sum_price"), count(lit(1)).as("n_orders"))
      .collect().toSet
    val viaMv = MaterializedView.mvAdvisorStar(spark, sf0001).collect().toSet
    assert(viaMv == direct)
  }

  test("q138 query shape: result equals direct aggregation at sf0.001") {
    val direct = qStatus.collect().toSet
    val viaMv = MaterializedView.mvAdvisorRevenue(spark, sf0001).collect().toSet
    assert(viaMv == direct)
  }
}
