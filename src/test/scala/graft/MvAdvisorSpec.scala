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
