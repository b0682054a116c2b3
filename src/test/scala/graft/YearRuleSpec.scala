package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** [[graft.plans.YearPredicateToRange]]: `year(col) <cmp> literal` becomes
  * a sargable range that reaches the parquet scan, with identical results
  * (the session under test carries GraftExtensions).
  */
class YearRuleSpec extends SparkTestBase {
  import spark.implicits._

  private def orders = Tables.orders(spark, sf0001)

  private def collectedYears: Map[Long, Int] =
    orders.select("o_orderkey", "o_orderdate")
      .as[(Long, LocalDateTime)].collect()
      .map { case (k, d) => k -> d.getYear }.toMap

  test("year(ts) = lit rewrites to a pushed range with identical rows") {
    val df = orders.filter(year(col("o_orderdate")) === 1997)
      .select("o_orderkey")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("year("),
      s"year() should have been rewritten:\n$optimized")
    val pushed = df.queryExecution.executedPlan.toString
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate") &&
      pushed.contains("LessThan(o_orderdate"),
      s"range must reach PushedFilters:\n$pushed")
    val expected = collectedYears.collect { case (k, y) if y == 1997 => k }.toSet
    assert(df.as[Long].collect().toSet == expected && expected.nonEmpty)
  }

  test("all comparison shapes and operand orders agree with per-row year()") {
    val years = collectedYears
    def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("o_orderkey").as[Long].collect().toSet
    val c = col("o_orderdate")
    assert(keys(orders.filter(year(c) >= 1997)) ==
      years.collect { case (k, y) if y >= 1997 => k }.toSet)
    assert(keys(orders.filter(year(c) > 1996)) ==
      years.collect { case (k, y) if y > 1996 => k }.toSet)
    assert(keys(orders.filter(year(c) < 1997)) ==
      years.collect { case (k, y) if y < 1997 => k }.toSet)
    assert(keys(orders.filter(year(c) <= 1996)) ==
      years.collect { case (k, y) if y <= 1996 => k }.toSet)
    assert(keys(orders.filter(lit(1997) === year(c))) ==
      years.collect { case (k, y) if y == 1997 => k }.toSet)
    assert(keys(orders.filter(lit(1997) > year(c))) ==
      years.collect { case (k, y) if y < 1997 => k }.toSet)
  }

  test("year(c) IN (years) becomes an OR of ranges with identical rows") {
    val df = orders.filter(col("o_orderdate").isNotNull)
      .filter(year(col("o_orderdate")).isin(1996, 1998))
      .select("o_orderkey")
    assert(!df.queryExecution.optimizedPlan.toString.contains("year("))
    val expected = collectedYears
      .collect { case (k, y) if y == 1996 || y == 1998 => k }.toSet
    assert(df.as[Long].collect().toSet == expected && expected.nonEmpty)
  }

  test("null dates and out-of-range years keep year() semantics") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("graft_year_").toString
    spark.createDataFrame(
      Seq(
        Row(1L, java.sql.Date.valueOf("1997-06-15")),
        Row(2L, null),
        Row(3L, java.sql.Date.valueOf("1998-01-01"))).asJava,
      StructType(Seq(
        StructField("id", LongType), StructField("d", DateType))))
      .write.parquet(s"$tmp/t")
    // parquet-backed, so the optimizer can't constant-fold the relation
    // away and the plan assertions observe the rule's real decisions
    val df = spark.read.parquet(s"$tmp/t")
    // null rows are filtered out by both forms
    assert(df.filter(year(col("d")) === 1997).select("id").as[Long]
      .collect().toSeq == Seq(1L))
    assert(df.filter(!(year(col("d")) === 1997)).select("id").as[Long]
      .collect().toSeq == Seq(3L), "negation must also drop the null row")
    // out-of-range year: the rule must decline (overflow guard) and the
    // original predicate still evaluates correctly
    val far = df.filter(year(col("d")) === 5881600)
    assert(far.queryExecution.optimizedPlan.toString.contains("year("))
    assert(far.count() == 0)
  }

  test("date columns rewrite too; non-filter uses of year() are untouched") {
    val d = orders.select(
      col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
    // to_date projection sits between scan and filter; the rewrite fires
    // on the date-typed attribute
    val f = d.filter(year(col("od")) === 1997)
    assert(!f.queryExecution.optimizedPlan.toString.contains("year("))
    val expected = collectedYears.collect { case (k, y) if y == 1997 => k }.toSet
    assert(f.select("o_orderkey").as[Long].collect().toSet == expected)
    // projection (not filter) keeps the year() expression
    val proj = orders.select(year(col("o_orderdate")).as("y"))
    assert(proj.queryExecution.optimizedPlan.toString.contains("year("))
  }
}
