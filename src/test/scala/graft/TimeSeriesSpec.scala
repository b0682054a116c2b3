package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Plan and coverage properties of the time-series operators (result
  * correctness is the q111/q112 oracles' job).
  */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  test("sessionization rides ONE exchange: window and aggregate share the user partitioning") {
    val df = TimeSeries.sessionStats(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges in:\n$plan")
  }

  test("daily resample covers each user's full span, observed rows match raw days") {
    val out = TimeSeries.dailyResample(spark, sf0001).cache()
    val spans = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), (max("day") - min("day") + 1).as("span"))
      .filter(col("n") =!= col("span"))
    assert(spans.isEmpty, "grid must be gapless per user")
    val rawDays = Tables_events_days
    val observed = out.filter(col("observed") === 1)
      .select("user_id", "day").as[(Long, Long)].collect().toSet
    assert(observed == rawDays)
    // forward fill leaves no nulls (every user's first day is observed)
    assert(out.filter(col("value").isNull).isEmpty)
    out.unpersist()
  }

  private def Tables_events_days: Set[(Long, Long)] =
    graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
      .distinct().as[(Long, Long)].collect().toSet
}
