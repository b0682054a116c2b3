package graft.plans
object DebugAgg {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    org.apache.log4j.LogManager.getRootLogger
    val df = graft.SparkEntry.queries("q173_decimal_sum_stats")(spark, "/root/testdata/sf0.001")
    val rule = new StatsAggregateRewrite(spark)
    val shapes = rule.aggShapes(df.queryExecution.analyzed)
    println(s"[dbg] shapes=${shapes}")
    df.queryExecution.optimizedPlan.collect {
      case ag: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        println(s"[dbg] optimized aggExprs = ${ag.aggregateExpressions.map(_.getClass.getSimpleName)}")
        ag.aggregateExpressions.foreach(e => println(s"[dbg]   $e"))
    }
    spark.stop()
  }
}
