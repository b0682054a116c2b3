package graft

import graft.sources.Tables
import graft.table.BucketedTable

/** The write-time bucketing contract: two tables bucketed on the join key
  * with equal bucket counts join with ZERO exchanges — the shuffle is paid
  * once at write, not per query.
  */
class BucketedJoinSpec extends SparkTestBase {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed-by-key tables sort-merge join with no exchange") {
    val tag = System.nanoTime()
    val ordersT = s"graft_b_orders_$tag"
    val custT = s"graft_b_cust_$tag"
    val orders = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("c_custkey").as("o_custkey"),
        org.apache.spark.sql.functions.col("c_mktsegment"))
    BucketedTable.write(orders, ordersT, buckets = 8, key = "o_custkey")
    BucketedTable.write(cust, custT, buckets = 8, key = "o_custkey")
    try {
      // disable broadcast (it would trivially avoid the shuffle) and AQE
      // (whose wrapper hides the static plan the assertion inspects)
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val j = spark.table(ordersT).join(spark.table(custT), "o_custkey")
        val physical = j.queryExecution.executedPlan.toString
        assert(!physical.contains("Exchange"),
          s"bucketed join must not shuffle:\n$physical")
        // and it is the same result as the plain (shuffling) join
        val plain = orders.join(cust, "o_custkey")
        assert(j.count() == plain.count())
        assert(plain.count() > 0)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $ordersT")
      spark.sql(s"DROP TABLE IF EXISTS $custT")
    }
  }
}
