package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Dynamic partition pruning over the hive-partitioned orders fact: the
  * runtime-derived year dim must show up as a DynamicPruningSubquery on
  * the partition column (I/O elision the oracle can't see), and the
  * pruned result must equal the unpartitioned reference join.
  */
class DppSpec extends SparkTestBase {
  import spark.implicits._

  test("partitioned fact join plans a DynamicPruningSubquery and matches the reference") {
    // 499000 selects 3 of sf0.001's 7 years — a proper subset, so the
    // pruning is live, not degenerate (all or nothing).
    val df = Relational.partitionPrunedRevenue(spark, sf0001, threshold = 499000.0)
    val planText = df.queryExecution.executedPlan.toString
    assert(planText.toLowerCase.contains("dynamicpruning"),
      s"expected a DynamicPruningSubquery partition filter in:\n$planText")

    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val years = orders.filter($"o_totalprice" > 499000.0)
      .select(year($"o_orderdate").as("y")).distinct().as[Int].collect().toSet
    assert(years.size == 3, s"threshold should keep 3 years, got $years")

    val got = df.select($"o_year", $"revenue", $"n_orders")
      .as[(Int, Double, Long)].collect().toMap2
    val want = orders.filter(year($"o_orderdate").isInCollection(years))
      .groupBy(year($"o_orderdate").cast("int").as("o_year"))
      .agg(
        sum($"o_totalprice".cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .as[(Int, Double, Long)].collect().toMap2
    assert(got == want)
  }

  private implicit class Tuple3Seq[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map { case (a, b, c) => a -> (b, c) }.toMap
  }
}
