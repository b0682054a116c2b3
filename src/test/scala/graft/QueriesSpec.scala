package graft

/** Contract smoke over every registered query at sf0.001: runs, returns
  * rows, and the oracle map stays consistent with the query map. (Value
  * correctness is the driver's DuckDB compare at sf0.01 — pre-validated
  * locally the same way.)
  */
class QueriesSpec extends SparkTestBase {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned zero rows")
    }
  }
}
