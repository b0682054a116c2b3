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

  test("approx quantiles (scale knob): within 2% of exact per group") {
    import graft.operators.Profile
    def byPrio(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = byPrio(Profile.orderPriceQuartiles(spark, sf0001))
    val approx = byPrio(Profile.orderPriceQuartiles(spark, sf0001, exact = false))
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (p, es) =>
      es.zip(approx(p)).foreach { case (e, a) =>
        assert(math.abs(a - e) <= e * 0.02, s"$p: approx $a vs exact $e")
      }
    }
  }

  test("approx profile (scale knob): same shape, exact nulls, distincts within HLL error") {
    import graft.operators.Profile
    def byCol(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = byCol(Profile.eventsProfile(spark, sf0001).collect())
    val approx = byCol(Profile.eventsProfile(spark, sf0001, exact = false).collect())
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, (nulls, nd)) =>
      assert(approx(c)._1 == nulls, s"$c null count must stay exact")
      // default HLL++ rsd is 5%; allow 3σ
      assert(math.abs(approx(c)._2 - nd) <= math.max(1L, (nd * 0.15).toLong),
        s"$c approx distinct ${approx(c)._2} vs exact $nd")
    }
  }
}
