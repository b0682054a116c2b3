package graft

import graft.operators.Temporal

/** Unit semantics of the temporal operators (the event-table queries q47/
  * q48 are value-checked against DuckDB's native ASOF JOIN / theta-join by
  * the oracle harness; this pins the generic operator's edge cases).
  */
class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  test("asof join: latest-preceding match, inclusive ties, no-match dropped") {
    val left = Seq(
      (1L, 10L, "L1"), // after both right rows → matches B@8
      (1L, 5L, "L2"),  // exactly at A@5 → inclusive match
      (1L, 3L, "L3"),  // before every right row → dropped
      (2L, 7L, "L4")   // key with no right side → dropped
    ).toDF("k", "lts", "lid")
    val right = Seq(
      (1L, 5L, "A"),
      (1L, 8L, "B")
    ).toDF("k", "rts", "v")

    val out = Temporal
      .asofJoin(left, right, Seq("k"), "lts", "rts", Seq("rts", "v"))
      .select($"lid", $"rts", $"v")
      .as[(String, Long, String)].collect().toSet
    assert(out == Set(("L1", 8L, "B"), ("L2", 5L, "A")))
  }

  test("binned range join emits each qualifying pair exactly once") {
    val out = Temporal.errorNeighborhood(spark, sf0001)
    val pairs = out.select("err_id", "near_id")
      .as[(Long, Long)].collect().toSeq
    assert(pairs.distinct.size == pairs.size, "no duplicate pairs from binning")
  }
}
