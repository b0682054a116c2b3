package graft

import graft.operators.UpsertOps

/** The KMV sketch as STREAMING state: with 1-file micro-batches the
  * per-group buffers must merge across batches through the state store
  * and land on the same answer as the single-batch drain (and, in exact
  * mode, as the batch COUNT(DISTINCT) the q117 oracle checks).
  */
class StreamKmvSpec extends SparkTestBase {
  import spark.implicits._

  test("multi-batch sketch state merges to the single-batch answer") {
    def result(maxFiles: Option[Int]): Map[(Long, String), (Long, Long)] =
      UpsertOps.streamDistinctSketchVia(spark, sf0001, maxFiles)
        .as[(Long, String, Long, Long)].collect()
        .map { case (w, t, u, n) => (w, t) -> (u, n) }.toMap

    val multi = result(Some(1)) // 4 staged files -> 4 micro-batches
    val single = result(None)
    assert(multi == single)
    assert(multi.nonEmpty)

    // exact-mode cross-check against a plain batch aggregate
    val batch = graft.sources.Tables.eventsUs(spark, sf0001)
      .selectExpr(
        "(ts_us div 3600000000) * 3600000000 AS w", "event_type",
        "user_id")
      .groupBy("w", "event_type")
      .agg(
        org.apache.spark.sql.functions.countDistinct("user_id").as("u"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .as[(Long, String, Long, Long)].collect()
      .map { case (w, t, u, n) => (w, t) -> (u, n) }.toMap
    assert(multi == batch)
  }
}
