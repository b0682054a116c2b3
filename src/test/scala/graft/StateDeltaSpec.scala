package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.IncrementalView
import graft.table.{KeyedTable, KeyedTableSpec}

/** The state-delta (CDF) feed and incremental view maintenance: op rows
  * for insert/update/late-arrival/delete, and refresh == full recompute.
  */
class StateDeltaSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): KeyedTable = {
    val path = Files.createTempDirectory("graft_cdf_").toString + "/t"
    KeyedTable(KeyedTableSpec(
      path = path, keyCols = Seq("user_id"), precombineCol = "ts_us",
      tiebreakCols = Seq("event_id"), partitionCols = Seq("event_type"),
      retainHistory = true))
  }

  private def rows(t: (Long, String, Long, Long, Double)*) =
    t.toSeq.toDF("user_id", "event_type", "ts_us", "event_id", "value")

  test("state delta emits insert/update pairs and drops late arrivals") {
    val table = newTable()
    table.upsert(spark, rows(
      (1L, "click", 100L, 1L, 1.0), // will be updated in c1
      (2L, "click", 100L, 2L, 2.0), // will receive a LATE arrival in c1
      (3L, "view", 100L, 3L, 3.0)), // untouched
      commitTime = "c0")
    table.upsert(spark, rows(
      (1L, "click", 200L, 4L, 10.0), // newer: state changes
      (2L, "click", 50L, 5L, 20.0),  // older ts: state must NOT change
      (4L, "view", 100L, 6L, 4.0)),  // brand new key
      commitTime = "c1")

    val feed = table.readStateDelta(spark, "c0", Some("c1"))
      .select("user_id", "event_type", "ts_us", "event_id", "value", "op")
      .as[(Long, String, Long, Long, Double, String)].collect().toSet
    assert(feed == Set(
      (1L, "click", 100L, 1L, 1.0, "update_preimage"),
      (1L, "click", 200L, 4L, 10.0, "update_postimage"),
      (4L, "view", 100L, 6L, 4.0, "insert")))

    // An empty window (nothing committed after c1) yields an empty feed.
    assert(table.readStateDelta(spark, "c1", None).isEmpty)
  }

  test("incrementally maintained view equals the full recompute") {
    val table = newTable()
    table.upsert(spark, rows(
      (1L, "click", 100L, 1L, 1.25),
      (2L, "click", 100L, 2L, 2.50),
      (3L, "view", 100L, 3L, 3.75)), commitTime = "c0")
    table.upsert(spark, rows(
      (1L, "click", 200L, 4L, 10.00), // update
      (2L, "click", 50L, 5L, 99.99),  // late arrival: no state change
      (5L, "view", 100L, 7L, 0.25)),  // insert
      commitTime = "c1")

    val v0 = IncrementalView.computeFull(table.readAsOf(spark, "c0"))
    val incr = IncrementalView.applyDelta(
      v0, table.readStateDelta(spark, "c0", Some("c1")))
    val full = IncrementalView.computeFull(table.read(spark))
    def m(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), col("n_rows"),
        col("sum_value").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(m(incr) == m(full))

    // A second hop: a c2 commit updates an existing key and opens a new
    // group; the iterated refresh still equals the recompute and the new
    // group enters the view.
    table.upsert(spark, rows(
      (1L, "click", 300L, 8L, 5.00),
      (6L, "purchase", 100L, 9L, 7.50)), commitTime = "c2")
    val incr2 = IncrementalView.applyDelta(
      incr, table.readStateDelta(spark, "c1", Some("c2")))
    assert(m(incr2) == m(IncrementalView.computeFull(table.read(spark))))
    assert(incr2.select("event_type").as[String].collect().contains("purchase"))
  }
}
