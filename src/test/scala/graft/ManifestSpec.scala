package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.{KeyedTable, KeyedTableSpec}

/** Snapshot manifests: pinned reads under concurrent appends, on both
  * copy-on-write and merge-on-read tables.
  */
class ManifestSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(t: (Long, String, Long, Long, Double)*) =
    t.toSeq.toDF("user_id", "event_type", "ts_us", "event_id", "value")

  private def mk(history: Boolean): KeyedTable = {
    val path = Files.createTempDirectory("graft_manifest_").toString + "/t"
    KeyedTable(KeyedTableSpec(
      path = path, keyCols = Seq("user_id"), precombineCol = "ts_us",
      tiebreakCols = Seq("event_id"), partitionCols = Seq("event_type"),
      retainHistory = history))
  }

  test("a pinned snapshot ignores later appends; a fresh one sees them") {
    for (history <- Seq(false, true)) {
      val t = mk(history)
      t.upsert(spark, rows((1L, "click", 100L, 1L, 1.0)), commitTime = "c0")
      val snap = t.writeManifest(spark)
      t.insert(spark, rows((2L, "view", 100L, 2L, 2.0)), commitTime = "c1")
      assert(t.readSnapshot(spark, snap)
        .select("user_id").as[Long].collect().toSet == Set(1L), s"history=$history")
      val snap2 = t.writeManifest(spark)
      assert(t.readSnapshot(spark, snap2)
        .select("user_id").as[Long].collect().toSet == Set(1L, 2L))
    }
  }

  test("merge-on-read snapshot resolves latest-per-key over the pinned set only") {
    val t = mk(history = true)
    t.upsert(spark, rows((1L, "click", 100L, 1L, 1.0)), commitTime = "c0")
    t.upsert(spark, rows((1L, "click", 200L, 2L, 5.0)), commitTime = "c1")
    val snap = t.writeManifest(spark)
    // A later version that would win the merge — the snapshot must not see it.
    t.upsert(spark, rows((1L, "click", 300L, 3L, 9.0)), commitTime = "c2")
    val got = t.readSnapshot(spark, snap)
      .select("user_id", "ts_us", "value").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 200L, 5.0)))
    assert(t.read(spark).select("ts_us").as[Long].collect().toSeq == Seq(300L))
  }
}
