package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.{KeyedTable, KeyedTableSpec}

/** Commit timeline markers ([[KeyedTable.recordTimeline]]): every mutator
  * drops `<commitTime>.<action>` in the sibling `_graft_timeline.<table>`
  * dir, the marker survives both static overwrites and via-tmp rewrites
  * (it lives OUTSIDE the table directory), and the latest marker is the
  * cheap change signal derived-state staleness guards compare.
  */
class TimelineSpec extends SparkTestBase {

  private def freshPath(): String =
    Files.createTempDirectory("graft_tl_").toString + "/tbl"

  private def kv(ids: (Int, Int)*) =
    spark.createDataFrame(ids.toSeq).toDF("id", "v")

  private def rows(ids: (Int, Int)*) =
    kv(ids: _*).withColumn("day", lit("d1"))

  test("each mutator records its action; the timeline is chronological") {
    val path = freshPath()
    val t = KeyedTable(KeyedTableSpec(
      path, keyCols = Seq("id"), precombineCol = "v",
      partitionCols = Seq("day")))
    t.upsert(spark, rows(1 -> 10, 2 -> 20))
    t.insert(spark, rows(3 -> 30))
    t.bulkInsert(spark, rows(4 -> 40))
    t.compact(spark)
    t.cluster(spark, Seq("id"))
    t.delete(spark, spark.createDataFrame(Seq(Tuple1(3))).toDF("id"))
    val actions = KeyedTable.timelineEntries(spark, path).map(_._2)
    assert(actions == Seq(
      "upsert", "insert", "bulkinsert", "compact", "cluster", "delete"))
    val commits = KeyedTable.timelineEntries(spark, path).map(_._1)
    assert(commits == commits.sorted, "marker order must be chronological")
  }

  test("markers survive a static-overwrite write and a via-tmp rewrite") {
    // Unpartitioned COW: an upsert is a STATIC overwrite that deletes the
    // whole table directory; compact is a delete+rename of it. The
    // timeline lives in a sibling dir, so history survives both.
    val path = freshPath()
    val t = KeyedTable(KeyedTableSpec(
      path, keyCols = Seq("id"), precombineCol = "v"))
    t.upsert(spark, kv(1 -> 10))
    t.upsert(spark, kv(1 -> 11, 2 -> 20))
    t.compact(spark)
    val actions = KeyedTable.timelineEntries(spark, path).map(_._2)
    assert(actions == Seq("upsert", "upsert", "compact"))
  }

  test("latest marker advances on every commit; empty table reads as \"\"") {
    val path = freshPath()
    assert(KeyedTable.latestTimelineMarker(spark, path) == "")
    val t = KeyedTable(KeyedTableSpec(
      path, keyCols = Seq("id"), precombineCol = "v",
      retainHistory = true))
    t.upsert(spark, kv(1 -> 10))
    val m1 = KeyedTable.latestTimelineMarker(spark, path)
    assert(m1.nonEmpty)
    t.upsert(spark, kv(1 -> 11))
    val m2 = KeyedTable.latestTimelineMarker(spark, path)
    assert(m2 > m1, "a later commit must sort after an earlier one")
    // MoR upserts are physically version appends; the timeline records
    // the physical commit class (data-class either way).
    assert(KeyedTable.DataActions.contains(
      KeyedTable.timelineEntries(spark, path).last._2))
  }

  test("action classes partition the vocabulary the mutators emit") {
    val emitted = Set("insert", "bulkinsert", "upsert", "compact",
      "cluster", "zorder", "evolve", "fold", "delete", "vacuum", "restore")
    val classed = KeyedTable.DataActions ++ KeyedTable.LayoutActions
    assert(KeyedTable.DataActions.intersect(KeyedTable.LayoutActions).isEmpty)
    // delete/vacuum/restore are deliberately UNclassed: unknown or
    // destructive actions must fall into the rebuild class by default.
    assert(classed.subsetOf(emitted))
    assert((emitted -- classed) == Set("delete", "vacuum", "restore"))
  }
}
