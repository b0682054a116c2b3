package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.{KeyedTable, KeyedTableSpec}

/** The per-commit maintenance composition
  * ([[KeyedTable.maintainDerivedState]] = [[KeyedTable.refreshColumnStats]]
  * + [[KeyedTable.refreshIndexes]]): one call after a commit brings the
  * column-stats sidecar, the record-level index, and every secondary
  * sidecar current from their own recorded state — the hook a
  * micro-batch write loop composes (q193). Cost contract: O(the
  * commit's own files) data reads (the stats carry rescans nothing
  * cached) and a bounded number of listings per call.
  */
class MaintenanceSpec extends SparkTestBase {

  private def freshPath(): String =
    Files.createTempDirectory("graft_maint_").toString + "/tbl"

  private def events(lo: Long, hi: Long) =
    spark.range(lo, hi).select(
      col("id").as("user_id"),
      when(col("id") % 2 === 0, "click").otherwise("view").as("event_type"),
      (col("id") * 7 + 100).as("ts_us"),
      col("id").as("event_id"),
      (col("id") % 97).cast("double").as("value"))

  private def tableAt(path: String) = KeyedTable(KeyedTableSpec(
    path, keyCols = Seq("user_id"), precombineCol = "ts_us",
    tiebreakCols = Seq("event_id"), partitionCols = Seq("event_type")))

  private def builtAt(path: String, dir: String): String =
    spark.read.parquet(s"$path/$dir")
      .select("built_at").limit(1).collect()(0).getString(0)

  test("maintainDerivedState refreshes stats, RLI, and secondary sidecars in one call") {
    val path = freshPath()
    val t = tableAt(path)
    assert(!t.maintainDerivedState(spark), "a virgin table has nothing to refresh")
    t.insert(spark, events(0, 400), commitTime = "c0")
    assert(!t.maintainDerivedState(spark),
      "no sidecar recorded yet: the initial builds name the surface")
    t.recordColumnStats(spark, Seq("ts_us"))
    t.recordIndexes(spark, Seq("event_id"))
    val rli0 = builtAt(path, "_graft_rli")
    val si0 = builtAt(path, "_graft_si_event_id")
    t.insert(spark, events(400, 500), commitTime = "c1")
    assert(t.maintainDerivedState(spark), "recorded sidecars must refresh")
    // Every sidecar advanced to the latest marker.
    val last = KeyedTable.timelineMarkers(spark, path)
      .lastOption.map(KeyedTable.markerCommit).get
    assert(builtAt(path, "_graft_rli") == last && rli0 != last)
    assert(builtAt(path, "_graft_si_event_id") == last && si0 != last)
    // The maintained stats cover every current file: pruning stays
    // exact and the point lookup serves through the fresh index.
    val all = t.read(spark).count()
    assert(t.readPruned(spark, "ts_us", Long.MinValue, Long.MaxValue)
      .count() == all)
    def lookup = t.read(spark).filter(col("user_id") === 450L)
    val scanned = graft.plans.PlanWalk.scannedFiles(lookup)
    assert(scanned.nonEmpty && scanned.forall(_.endsWith(".parquet")),
      "the refreshed index must serve the point lookup on c1's key")
    assert(lookup.select("event_id").collect().map(_.getLong(0)).toSeq ==
      Seq(450L))
  }

  test("maintenance cost: bounded listings per call, carried stats never rescan") {
    val path = freshPath()
    val t = tableAt(path)
    t.insert(spark, events(0, 300), commitTime = "c0")
    t.recordColumnStats(spark, Seq("ts_us"))
    t.recordKeyIndex(spark)
    t.insert(spark, events(300, 350), commitTime = "c1")
    // Poison the retired cache: if the refresh rescans cached files the
    // real minima come back; the carry must keep the sentinels — the
    // O(commit files) proof for the composed hook.
    val stalePath = s"$path/_graft_colstats_stale"
    val st = spark.read.parquet(stalePath)
    val schema = st.schema
    val cached = st.collect().toSeq
    val mi = schema.fieldIndex("min_ts_us")
    val sentinel = -616161L
    val poisoned = cached.map(r =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq.updated(mi, sentinel)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(poisoned, 1), schema)
      .coalesce(1).write.mode("overwrite").parquet(stalePath)
    val n0 = KeyedTable.fullListings.get()
    assert(t.maintainDerivedState(spark))
    val listings = KeyedTable.fullListings.get() - n0
    assert(listings <= 4,
      s"maintenance must stay metadata-bounded, did $listings full listings")
    val side = spark.read.parquet(s"$path/_graft_colstats")
    assert(side.filter(col("min_ts_us") === sentinel).count() == cached.size,
      "the composed hook must carry cached stats rows, not rescan")
  }
}
