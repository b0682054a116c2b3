package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables
import graft.table.{KeyedTable, KeyedTableSpec}

/** [[graft.table.KeyedTable.streamFeed]]: the live tailer must deliver
  * every stored version exactly once with its commit time, resume from
  * the checkpoint delivering ONLY post-restart commits, and refuse
  * non-history tables (COW rewrites would re-deliver untouched rows).
  */
class StreamFeedSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsUs =
    Tables.events(spark, sf0001).withColumn("ts_us", expr("ts div 1000"))

  // event_id keys: unique per row, so batch precombine keeps every row
  // and the feed's content is the exact input slices.
  private def morSpec(path: String) = KeyedTableSpec(
    path = path, keyCols = Seq("event_id"), precombineCol = "ts_us",
    partitionCols = Seq("event_type"), retainHistory = true)

  private def rows(df: DataFrame): Set[(Long, String, Long, Long, Double, String)] =
    df.select("user_id", "event_type", "ts_us", "event_id", "value", "commit_time")
      .as[(Long, String, Long, Long, Double, String)].collect().toSet

  private def drain(table: KeyedTable, out: String, checkpoint: String): Unit = {
    val q = table.streamFeed(spark)
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("every version rides the feed once; restart delivers only the delta") {
    val tmp = Files.createTempDirectory("graft_feed_").toString
    val table = KeyedTable(morSpec(s"$tmp/t"))
    val ev = eventsUs
    table.upsert(spark, ev.filter(col("event_id") % 2 === 0), commitTime = "c0")
    table.upsert(spark, ev.filter(col("event_id") % 2 === 1), commitTime = "c1")
    val (out, cp) = (s"$tmp/out", s"$tmp/cp")
    drain(table, out, cp)
    def tag(c: String)(df: DataFrame) = df.withColumn("commit_time", lit(c))
    val expected =
      rows(tag("c0")(ev.filter(col("event_id") % 2 === 0))) ++
        rows(tag("c1")(ev.filter(col("event_id") % 2 === 1)))
    assert(rows(spark.read.parquet(out)) == expected)
    // A third commit lands (same content — version rows identical up to
    // commit time); the restarted tailer appends EXACTLY those versions.
    table.upsert(spark, ev.filter(col("event_id") % 10 === 0), commitTime = "c2")
    drain(table, out, cp)
    val delta = rows(tag("c2")(ev.filter(col("event_id") % 10 === 0)))
    assert(rows(spark.read.parquet(out)) == expected ++ delta)
    // The feed ≡ the raw store: same versions, same tags.
    assert(rows(spark.read.parquet(out)) ==
      rows(table.readRaw(spark).withColumn(
        "commit_time", col("_graft_commit_time"))))
  }

  test("non-history tables refuse the feed") {
    val tmp = Files.createTempDirectory("graft_feed_cow_").toString
    val cow = KeyedTable(morSpec(s"$tmp/t").copy(retainHistory = false))
    cow.upsert(spark, eventsUs, commitTime = "c0")
    val e = intercept[IllegalArgumentException](cow.streamFeed(spark))
    assert(e.getMessage.contains("retainHistory"))
  }
}
