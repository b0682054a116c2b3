package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.JsonStreamSource
import graft.streaming.MicroBatchPipeline
import graft.table.{KeyedTable, KeyedTableSpec}

/** Streaming acceptance scenarios (SURVEY §5 #8–9): the micro-batch loop
  * end-to-end over a JSON file stream, empty input, and checkpoint restart
  * without duplicates.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def writeJson(dir: String, records: Seq[String]): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    records.zipWithIndex.foreach { case (r, i) =>
      Files.writeString(new java.io.File(d, f"rec_$i%04d.json").toPath, r + "\n")
    }
  }

  private def table(dir: String) = KeyedTable(KeyedTableSpec(
    path = s"$dir/t",
    keyCols = Seq("name"),
    precombineCol = "date",
    tiebreakCols = Seq("payload"),
    partitionCols = Seq("year")))

  test("stream → foreachBatch → upsert: latest record per key lands") {
    val tmp = Files.createTempDirectory("graft_stream_spec_").toString
    writeJson(s"$tmp/in", Seq(
      """{"name":"a","date":"2024-03-07","year":2024,"payload":"v1"}""",
      """{"name":"a","date":"2024-03-09","year":2024,"payload":"v2"}""",
      """{"name":"b","date":"2024-03-07","year":2024,"payload":"w1"}"""))
    val t = table(tmp)
    val q = MicroBatchPipeline.start(
      JsonStreamSource.stream(spark, s"$tmp/in", maxFilesPerTrigger = Some(1)),
      t, s"$tmp/cp", Trigger.AvailableNow())
    q.awaitTermination()
    val byName = t.read(spark).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("payload")).toMap
    assert(byName == Map("a" -> "v2", "b" -> "w1"))
  }

  test("restart from checkpoint does not reprocess or duplicate") {
    val tmp = Files.createTempDirectory("graft_stream_spec_").toString
    writeJson(s"$tmp/in", Seq(
      """{"name":"a","date":"2024-03-07","year":2024,"payload":"v1"}"""))
    val t = table(tmp)
    val schema = JsonStreamSource.inferSchema(spark, s"$tmp/in")
    val q1 = MicroBatchPipeline.start(
      JsonStreamSource.stream(spark, s"$tmp/in", Some(schema)),
      t, s"$tmp/cp", Trigger.AvailableNow())
    q1.awaitTermination()
    assert(t.read(spark).count() == 1)

    // new file arrives; restart the query from the same checkpoint
    writeJson(s"$tmp/in2", Nil) // no-op, keep dirs distinct
    Files.writeString(new java.io.File(s"$tmp/in/rec_9999.json").toPath,
      """{"name":"c","date":"2024-03-08","year":2024,"payload":"x1"}""" + "\n")
    val q2 = MicroBatchPipeline.start(
      JsonStreamSource.stream(spark, s"$tmp/in", Some(schema)),
      t, s"$tmp/cp", Trigger.AvailableNow())
    q2.awaitTermination()
    val names = t.read(spark).select("name").as[String].collect().sorted.toSeq
    assert(names == Seq("a", "c"))
  }

  test("empty input stream leaves no table behind (empty-batch guard)") {
    val tmp = Files.createTempDirectory("graft_stream_spec_").toString
    writeJson(s"$tmp/in", Seq("""{"name":"a","date":"1","year":1,"payload":"p"}"""))
    val t = table(tmp)
    // stream over an all-filtered source: batches arrive but carry 0 rows
    val src = JsonStreamSource.stream(spark, s"$tmp/in")
      .filter(col("name") === "no-such-key")
    val q = MicroBatchPipeline.start(src, t, s"$tmp/cp", Trigger.AvailableNow())
    q.awaitTermination()
    assert(!t.exists(spark))
  }

  test("starting position policy maps to file-source options") {
    val tmp = Files.createTempDirectory("graft_stream_spec_").toString
    writeJson(s"$tmp/in", Seq("""{"name":"a","date":"1","year":1,"payload":"p"}"""))
    assert(JsonStreamSource.streamFrom(spark, s"$tmp/in", "earliest").isStreaming)
    assert(JsonStreamSource.streamFrom(spark, s"$tmp/in", "latest").isStreaming)
    intercept[IllegalArgumentException] {
      JsonStreamSource.streamFrom(spark, s"$tmp/in", "bogus")
    }
  }
}
