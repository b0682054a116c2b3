package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.JsonStreamSource

class EmptyBatchStatefulProbe extends SparkTestBase {
  // Pins the interaction q71-shaped pipelines rely on: a micro-batch whose
  // rows are ALL late (watermark-dropped) makes the stateful aggregate emit
  // zero rows; the foreachBatch empty-batch guard then skips the upsert,
  // and Spark 4's state-store commit validation must NOT flag the skipped
  // batch (the state operator ran inside the batch plan; isEmpty's
  // short-circuit happens downstream of it).
  test("stateful agg + foreachBatch isEmpty guard survives an all-late batch") {
    val tmp = Files.createTempDirectory("graft_late_").toString
    val in = s"$tmp/in"
    val d = new java.io.File(in); d.mkdirs()
    def f(name: String, recs: Seq[String], mt: Long): Unit = {
      val file = new java.io.File(d, name)
      Files.writeString(file.toPath, recs.mkString("\n") + "\n")
      file.setLastModified(mt)
    }
    val t0 = System.currentTimeMillis() - 600000L
    // batch 1: fresh rows advance the watermark far ahead
    f("a.json", Seq(
      """{"k":"a","ts_us":7200000000,"v":1.0}""",
      """{"k":"a","ts_us":7205000000,"v":2.0}"""), t0)
    // batch 2: ONLY late rows (hours behind the watermark) -> agg emits 0 rows
    f("b.json", Seq("""{"k":"a","ts_us":1000000,"v":9.0}"""), t0 + 1000)
    val agg = JsonStreamSource.stream(spark, in, maxFilesPerTrigger = Some(1))
      .withColumn("ts_evt", timestamp_micros(col("ts_us")))
      .withWatermark("ts_evt", "1 minute")
      .groupBy(window(col("ts_evt"), "1 hour"), col("k"))
      .agg(sum(col("v")).as("s"))
    var skipped = 0
    val q = agg.writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) b.count() else skipped += 1
        ()
      }
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(skipped >= 0) // reaching here without STATE_STORE_COMMIT_VALIDATION is the point
  }
}
