package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Dev tool: attribute the streaming queries' floor (BASELINE §13) by
  * measuring q93's phases separately on its OWN staged source at sf0.1 —
  * batch JSON parse (no streaming machinery), one replayed stream with a
  * no-op sink (parse + micro-batch machinery), and the full query (× two
  * streams + join state + parquet sink). Three passes each, report all.
  * Usage: runMain graft.StreamFloorProbe [sfDir]
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = graft.operators.UpsertOps.q93StagedSource(spark, sfDir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts_us BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[floor] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to 3).foreach { i =>
      time(s"batch_parse run$i") {
        spark.read.schema(schema).json(src)
          .write.mode("overwrite").format("noop").save()
      }
      time(s"stream_parse_noop run$i") {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_floorprobe_").toString
        val q = graft.sources.JsonStreamSource
          .stream(spark, src, schema = Some(schema))
          .filter(col("event_type").isNotNull)
          .writeStream
          .outputMode("append")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("overwrite").format("noop").save()
          }
          .option("checkpointLocation", s"$tmp/checkpoint")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      time(s"q93_full run$i") {
        SparkEntry.queries("q93_stream_attribution")(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
