package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.table.{KeyedTable, KeyedTableSpec}

/** Measured evidence for the incremental column-stats claim (BASELINE):
  * after a 1% drip commit, `recordColumnStats` with the retired cache
  * must cost a FRACTION of the full rebuild — the carry scans only the
  * commit's own files. Prints one line per timing:
  * full build / incremental refresh after the drip / forced full
  * rebuild over the identical final file set (the apples-to-apples
  * comparison — same files, only the carry differs).
  */
object IncStatsSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path =
      Files.createTempDirectory("graft_incsmoke_").toString + "/events_keyed"
    val t = KeyedTable(KeyedTableSpec(
      path = path, keyCols = Seq("event_id"), precombineCol = "ts_us",
      partitionCols = Seq("event_type")))
    val ev = Tables.eventsUs(spark, sfDir)
    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-34s ${s}%8.3f s")
      s
    }
    val cols = Seq("ts_us", "event_id", "value")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Writes repartition by the hive column so files are properly sized
    // (one-ish per partition, the compacted 100 TB shape): with a
    // FRAGMENTED layout the measurement flips — per-FILE driver costs
    // (listing, per-path stat) dominate both paths at toy scale and the
    // carry's extra bookkeeping outweighs the tiny scan it saves.
    def part(df: org.apache.spark.sql.DataFrame) =
      df.repartition(col("event_type"))
    t.insert(spark, part(ev.filter(col("event_id") % 200 === 199)), "w0")
    t.recordColumnStats(spark, cols) // warmup: codegen + readers
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_graft_colstats"), true)
    t.insert(spark, part(ev.filter(
      col("event_id") % 100 =!= 0 && col("event_id") % 200 =!= 199)), "c0")
    timed("stats: initial full build")(t.recordColumnStats(spark, cols))
    var inc = 0.0
    var full = 0.0
    (1 to 2).foreach { i => // two drip cycles: the second is fully warm
      t.insert(spark,
        part(ev.filter(col("event_id") % 100 === 0)
          .withColumn("event_id", col("event_id") + i * 10000000L)),
        s"c$i")
      t.read(spark).count() // untimed: absorb post-commit first-touch IO
      inc = timed(s"stats: incremental after 1% drip #$i")(
        t.refreshColumnStats(spark))
      // Forced full rebuild over the SAME final file set: drop the
      // sidecar (no cache remains after a successful build).
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/_graft_colstats"), true)
      full = timed(s"stats: full rebuild, same files #$i")(
        t.recordColumnStats(spark, cols))
    }
    println(f"incremental/full ratio (warm)      ${inc / full}%8.3f")
    spark.stop()
  }
}
