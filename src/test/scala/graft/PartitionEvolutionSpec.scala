package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.table.{KeyedTable, KeyedTableSpec}

/** Partition evolution: generations are physical (old files never move),
  * reads resolve across them, key identity is layout-independent, and
  * the single-layout services refuse until generations fold.
  */
class PartitionEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(t: (Long, String, Long, Long, Double)*) =
    t.toSeq.toDF("user_id", "event_type", "ts_us", "event_id", "value")

  private def mk(): (KeyedTable, org.apache.hadoop.fs.FileSystem, String) = {
    val path = Files.createTempDirectory("graft_evo_").toString + "/t"
    val t = KeyedTable(KeyedTableSpec(
      path = path, keyCols = Seq("user_id", "event_type"),
      precombineCol = "ts_us", tiebreakCols = Seq("event_id"),
      globalKeys = true))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (t, fs, path)
  }

  test("old files stay put; new commits land in the new layout; reads merge across") {
    val (t, fs, path) = mk()
    t.upsert(spark, rows(
      (1L, "click", 100L, 1L, 1.0),
      (2L, "view", 100L, 2L, 2.0)), commitTime = "c0")
    def rootFiles() = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), false)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val p = it.next().getPath
        if (p.getName.endsWith(".parquet")) b += p.getName
      }
      b.result().sorted
    }
    val before = rootFiles()
    t.evolvePartitioning(spark, Seq("event_type"))
    t.upsert(spark, rows(
      (1L, "click", 200L, 3L, 5.0),  // cross-generation update
      (3L, "view", 100L, 4L, 3.0)),  // new key in the new layout
      commitTime = "c1")
    assert(rootFiles() == before, "generation 0 files must not move")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$path/_graft_gen_1/event_type=click")),
      "generation 1 must be hive-partitioned by event_type")
    val got = t.read(spark)
      .select("user_id", "event_type", "ts_us", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, "click", 200L, 5.0), // gen-1 version superseded the gen-0 row
      (2L, "view", 100L, 2.0),
      (3L, "view", 100L, 3.0)))
  }

  test("a second evolution opens another generation; merge still exact") {
    val (t, _, path) = mk()
    t.upsert(spark, rows((1L, "click", 100L, 1L, 1.0)), commitTime = "c0")
    t.evolvePartitioning(spark, Seq("event_type"))
    t.upsert(spark, rows((1L, "click", 200L, 2L, 2.0)), commitTime = "c1")
    t.evolvePartitioning(spark, Nil) // coarsen back to unpartitioned
    t.upsert(spark, rows((1L, "click", 300L, 3L, 3.0)), commitTime = "c2")
    assert(t.layoutGens(spark).map(_._1) == Seq(1, 2))
    val got = t.read(spark)
      .select("ts_us", "value").as[(Long, Double)].collect().toSeq
    assert(got == Seq((300L, 3.0)))
  }

  test("guards: non-global keys refuse; single-layout services refuse once evolved") {
    val path = Files.createTempDirectory("graft_evo_g_").toString + "/t"
    val scoped = KeyedTable(KeyedTableSpec(
      path = path, keyCols = Seq("user_id"), precombineCol = "ts_us",
      partitionCols = Seq("event_type")))
    scoped.upsert(spark, rows((1L, "click", 100L, 1L, 1.0)), "c0")
    intercept[IllegalArgumentException] {
      scoped.evolvePartitioning(spark, Nil)
    }
    val (t, _, _) = mk()
    t.upsert(spark, rows((1L, "click", 100L, 1L, 1.0)), "c0")
    t.evolvePartitioning(spark, Seq("event_type"))
    intercept[IllegalArgumentException] { t.compact(spark) }
    intercept[IllegalArgumentException] { t.delete(spark, rows()) }
    intercept[IllegalArgumentException] { t.writeManifest(spark) }
    intercept[IllegalArgumentException] {
      t.evolvePartitioning(spark, Seq("event_type")) // no-op layout
    }
  }

  test("folding a history table keeps every version (no implicit vacuum)") {
    val path = Files.createTempDirectory("graft_evo_mor_").toString + "/t"
    val t = KeyedTable(KeyedTableSpec(
      path = path, keyCols = Seq("user_id", "event_type"),
      precombineCol = "ts_us", tiebreakCols = Seq("event_id"),
      globalKeys = true, retainHistory = true))
    t.upsert(spark, rows((1L, "click", 100L, 1L, 1.0)), "c0")
    t.evolvePartitioning(spark, Seq("event_type"))
    t.upsert(spark, rows((1L, "click", 200L, 2L, 5.0)), "c1")
    t.foldGenerations(spark)
    assert(t.layoutGens(spark).isEmpty)
    // time travel to c0 must still see the superseded version
    assert(t.readAsOf(spark, "c0")
      .select("ts_us", "value").as[(Long, Double)].collect().toSeq ==
      Seq((100L, 1.0)))
    assert(t.read(spark)
      .select("ts_us", "value").as[(Long, Double)].collect().toSeq ==
      Seq((200L, 5.0)))
  }

  test("folding generations restores the spec layout and re-enables services") {
    val (t, fs, path) = mk()
    t.upsert(spark, rows((1L, "click", 100L, 1L, 1.0)), "c0")
    t.evolvePartitioning(spark, Seq("event_type"))
    t.upsert(spark, rows(
      (1L, "click", 200L, 2L, 5.0),
      (2L, "view", 100L, 3L, 2.0)), "c1")
    val before = t.read(spark)
      .select("user_id", "event_type", "ts_us", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    t.foldGenerations(spark)
    assert(t.layoutGens(spark).isEmpty)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_graft_gen_1")))
    val after = t.read(spark)
      .select("user_id", "event_type", "ts_us", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(after == before)
    t.compact(spark) // guarded before the fold; must work now
    assert(t.read(spark)
      .select("user_id", "event_type", "ts_us", "value")
      .as[(Long, String, Long, Double)].collect().toSet == before)
    // commit times survived the fold: the c1 delta is still addressable
    assert(t.readIncremental(spark, "c0")
      .select("user_id").as[Long].collect().toSet == Set(1L, 2L))
  }
}
