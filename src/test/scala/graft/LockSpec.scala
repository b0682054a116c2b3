package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.table.{KeyedTable, KeyedTableSpec}

/** The filesystem lock provider: contending writers serialize (no lost
  * updates), a leaked lock surfaces as a timeout, and the operator
  * override clears it.
  */
class LockSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): KeyedTable = {
    val path = Files.createTempDirectory("graft_lock_").toString + "/t"
    KeyedTable(KeyedTableSpec(
      path = path, keyCols = Seq("event_id"), precombineCol = "ts_us"))
  }

  test("four contending writers serialize; every commit survives") {
    val table = newTable()
    val ev = Tables.events(spark, sf0001)
      .withColumn("ts_us", expr("ts div 1000"))
    // Disjoint slices racing into ONE unpartitioned table: unguarded,
    // the read-merge-overwrite sequences interleave and a loser's rows
    // vanish; under the lock each commit sees the previous one's files.
    val threads = (0 until 4).map { i =>
      new Thread(() =>
        table.withTableLock(spark) {
          table.upsert(spark, ev.filter(col("event_id") % 4 === i), s"c$i")
        })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val got = table.read(spark).count()
    val want = ev.count()
    assert(got == want, s"lost update: $got of $want rows survived")
  }

  test("a leaked lock times out; breakTableLock clears it") {
    val table = newTable()
    table.upsert(spark, Seq((1L, 100L)).toDF("event_id", "ts_us"), "c0")
    // Simulate a crashed holder: the lock file exists, nobody releases.
    // (Lock lives BESIDE the table dir — inside it, a bootstrap's static
    // overwrite would delete the holder's own lock mid-commit.)
    val base = new org.apache.hadoop.fs.Path(table.spec.path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(
      base.getParent, s"_graft_lock.${base.getName}"), false).close()
    intercept[java.util.concurrent.TimeoutException] {
      table.withTableLock(spark, timeoutMs = 300L) { fail("must not enter") }
    }
    table.breakTableLock(spark)
    var entered = false
    table.withTableLock(spark, timeoutMs = 1000L) { entered = true }
    assert(entered)
  }
}
