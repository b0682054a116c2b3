package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.table.{KeyedTable, KeyedTableSpec}

/** A stand-in external lock service (what a DynamoDB/ZooKeeper provider
  * would be at 100 TB, where object stores have no atomic create): an
  * in-JVM registry keyed by lockId, counting acquires so the spec can
  * prove the table's write path really routed through the plugged
  * provider and not the filesystem default.
  */
class StubLockProvider extends graft.table.LockProvider {
  override def tryAcquire(
      spark: org.apache.spark.sql.SparkSession, lockId: String): Boolean =
    StubLockProvider.held.add(lockId) && { StubLockProvider.acquires.incrementAndGet(); true }
  override def release(
      spark: org.apache.spark.sql.SparkSession, lockId: String): Unit = {
    StubLockProvider.held.remove(lockId); ()
  }
}
object StubLockProvider {
  val held: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val acquires = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** The lock provider seam: contending writers serialize (no lost
  * updates), a leaked lock surfaces as a timeout, the operator override
  * clears it — and the whole discipline runs through a conf-plugged
  * provider ([[graft.table.Locks]]), proving the object-store
  * deployment's external lock service has a coded plug point.
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

  test("a conf-plugged provider carries the table lock end-to-end") {
    val table = newTable()
    spark.conf.set(graft.table.Locks.ProviderConf, classOf[StubLockProvider].getName)
    try {
      val before = StubLockProvider.acquires.get()
      // Same contention shape as the FS test, now through the stub: the
      // serialization guarantee must come from the PROVIDER (no lock
      // file ever exists on disk).
      val ev = Tables.events(spark, sf0001)
        .withColumn("ts_us", expr("ts div 1000"))
      val threads = (0 until 2).map { i =>
        new Thread(() =>
          table.withTableLock(spark) {
            table.upsert(spark, ev.filter(col("event_id") % 2 === i), s"c$i")
          })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(table.read(spark).count() == ev.count())
      assert(StubLockProvider.acquires.get() >= before + 2,
        "table lock did not route through the plugged provider")
      val base = new org.apache.hadoop.fs.Path(table.spec.path)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
          base.getParent, s"_graft_lock.${base.getName}")),
        "plugged provider must fully replace the FS lock file")
      // Leaked-holder discipline is provider-independent: the shared
      // driver times out and Locks.break releases through the provider.
      assert(StubLockProvider.held.add(s"${base.getParent}/_graft_lock.${base.getName}"))
      intercept[java.util.concurrent.TimeoutException] {
        table.withTableLock(spark, timeoutMs = 200L) { fail("must not enter") }
      }
      table.breakTableLock(spark)
      var entered = false
      table.withTableLock(spark, timeoutMs = 1000L) { entered = true }
      assert(entered)
    } finally spark.conf.unset(graft.table.Locks.ProviderConf)
  }
}
