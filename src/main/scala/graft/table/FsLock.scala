package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Pluggable writer-lock provider — the seam the 100 TB deployment story
  * needs: the default filesystem provider's atomic create is sound on
  * local FS and HDFS but NOT on object stores (S3 has no atomic
  * create-if-absent), the same constraint Hudi documents for its FS lock
  * provider — there, deployments plug a lock service (DynamoDB,
  * ZooKeeper, a database row) by naming an implementing class in
  * `spark.graft.lock.provider`. The provider supplies only the two
  * primitive operations; the polling loop, timeout surface, and
  * break-hint discipline live once in [[Locks.withLock]] so every
  * provider inherits the same semantics.
  *
  * `lockId` is the lock's stable identity — for table locks the
  * `_graft_lock.<table>` path string — which an external service uses as
  * its key; the FS provider interprets it as a path.
  */
trait LockProvider {

  /** ONE atomic acquire attempt; `false` = currently held elsewhere.
    * Must be genuinely atomic across contending processes — an
    * exists-then-create is the TOCTOU hole this trait exists to avoid.
    */
  def tryAcquire(spark: SparkSession, lockId: String): Boolean

  /** Release the lock (also the forced break for a crashed holder —
    * the provider cannot distinguish stuck from slow; operator call).
    */
  def release(spark: SparkSession, lockId: String): Unit
}

/** The default provider: an atomic create-if-absent of the lock file.
  * HDFS's `create(overwrite=false)` is NameNode-enforced-atomic, but
  * Hadoop's LOCAL filesystem implements it as exists-then-create, a
  * TOCTOU hole two contending threads fall straight through — so the
  * `file` scheme goes via NIO's O_EXCL `createFile`.
  */
object FsLockProvider extends LockProvider {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  override def tryAcquire(spark: SparkSession, lockId: String): Boolean = {
    val lock = new Path(lockId)
    val f = fsOf(spark, lock)
    f.mkdirs(lock.getParent) // first-ever use: parent may not exist
    if (f.getScheme == "file") {
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(lock.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { f.create(lock, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
  }

  override def release(spark: SparkSession, lockId: String): Unit = {
    val lock = new Path(lockId)
    fsOf(spark, lock).delete(lock, false)
    ()
  }
}

/** The engine's one lock discipline, shared by the table writer lock
  * ([[KeyedTable.withTableLock]]) and the catalog registry lock
  * ([[GraftCatalog]]): resolve the session's provider, poll
  * `tryAcquire` until acquired or timed out, release on exit. A crash
  * while holding the lock leaks it (timeout message names the lock and
  * the operator override, mirroring Hudi's forced unlock).
  */
object Locks {

  /** Conf key naming a no-arg [[LockProvider]] class; absent (or the
    * literal `fs`) selects [[FsLockProvider]].
    */
  val ProviderConf = "spark.graft.lock.provider"

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, LockProvider]()

  def provider(spark: SparkSession): LockProvider =
    spark.conf.getOption(ProviderConf) match {
      case None | Some("fs") => FsLockProvider
      case Some(cn) =>
        cache.computeIfAbsent(cn, n =>
          Class.forName(n).getDeclaredConstructor().newInstance()
            .asInstanceOf[LockProvider])
    }

  def withLock[T](
      spark: SparkSession,
      lockId: String,
      timeoutMs: Long,
      pollMs: Long,
      breakHint: String)(body: => T): T = {
    val p = provider(spark)
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!p.tryAcquire(spark, lockId)) {
      if (System.currentTimeMillis() > deadline)
        throw new java.util.concurrent.TimeoutException(
          s"could not acquire lock $lockId within ${timeoutMs} ms; " +
            s"holder stuck or crashed? $breakHint is the operator override")
      Thread.sleep(pollMs)
    }
    try body
    finally p.release(spark, lockId)
  }

  /** Forcibly remove a leaked lock (crashed holder). Operator judgment
    * call by design.
    */
  def break(spark: SparkSession, lockId: String): Unit =
    provider(spark).release(spark, lockId)
}
