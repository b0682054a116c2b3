package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}

/** The engine's one filesystem lock discipline, shared by the table lock
  * ([[KeyedTable.withTableLock]]) and the catalog registry lock
  * ([[GraftCatalog]]): an atomic create-if-absent of the lock file, polled
  * until acquired or timed out. The acquire must be genuinely atomic —
  * HDFS's `create(overwrite=false)` is (NameNode-enforced), but Hadoop's
  * LOCAL filesystem implements it as exists-then-create, a TOCTOU hole two
  * contending threads fall straight through — so the `file` scheme goes
  * via NIO's O_EXCL `createFile`. Object stores without atomic create need
  * an external lock service, the same constraint Hudi documents for its
  * FS lock provider.
  *
  * A crash while holding the lock leaks the file (the provider cannot
  * distinguish stuck from slow); the timeout message names the lock path
  * and `breakLock` is the operator override, mirroring Hudi's forced
  * unlock.
  */
object FsLock {

  def withLock[T](
      f: FileSystem,
      lock: Path,
      timeoutMs: Long,
      pollMs: Long,
      breakHint: String)(body: => T): T = {
    f.mkdirs(lock.getParent) // first-ever use: parent may not exist
    def tryAcquire(): Boolean =
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
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!tryAcquire()) {
      if (System.currentTimeMillis() > deadline)
        throw new java.util.concurrent.TimeoutException(
          s"could not acquire lock $lock within ${timeoutMs} ms; " +
            s"holder stuck or crashed? $breakHint is the operator override")
      Thread.sleep(pollMs)
    }
    try body
    finally f.delete(lock, false)
  }

  /** Forcibly remove a leaked lock (crashed holder). Operator judgment
    * call by design.
    */
  def breakLock(f: FileSystem, lock: Path): Unit = f.delete(lock, false)
}
