package graft.table

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The discovery half of the reference's hive_sync
  * (glue_job_script.py:64-73): Hudi registers tables in the Glue Data
  * Catalog so a LATER job — one that never saw the table path — finds them
  * by name. [[KeyedTable.registerSynced]] replays a single table's sidecar
  * but still needs the caller to know the path; this registry closes that
  * gap with a central, persistent file of synced table paths, the engine's
  * analogue of `hive.metastore.uris`: a session is pointed at the registry
  * via ONE conf key and every previously synced table resolves by name.
  *
  * Wiring: `spark.graft.catalog.registry` names the registry file (set it
  * in the session builder, like the metastore URI). [[KeyedTable.syncCatalog]]
  * appends `(table path, partition cols)` on every sync; an analyzer rule
  * installed by [[graft.GraftExtensions]] calls [[replayIfStale]] when a
  * query contains an unresolved relation, so discovery happens at name
  * RESOLUTION time — exactly when a metastore would be consulted — with no
  * explicit call in user code. Table names come from each path's own
  * `_graft_catalog` sidecar (names are a property of the table; the
  * registry only records where tables live).
  *
  * Scale shape: the registry is one small line-per-table file read at most
  * once per (session, registry generation) — the mtime guard below makes
  * the steady-state cost of the analyzer hook a single `getFileStatus`
  * per query that mentions a table, and zero when the conf is unset.
  * Concurrent registrations — including from DIFFERENT sessions/JVMs —
  * serialize on an atomic-create lock file beside the registry (the
  * [[KeyedTable.withTableLock]] pattern: NIO O_EXCL for `file://`,
  * NameNode-atomic `create(overwrite=false)` elsewhere), so a
  * read-append-publish never loses a concurrent writer's line; the
  * publish itself stays tmp + atomic rename, so readers never observe a
  * partial file.
  */
object GraftCatalog {

  /** Conf key naming the registry file — the session's "metastore URI". */
  val RegistryConf = "spark.graft.catalog.registry"

  // (session identity) -> registry (mtime, length) whose replay COMPLETED
  // into it. Recorded only after a fully-successful replay: a partial
  // failure (one unreadable sidecar) must leave the generation unrecorded
  // so the next resolution retries the remainder.
  private val replayedMtime = TrieMap.empty[Int, (Long, Long)]

  // Re-entrancy guard, separate from the completion record: the nested
  // analysis of the replay's own createTable calls re-enters the analyzer
  // rule, and this flag turns that re-entry into a no-op instead of a
  // recursion (or a premature "done" mark).
  private val replayInProgress = TrieMap.empty[Int, Unit]

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def registryPath(spark: SparkSession): Option[Path] =
    spark.conf.getOption(RegistryConf).filter(_.nonEmpty).map(new Path(_))

  /** Whether this session points at a registry (the analyzer hook's
    * fast-path guard — no FS calls when unset).
    */
  def isConfigured(spark: SparkSession): Boolean =
    registryPath(spark).isDefined

  private def readLines(spark: SparkSession, p: Path): Seq[String] = {
    val f = fs(spark, p)
    if (!f.exists(p)) Nil
    else {
      val in = f.open(p)
      try new String(in.readAllBytes(), UTF_8)
        .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
      finally in.close()
    }
  }

  /** Record a synced table's location (idempotent). Called by
    * [[KeyedTable.syncCatalog]]; a no-op when no registry is configured,
    * so the conf-less single-session workflow is unchanged. The
    * read-append-publish runs under the registry lock so two sessions
    * registering concurrently cannot each read the pre-state and publish
    * a file missing the other's line (lost update).
    */
  def record(spark: SparkSession, tablePath: String, partitionCols: Seq[String]): Unit =
    registryPath(spark).foreach { reg =>
      Locks.withLock(spark, registryLock(reg).toString,
        timeoutMs = 30000L, pollMs = 10L,
        breakHint = "GraftCatalog.breakRegistryLock(spark)") {
        val f = fs(spark, reg)
        val line = (tablePath +: partitionCols).mkString("\t")
        val existing = readLines(spark, reg)
        if (!existing.contains(line)) {
          val tmp = new Path(
            Option(reg.getParent).getOrElse(new Path(".")),
            "." + reg.getName + ".tmp")
          val out = f.create(tmp, true)
          try out.write((existing :+ line).mkString("\n").getBytes(UTF_8))
          finally out.close()
          // The publish must never leave a window where the registry is
          // ABSENT: a concurrent replayIfStale (readers take no lock) that
          // lands in a delete→rename gap would skip replay and fail the
          // query. On the local scheme NIO's ATOMIC_MOVE replaces in one
          // step; elsewhere (HDFS rename won't overwrite) fall back to
          // delete+rename — HDFS readers of the brief gap retry on the
          // next resolution since no generation was recorded for it.
          if (f.getScheme == "file") {
            java.nio.file.Files.move(
              java.nio.file.Paths.get(tmp.toUri.getPath),
              java.nio.file.Paths.get(reg.toUri.getPath),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          } else {
            f.delete(reg, false)
            if (!f.rename(tmp, reg))
              throw new java.io.IOException(
                s"failed to publish catalog registry $reg (rename returned false)")
          }
        }
      }
    }

  private def registryLock(reg: Path): Path =
    new Path(
      Option(reg.getParent).getOrElse(new Path(".")),
      "." + reg.getName + ".lock")

  /** Forcibly clear a leaked registry lock (crashed holder) — the
    * operator override named in the acquire-timeout message.
    */
  def breakRegistryLock(spark: SparkSession): Unit =
    registryPath(spark).foreach(reg =>
      Locks.break(spark, registryLock(reg).toString))

  /** Replay the registry into this session's catalog unless its current
    * generation (mtime) was already replayed. Called from the analyzer
    * hook; safe to call directly (e.g. at session setup).
    */
  def replayIfStale(spark: SparkSession): Unit =
    registryPath(spark).foreach { reg =>
      val f = fs(spark, reg)
      if (f.exists(reg)) {
        val st = f.getFileStatus(reg)
        // (mtime, length) — mtime alone has filesystem-dependent
        // granularity and two syncs can land within one tick.
        val gen = (st.getModificationTime, st.getLen)
        val key = System.identityHashCode(spark)
        if (!replayedMtime.get(key).contains(gen) &&
            replayInProgress.putIfAbsent(key, ()).isEmpty) {
          try {
            if (replay(spark, reg)) replayedMtime.put(key, gen)
          } finally replayInProgress.remove(key)
        }
      }
    }

  // A table name is registered only if it is a plain identifier: the
  // sidecar/registry files are plain text anyone with FS access can edit,
  // so their content must never reach the SQL parser as anything but a
  // bare name (and the path goes through the catalog API, not a SQL
  // string literal).
  private val IdentifierRx = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Replay every registered table; returns true when nothing remains to
    * RETRY, so the caller records the generation as done. Failures split
    * by permanence: a validation refusal (non-identifier sidecar name —
    * content that can never become registrable) is logged and counted as
    * handled, otherwise a poisoned line would force a full registry +
    * sidecar re-read on EVERY later name resolution for the session's
    * lifetime; a transient failure (unreadable sidecar, IO error) leaves
    * the generation unrecorded so the next resolution retries it — and
    * never aborts the remaining lines either way.
    */
  private def replay(spark: SparkSession, reg: Path): Boolean =
    readLines(spark, reg).map { line =>
      try {
        val parts = line.split('\t')
        val tablePath = parts.head
        val partCols = parts.drop(1).toSeq
        val sidecar = new Path(tablePath, "_graft_catalog")
        val names = readLines(spark, sidecar)
        // Validate BEFORE tableExists: the raw sidecar string must not
        // reach even the identifier parser (tableExists swallows its
        // ParseException into `false`, which would mask the refusal).
        names.foreach { name =>
          if (!IdentifierRx.matches(name))
            throw new InvalidRegistration(
              s"refusing to register non-identifier table name '$name' from $sidecar")
        }
        names.filterNot(spark.catalog.tableExists).foreach { name =>
          spark.catalog.createTable(name, tablePath, "parquet")
          if (partCols.nonEmpty) spark.catalog.recoverPartitions(name)
        }
        true
      } catch {
        case e: InvalidRegistration =>
          System.err.println(s"[graft-catalog] skipping '$line' permanently: ${e.getMessage}")
          true // permanent: retrying cannot make this line valid
        case e: Exception =>
          System.err.println(s"[graft-catalog] replay of '$line' failed: ${e.getMessage}")
          false // transient: keep the generation unrecorded → retried
      }
    }.forall(identity)

  private final class InvalidRegistration(msg: String) extends Exception(msg)
}
