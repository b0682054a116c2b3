package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.table.{KeyedTable, KeyedTableSpec}

/** [[graft.plans.PointLookupRewrite]]: a literal key filter over a keyed
  * table's declarative read plan must scan only the record-level index's
  * candidate FILES (not the table), give the identical result on fresh
  * and stale indexes, and decline on raw scans, absent indexes, and
  * oversized probes.
  */
class PointLookupRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsUs =
    Tables.events(spark, sf0001).withColumn("ts_us", expr("ts div 1000"))

  private def outputSet(df: DataFrame): Set[(Long, String, Long, Long, Double)] =
    df.select("user_id", "event_type", "ts_us", "event_id", "value")
      .as[(Long, String, Long, Long, Double)].collect().toSet

  private def cowSpec(path: String) = KeyedTableSpec(
    path = path, keyCols = Seq("user_id"), precombineCol = "ts_us",
    tiebreakCols = Seq("event_id"), partitionCols = Seq("event_type"))

  private def morSpec(path: String) = cowSpec(path).copy(retainHistory = true)

  private def probeIds: Seq[Long] = eventsUs
    .select("user_id").distinct().filter(col("user_id") % 13 === 3)
    .as[Long].collect().toSeq.sorted.take(15) // 15 > InSet threshold

  private def dataFileCount(path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(fs.makeQualified(p), true)
    var n = 0
    while (it.hasNext) {
      val s = it.next()
      val rel = s.getPath.toUri.getPath
      if (s.getPath.getName.endsWith(".parquet") &&
        !rel.split('/').exists(seg => seg.startsWith("_") || seg.startsWith(".")))
        n += 1
    }
    n
  }

  /** The rewrite fired iff every scanned root is a data FILE (the pruned
    * index lists files; the unpruned relation roots at the table dir).
    */
  private def scannedDataFiles(df: DataFrame): Option[Seq[String]] = {
    val paths = graft.plans.PlanWalk.scannedFiles(df)
    if (paths.nonEmpty && paths.forall(_.endsWith(".parquet"))) Some(paths)
    else None
  }

  test("MoR resolve read + IN filter scans only candidate files, exact") {
    val path = Files.createTempDirectory("graft_plr_mor_").toString + "/t"
    val table = KeyedTable(morSpec(path))
    val ev = eventsUs
    table.upsert(spark, ev.filter(col("event_id") % 2 === 0), commitTime = "c0")
    table.upsert(spark, ev.filter(col("event_id") % 2 === 1), commitTime = "c1")
    val ids = probeIds
    def q = table.read(spark).filter(col("user_id").isin(ids: _*))
    val expected = outputSet(q) // no index yet: the rule declines
    assert(scannedDataFiles(q).isEmpty, "absent index must not rewrite")
    table.recordKeyIndex(spark)
    val served = q
    val files = scannedDataFiles(served)
    assert(files.isDefined, "the filter must be served from candidate files")
    assert(files.get.length < dataFileCount(path),
      s"candidates must prune: ${files.get.length} of ${dataFileCount(path)}")
    assert(outputSet(served) == expected)
    // Equality probe serves too, and extra above-resolve predicates ride.
    val one = table.read(spark)
      .filter(col("user_id") === ids.head && col("value") >= 0.0)
    assert(scannedDataFiles(one).isDefined)
    assert(outputSet(one) ==
      expected.filter(r => r._1 == ids.head && r._5 >= 0.0))
  }

  test("stale index: delta commit lands, filtered read stays exact and pruned") {
    val path = Files.createTempDirectory("graft_plr_stale_").toString + "/t"
    val table = KeyedTable(morSpec(path))
    val ev = eventsUs
    table.upsert(spark, ev.filter(col("event_id") % 2 === 0), commitTime = "c0")
    table.recordKeyIndex(spark) // built at c0
    table.upsert(spark, ev.filter(col("event_id") % 2 === 1), commitTime = "c1")
    val ids = probeIds
    val served = table.read(spark).filter(col("user_id").isin(ids: _*))
    val files = scannedDataFiles(served)
    assert(files.isDefined, "stale index must still serve (delta settled)")
    assert(files.get.length < dataFileCount(path))
    // Ground truth from the lookup API (spec'd exact in RliSpec).
    assert(outputSet(served) ==
      outputSet(table.lookupKeys(spark, ids.toDF("user_id"))))
  }

  test("plain COW with duplicate keys: every probe row survives the prune") {
    val path = Files.createTempDirectory("graft_plr_cow_").toString + "/t"
    // event_id keys: unique per row, so a 2-key probe genuinely lives in
    // few files (a user_id probe would touch every partition and the
    // covering candidate set would — correctly — decline to prune).
    val table = KeyedTable(KeyedTableSpec(
      path = path, keyCols = Seq("event_id"), precombineCol = "ts_us",
      partitionCols = Seq("event_type")))
    val ev = eventsUs
    table.upsert(spark, ev, commitTime = "c0")
    // insert can land DUPLICATE keys on a COW table; read returns all —
    // the index covers every stored row, so the prune must too.
    val dup = ev.orderBy("event_id").limit(2)
    table.insert(spark, dup, commitTime = "c1")
    table.recordKeyIndex(spark)
    val ids = dup.select("event_id").as[Long].collect().toSeq
    def q = table.read(spark).filter(col("event_id").isin(ids: _*))
    val files = scannedDataFiles(q)
    assert(files.isDefined && files.get.length < dataFileCount(path),
      s"COW probe must prune: $files of ${dataFileCount(path)}")
    val direct = outputSet(
      spark.read.parquet(path).filter(col("event_id").isin(ids: _*)))
    assert(outputSet(q) == direct)
    assert(q.count() > ids.size, "duplicate key rows must survive the prune")
  }

  test("secondary probe on COW: value filter scans only the composed candidates") {
    val path = Files.createTempDirectory("graft_plr_sec_").toString + "/t"
    // event_id keys + a near-unique probe column: 2 probe values map to
    // 2 keys in ~2 files (a user-keyed layout would spread any key over
    // every partition and the covering candidates would decline).
    val table = KeyedTable(KeyedTableSpec(
      path = path, keyCols = Seq("event_id"), precombineCol = "ts_us",
      partitionCols = Seq("event_type")))
    val ev = eventsUs
    table.upsert(spark, ev, commitTime = "c0")
    table.recordKeyIndex(spark)
    val vals: Seq[Double] = ev.orderBy("event_id").limit(2)
      .select("value").as[Double].collect().toSeq
    // Without the sidecar the non-key probe must not rewrite.
    def q = table.read(spark).filter(col("value").isin(vals: _*))
    assert(scannedDataFiles(q).isEmpty, "no secondary sidecar: no rewrite")
    table.secondaryIndex(spark, "value")
    val files = scannedDataFiles(q)
    assert(files.isDefined && files.get.length < dataFileCount(path),
      s"secondary probe must prune: $files of ${dataFileCount(path)}")
    assert(outputSet(q) == outputSet(
      spark.read.parquet(path).filter(col("value").isin(vals: _*))))
  }

  test("secondary probe on MoR: migrated value never leaks the superseded row") {
    val path = Files.createTempDirectory("graft_plr_mig_").toString + "/t"
    val table = KeyedTable(morSpec(path))
    val ev = eventsUs
    table.upsert(spark, ev, commitTime = "c0")
    table.recordKeyIndex(spark)
    table.secondaryIndex(spark, "event_id")
    // Migrate one key: a NEWER version lands under a fresh event_id.
    val base = table.read(spark)
      .orderBy(col("user_id"), col("event_type")).limit(1).cache()
    val migrated = base
      .withColumn("ts_us", col("ts_us") + 1000L)
      .withColumn("event_id", lit(9999999L))
    val oldId = base.select("event_id").as[Long].collect()(0)
    table.upsert(spark, migrated, commitTime = "c1")
    // Probe the OLD value: the stale sidecar still maps it to the key,
    // the candidates hold the key's NEW winner, the guard + residual
    // filter must land on empty — not on the superseded version.
    val qOld = table.read(spark).filter(col("event_id") === oldId)
    assert(scannedDataFiles(qOld).isDefined,
      "the stale secondary probe must still serve (pruned)")
    assert(qOld.count() == 0L, "a migrated value must not resurrect")
    val qNew = table.read(spark).filter(col("event_id") === 9999999L)
    assert(scannedDataFiles(qNew).isDefined)
    assert(qNew.count() == 1L, "the delta-only value must be found")
  }

  test("declines: raw scan on MoR, oversized probe") {
    val path = Files.createTempDirectory("graft_plr_dec_").toString + "/t"
    val table = KeyedTable(morSpec(path))
    table.upsert(spark, eventsUs, commitTime = "c0")
    table.recordKeyIndex(spark)
    table.read(spark) // warm the registry either way
    val ids = probeIds
    // A raw scan sees superseded versions; winner-only candidates would
    // drop them — the rule must stay off the raw shape.
    val raw = spark.read.parquet(path).filter(col("user_id").isin(ids: _*))
    assert(scannedDataFiles(raw).isEmpty, "raw scans must not rewrite")
    // An oversized probe is not point-shaped.
    val manyIds = eventsUs.select("user_id").distinct()
      .as[Long].collect().toSeq.take(200)
    val big = table.read(spark).filter(col("user_id").isin(manyIds: _*))
    assert(scannedDataFiles(big).isEmpty, "oversized probes must not rewrite")
    assert(outputSet(big) ==
      outputSet(table.read(spark)).filter(r => manyIds.contains(r._1)))
  }

  test("composite key: the tuple-product probe serves; a partial key probe declines") {
    val path = Files.createTempDirectory("graft_plr_comp_").toString + "/t"
    // Composite (user_id, event_id) key on a resolving table; versions
    // land via a same-content second commit.
    val table = KeyedTable(KeyedTableSpec(
      path = path, keyCols = Seq("user_id", "event_id"),
      precombineCol = "ts_us", partitionCols = Seq("event_type"),
      retainHistory = true))
    val ev = eventsUs
    table.upsert(spark, ev, commitTime = "c0")
    table.upsert(spark, ev.filter(col("event_id") < 50), commitTime = "c1")
    table.recordKeyIndex(spark)
    val pairs = ev.orderBy("event_id").limit(3)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSeq
    val uids = pairs.map(_._1).distinct
    val eids = pairs.map(_._2)
    // user_id IN (...) AND event_id IN (...): the cartesian tuple set
    // covers every probed pair; the residual filter trims the rest.
    def q = table.read(spark)
      .filter(col("user_id").isin(uids: _*) && col("event_id").isin(eids: _*))
    val files = scannedDataFiles(q)
    assert(files.isDefined, "composite tuple probe must serve")
    assert(files.get.length < dataFileCount(path),
      s"composite candidates must prune: ${files.get.length} of ${dataFileCount(path)}")
    val expected = outputSet(
      table.read(spark)
        .filter(col("user_id").isin(uids: _*) && col("event_id").isin(eids: _*))
        .filter(lit(true))) // same frame; the rewrite only changes files
    assert(outputSet(q) == expected)
    assert(outputSet(q) == outputSet(table.lookupKeys(spark,
      pairs.toDF("user_id", "event_id"))
      .filter(col("user_id").isin(uids: _*) && col("event_id").isin(eids: _*))))
    // A probe on HALF the key does not identify tuples: it must decline
    // (no secondary sidecar on user_id here to rescue it).
    def qHalf = table.read(spark).filter(col("user_id") === uids.head)
    assert(scannedDataFiles(qHalf).isEmpty, "partial key probe must decline")
  }

  test("composite-key MoR secondary probe: exact tuple guard, no leak") {
    val path = Files.createTempDirectory("graft_plr_cse_").toString + "/t"
    val table = KeyedTable(KeyedTableSpec(
      path = path, keyCols = Seq("user_id", "event_id"),
      precombineCol = "ts_us", partitionCols = Seq("event_type"),
      retainHistory = true))
    // `tag` is a unique NON-key column to probe through the secondary.
    val ev = eventsUs.withColumn("tag", col("event_id") * 1000L + 7L)
    table.upsert(spark, ev, commitTime = "c0")
    table.recordKeyIndex(spark)
    table.secondaryIndex(spark, "tag")
    // Migrate one composite key's winner to a fresh tag.
    val base = table.read(spark)
      .orderBy(col("user_id"), col("event_type")).limit(1).cache()
    val oldTag = base.select("tag").as[Long].collect()(0)
    table.upsert(spark,
      base.withColumn("ts_us", col("ts_us") + 1000L)
        .withColumn("tag", lit(999999999L)),
      commitTime = "c1")
    // The stale sidecar maps the OLD tag to the composite key; the
    // exact tuple guard (OR-of-AND) bounds the swapped scan so the
    // superseded version cannot leak through a shared candidate file.
    val qOld = table.read(spark).filter(col("tag") === oldTag)
    assert(scannedDataFiles(qOld).isDefined,
      "the composite secondary probe must serve (pruned)")
    assert(qOld.count() == 0L, "a migrated value must not resurrect")
    val qNew = table.read(spark).filter(col("tag") === 999999999L)
    assert(scannedDataFiles(qNew).isDefined)
    assert(qNew.count() == 1L, "the delta-only value must be found")
  }

  test("narrowing and renaming projections between filter and scan still serve") {
    val path = Files.createTempDirectory("graft_plr_proj_").toString + "/t"
    // Unique keys, one per partition's files — the q147 shape, where a
    // single-key probe genuinely prunes.
    val table = KeyedTable(KeyedTableSpec(
      path = path, keyCols = Seq("event_id"), precombineCol = "ts_us",
      partitionCols = Seq("event_type")))
    table.upsert(spark, eventsUs, commitTime = "c0")
    table.recordKeyIndex(spark)
    val id = 3L
    // The BI-tool shape: SELECT a, b FROM t WHERE k = … — a narrowing
    // projection wrapped around the probe.
    val narrowed = table.read(spark)
      .select("event_id", "value")
      .filter(col("event_id") === id)
    assert(scannedDataFiles(narrowed).isDefined,
      "a narrowing projection must not block the point serve")
    // A RENAMING projection below the filter: the probe is on the alias.
    val renamed = table.read(spark)
      .select(col("event_id").as("eid"), col("value"), col("event_type"))
      .filter(col("eid") === id)
    assert(scannedDataFiles(renamed).isDefined,
      "a renamed key probe must still serve")
    val expect = table.read(spark).filter(col("event_id") === id)
      .select(col("event_id").as("eid"), col("value"), col("event_type"))
      .collect().toSet
    assert(renamed.collect().toSet == expect)
    // Same two shapes on the MoR resolve read.
    val morPath = Files.createTempDirectory("graft_plr_projm_").toString + "/t"
    val mor = KeyedTable(morSpec(morPath))
    mor.upsert(spark, eventsUs.filter(col("event_id") % 2 === 0), "c0")
    mor.upsert(spark, eventsUs.filter(col("event_id") % 2 === 1), "c1")
    mor.recordKeyIndex(spark)
    val morNarrowed = mor.read(spark)
      .select(col("user_id").as("uid"), col("ts_us"))
      .filter(col("uid") === id)
    assert(scannedDataFiles(morNarrowed).isDefined,
      "the MoR resolve read must serve under a renaming projection")
    assert(morNarrowed.collect().toSet ==
      mor.read(spark).filter(col("user_id") === id)
        .select(col("user_id").as("uid"), col("ts_us")).collect().toSet)
  }
}
