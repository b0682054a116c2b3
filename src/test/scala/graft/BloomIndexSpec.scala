package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.table.{KeyedTable, KeyedTableSpec}

/** The record-key bloom index and its file-level copy-on-write upsert:
  * result equivalence with the partition-level path, physical file
  * pruning (untouched file groups keep their exact paths and bytes), and
  * the index's no-false-negative contract.
  */
class BloomIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsUs =
    Tables.events(spark, sf0001).withColumn("ts_us", expr("ts div 1000"))

  private def outputSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Long, Double)] =
    df.select("user_id", "event_type", "ts_us", "event_id", "value")
      .as[(Long, String, Long, Long, Double)].collect().toSet

  private def partitionedSpec(path: String) = KeyedTableSpec(
    path = path, keyCols = Seq("user_id"), precombineCol = "ts_us",
    tiebreakCols = Seq("event_id"), partitionCols = Seq("event_type"))

  // event_id is unique per row, so a bulk load is key-unique by
  // construction (the file-group invariant the file-level path relies
  // on, like Hudi's) and a range layout spreads real key ranges.
  private def flatSpec(path: String) = KeyedTableSpec(
    path = path, keyCols = Seq("event_id"), precombineCol = "ts_us")

  test("bloom-indexed upsert equals the partition-level upsert") {
    val ev = eventsUs
    val a = Files.createTempDirectory("graft_bloom_eq_a_").toString + "/t"
    val b = Files.createTempDirectory("graft_bloom_eq_b_").toString + "/t"
    val viaBloom = KeyedTable(partitionedSpec(a))
    val viaPart = KeyedTable(partitionedSpec(b))
    for ((t, c) <- Seq(("c0", 0), ("c1", 1))) {
      viaBloom.upsertBloomIndexed(spark, ev.filter(col("event_id") % 2 === c), t)
      viaPart.upsert(spark, ev.filter(col("event_id") % 2 === c), t)
    }
    assert(outputSet(viaBloom.read(spark)) == outputSet(viaPart.read(spark)))
  }

  test("only may-contain file groups are replaced; the rest keep their bytes") {
    val ev = eventsUs
    val path = Files.createTempDirectory("graft_bloom_prune_").toString + "/t"
    val table = KeyedTable(flatSpec(path))
    // Key-range-laid initial load: 8 file groups, each a tight event_id
    // range, so a batch touching one range blooms to few candidates.
    table.bulkInsert(
      spark, ev.repartitionByRange(8, col("event_id")), commitTime = "c0")
    table.recordBloomIndex(spark)

    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(): Map[String, Long] = {
      val it = fs.listFiles(fs.makeQualified(new org.apache.hadoop.fs.Path(path)), true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val s = it.next()
        val rel = s.getPath.toUri.getPath
        if (s.getPath.getName.endsWith(".parquet") &&
          !rel.split('/').exists(seg => seg.startsWith("_") || seg.startsWith(".")))
          b += (s.getPath.toString -> s.getLen)
      }
      b.result()
    }
    val before = files()
    assert(before.size >= 6, s"expected >=6 file groups, got ${before.size}")

    // Touch a narrow key slice with strictly-later versions.
    val lo = ev.agg(min("event_id")).as[Long].head()
    val batch = ev.filter(col("event_id").between(lo, lo + 50))
      .withColumn("ts_us", col("ts_us") + 1000000L)
      .withColumn("value", col("value") + 1.0)
    table.upsertBloomIndexed(spark, batch, commitTime = "c1")

    val after = files()
    val untouched = before.keySet.intersect(after.keySet)
    val replaced = before.keySet -- after.keySet
    assert(replaced.nonEmpty, "the touched file group must be rewritten")
    assert(untouched.size >= before.size - 3,
      s"expected most of ${before.size} file groups untouched; replaced $replaced")
    untouched.foreach(p => assert(before(p) == after(p), s"$p changed size"))

    // Read-back: latest per event — the touched slice carries the bump.
    val got = outputSet(table.read(spark))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("ts_us").desc)
    val want = outputSet(
      ev.unionByName(batch)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn"))
    assert(got == want)

    // A third commit must stay correct against the incrementally
    // maintained index (no rebuild in between).
    val batch2 = ev.filter(col("event_id") % 97 === 0)
      .withColumn("ts_us", col("ts_us") + 2000000L)
    table.upsertBloomIndexed(spark, batch2, commitTime = "c2")
    val want2 = outputSet(
      ev.unionByName(batch).unionByName(batch2)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn"))
    assert(outputSet(table.read(spark)) == want2)
  }

  test("a non-indexed write invalidates the index; the next indexed upsert rebuilds correctly") {
    val ev = eventsUs
    val path = Files.createTempDirectory("graft_bloom_inval_").toString + "/t"
    val table = KeyedTable(flatSpec(path))
    val evA = ev.filter(col("event_id") % 2 === 0)
    val evB = ev.filter(col("event_id") % 2 === 1)
    table.upsertBloomIndexed(spark, evA, commitTime = "c0")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bloomPath = new org.apache.hadoop.fs.Path(path, "_graft_bloom")
    assert(fs.exists(bloomPath))
    // A plain insert appends files OUTSIDE the bloom path — the index
    // must go stale-ABSENT, never stale-present (a present index blind
    // to evB's files would silently skip merging their keys).
    table.insert(spark, evB, commitTime = "c1")
    assert(!fs.exists(bloomPath), "non-indexed write must drop the bloom index")
    // Update keys that live only in the non-indexed files: the rebuild
    // must find them and the merge must still be exact.
    // deterministic slice (limit() could re-evaluate differently below)
    val batch = evB.filter(col("event_id") % 7 === 1)
      .withColumn("ts_us", col("ts_us") + 1000000L)
      .withColumn("value", col("value") + 1.0)
    table.upsertBloomIndexed(spark, batch, commitTime = "c2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("ts_us").desc)
    val want = outputSet(
      ev.unionByName(batch)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn"))
    assert(outputSet(table.read(spark)) == want)
  }

  test("a legacy absolute-path bloom sidecar is detected and rebuilt relative") {
    val ev = eventsUs
    val path = Files.createTempDirectory("graft_bloom_fmt_").toString + "/t"
    val table = KeyedTable(flatSpec(path))
    table.bulkInsert(
      spark, ev.repartitionByRange(8, col("event_id")), commitTime = "c0")
    table.recordBloomIndex(spark)
    // Regress the sidecar to the pre-change format: absolute URIs in
    // `file` (what a sidecar persisted by an old build carries).
    val legacy = spark.read.parquet(s"$path/_graft_bloom")
      .withColumn("file", concat(lit(s"file:$path/"), col("file")))
      .collect()
    val schema = spark.read.parquet(s"$path/_graft_bloom").schema
    spark.createDataFrame(
        java.util.Arrays.asList(legacy: _*), schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_graft_bloom")
    assert(spark.read.parquet(s"$path/_graft_bloom")
      .select("file").as[String].collect().forall(_.startsWith("file:/")),
      "precondition: the sidecar is in the legacy absolute format")
    // The next indexed upsert must detect the format, rebuild, and stay
    // exact — and the rebuilt sidecar must be table-relative again.
    val upd = ev.filter(col("event_id") % 5 === 0)
      .withColumn("ts_us", col("ts_us") + 1000000L)
    table.upsertBloomIndexed(spark, upd, commitTime = "c1")
    val expect = eventsUs.withColumn("ts_us",
        when(col("event_id") % 5 === 0, col("ts_us") + 1000000L)
          .otherwise(col("ts_us")))
    assert(outputSet(table.read(spark)) == outputSet(expect))
    val rebuilt = spark.read.parquet(s"$path/_graft_bloom")
      .select("file").as[String].collect()
    assert(rebuilt.nonEmpty && rebuilt.forall(f =>
      !f.startsWith("/") && !f.contains("://")),
      s"rebuilt sidecar must be table-relative, got ${rebuilt.take(3).toSeq}")
  }

  test("index probe has no false negatives: every stored key's file is a candidate") {
    val ev = eventsUs
    val path = Files.createTempDirectory("graft_bloom_fn_").toString + "/t"
    val table = KeyedTable(flatSpec(path))
    table.bulkInsert(
      spark, ev.repartitionByRange(6, col("event_id")), commitTime = "c0")
    table.recordBloomIndex(spark)

    // Candidates come back TABLE-RELATIVE (the sidecar's stored form);
    // relativize the observed assignment the same way.
    val rootPrefix = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toUri.getPath + "/"
    }
    val keyToFile = table.readRaw(spark)
      .withColumn("file", input_file_name())
      .select(col("event_id"), col("file"))
      .distinct().as[(Long, String)].collect()
      .map { case (eid, abs) =>
        (eid, new org.apache.hadoop.fs.Path(new java.net.URI(abs))
          .toUri.getPath.stripPrefix(rootPrefix))
      }
    // Single-key probes (the worst case for a bloom) over a spread sample,
    // one probe job per key: the key's actual file must be a candidate.
    val byKey = keyToFile.groupBy(_._1)
    val sample = byKey.keys.toSeq.sorted.grouped(
      math.max(1, byKey.size / 10)).map(_.head).toSeq
    sample.foreach { eid =>
      val (cands, total) = table.bloomCandidateFiles(
        spark, ev.filter(col("event_id") === eid))
      assert(total >= 6)
      byKey(eid).map(_._2).foreach(f => assert(cands.contains(f),
        s"event $eid stored in $f but candidates were $cands"))
    }
    // And one all-keys probe: the union of candidates must cover every
    // (key, file) assignment — zero false negatives table-wide.
    val (all, _) = table.bloomCandidateFiles(spark, ev)
    keyToFile.foreach { case (eid, f) =>
      assert(all.contains(f), s"file $f (event $eid) missing from all-keys probe")
    }
  }
}
