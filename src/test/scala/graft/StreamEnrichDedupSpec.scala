package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.UpsertOps
import graft.sources.Tables
import graft.table.{KeyedTable, KeyedTableSpec}

/** Round-8 streaming + maintenance surface: stream-static broadcast
  * enrichment (q123), watermarked streaming dedup (q124), CDC replica
  * application (q125), failed-action rollback (q126). Each claim here is
  * the part the sf0.01 oracle cannot see: cross-batch behavior, plan
  * shape, state bounds, idempotence, and byte-level non-interference.
  */
class StreamEnrichDedupSpec extends SparkTestBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  // ── q123 stream-static enrichment ─────────────────────────────────

  test("enrichment aggregates identically across micro-batch splits") {
    val (multi, _) = UpsertOps.streamEnrichVia(spark, sf0001, Some(1))
    val (single, _) = UpsertOps.streamEnrichVia(spark, sf0001, None)
    assert(rows(multi) == rows(single))
    assert(multi.count() > 0)
  }

  test("the dimension side is broadcast in the streaming plan") {
    val (_, q) = UpsertOps.streamEnrichVia(spark, sf0001, None)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { q.explain() }
    val plan = out.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join in the streaming plan:\n$plan")
    // the stream side must NOT be exchanged before the join — the only
    // shuffle is the downstream aggregate's
    assert(!plan.contains("SortMergeJoin"), "dim join degraded to SMJ")
  }

  // ── q124 watermarked streaming dedup ──────────────────────────────

  test("re-delivered events are dropped across micro-batches") {
    // 5 staged files (4 time slices + the re-delivery) at one file per
    // trigger: every duplicate arrives in a LATER batch than its
    // original, so the drop is a cross-batch state lookup, not in-batch
    val (deduped, _) =
      UpsertOps.streamDedupVia(spark, sf0001, maxFilesPerTrigger = Some(1))
    val original = Tables.eventsUs(spark, sf0001)
      .select("event_id", "ts_us", "user_id", "event_type", "value")
    assert(rows(deduped) == rows(original))
  }

  test("dedup state is bounded by the watermark horizon") {
    // tight 6-hour horizon over a 30-day event span: the watermark
    // advances past earlier slices' keys and EVICTS them — final state
    // holds a small recent fraction of the 1000 keys, the contract that
    // keeps an unbounded stream's dedup state finite. (With eviction,
    // re-delivered old events can re-emit — exactness under a horizon
    // narrower than the transport's re-delivery window is not claimed.)
    val (_, stateRows) = UpsertOps.streamDedupVia(
      spark, sf0001, maxFilesPerTrigger = Some(1), delay = "6 hours")
    assert(stateRows.nonEmpty)
    assert(stateRows.last < 200,
      s"expected evicted dedup state, saw ${stateRows.last} rows")
  }

  // ── q125 CDC replica application ──────────────────────────────────

  test("feed application is idempotent and order-insensitive") {
    val tmp = Files.createTempDirectory("graft_cdc_spec_").toString
    def keyedSpec(p: String, history: Boolean) = KeyedTableSpec(
      path = p, keyCols = Seq("user_id"), precombineCol = "ts_us",
      tiebreakCols = Seq("event_id"), partitionCols = Seq("event_type"),
      retainHistory = history)
    val src = KeyedTable(keyedSpec(s"$tmp/src", history = true))
    val ev = Tables.eventsUs(spark, sf0001)
    src.upsert(spark, ev.filter(col("event_id") % 3 === 0), commitTime = "c0")
    src.upsert(spark, ev.filter(col("event_id") % 3 === 1), commitTime = "c1")
    src.upsert(spark, ev.filter(col("event_id") % 3 === 2), commitTime = "c2")
    val want = rows(src.read(spark)
      .select("user_id", "event_type", "ts_us", "event_id", "value"))

    val d1 = src.readStateDelta(spark, "", Some("c1"))
      .filter(col("op") =!= "update_preimage").drop("op")
    val d2 = src.readStateDelta(spark, "c1")
      .filter(col("op") =!= "update_preimage").drop("op")

    def replicaAfter(tag: String, feeds: Seq[org.apache.spark.sql.DataFrame])
        : Set[String] = {
      val r = KeyedTable(keyedSpec(s"$tmp/replica_$tag", history = false))
      feeds.foreach(f => r.upsert(spark, f))
      rows(r.read(spark)
        .select("user_id", "event_type", "ts_us", "event_id", "value"))
    }

    assert(replicaAfter("fwd", Seq(d1, d2)) == want)
    // double application: the replica's precombine merge absorbs replays
    assert(replicaAfter("replay", Seq(d1, d2, d2, d1)) == want)
    // reversed order: the latest postimage wins the merge either way
    assert(replicaAfter("rev", Seq(d2, d1)) == want)
  }

  // ── q126 failed-action rollback ───────────────────────────────────

  test("cleaner removes exactly the crash debris, bytes untouched") {
    val tmp = Files.createTempDirectory("graft_debris_spec_").toString
    val t = KeyedTable(KeyedTableSpec(
      path = s"$tmp/events", keyCols = Seq("user_id"),
      precombineCol = "ts_us", tiebreakCols = Seq("event_id"),
      partitionCols = Seq("event_type")))
    val ev = Tables.eventsUs(spark, sf0001)
    t.upsert(spark, ev.filter(col("event_id") % 2 === 0), commitTime = "c0")
    t.upsert(spark, ev.filter(col("event_id") % 2 === 1), commitTime = "c1")
    t.recordColumnStats(spark, Seq("ts_us")) // sidecar must survive

    def snapshot(): Map[String, Long] = {
      val walk = Files.walk(java.nio.file.Paths.get(s"$tmp/events"))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(p => p.toString -> Files.size(p)).toMap
      } finally walk.close()
    }
    val before = snapshot()
    val want = rows(t.read(spark))

    val crashed = java.nio.file.Paths.get(s"$tmp/events_graft_cluster_tmp")
    Files.createDirectories(crashed)
    Files.write(crashed.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    val committer = java.nio.file.Paths.get(s"$tmp/events/_temporary/0")
    Files.createDirectories(committer)
    Files.write(committer.resolve("task.parquet"), Array[Byte](4))
    val staging = java.nio.file.Paths.get(s"$tmp/events/.spark-staging-x")
    Files.createDirectories(staging)
    Files.write(staging.resolve("part-00000.parquet"), Array[Byte](5))

    t.rollbackDebris(spark)

    assert(!Files.exists(crashed), "crashed rewrite scratch survived")
    assert(!Files.exists(java.nio.file.Paths.get(s"$tmp/events/_temporary")))
    assert(!Files.exists(staging))
    assert(snapshot() == before, "cleaner touched live table bytes")
    assert(rows(t.read(spark)) == want)
  }
}
