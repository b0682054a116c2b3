package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.JsonStreamSource
import graft.streaming.MicroBatchPipeline
import graft.table.{KeyedTable, KeyedTableSpec}

/** Streaming acceptance scenarios (SURVEY §5 #8–9): the micro-batch loop
  * end-to-end over a JSON file stream, empty input, and checkpoint restart
  * without duplicates.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def writeJson(dir: String, records: Seq[String]): Unit = {
    val d = new java.io.File(dir)
    d.mkdirs()
    records.zipWithIndex.foreach { case (r, i) =>
      Files.writeString(new java.io.File(d, f"rec_$i%04d.json").toPath, r + "\n")
    }
  }

  private def table(dir: String) = KeyedTable(KeyedTableSpec(
    path = s"$dir/t",
    keyCols = Seq("name"),
    precombineCol = "date",
    tiebreakCols = Seq("payload"),
    partitionCols = Seq("year")))

  test("stream → foreachBatch → upsert: latest record per key lands") {
    val tmp = Files.createTempDirectory("graft_stream_spec_").toString
    writeJson(s"$tmp/in", Seq(
      """{"name":"a","date":"2024-03-07","year":2024,"payload":"v1"}""",
      """{"name":"a","date":"2024-03-09","year":2024,"payload":"v2"}""",
      """{"name":"b","date":"2024-03-07","year":2024,"payload":"w1"}"""))
    val t = table(tmp)
    val q = MicroBatchPipeline.start(
      JsonStreamSource.stream(spark, s"$tmp/in", maxFilesPerTrigger = Some(1)),
      t, s"$tmp/cp", Trigger.AvailableNow())
    q.awaitTermination()
    val byName = t.read(spark).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("payload")).toMap
    assert(byName == Map("a" -> "v2", "b" -> "w1"))
  }

  test("mid-stream schema drift: bootstrap narrow, widen at the batch that adds the column") {
    // The reference's evolveSchema-inside-the-loop semantic: a column
    // first seen mid-stream must not exist (even null-filled) before its
    // first batch. Two drains against ONE checkpoint make the mid-stream
    // table state observable between micro-batches.
    val tmp = Files.createTempDirectory("graft_stream_drift_spec_").toString
    val t = table(tmp)
    val wideSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "name STRING, date STRING, year BIGINT, payload STRING, score BIGINT")
    def drain(): Unit = {
      val q = MicroBatchPipeline.start(
        JsonStreamSource.stream(spark, s"$tmp/in", schema = Some(wideSchema)),
        t, s"$tmp/cp", Trigger.AvailableNow(),
        prep = graft.schema.SchemaEvolution.dropAbsentColumns)
      q.awaitTermination()
    }
    new java.io.File(s"$tmp/in").mkdirs()
    Files.writeString(new java.io.File(s"$tmp/in", "a.json").toPath,
      """{"name":"a","date":"2024-03-07","year":2024,"payload":"v1"}""" + "\n")
    drain()
    assert(!t.currentUserSchema(spark).get.fieldNames.contains("score"),
      "a column no record has carried yet must not exist after bootstrap")
    Files.writeString(new java.io.File(s"$tmp/in", "b.json").toPath,
      """{"name":"b","date":"2024-03-08","year":2024,"payload":"w1","score":7}""" + "\n")
    drain()
    val out = t.read(spark).collect()
      .map(r => r.getAs[String]("name") ->
        Option(r.getAs[Any]("score")).map(_.toString)).toMap
    assert(t.currentUserSchema(spark).get.fieldNames.contains("score"),
      "the first batch carrying the column must widen the table")
    assert(out == Map("a" -> None, "b" -> Some("7")),
      "pre-drift rows null-fill, the widening batch's rows carry the value")
  }

  test("restart from checkpoint does not reprocess or duplicate") {
    val tmp = Files.createTempDirectory("graft_stream_spec_").toString
    writeJson(s"$tmp/in", Seq(
      """{"name":"a","date":"2024-03-07","year":2024,"payload":"v1"}"""))
    val t = table(tmp)
    val schema = JsonStreamSource.inferSchema(spark, s"$tmp/in")
    val q1 = MicroBatchPipeline.start(
      JsonStreamSource.stream(spark, s"$tmp/in", Some(schema)),
      t, s"$tmp/cp", Trigger.AvailableNow())
    q1.awaitTermination()
    assert(t.read(spark).count() == 1)

    // new file arrives; restart the query from the same checkpoint
    writeJson(s"$tmp/in2", Nil) // no-op, keep dirs distinct
    Files.writeString(new java.io.File(s"$tmp/in/rec_9999.json").toPath,
      """{"name":"c","date":"2024-03-08","year":2024,"payload":"x1"}""" + "\n")
    val q2 = MicroBatchPipeline.start(
      JsonStreamSource.stream(spark, s"$tmp/in", Some(schema)),
      t, s"$tmp/cp", Trigger.AvailableNow())
    q2.awaitTermination()
    val names = t.read(spark).select("name").as[String].collect().sorted.toSeq
    assert(names == Seq("a", "c"))
  }

  test("empty input stream leaves no table behind (empty-batch guard)") {
    val tmp = Files.createTempDirectory("graft_stream_spec_").toString
    writeJson(s"$tmp/in", Seq("""{"name":"a","date":"1","year":1,"payload":"p"}"""))
    val t = table(tmp)
    // stream over an all-filtered source: batches arrive but carry 0 rows
    val src = JsonStreamSource.stream(spark, s"$tmp/in")
      .filter(col("name") === "no-such-key")
    val q = MicroBatchPipeline.start(src, t, s"$tmp/cp", Trigger.AvailableNow())
    q.awaitTermination()
    assert(!t.exists(spark))
  }

  test("malformed JSON records do not fail the pipeline; valid rows land") {
    // Spark's JSON source defaults to PERMISSIVE: a record that fails to
    // parse yields an all-null row instead of failing the query — the
    // DynamicFrame-style never-fail-the-batch posture. The pipeline
    // carries the null row through the upsert (a single null-key group);
    // valid rows are unaffected. This pins the policy: bad input degrades
    // to an inspectable null row, never to a dead stream.
    val tmp = Files.createTempDirectory("graft_stream_spec_").toString
    writeJson(s"$tmp/in", Seq(
      """{"name":"a","date":"2024-03-07","year":2024,"payload":"v1"}""",
      """{this is not json at all""",
      """{"name":"b","date":"2024-03-07","year":2024,"payload":"w1"}"""))
    val t = table(tmp)
    val q = MicroBatchPipeline.start(
      JsonStreamSource.stream(spark, s"$tmp/in"),
      t, s"$tmp/cp", Trigger.AvailableNow())
    q.awaitTermination()
    val rows = t.read(spark).collect()
    val byName = rows.filter(_.getAs[String]("name") != null)
      .map(r => r.getAs[String]("name") -> r.getAs[String]("payload")).toMap
    assert(byName == Map("a" -> "v1", "b" -> "w1"))
    // the malformed record degrades to exactly one all-null row
    assert(rows.count(_.getAs[String]("name") == null) == 1)
  }

  test("event-time tumbling window + watermark: finalized windows emit, late data is dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{count => cnt, lit, timestamp_micros, window}
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val hourUs = 3600L * 1000 * 1000
    val agg = ms.toDF().toDF("ts_us", "etype")
      .withColumn("ts", timestamp_micros($"ts_us"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"etype")
      .agg(cnt(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()
    try {
      // hour 0: two events; then an event far in hour 3 to advance the
      // watermark past hour 0's end + 10 min → hour 0 finalizes.
      ms.addData((1L * 60 * 1000 * 1000, "click"), (2L * 60 * 1000 * 1000, "click"))
      q.processAllAvailable()
      ms.addData((3 * hourUs + 1, "click"))
      q.processAllAvailable()
      val emitted = spark.table("win_out").select("n").as[Long].collect().toSeq
      assert(emitted == Seq(2L), s"hour-0 window should emit with n=2, got $emitted")

      // late event for hour 0, behind the watermark → dropped, no new row
      ms.addData((5L * 60 * 1000 * 1000, "click"))
      q.processAllAvailable()
      val after = spark.table("win_out").select("n").as[Long].collect().toSeq
      assert(after == Seq(2L), s"late data must not reopen the window, got $after")
    } finally q.stop()
  }

  test("stateful sessionization: closed sessions emit incrementally, state carries across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Sessionization
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hourUs = 3600L * 1000 * 1000
    val ms = MemoryStream[(Long, Long)]
    val out = Sessionization.sessionize(ms.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // batch 1: user 7 has two close events (one open session) — nothing emits
      ms.addData((7L, 0L), (7L, 10L * 60 * 1000 * 1000))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0)

      // batch 2: an event 2h later closes session 1 (2 events) and opens session 2
      ms.addData((7L, 3 * hourUs))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .as[Sessionization.SessionOut].collect().toSeq
      assert(rows == Seq(Sessionization.SessionOut(7L, 1L, 2L, 0L, 10L * 60 * 1000 * 1000)))

      // a second user's state is independent
      ms.addData((9L, 0L), (9L, 5 * hourUs))
      q.processAllAvailable()
      val users = spark.table("sess_out").select("user_id").as[Long].collect().toSet
      assert(users == Set(7L, 9L))
    } finally q.stop()
  }

  test("stream-stream interval join: purchases attribute to in-window clicks only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.timestamp_micros
    import graft.streaming.StreamJoin
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val minUs = 60L * 1000 * 1000
    val base = 1000 * 60 * minUs // clear of epoch: time-0 rows would sit
                                 // AT the initial watermark and be dropped
    val msC = MemoryStream[(Long, Long)]
    val msP = MemoryStream[(Long, Long, Double)]
    val clicks = msC.toDF().toDF("user_id", "c_us")
      .withColumn("c_ts", timestamp_micros($"c_us"))
    val purchases = msP.toDF().toDF("p_user", "p_us", "amount")
      .withColumn("p_ts", timestamp_micros($"p_us"))
    val q = StreamJoin.clickAttribution(clicks, purchases)
      .select("user_id", "c_us", "p_us", "amount")
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_out").start()
    try {
      msC.addData((1L, base), (2L, base))
      msP.addData((1L, base + 30 * minUs, 9.99)) // 30 min later → match
      q.processAllAvailable()
      val first = spark.table("attr_out")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(first == Set((1L, base, base + 30 * minUs, 9.99)))

      // user 2 purchases 3 h after the click — outside the 1 h window
      msP.addData((2L, base + 180 * minUs, 5.0))
      q.processAllAvailable()
      val after = spark.table("attr_out")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(after == first, "out-of-window purchase must not join")
    } finally q.stop()
  }

  test("streaming dedup: duplicate keys within the watermark are dropped, state stays bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long)] // (doc_id, event micros)
    val in = ms.toDF().toDF("doc_id", "us")
      .withColumn("ts", timestamp_micros($"us"))
    val out = StreamingDedup.dedupWithinWatermark(in, Seq("doc_id"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val min = 60L * 1000 * 1000
      ms.addData((1L, 0L), (1L, 1 * min), (2L, 2 * min)) // 1 duplicated in-batch
      q.processAllAvailable()
      ms.addData((1L, 3 * min), (3L, 4 * min)) // 1 duplicated across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L), s"one row per key: $ids")
      // far beyond the horizon the key's state has been evicted: the same
      // doc_id is accepted again (bounded state, by design). The watermark
      // only advances after a batch with later events, so first push it
      // past 0 + 10min with an unrelated key, then re-send doc 1.
      ms.addData((4L, 120 * min))
      q.processAllAvailable()
      ms.addData((1L, 121 * min))
      q.processAllAvailable()
      val again = spark.table("dedup_out").filter($"doc_id" === 1L).count()
      assert(again == 2, "state evicted past the watermark horizon")
    } finally q.stop()
  }

  test("streaming heavy hitters: bounded sharded state, exact when capacity covers bucket vocab") {
    import graft.streaming.StreamingFrequentTerms
    import graft.streaming.StreamingFrequentTerms.BucketSummary
    val tmp = Files.createTempDirectory("graft_hh_").toString
    // stage the corpus tokens as a multi-file stream
    graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("term"))
      .repartition(3)
      .write.mode("overwrite").json(s"$tmp/in")
    val buckets = 4
    val stream = StreamingFrequentTerms.summaries(
      JsonStreamSource.stream(spark, s"$tmp/in", maxFilesPerTrigger = Some(1)),
      termCol = "term", buckets = buckets, capacity = 64)
    val emissions = scala.collection.mutable.ArrayBuffer.empty[BucketSummary]
    val q = stream.toDF().writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map { r =>
          BucketSummary(
            r.getAs[Int]("bucket"),
            r.getAs[Map[String, Long]]("terms"))
        }
        emissions.synchronized { emissions ++= rows }
        ()
      }
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // state is bounded by the bucket count, not the token count
    val stateRows = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsTotal)
    assert(stateRows.nonEmpty && stateRows.forall(_ <= buckets))

    // capacity (64) >= any bucket's vocabulary (31 total) -> exact counts
    val expected = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(10)
    assert(StreamingFrequentTerms.mergedTopK(emissions.toSeq, 10) == expected)
  }

  test("streaming as-of enrichment: each event gets the latest dimension row at or before its time") {
    val tmp = Files.createTempDirectory("graft_asof_stream_").toString
    // events across two keys, including one BEFORE any snapshot
    writeJson(s"$tmp/in", Seq(
      """{"k":"x","ts":5,"event":"e1"}""",
      """{"k":"x","ts":25,"event":"e2"}""",
      """{"k":"x","ts":35,"event":"e3"}""",
      """{"k":"y","ts":25,"event":"e4"}""",
      """{"k":"z","ts":50,"event":"e5"}""")) // key with no dimension rows at all
    val dim = Seq(
      ("x", 10L, "x-v1"), ("x", 30L, "x-v2"), ("y", 20L, "y-v1"))
      .toDF("k", "dts", "dval")

    val enriched = graft.streaming.StreamingAsOf.enrich(
      JsonStreamSource.stream(spark, s"$tmp/in"),
      dim, keyCol = "k", tsCol = "ts", dimTsCol = "dts", dimValCol = "dval")
    val got = scala.collection.mutable.Map.empty[String, (Any, Any)]
    val q = enriched.writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r =>
          got.synchronized {
            got(r.getAs[String]("event")) =
              (r.getAs[Any]("asof_ts"), r.getAs[Any]("asof_val"))
          })
        ()
      }
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(got("e1") == (null, null), "event before any snapshot → null enrichment")
    assert(got("e2") == (10L, "x-v1"))
    assert(got("e3") == (30L, "x-v2"), "snapshot AT the event time is eligible")
    assert(got("e4") == (20L, "y-v1"))
    assert(got("e5") == (null, null), "key absent from the dimension → null enrichment")
  }

  test("stateful queries run on the RocksDB state store (off-heap, disk-backed)") {
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .endsWith("RocksDBStateStoreProvider"))
    // Drive one stateful micro-batch and check the progress carries
    // RocksDB-specific metrics — proof the provider is actually in use,
    // not just configured.
    val tmp = Files.createTempDirectory("graft_rocks_").toString
    writeJson(s"$tmp/in", Seq(
      """{"k":"a","v":1}""", """{"k":"a","v":2}""", """{"k":"b","v":3}"""))
    val q = JsonStreamSource.stream(spark, s"$tmp/in")
      .groupBy(col("k")).count()
      .writeStream.outputMode("update")
      // consume every partition: state stores only commit for processed
      // partitions, and Spark 4 validates all of them committed
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => { b.count(); () })
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val metrics = q.recentProgress.flatMap(_.stateOperators)
      .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
    assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
      s"expected rocksdb custom metrics, got: ${metrics.distinct.mkString(", ")}")
  }

  test("sharded transport: per-key ordering survives adversarial cross-shard interleaving") {
    // Two shards with key→shard affinity (a → shard 0, b → shard 1), each
    // shard's files appended in its own order, but GLOBAL arrival
    // interleaved adversarially: a's second record arrives after BOTH of
    // b's. A keyed sink precombining on transport_seq must still land the
    // per-shard-latest record for every key.
    val tmp = Files.createTempDirectory("graft_shard_spec_").toString
    val in = s"$tmp/in"
    def shardFile(shard: Int, name: String, rec: String, mtimeMs: Long): Unit = {
      val d = new java.io.File(s"$in/shard=$shard"); d.mkdirs()
      val f = new java.io.File(d, name)
      Files.writeString(f.toPath, rec + "\n")
      f.setLastModified(mtimeMs)
    }
    val t0 = System.currentTimeMillis() - 600000L
    // shard 0 (key a): "a1" then "a2"; shard 1 (key b): "b1" then "b2"
    shardFile(0, "f0.json", """{"name":"a","year":2024,"payload":"a1"}""", t0)
    shardFile(1, "f0.json", """{"name":"b","year":2024,"payload":"b1"}""", t0 + 1000)
    shardFile(1, "f1.json", """{"name":"b","year":2024,"payload":"b2"}""", t0 + 2000)
    shardFile(0, "f1.json", """{"name":"a","year":2024,"payload":"a2"}""", t0 + 3000)

    val stream = JsonStreamSource.streamSharded(
      spark, in, maxFilesPerTrigger = Some(1)) // one file per micro-batch
    assert(stream.columns.contains("shard") && stream.columns.contains("transport_seq"))

    val t = KeyedTable(KeyedTableSpec(
      path = s"$tmp/t",
      keyCols = Seq("name"),
      precombineCol = "transport_seq", // the transport's own sequence
      partitionCols = Seq("year")))
    val q = MicroBatchPipeline.start(stream, t, s"$tmp/cp", Trigger.AvailableNow())
    q.awaitTermination()

    val out = t.read(spark).collect()
      .map(r => r.getAs[String]("name") ->
        (r.getAs[String]("payload"), r.getAs[Long]("shard"))).toMap
    assert(out == Map("a" -> ("a2", 0L), "b" -> ("b2", 1L)),
      "per-shard-latest record must win per key despite interleaved arrival")
  }

  test("resharding: a shard split mid-stream preserves per-key ordering and new shard dirs are discovered") {
    // Kinesis resharding contract: shard 0 splits into children 2 and 3;
    // key a's affinity moves to child shard 2, records for a in the child
    // arrive strictly AFTER its parent-shard records (Kinesis guarantees
    // parents drain before children serve). In file-source terms the
    // child dirs appear only after the first drain — the restarted stream
    // (same checkpoint) must discover them and transport_seq must still
    // give key a a total order spanning the split.
    val tmp = Files.createTempDirectory("graft_reshard_spec_").toString
    val in = s"$tmp/in"
    def shardFile(shard: Int, name: String, rec: String, mtimeMs: Long): Unit = {
      val d = new java.io.File(s"$in/shard=$shard"); d.mkdirs()
      val f = new java.io.File(d, name)
      Files.writeString(f.toPath, rec + "\n")
      f.setLastModified(mtimeMs)
    }
    val t0 = System.currentTimeMillis() - 600000L
    // pre-split: key a on shard 0, key b on shard 1
    shardFile(0, "f0.json", """{"name":"a","year":2024,"payload":"a1"}""", t0)
    shardFile(0, "f1.json", """{"name":"a","year":2024,"payload":"a2"}""", t0 + 1000)
    shardFile(1, "f0.json", """{"name":"b","year":2024,"payload":"b1"}""", t0 + 500)

    val t = KeyedTable(KeyedTableSpec(
      path = s"$tmp/t",
      keyCols = Seq("name"),
      precombineCol = "transport_seq",
      partitionCols = Seq("year")))
    def drain(): Unit = {
      val stream = JsonStreamSource.streamSharded(
        spark, in, maxFilesPerTrigger = Some(1))
      val q = MicroBatchPipeline.start(stream, t, s"$tmp/cp", Trigger.AvailableNow())
      q.awaitTermination()
    }
    drain()
    assert(t.read(spark).collect().map(r =>
      r.getAs[String]("name") -> r.getAs[String]("payload")).toMap ==
      Map("a" -> "a2", "b" -> "b1"))

    // split: shard 0 goes quiet; children 2 (inherits key a) and 3 (new
    // key c) appear; sibling shard 1 keeps flowing
    shardFile(2, "f0.json", """{"name":"a","year":2024,"payload":"a3"}""", t0 + 2000)
    shardFile(3, "f0.json", """{"name":"c","year":2024,"payload":"c1"}""", t0 + 2500)
    shardFile(1, "f1.json", """{"name":"b","year":2024,"payload":"b2"}""", t0 + 3000)
    drain()

    val out = t.read(spark).collect()
      .map(r => r.getAs[String]("name") ->
        (r.getAs[String]("payload"), r.getAs[Long]("shard"))).toMap
    assert(out == Map(
      "a" -> ("a3", 2L), // child-shard record supersedes the parent's
      "b" -> ("b2", 1L),
      "c" -> ("c1", 3L)),
      "post-split child shards must be discovered and per-key order must span the split")
  }

  test("choice-type policy: a \"5\"/5 mixed batch lands typed without nulling data") {
    import org.apache.spark.sql.types.LongType
    val tmp = Files.createTempDirectory("graft_choice_spec_").toString
    // Records disagree on k's type (int vs string) — DynamicFrame would
    // carry a choice type; a fixed long schema would null the "5".
    writeJson(s"$tmp/in", Seq(
      """{"id":1,"k":5}""",
      """{"id":2,"k":"6"}""",
      """{"id":3,"k":"oops"}"""))
    val inferred = JsonStreamSource.inferSchema(spark, s"$tmp/in")
    val wide = JsonStreamSource.widenToChoiceSchema(inferred)
    assert(wide.fields.forall(_.dataType == org.apache.spark.sql.types.StringType))
    // Batch read through the widened schema: both numeric variants survive
    // as their literal tokens, then resolve to long (cast semantics).
    val raw = spark.read.schema(wide).json(s"$tmp/in")
    val resolved = JsonStreamSource.resolveChoice(raw, "k", LongType)
      .select($"id".cast("long"), $"k")
      .as[(Long, Option[Long])].collect().toMap
    assert(resolved == Map(1L -> Some(5L), 2L -> Some(6L), 3L -> None))
    // The streaming path accepts the widened schema too.
    assert(JsonStreamSource.stream(spark, s"$tmp/in", Some(wide)).isStreaming)
  }

  test("restart ingest resumes from the checkpoint: every event exactly once") {
    val got = graft.operators.UpsertOps.streamRestart(spark, sf0001)
      .select("event_id").as[Long].collect().toSeq
    val expect = graft.sources.Tables.events(spark, sf0001)
      .select("event_id").as[Long].collect().toSeq
    // exact multiset equality: a checkpoint replay would duplicate
    // phase-1 rows; a broken resume would drop phase-2 rows
    assert(got.sorted == expect.sorted)
  }

  test("starting position policy maps to file-source options") {
    val tmp = Files.createTempDirectory("graft_stream_spec_").toString
    writeJson(s"$tmp/in", Seq("""{"name":"a","date":"1","year":1,"payload":"p"}"""))
    assert(JsonStreamSource.streamFrom(spark, s"$tmp/in", "earliest").isStreaming)
    assert(JsonStreamSource.streamFrom(spark, s"$tmp/in", "latest").isStreaming)
    intercept[IllegalArgumentException] {
      JsonStreamSource.streamFrom(spark, s"$tmp/in", "bogus")
    }
  }
}
