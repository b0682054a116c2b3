package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a larger scale tier from an existing fixture for
  * the scale-smoke runs (the driver ships sf0.001/0.01/0.1 only; the
  * blocking-curve question — "does the dedup/ANN family stay near-linear
  * at 10× rows?" — needs a 10× corpus). Each of `reps` replicas keeps the
  * ORIGINAL's internal structure (so per-replica dup/neighbor density
  * matches the source tier) while replicas stay distinct from each other:
  * document words and embedding dimensions are ROTATED by the replica
  * index — length, token multiset, norms and within-replica similarities
  * are all preserved, but cross-replica texts share no k-grams and
  * cross-replica cosines decorrelate. That is "10× more data drawn from
  * the same distribution", not "every doc duplicated 10 times" (which
  * would measure a pathological all-dups corpus instead of scaling).
  *
  * Usage: `runMain graft.ScaleGen [fromDir] [toDir] [reps]`; writes
  * documents.parquet + embeddings.parquet under toDir.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val from = args.headOption.getOrElse("/root/testdata/sf0.1")
    val to = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$from/documents.parquet")
    val nDocs = docs.agg(max("doc_id")).head.getLong(0) + 1
    val repl = spark.range(reps).select(col("id").cast("int").as("rep"))

    val words = split(col("text"), " ")
    val rot = pmod(col("rep"), size(words))
    val rotated = concat_ws(" ",
      concat(
        slice(words, rot + lit(1), size(words) - rot),
        slice(words, lit(1), rot)))
    docs.crossJoin(repl)
      .select(
        (col("doc_id") + col("rep").cast("long") * nDocs).as("doc_id"),
        when(col("rep") === 0, col("text")).otherwise(rotated).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$to/documents.parquet")

    val emb = spark.read.parquet(s"$from/embeddings.parquet")
    val nVecs = emb.agg(max("vec_id")).head.getLong(0) + 1
    val dims = size(col("embedding"))
    val drot = pmod(col("rep"), dims)
    val rotatedEmb = concat(
      slice(col("embedding"), drot + lit(1), dims - drot),
      slice(col("embedding"), lit(1), drot))
    emb.crossJoin(repl)
      .select(
        (col("vec_id") + col("rep").cast("long") * nVecs).as("vec_id"),
        when(col("rep") === 0, col("embedding")).otherwise(rotatedEmb).as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$to/embeddings.parquet")

    // Events scale on BOTH axes that matter to the keyed/time-series
    // family: 10× rows via replication and 10× key cardinality via
    // per-replica user/event id offsets (a 10× corpus with the SAME 1.5k
    // users would measure hot-key pileup, not scaling). Timestamps stay —
    // per-user densities and session/gap structure match the source tier.
    // NOTE: `ts` is read as a plain long (nanosAsLong) and written back
    // as INT64 — the TIMESTAMP(NANOS) annotation of the shipped tiers is
    // NOT preserved. The generated tier is for ScaleSmoke TIMING only;
    // DuckDB oracles (epoch_us(ts)) would not bind against it.
    val ev = spark.read.parquet(s"$from/events.parquet")
    val nEvents = ev.agg(max("event_id")).head.getLong(0) + 1
    val nUsers = ev.agg(max("user_id")).head.getLong(0) + 1
    val passthrough = ev.columns
      .filterNot(Set("event_id", "user_id").contains).map(col).toSeq
    ev.crossJoin(repl)
      .select(
        (col("event_id") + col("rep").cast("long") * nEvents).as("event_id") +:
        (col("user_id") + col("rep").cast("long") * nUsers).as("user_id") +:
        passthrough: _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$to/events.parquet")

    // orders scales 10× on rows with per-replica key offsets (the q128
    // MV-rewrite smoke measures rollup-BUILD cost against base size;
    // an unscaled copy would flat-line the curve by construction).
    val ord = spark.read.parquet(s"$from/orders.parquet")
    val nOrders = ord.agg(max("o_orderkey")).head.getLong(0) + 1
    val ordPass = ord.columns
      .filterNot(_ == "o_orderkey").map(col).toSeq
    ord.crossJoin(repl)
      .select(
        (col("o_orderkey") + col("rep").cast("long") * nOrders).as("o_orderkey") +:
        ordPass: _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$to/orders.parquet")

    // Dimension tables ride along unscaled (the realistic shape: dims
    // grow orders slower than facts) so the stream-enrichment smoke can
    // join them at the big tier.
    Seq("customer", "nation").foreach { t =>
      spark.read.parquet(s"$from/$t.parquet")
        .write.mode("overwrite").parquet(s"$to/$t.parquet")
    }

    println(s"[scalegen] wrote $to: documents=${nDocs * reps} " +
      s"embeddings=${nVecs * reps} events=${nEvents * reps}")
    spark.stop()
  }
}
