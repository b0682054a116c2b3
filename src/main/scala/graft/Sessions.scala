package graft

import org.apache.spark.sql.SparkSession

/** The library's one session recipe — every runner main and the test base
  * build from here so the common settings cannot drift between entry
  * points:
  *
  *   - `GraftExtensions`: custom SQL functions + the YearPredicateToRange
  *     optimizer rule;
  *   - nanosAsLong: kept for fixture tiers whose `events.ts` is parquet
  *     TIMESTAMP(NANOS) (read as a nanos long); tiers that ship
  *     TIMESTAMP(MICROS) arrive as TIMESTAMP_NTZ and Tables.events
  *     normalizes either shape to the one nanos-long convention
  *     (`ts div 1000` ≡ DuckDB `epoch_us(ts)`);
  *   - Kryo, as the reference job configures (glue_job_script.py:19);
  *   - RocksDB state store: stateful streaming state lives off-heap and
  *     spills to local disk, bounding executor heap by the watermark
  *     horizon rather than total state size — the production choice once
  *     state outgrows the HDFS-backed in-memory default;
  *   - `unloadOnCommit`: state stores close synchronously when a task
  *     commits instead of staying loaded in the executor indefinitely.
  *     This library's streaming surface is bounded foreachBatch drains
  *     (the reference's micro-batch shape), so each query's stores are
  *     used for a handful of batches and then never again — without this,
  *     every finished drain leaves live RocksDB instances behind whose
  *     background maintenance (snapshot + cleanup every 60 s across ALL
  *     loaded providers) steals CPU from later queries. Measured: the
  *     streaming family's wall-clock swung 2–6× run-to-run from exactly
  *     this (q71 2.6–15.6 s); with unload-on-commit it sits at its
  *     minimum (2.5–3.6 s). A deployment running one CONTINUOUS query
  *     with large state should override this to false — there the store
  *     is reused every batch and reloading it is the dominant cost;
  *   - UTC + no UI for reproducible, headless runs.
  */
object Sessions {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.unloadOnCommit", "true")
}
