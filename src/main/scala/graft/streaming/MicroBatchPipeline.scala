package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.schema.SchemaEvolution
import graft.table.KeyedTable

/** The reference's micro-batch driver loop
  * (glue-streaming-job-script/glue_job_script.py:96-118) as Structured
  * Streaming: every trigger interval the new records become a batch
  * DataFrame, empty batches are skipped (py:98), the batch is
  * schema-aligned against the current table (py:103 → 81-94) and upserted
  * (py:105-109). Progress is checkpointed for exactly-once restart —
  * subsuming both the Spark checkpoint (py:116) and the Glue job bookmark
  * (Template.yaml:278).
  *
  * Scale notes: `foreachBatch` (rather than a direct streaming sink) is the
  * load-bearing choice, exactly as in the reference — it is what allows
  * per-batch schema resolution, which a fixed-schema streaming sink cannot
  * do (SURVEY §7.4). `batch.isEmpty` is used instead of the reference's
  * `count() > 0`: it stops at the first row instead of scanning the batch.
  */
object MicroBatchPipeline {

  /** Wire `source` (a streaming DataFrame) into `table` and start the query.
    *
    * @param trigger    micro-batch cadence; the reference's `windowSize`
    *                   default is "10 seconds" (Template.yaml:30-33); tests
    *                   use `Trigger.AvailableNow` for a bounded drain.
    * @param checkpoint offsets + commit log dir (py:116).
    * @param write      the per-batch write operation — defaults to the
    *                   partition-level [[KeyedTable.upsert]]; pass
    *                   `(t, sp, b) => t.upsertBloomIndexed(sp, b)` to run
    *                   the same loop through the file-level bloom path
    *                   (q115), or any other write op the table supports.
    * @param prep       per-batch transform applied BEFORE schema alignment
    *                   — the DynamicFrame-conversion point of the
    *                   reference loop (py:99-103, `fromDF` → evolve).
    *                   Pass [[SchemaEvolution.dropAbsentColumns]] to model
    *                   a schema-on-read transport whose batches carry only
    *                   the fields their records have, so a column that
    *                   first appears MID-STREAM widens the table at that
    *                   batch rather than existing null-filled from
    *                   bootstrap.
    */
  def start(
      source: DataFrame,
      table: KeyedTable,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      queryName: String = "graft-upsert-pipeline",
      write: (KeyedTable, org.apache.spark.sql.SparkSession, DataFrame) => Unit =
        (t, sp, b) => t.upsert(sp, b),
      prep: DataFrame => DataFrame = identity): StreamingQuery = {

    val processBatch: (Dataset[Row], Long) => Unit = (batch, _) => {
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val aligned =
          SchemaEvolution.align(prep(batch.toDF()), table.currentUserSchema(spark))
        write(table, spark, aligned)
      }
    }

    source.writeStream
      .queryName(queryName)
      .foreachBatch(processBatch)
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
