package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming as-of enrichment: attach to each streaming event the LATEST
  * dimension row at or before the event's timestamp — joining a stream
  * against a slowly-changing dimension (price books, currency rates, model
  * versions), the streaming counterpart of [[graft.operators.Temporal]]'s
  * batch as-of join.
  *
  * Shape: the dimension is packed per key into a chronologically sorted
  * array of (ts, value) snapshots and BROADCAST; the stream side is then a
  * stateless stream-static equality join plus a codegen'd higher-order
  * lookup (`filter` keeps snapshots ≤ event time — order-preserving, so
  * the last survivor is the as-of row). Statelessness is the point:
  * a stream-stream formulation would buffer the dimension in the state
  * store and need watermark coordination, but a slowly-changing dimension
  * is bounded and known at query start, so it belongs in a broadcast, not
  * in state. Events earlier than every snapshot yield null enrichment
  * (explicitly, not an error). The dimension snapshot is fixed at query
  * start; refreshing it is a restart (or a foreachBatch re-read) by
  * design — the same contract as Spark's stream-static join.
  *
  * Scale: broadcast size is O(keys × snapshots-per-key), independent of
  * stream volume; per-event work is one hash probe + one array scan
  * (binary search would shave the scan, but snapshot arrays of a
  * slowly-changing dimension are short by definition).
  */
object StreamingAsOf {

  /** @param stream  streaming frame carrying `keyCol` and event-time `tsCol`
    * @param dim     bounded dimension frame: `keyCol`, `dimTsCol`, `dimValCol`
    * @return stream with `asof_ts` / `asof_val` columns (null when no
    *         snapshot is at or before the event's time)
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      keyCol: String,
      tsCol: String,
      dimTsCol: String,
      dimValCol: String): DataFrame = {
    val packed = dim
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(
        struct(col(dimTsCol).as("ts"), col(dimValCol).as("v")))).as("snaps"))
    // Materialized once: the lambda-bearing filter is excluded from
    // subexpression elimination, so referencing it in both size() and
    // element_at() directly would scan the snapshot array twice per event.
    val eligible: Column =
      filter(col("snaps"), x => x.getField("ts") <= col(tsCol))
    stream
      .join(broadcast(packed), Seq(keyCol), "left")
      .withColumn("_elig", eligible)
      .withColumn("_asof",
        when(size(col("_elig")) > 0, element_at(col("_elig"), -1)))
      .withColumn("asof_ts", col("_asof.ts"))
      .withColumn("asof_val", col("_asof.v"))
      .drop("snaps", "_elig", "_asof")
  }
}
