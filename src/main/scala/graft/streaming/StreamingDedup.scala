package graft.streaming

import org.apache.spark.sql.DataFrame

/** Ingest-time exact dedup for unbounded streams — the streaming face of
  * [[graft.operators.Dedup.exact]]: a training-data pipeline deduplicates
  * documents AT INGEST so duplicates never reach storage, rather than
  * re-scanning the corpus afterwards.
  *
  * Built on Structured Streaming's keyed dedup state:
  * `dropDuplicatesWithinWatermark` keeps one row per key and drops any
  * duplicate arriving within the watermark horizon of the retained row's
  * event time. State is bounded: a key's entry is evicted once the
  * watermark passes its event time + delay, so memory is O(keys inside the
  * horizon), not O(all keys ever) — the property that keeps a 100 TB/day
  * ingest stable. Exactly-once across restarts comes from the checkpoint,
  * same as [[MicroBatchPipeline]].
  *
  * The key can be any deterministic content fingerprint — doc_id for
  * at-least-once transports, `TextFunctions.fingerprintMd5(text)` (or the
  * rolling hash) for content-level dedup.
  */
object StreamingDedup {

  /** Drop rows whose `keyCols` duplicate a row already seen within the
    * watermark horizon. `eventTimeCol` must be a timestamp column;
    * `delay` is the out-of-orderness bound (e.g. "10 minutes").
    */
  def dedupWithinWatermark(
      stream: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: String,
      delay: String): DataFrame =
    stream
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
}
