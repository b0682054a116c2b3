package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.FreqBuffer

/** Heavy hitters over an unbounded token stream with BOUNDED state — the
  * streaming form of the batch Misra–Gries aggregate
  * ([[graft.functions.FrequentTerms]], q70): "what are the top terms so
  * far" maintained continuously, without ever keying state on the term
  * domain.
  *
  * Shape: tokens are sharded by `hash(term) mod buckets` — term-disjoint,
  * so a term's entire count lives in exactly one bucket's summary — and
  * `mapGroupsWithState` keeps ONE `FreqBuffer` of `capacity` entries per
  * bucket. State is O(buckets × capacity) forever, independent of stream
  * length AND vocabulary size; a `groupBy(term)` streaming aggregate would
  * hold every distinct term ever seen in the state store (the unbounded-
  * vocabulary analogue of the unwatermarked-aggregate trap). Buckets also
  * spread the update work: a single global summary would serialize the
  * stream through one task.
  *
  * Each trigger emits every updated bucket's current summary; the consumer
  * merges bucket summaries (≤ buckets × capacity entries — driver-safe by
  * construction) and takes the global top-k. Per-bucket Misra–Gries bound:
  * estimate ∈ [true − N_b/(capacity+1), true] with N_b the bucket's token
  * count; EXACT when `capacity` ≥ the bucket's distinct-term count, which
  * is what the spec checks against the batch oracle counts.
  */
object StreamingFrequentTerms {

  final case class BucketSummary(bucket: Int, terms: Map[String, Long])

  def summaries(
      tokens: DataFrame,
      termCol: String,
      buckets: Int = 8,
      capacity: Int = 256): Dataset[BucketSummary] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens
      .select(
        pmod(hash(col(termCol)), lit(buckets)).cast("int").as("bucket"),
        col(termCol).cast("string").as("term"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (bucket: Int, rows: Iterator[(Int, String)],
         state: GroupState[Map[String, Long]]) =>
          val buf = new FreqBuffer(capacity)
          state.getOption.foreach(_.foreach { case (t, c) =>
            buf.counts.update(t, c)
          })
          rows.foreach(r => buf.add(r._2))
          val snapshot = buf.counts.toMap
          state.update(snapshot)
          BucketSummary(bucket, snapshot)
      }
  }

  /** Merge bucket summaries (in emission order — later entries supersede
    * earlier ones for the same bucket) into the global top-k. Bucket
    * sharding is term-disjoint, so merging is plain concatenation of each
    * bucket's latest summary, no cross-bucket combining.
    */
  def mergedTopK(summariesInOrder: Seq[BucketSummary], k: Int): Seq[(String, Long)] =
    summariesInOrder
      .groupBy(_.bucket).values
      .flatMap(_.last.terms)
      .toSeq
      .sortBy { case (t, c) => (-c, t) }
      .take(k)
}
