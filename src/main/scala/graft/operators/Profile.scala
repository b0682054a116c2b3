package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-profiling utilities — the "know your corpus before you train on
  * it" leg of a pipeline: per-column null and distinct counts in ONE scan
  * (a 1-row aggregate of fused counters, unpivoted with `stack` — never a
  * scan per column), and exact discrete quantiles of a measure.
  */
object Profile {

  /** Per-column profile of the events table: nulls and distinct counts.
    * The timestamp is profiled at microsecond resolution (`ts div 1000`) —
    * the cross-engine comparable form of the parquet nanos column.
    *
    * `exact = true` (default; what the bit-exact DuckDB oracle needs) uses
    * `count_distinct`, which expands the single scan ~6× — one partial
    * per distinct-aggregate column. At 100 TB profile with
    * `exact = false`: `approx_count_distinct` (HyperLogLog++) keeps the
    * aggregate a true single fused pass with ~2% relative error, which is
    * what a corpus profile needs.
    */
  def eventsProfile(s: SparkSession, dir: String, exact: Boolean = true): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("ts_us", expr("ts div 1000"))
    val cols = Seq("event_id", "user_id", "event_type", "ts_us", "value", "props")
    val distinctOf: String => org.apache.spark.sql.Column =
      if (exact) c => count_distinct(col(c))
      else c => approx_count_distinct(col(c))
    val aggs = cols.flatMap(c => Seq(
      sum(col(c).isNull.cast("long")).as(s"${c}_nulls"),
      distinctOf(c).as(s"${c}_distinct")))
    val row = e.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', ${c}_nulls, ${c}_distinct")
      .mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, n_nulls, n_distinct)")
  }

  /** Quartiles of order totalprice per priority.
    *
    * `exact = true` (default; the oracle path): `percentile_disc` returns
    * actual data elements (no interpolation arithmetic), which is what
    * makes the doubles comparable bit-for-bit across engines — but an
    * exact percentile buffers each group's values. At 100 TB profile with
    * `exact = false`: `approx_percentile` (Greenwald-Khanna sketch, here
    * accuracy 1/10000) keeps per-group state bounded and mergeable —
    * map-side partials instead of a full per-group sort.
    */
  /** Distinct users per event type through the engine's own KMV sketch
    * ([[graft.functions.KmvDistinct]]) — the mergeable-cardinality shape:
    * map-side partial buffers of ≤ k hash minima union associatively, so
    * the shuffle carries O(groups · k) longs however many rows the scan
    * reads; `COUNT(DISTINCT x)` shuffles every distinct value instead.
    * k = 2¹⁶ holds every per-type cardinality in this corpus family (1.5k
    * distinct users at sf0.1, ~15k at sf1) below the exact/estimate
    * boundary, so the sketch is in its exact mode and the DuckDB
    * `COUNT(DISTINCT)` oracle matches bit-for-bit; beyond k the same
    * sketch degrades to a documented ~1/√k relative error instead of an
    * unbounded shuffle. KmvSketchSpec covers the estimator side with a
    * deliberately undersized k.
    */
  def distinctUsersSketch(s: SparkSession, dir: String, k: Int = 1 << 16): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        // COUNT(DISTINCT) semantics exclude NULLs, but xxhash64(NULL) is
        // the (valid) seed hash — mask to null so the aggregate skips it.
        graft.functions.KmvDistinct
          .kmvDistinct(when(col("user_id").isNotNull,
            xxhash64(col("user_id"))), k).as("n_users"),
        count(lit(1)).as("n_events"))

  def orderPriceQuartiles(s: SparkSession, dir: String, exact: Boolean = true): DataFrame = {
    val qs: String => org.apache.spark.sql.Column =
      if (exact) p => expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY o_totalprice)")
      else p => expr(s"approx_percentile(o_totalprice, $p, 10000)")
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        qs("0.25").as("p25"),
        qs("0.5").as("p50"),
        qs("0.75").as("p75"),
        count(lit(1)).as("n"))
  }
}
