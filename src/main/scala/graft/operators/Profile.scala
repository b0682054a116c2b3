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

  /** Exact discrete quartiles of order totalprice per priority:
    * `percentile_disc` returns actual data elements (no interpolation
    * arithmetic), which is what makes the doubles comparable bit-for-bit
    * across engines.
    */
  def orderPriceQuartiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)").as("p25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)").as("p75"),
        count(lit(1)).as("n"))
}
