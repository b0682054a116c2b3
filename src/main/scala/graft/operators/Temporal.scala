package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Temporal join operators Spark lacks as builtins, composed Spark-first.
  *
  * The as-of join ("for each left row, the latest right row at or before
  * it, per key") is not expressed as a join at all: both sides are tagged
  * and interleaved into ONE frame, sorted per key by (time, side), and a
  * running `last(..., ignoreNulls)` window carries the most recent right
  * row forward onto every left row. Cost: one shuffle on the key + one
  * within-partition sort — the same partitioning a sort-merge join would
  * need, but with no join state, no range probing, and no row
  * amplification; a naive `l.ts >= r.ts` theta-join would plan as a
  * BroadcastNestedLoopJoin and die at scale. DuckDB's native ASOF JOIN is
  * the oracle.
  */
object Temporal {

  private val SideCol = "_graft_side"
  private val TsCol = "_graft_asof_ts"
  private val PayloadCol = "_graft_asof_payload"

  /** Generic inclusive as-of join: for each `left` row, attach
    * `payloadCols` of the `right` row with the greatest `rightTs` ≤ the
    * row's `leftTs` within the same `keys` group (a right row exactly at
    * the left timestamp matches — standard as-of semantics). Left rows
    * with no earlier right row are dropped (inner as-of).
    *
    * Contract: `payloadCols` must not collide with `left`'s columns, and
    * `right` must be unique per (keys, rightTs) — pre-combine it like
    * [[graft.table.KeyedTable.dedupLatest]] if it isn't.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    val payloadType = right.select(payloadCols.map(col): _*).schema
    val l = left
      .withColumn(TsCol, col(leftTs))
      .withColumn(SideCol, lit(1))
      .withColumn(PayloadCol, lit(null).cast(payloadType))
    val r = right
      .withColumn(TsCol, col(rightTs))
      .withColumn(SideCol, lit(0))
      .withColumn(PayloadCol, struct(payloadCols.map(col): _*))
      .select(keys.map(col) ++ Seq(col(TsCol), col(SideCol), col(PayloadCol)): _*)

    // rows-unbounded-preceding running last(): each left row (side 1 sorts
    // after side 0 at equal ts) sees the latest right payload so far.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TsCol).asc, col(SideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l
      .unionByName(r, allowMissingColumns = true)
      .withColumn(PayloadCol, last(col(PayloadCol), ignoreNulls = true).over(w))
      .filter(col(SideCol) === 1 && col(PayloadCol).isNotNull)

    payloadCols
      .foldLeft(matched)((d, c) => d.withColumn(c, col(s"$PayloadCol.$c")))
      .drop(PayloadCol, SideCol, TsCol)
  }

  /** Binned range join: pairs of events of the same user within
    * `windowUs` microseconds of each other, anchored on 'error' events —
    * the "what happened around each failure" query. The interval
    * predicate alone is a theta-join (BroadcastNestedLoopJoin); binning
    * both sides by `windowUs`-wide time buckets and exploding the anchor
    * side to its bucket ±1 turns it into an equality join on
    * (user, bucket): any pair within the window differs by at most one
    * bucket, and a candidate's single bucket matches exactly one of the
    * anchor's three probes, so each qualifying pair meets exactly once —
    * no dedup needed. Join key cardinality is users × time-buckets, so
    * parallelism scales with data, and the exact |Δt| ≤ window check runs
    * inside the join stage.
    */
  def errorNeighborhood(
      s: SparkSession, dir: String, windowUs: Long = 3600000000L): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("bin", expr(s"(ts div 1000) div $windowUs"))
    val anchors = e.filter(col("event_type") === "error")
      .select(
        col("event_id").as("err_id"), col("user_id").as("a_user"),
        col("ts_us").as("a_ts"), col("bin"))
      .withColumn("probe_bin",
        explode(array(col("bin") - 1, col("bin"), col("bin") + 1)))
    val others = e.select(
      col("event_id").as("near_id"), col("user_id"),
      col("ts_us").as("n_ts"), col("bin").as("n_bin"))
    anchors.join(others,
        col("a_user") === col("user_id") &&
        col("probe_bin") === col("n_bin") &&
        col("err_id") =!= col("near_id") &&
        abs(col("n_ts") - col("a_ts")) <= windowUs)
      .select(
        col("err_id"), col("near_id"),
        (col("n_ts") - col("a_ts")).as("dt_us"))
  }

  /** q47: each click joined as-of to the user's most recent purchase at or
    * before it (the "attribute an action to the latest preceding
    * conversion" query). Purchases are pre-combined to one row per
    * (user, microsecond) so the match is deterministic on both engines.
    */
  def clickAsofPurchase(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = {
      val p = e.filter(col("event_type") === "purchase")
        .select(
          col("user_id"),
          col("ts_us").as("p_ts_us"),
          col("value").as("p_value"),
          col("event_id").as("p_event_id"))
      val w = Window.partitionBy(col("user_id"), col("p_ts_us"))
        .orderBy(col("p_event_id").desc)
      p.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "p_ts_us", "p_value")
    }
    asofJoin(clicks, purchases,
        keys = Seq("user_id"), leftTs = "ts_us", rightTs = "p_ts_us",
        payloadCols = Seq("p_ts_us", "p_value"))
      .select("event_id", "user_id", "ts_us", "p_ts_us", "p_value")
  }
}
