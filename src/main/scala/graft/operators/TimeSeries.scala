package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Time-series reshaping over the events table — the resample /
  * sessionize verbs every telemetry or user-activity pipeline runs before
  * modeling. Day indices and gaps are integer microsecond arithmetic
  * (`ts div 1000` ≡ DuckDB `epoch_us`), so both engines bucket and
  * compare identically, and carried values are byte-copies of stored
  * doubles — nothing is recomputed, everything hashes bit-for-bit.
  */
object TimeSeries {

  private val MicrosPerDay = 86400000000L

  private def eventsUs(s: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(s, dir)

  /** Daily resample with forward fill: per user, one row per calendar day
    * from their first to their last event; days with activity carry the
    * LAST observed `value` of the day, silent days carry the value
    * forward. Three key-partitioned steps — last-per-day aggregate
    * (map-side combined), per-user grid explode from a 2-column bounds
    * aggregate, and one window pass for the fill — so the shuffle is
    * O(users + observed days + grid days), never row² and never a range
    * join. At 100 TB the grid explode is the only row-multiplying step
    * and its factor is bounded by the calendar span, not the data.
    */
  def dailyResample(s: SparkSession, dir: String): DataFrame = {
    // integer division (`div`), not `/` — Spark's `/` on longs is DOUBLE
    // division, and a float day bucket is exactly the cross-engine
    // boundary hazard the integer arithmetic here exists to avoid
    val e = eventsUs(s, dir)
      .withColumn("day", expr(s"ts_us div $MicrosPerDay"))
    val obs = e.groupBy(col("user_id"), col("day"))
      .agg(max_by(col("value"),
        struct(col("ts_us"), col("event_id"))).as("day_value"))
    val grid = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "day"), "left")
      .select(
        col("user_id"), col("day"),
        last(col("day_value"), ignoreNulls = true).over(w).as("value"),
        col("day_value").isNotNull.cast("int").as("observed"))
  }

  /** Batch sessionization: split each user's event stream at >30-minute
    * silences, then summarize each session (event count, bounds,
    * duration). One shuffle on user — the lag, the running session
    * counter, and the per-session aggregate all ride the same user
    * partitioning (the aggregate keys ARE a superset of the window
    * keys, so no second exchange). The streaming twin keeps the same
    * gap rule in state; this is the backfill/replay form.
    */
  def sessionStats(
      s: SparkSession, dir: String, gapUs: Long = 1800000000L): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val newSession = (col("ts_us") - lag(col("ts_us"), 1).over(byTime) >
      lit(gapUs)).cast("long")
    eventsUs(s, dir)
      .withColumn("new_s", coalesce(newSession, lit(1L)))
      .withColumn("session_id",
        sum(col("new_s")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
