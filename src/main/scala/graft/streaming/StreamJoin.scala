package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream interval join — attribution in motion: each purchase
  * joins the clicks that preceded it by at most `window`.
  *
  * Both inputs carry event-time watermarks and the join condition carries
  * an explicit time range, which is what makes this viable unbounded:
  * Spark derives from (watermark, range) how long a buffered row can
  * still find a partner and evicts join state past that horizon — state
  * is O(rows inside the window), not O(stream). Inner matches emit as
  * soon as both sides arrive; no watermark wait.
  *
  * Expected columns: clicks(user_id, c_ts timestamp, ...),
  * purchases(p_user, p_ts timestamp, ...).
  */
object StreamJoin {

  def clickAttribution(
      clicks: DataFrame,
      purchases: DataFrame,
      window: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("c_ts", lateness)
    val p = purchases.withWatermark("p_ts", lateness)
    c.join(
      p,
      expr(
        s"user_id = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval $window"))
  }
}
