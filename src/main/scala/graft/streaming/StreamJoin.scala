package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join (absent from the reference, which has
  * no streaming at all — SURVEY.md §2.6): the canonical attribution
  * shape, each purchase joined to the same user's clicks in the
  * preceding 30 minutes.
  *
  * Scale posture: both sides shuffle on user_id; the event-time range
  * condition plus watermarks bound the join state Spark must buffer —
  * clicks older than (watermark − 30 min) are evicted, so state is
  * O(recent events per user), not O(stream). Without the time bound the
  * state store would grow unbounded — the bound IS the design.
  */
object StreamJoin {

  /** Both inputs are event-shaped (ts, user_id, event_id, value,
    * event_type ...); works identically on batch or streaming frames —
    * the streaming test proves batch/stream equivalence. */
  def purchaseAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "1 hour")
    p.join(c, expr(
      """user_id = c_user AND
        |click_ts <= purchase_ts AND
        |click_ts >= purchase_ts - interval 30 minutes""".stripMargin))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"))
  }
}
