package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup — the ingestion guard in front of StreamIngest
  * when the upstream delivers at-least-once (reference has no streaming;
  * this is the Spark-native piece a 100 TB ingest pipeline needs).
  *
  * Uses Spark's native dropDuplicatesWithinWatermark: state holds one
  * entry per key seen within the watermark horizon and is evicted as
  * event time advances — bounded state, unlike a plain dropDuplicates
  * on a stream (which accumulates keys forever). Exactly the semantics
  * an at-least-once source (Kafka redelivery, retried file commits)
  * needs: duplicates arrive close in time, so a horizon-bounded dedup
  * is both correct for the failure mode and bounded in memory.
  */
object StreamDedup {

  /** Drop re-deliveries of the same event_id arriving within the
    * watermark horizon. Works on batch frames too (falls back to plain
    * dropDuplicates semantics for the test's ground truth). */
  def dedupEvents(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", horizon)
        .dropDuplicatesWithinWatermark("event_id")
    else
      events.dropDuplicates("event_id")
}
