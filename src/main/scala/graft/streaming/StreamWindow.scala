package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native streaming windowed aggregation: watermark + window() over
  * event time — Spark's built-in stateful path (state = open windows
  * per key, evicted once the watermark passes the window end), the
  * declarative counterpart of the custom-state SessionizeStream.
  * Works identically on a batch frame, which is how the test pins
  * stream == batch. */
object StreamWindow {

  /** Hourly (count, cents) per event type. `horizon` bounds both late
    * data acceptance and state retention. */
  def tumblingCounts(events: DataFrame, horizon: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", horizon) else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.queries.Q.cents(col("value"))).as("cents"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("cents"))
  }
}
