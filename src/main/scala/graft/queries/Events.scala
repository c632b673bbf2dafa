package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Q._

/** Stream-shaped queries over the events table — the batch expressions of
  * the Structured Streaming operators (tumbling windows, sessionization).
  * The same aggregations run incrementally via readStream + watermark in
  * graft.streaming (reference has no streaming at all; its incremental
  * story is memoized recomputation — we provide both). */
object Events {

  /** Tumbling 1-hour windows: event count + value sum per window/type. */
  def eventsTumbling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm")
          .as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), (sum(cents($"value")) / 100.0).as("total"))
      .orderBy($"hour", $"event_type")
  }

  val eventsTumblingSql: String =
    s"""SELECT strftime(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M') AS hour,
       | event_type, COUNT(*) AS n,
       | SUM(${centsSql("value")}) / CAST(100.0 AS DOUBLE) AS total
       |FROM events
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Sessionization (30-min inactivity gap) via gaps-and-islands:
    * session count and mean session length per user. */
  def eventsSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val flagged = Tables(s, dir, "events")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_session",
        ($"prev_ts".isNull ||
          unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800).cast("int"))
    flagged
      .groupBy($"user_id")
      .agg(sum($"new_session").cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  val eventsSessionsSql: String =
    """WITH flagged AS (
      |  SELECT user_id,
      |    CASE WHEN prev_ts IS NULL
      |         OR date_diff('second', prev_ts, ts) > 1800
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM (
      |    SELECT user_id, ts,
      |      LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |    FROM events) t)
      |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
      |  COUNT(*) AS n_events
      |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Sliding windows via Spark's native window() generator: 1-hour
    * windows sliding every 15 minutes — each event lands in exactly 4
    * epoch-aligned windows (3600/900); count + value sum per window. */
  def eventsSliding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), (sum(cents($"value")) / 100.0).as("total"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm").as("w_start"),
        $"event_type", $"n", $"total")
      .orderBy($"w_start", $"event_type")
  }

  /** DuckDB twin: an event at t belongs to the 4 windows starting at
    * floor(t/900s)*900s - k*900s, k=0..3 (exactly Spark's epoch-aligned
    * assignment), generated with unnest + make_timestamp(µs). */
  val eventsSlidingSql: String =
    s"""WITH widx AS (
       |  SELECT event_type, ${centsSql("value")} AS cents,
       |    make_timestamp((CAST(floor(epoch_us(ts) / 900000000) AS BIGINT) - k) * 900000000)
       |      AS w_start_ts
       |  FROM events, (SELECT unnest(range(4)) AS k))
       |SELECT strftime(w_start_ts, '%Y-%m-%d %H:%M') AS w_start, event_type,
       |  COUNT(*) AS n, SUM(cents) / CAST(100.0 AS DOUBLE) AS total
       |FROM widx GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Time-series gap fill: per-user daily event counts with missing days
    * materialized as zero rows over the user's own [first, last] day span
    * (sequence + explode generator, then outer join back). */
  def eventsGapfill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables(s, dir, "events")
      .groupBy($"user_id", date_trunc("day", $"ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"), sum(cents($"value")).as("cents"))
    val spans = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
    val allDays = spans.select($"user_id",
      explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
    allDays.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"),
        coalesce($"n", lit(0L)).as("n"),
        (coalesce($"cents", lit(0L)) / 100.0).as("total"))
      .orderBy($"user_id", $"day")
  }

  val eventsGapfillSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
       |    COUNT(*) AS n, SUM(${centsSql("value")}) AS cents
       |  FROM events GROUP BY 1, 2),
       |spans AS (
       |  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
       |alldays AS (
       |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM spans)
       |SELECT a.user_id, strftime(a.day, '%Y-%m-%d') AS day,
       |  COALESCE(d.n, 0) AS n,
       |  CAST(COALESCE(d.cents, 0) AS BIGINT) / CAST(100.0 AS DOUBLE) AS total
       |FROM alldays a LEFT JOIN daily d ON a.user_id = d.user_id AND a.day = d.day
       |ORDER BY a.user_id, day""".stripMargin

  /** Incremental-append scenario: merge yesterday's aggregate with
    * today's delta — the memoized-view refresh shape, expressed as the
    * batch equivalence (full recompute == merged increments). */
  def eventsIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val cut = "2024-01-03 00:00:00"
    val before = ev.where($"ts" < lit(cut).cast("timestamp"))
    val after = ev.where($"ts" >= lit(cut).cast("timestamp"))
    def daily(df: DataFrame): DataFrame = df
      .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"),
        $"user_id")
      .agg(count(lit(1)).as("n"), sum(cents($"value")).as("cents"))
    // merge partial aggregates (same key ⇒ sum folds) — n-way merge O1
    daily(before).unionByName(daily(after))
      .groupBy($"day", $"user_id")
      .agg(sum($"n").cast("long").as("n"),
        (sum($"cents") / 100.0).as("total"))
      .orderBy($"day", $"user_id")
  }

  val eventsIncrementalSql: String =
    s"""SELECT strftime(DATE_TRUNC('day', ts), '%Y-%m-%d') AS day, user_id,
       | COUNT(*) AS n,
       | SUM(${centsSql("value")}) / CAST(100.0 AS DOUBLE) AS total
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, QFn] = Map(
    "events_tumbling" -> (eventsTumbling _),
    "events_sessions" -> (eventsSessions _),
    "events_sliding" -> (eventsSliding _),
    "events_gapfill" -> (eventsGapfill _),
    "events_incremental" -> (eventsIncremental _))

  val oracles: Map[String, String] = Map(
    "events_tumbling" -> eventsTumblingSql,
    "events_sessions" -> eventsSessionsSql,
    "events_sliding" -> eventsSlidingSql,
    "events_gapfill" -> eventsGapfillSql,
    "events_incremental" -> eventsIncrementalSql)
}
