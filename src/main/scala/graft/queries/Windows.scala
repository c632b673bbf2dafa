package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Q._

/** Window-function inventory (absent from the reference — SURVEY.md §2.6
  * "Window functions: none"): ranking, running totals, lag/lead. All
  * orderings carry a unique tiebreak column so results are deterministic.
  */
object Windows {

  /** Top-3 orders per customer by total price (row_number ranking). */
  def windowTopn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables(s, dir, "orders")
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= 3)
      .select($"o_custkey", $"rank", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rank")
  }

  val windowTopnSql: String =
    """SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
      |  FROM orders) t
      |WHERE rank <= 3
      |ORDER BY o_custkey, rank""".stripMargin

  /** Running revenue per supplier over ship time (cumulative frame).
    * Exact integer cents keep the running sum order-stable. */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables(s, dir, "lineitem")
      .where($"l_suppkey" <= 10)
      .withColumn("running_cents", sum(cents($"l_extendedprice")).over(w))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        ($"running_cents" / 100.0).as("running"))
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
  }

  val windowRunningSql: String =
    s"""SELECT l_suppkey, l_orderkey, l_linenumber,
       | CAST(SUM(${centsSql("l_extendedprice")}) OVER (
       |   PARTITION BY l_suppkey
       |   ORDER BY l_shipdate, l_orderkey, l_linenumber
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |  / CAST(100.0 AS DOUBLE) AS running
       |FROM lineitem WHERE l_suppkey <= 10
       |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** Per-user inter-event deltas (lag). */
  def windowLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables(s, dir, "events")
      .withColumn("prev_cents", lag(cents($"value"), 1).over(w))
      .select($"event_id", $"user_id",
        (cents($"value") - coalesce($"prev_cents", lit(0L))).as("delta_cents"))
      .orderBy($"event_id")
  }

  val windowLagSql: String =
    s"""SELECT event_id, user_id,
       | ${centsSql("value")} - COALESCE(
       |   LAG(${centsSql("value")}, 1) OVER (
       |     PARTITION BY user_id ORDER BY ts, event_id), 0) AS delta_cents
       |FROM events
       |ORDER BY event_id""".stripMargin

  /** Value-based RANGE frame: per event, the user's value sum over the
    * trailing 30 minutes (frame bounds on the event-time axis in µs, not
    * row counts — peers with equal timestamps share the frame). */
  def windowRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(-1800000000L, 0L)
    Tables(s, dir, "events")
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("trail_cents", sum(cents($"value")).over(w))
      .select($"event_id", $"user_id",
        ($"trail_cents" / 100.0).as("trail_30m"))
      .orderBy($"event_id")
  }

  val windowRangeSql: String =
    s"""SELECT event_id, user_id,
       | CAST(SUM(${centsSql("value")}) OVER (
       |   PARTITION BY user_id ORDER BY epoch_us(ts)
       |   RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW) AS BIGINT)
       |  / CAST(100.0 AS DOUBLE) AS trail_30m
       |FROM events
       |ORDER BY event_id""".stripMargin

  /** Distribution-rank window functions over one ordered pass: quartile
    * (ntile), percent_rank, cume_dist per user — exact small-integer
    * ratios, so the doubles are bit-identical across engines. */
  def windowNtile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables(s, dir, "events")
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .select($"event_id", $"user_id", $"quartile", $"pr", $"cd")
      .orderBy($"event_id")
  }

  val windowNtileSql: String =
    """SELECT event_id, user_id,
      | CAST(NTILE(4) OVER w AS INT) AS quartile,
      | PERCENT_RANK() OVER w AS pr,
      | CUME_DIST() OVER w AS cd
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** first_value / last_value / nth_value: navigation functions with an
    * explicit full-partition frame (last/nth are frame-sensitive — the
    * default running frame would return the CURRENT row's value). */
  def windowFirstLast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(s, dir, "events")
      .withColumn("first_type", first($"event_type").over(w))
      .withColumn("last_type", last($"event_type").over(wf))
      .withColumn("second_cents", nth_value(cents($"value"), 2).over(wf))
      .select($"event_id", $"user_id", $"first_type", $"last_type",
        $"second_cents")
      .orderBy($"event_id")
  }

  val windowFirstLastSql: String =
    s"""SELECT event_id, user_id,
       | FIRST_VALUE(event_type) OVER w2 AS first_type,
       | LAST_VALUE(event_type) OVER w2 AS last_type,
       | NTH_VALUE(${centsSql("value")}, 2) OVER w2 AS second_cents
       |FROM events
       |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       |ORDER BY event_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "window_firstlast" -> (windowFirstLast _),
    "window_topn" -> (windowTopn _),
    "window_running" -> (windowRunning _),
    "window_range" -> (windowRange _),
    "window_lag" -> (windowLag _),
    "window_ntile" -> (windowNtile _))

  val oracles: Map[String, String] = Map(
    "window_firstlast" -> windowFirstLastSql,
    "window_topn" -> windowTopnSql,
    "window_running" -> windowRunningSql,
    "window_range" -> windowRangeSql,
    "window_lag" -> windowLagSql,
    "window_ntile" -> windowNtileSql)
}
