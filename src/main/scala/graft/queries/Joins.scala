package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Q._

/** Join inventory: the reference has NO joins (SURVEY.md §2.6) — its only
  * binary op is the key-aligned merge. These are the Spark-native join
  * surface a messdb user gains: equi (inner/outer), semi/anti (EXISTS /
  * NOT EXISTS), range (non-equi predicate), and as-of (latest-before,
  * computed with the scalable union+window pattern, not a quadratic
  * inequality join).
  */
object Joins {

  /** Left semi: suppliers that shipped at least one high-quantity line. */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = Tables(s, dir, "supplier")
    val li = Tables(s, dir, "lineitem").where($"l_quantity" >= 45)
      .select($"l_suppkey")
    sup.join(li, sup("s_suppkey") === li("l_suppkey"), "left_semi")
      .select($"s_suppkey", $"s_name", $"s_nationkey")
      .orderBy($"s_suppkey")
  }

  val joinSemiSql: String =
    """SELECT s_suppkey, s_name, s_nationkey FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_suppkey = s_suppkey AND l_quantity >= 45)
      |ORDER BY s_suppkey""".stripMargin

  /** Left anti: parts that never appear in any lineitem. */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val part = Tables(s, dir, "part")
    val li = Tables(s, dir, "lineitem").select($"l_partkey")
    part.join(li, part("p_partkey") === li("l_partkey"), "left_anti")
      .select($"p_partkey", $"p_name", $"p_brand")
      .orderBy($"p_partkey")
  }

  val joinAntiSql: String =
    """SELECT p_partkey, p_name, p_brand FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |ORDER BY p_partkey""".stripMargin

  /** Left outer + aggregate: customer count per nation, zero-filled. */
  def joinOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nation = Tables(s, dir, "nation")
    val cust = Tables(s, dir, "customer")
      .groupBy($"c_nationkey").agg(count(lit(1)).as("n_customers"))
    nation.join(cust, nation("n_nationkey") === cust("c_nationkey"), "left")
      .select($"n_nationkey", $"n_name",
        coalesce($"n_customers", lit(0L)).as("n_customers"))
      .orderBy($"n_nationkey")
  }

  val joinOuterSql: String =
    """SELECT n_nationkey, n_name,
      | COALESCE(c.n_customers, 0) AS n_customers
      |FROM nation LEFT JOIN (
      |  SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1
      |) c ON n_nationkey = c.c_nationkey
      |ORDER BY n_nationkey""".stripMargin

  /** Equi join + range predicate: revenue of lines shipped within 60 days
    * of their order date, per order-priority bucket. */
  def joinRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables(s, dir, "lineitem")
      .select($"l_orderkey", $"l_shipdate", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" >= $"o_orderdate" &&
        $"l_shipdate" < date_add($"o_orderdate".cast("date"), 60))
      .groupBy($"o_orderpriority")
      .agg((sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")))
        / 10000.0).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy($"o_orderpriority")
  }

  val joinRangeSql: String =
    s"""SELECT o_orderpriority,
       | SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) / CAST(10000.0 AS DOUBLE) AS revenue,
       | COUNT(*) AS n_lines
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       | AND l_shipdate >= o_orderdate
       | AND l_shipdate < CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** As-of join: for each purchase event, the user's most recent click at
    * or before it. Implemented as union + running last-non-null over a
    * (user, time) window — one shuffle, no quadratic inequality join;
    * this is the 100TB-safe plan. */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id", lit(0).as("_is_p"),
        $"ts".as("_click_ts"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", lit(1).as("_is_p"),
        lit(null).cast("timestamp").as("_click_ts"))
    // clicks sort before purchases at equal ts => "at or before" inclusive
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"_is_p", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn("last_click", last($"_click_ts", ignoreNulls = true).over(w))
      .where($"_is_p" === 1)
      .select($"event_id",
        date_format($"last_click", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_click"))
      .orderBy($"event_id")
  }

  val joinAsofSql: String =
    """SELECT p.event_id,
      | strftime(max(c.ts), '%Y-%m-%d %H:%M:%S.%f') AS last_click
      |FROM events p LEFT JOIN events c
      |  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.event_id
      |ORDER BY p.event_id""".stripMargin

  /** Forward as-of: each purchase matched to the user's FIRST click
    * STRICTLY after it. Same union+window pattern, mirrored: clicks sort
    * before purchases at equal ts, so the strictly-following frame never
    * sees a same-timestamp click. */
  def joinAsofFwd(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id", lit(0).as("_is_p"),
        $"ts".as("_click_ts"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", lit(1).as("_is_p"),
        lit(null).cast("timestamp").as("_click_ts"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"_is_p", $"event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    clicks.unionByName(purchases)
      .withColumn("next_click", first($"_click_ts", ignoreNulls = true).over(w))
      .where($"_is_p" === 1)
      .select($"event_id",
        date_format($"next_click", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("next_click"))
      .orderBy($"event_id")
  }

  val joinAsofFwdSql: String =
    """SELECT p.event_id,
      | strftime(min(c.ts), '%Y-%m-%d %H:%M:%S.%f') AS next_click
      |FROM events p LEFT JOIN events c
      |  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts > p.ts
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.event_id
      |ORDER BY p.event_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "join_semi" -> (joinSemi _),
    "join_anti" -> (joinAnti _),
    "join_outer" -> (joinOuter _),
    "join_range" -> (joinRange _),
    "join_asof" -> (joinAsof _),
    "join_asof_fwd" -> (joinAsofFwd _))

  val oracles: Map[String, String] = Map(
    "join_semi" -> joinSemiSql,
    "join_anti" -> joinAntiSql,
    "join_outer" -> joinOuterSql,
    "join_range" -> joinRangeSql,
    "join_asof" -> joinAsofSql,
    "join_asof_fwd" -> joinAsofFwdSql)
}
