package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Correlated-subquery and pivot shapes (SQL-surface breadth beyond the
  * reference; both decorrelate/plan to joins + conditional aggregation
  * in Catalyst). */
object Subqueries {

  /** Customers with above-nation-average balance (correlated scalar
    * subquery, expressed as a broadcast join against the per-nation
    * aggregate — the decorrelated plan, stated directly). */
  def subqueryAboveAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables(s, dir, "customer")
    val navg = cust.groupBy($"c_nationkey".as("nk"))
      .agg((sum(cents($"c_acctbal")) / lit(100.0) / count(lit(1))).as("nation_avg"))
    cust.join(broadcast(navg), $"c_nationkey" === $"nk")
      .where($"c_acctbal" > $"nation_avg")
      .select($"c_custkey", $"c_nationkey", $"c_acctbal", $"nation_avg")
      .orderBy($"c_custkey")
  }

  val subqueryAboveAvgSql: String =
    s"""WITH navg AS (
       |  SELECT c_nationkey AS nk,
       |    SUM(${centsSql("c_acctbal")}) / CAST(100.0 AS DOUBLE) / COUNT(*) AS nation_avg
       |  FROM customer GROUP BY 1)
       |SELECT c_custkey, c_nationkey, c_acctbal, nation_avg
       |FROM customer JOIN navg ON c_nationkey = nk
       |WHERE c_acctbal > nation_avg
       |ORDER BY c_custkey""".stripMargin

  /** Pivot: order counts by status per priority (conditional aggregation
    * in the oracle — the portable form of PIVOT). */
  def pivotStatus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select($"o_orderpriority", $"F".as("n_f"), $"O".as("n_o"), $"P".as("n_p"))
      .orderBy($"o_orderpriority")
  }

  val pivotStatusSql: String =
    """SELECT o_orderpriority,
      | COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      | COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      | COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Correlated EXISTS / NOT EXISTS through Spark's SQL front-end (the
    * subquery forms Catalyst rewrites to semi/anti joins): customers
    * with an open order but no finished one. */
  def subqueryExists(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
    Tables(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey, c_nationkey
        |FROM customer_v
        |WHERE EXISTS (SELECT 1 FROM orders_v
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |  AND NOT EXISTS (SELECT 1 FROM orders_v
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  val subqueryExistsSql: String =
    """SELECT c_custkey, c_nationkey
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Pearson correlation + OLS slope from EXACT integer moments (the
    * agg_stats pattern extended to two variables): Σx, Σy, Σx², Σxy in
    * cents as decimal(38)/HUGEINT, one fp division at the end — a
    * double corr()/regr_slope() would be aggregation-order-dependent
    * and never hash-match across engines. */
  def aggCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = cents($"l_extendedprice").cast("decimal(38,0)")
    val y = cents($"l_discount").cast("decimal(38,0)")
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      .select($"l_returnflag", $"n",
        (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")) *
            sqrt(($"n" * $"syy" - $"sy" * $"sy").cast("double")))).as("corr"),
        (($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          ($"n" * $"sxx" - $"sx" * $"sx").cast("double")).as("slope"))
      .orderBy($"l_returnflag")
  }

  val aggCorrSql: String = {
    val x = s"CAST(${centsSql("l_extendedprice")} AS HUGEINT)"
    val y = s"CAST(${centsSql("l_discount")} AS HUGEINT)"
    s"""WITH m AS (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    SUM($x) AS sx, SUM($y) AS sy,
       |    SUM($x * $x) AS sxx, SUM($y * $y) AS syy, SUM($x * $y) AS sxy
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, n,
       |  CAST(n * sxy - sx * sy AS DOUBLE) /
       |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
       |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr,
       |  CAST(n * sxy - sx * sy AS DOUBLE) /
       |    CAST(n * sxx - sx * sx AS DOUBLE) AS slope
       |FROM m ORDER BY l_returnflag""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "subquery_above_avg" -> (subqueryAboveAvg _),
    "subquery_exists" -> (subqueryExists _),
    "agg_corr" -> (aggCorr _),
    "pivot_status" -> (pivotStatus _))

  val oracles: Map[String, String] = Map(
    "subquery_above_avg" -> subqueryAboveAvgSql,
    "subquery_exists" -> subqueryExistsSql,
    "agg_corr" -> aggCorrSql,
    "pivot_status" -> pivotStatusSql)
}
