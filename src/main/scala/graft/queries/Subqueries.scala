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

  val queries: Map[String, QFn] = Map(
    "subquery_above_avg" -> (subqueryAboveAvg _),
    "pivot_status" -> (pivotStatus _))

  val oracles: Map[String, String] = Map(
    "subquery_above_avg" -> subqueryAboveAvgSql,
    "pivot_status" -> pivotStatusSql)
}
