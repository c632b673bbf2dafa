package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Sketch/quantile/heavy-hitter aggregates (§2.7 sketch extensions).
  * Exact percentiles interpolate identically in Spark and DuckDB
  * (quantile_cont), so they oracle-match; the HLL sketch
  * (approx_count_distinct) is engine-specific → rows-only + accuracy
  * pinned in ScalaTest. */
object Sketches {

  /** Exact interpolated quantiles of quantity + price per return flag. */
  def aggQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, array(0.25, 0.75))").getItem(0).as("q25_qty"),
        expr("percentile(l_quantity, array(0.25, 0.75))").getItem(1).as("q75_qty"),
        expr("percentile(l_extendedprice, 0.9)").as("p90_price"))
      .orderBy($"l_returnflag")
  }

  val aggQuantilesSql: String =
    """SELECT l_returnflag,
      | quantile_cont(l_quantity, 0.5) AS median_qty,
      | quantile_cont(l_quantity, 0.25) AS q25_qty,
      | quantile_cont(l_quantity, 0.75) AS q75_qty,
      | quantile_cont(l_extendedprice, 0.9) AS p90_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Heavy hitters: top-5 parts by order count (exact, deterministic
    * tiebreak). */
  def aggHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_partkey")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("long").as("qty"))
      .orderBy($"n".desc, $"l_partkey")
      .limit(5)
  }

  val aggHeavyHittersSql: String =
    """SELECT l_partkey, COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS qty
      |FROM lineitem GROUP BY l_partkey
      |ORDER BY n DESC, l_partkey LIMIT 5""".stripMargin

  /** HLL sketch distinct counts (no oracle: estimator differs per
    * engine; accuracy vs exact is pinned in SketchSpec). */
  def aggApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
        approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"))
      .orderBy($"l_returnflag")
  }

  /** Approximate percentiles via the t-digest-style sketch
    * (approx_percentile) — the O(1)-memory path for 100 TB where exact
    * percentile's per-group sort/collect is infeasible. Estimator is
    * engine-specific (no oracle); error vs the exact quantiles is pinned
    * in SketchSpec. */
  def aggApproxQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("median_qty"),
        expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("p90_price"))
      .orderBy($"l_returnflag")
  }

  val queries: Map[String, QFn] = Map(
    "agg_quantiles" -> (aggQuantiles _),
    "agg_heavy_hitters" -> (aggHeavyHitters _),
    "agg_approx_quantiles" -> (aggApproxQuantiles _),
    "agg_approx_distinct" -> (aggApproxDistinct _))

  val oracles: Map[String, String] = Map(
    "agg_quantiles" -> aggQuantilesSql,
    "agg_heavy_hitters" -> aggHeavyHittersSql)
}
