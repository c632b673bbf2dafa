package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Set operations (reference: only union-with-combine via merge, SURVEY.md
  * §2.6) plus aggregation variants: distinct aggregate, rollup, cube. */
object SetOps {

  private def openCust(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").where(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
  private def finishedCust(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").where(col("o_orderstatus") === "F")
      .select(col("o_custkey"))

  /** Customers with both open and finished orders (INTERSECT). */
  def setIntersect(s: SparkSession, dir: String): DataFrame =
    openCust(s, dir).intersect(finishedCust(s, dir))
      .orderBy(col("o_custkey"))

  val setIntersectSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin

  /** Customers with open but no finished orders (EXCEPT). */
  def setExcept(s: SparkSession, dir: String): DataFrame =
    openCust(s, dir).except(finishedCust(s, dir)).orderBy(col("o_custkey"))

  val setExceptSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin

  /** UNION (distinct) of the two sets. */
  def setUnion(s: SparkSession, dir: String): DataFrame =
    openCust(s, dir).union(finishedCust(s, dir)).distinct()
      .orderBy(col("o_custkey"))

  val setUnionSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |UNION
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin

  /** Multiset INTERSECT ALL: per-customer open/finished order counts
    * intersect with multiplicity = min(count_O, count_F) copies kept. */
  def setIntersectAll(s: SparkSession, dir: String): DataFrame =
    openCust(s, dir).intersectAll(finishedCust(s, dir))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_copies"))
      .orderBy(col("o_custkey"))

  val setIntersectAllSql: String =
    """SELECT o_custkey, COUNT(*) AS n_copies FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Multiset EXCEPT ALL: open-order multiset minus finished-order
    * multiset, surviving multiplicities. */
  def setExceptAll(s: SparkSession, dir: String): DataFrame =
    openCust(s, dir).exceptAll(finishedCust(s, dir))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_copies"))
      .orderBy(col("o_custkey"))

  val setExceptAllSql: String =
    """SELECT o_custkey, COUNT(*) AS n_copies FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Distinct aggregate: distinct parts and suppliers per return flag. */
  def aggDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_lines"))
      .orderBy($"l_returnflag")
  }

  val aggDistinctSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      | COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** ROLLUP over (region, nation) customer counts — subtotal rows carry
    * NULL group keys in both engines. */
  def aggRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    val c = Tables(s, dir, "customer")
    c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  val aggRollupSql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_customers
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** CUBE over (orderstatus, orderpriority). */
  def aggCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        (sum(cents($"o_totalprice")) / 100.0).as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val aggCubeSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       | SUM(${centsSql("o_totalprice")}) / CAST(100.0 AS DOUBLE) AS total
       |FROM orders
       |GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS (region totals, nation totals, grand total —
    * not the rollup/cube lattice). */
  def aggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    val c = Tables(s, dir, "customer")
    c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupingSets(Seq(Seq($"r_name"), Seq($"n_name"), Seq()),
        $"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  val aggGroupingSetsSql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_customers
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name), (n_name), ())
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** Statistical aggregates with cross-engine bit-exactness: mean,
    * population variance and stddev derived from EXACT integer moments
    * (n, Σcents, Σcents² — the latter in 38-digit decimal / HUGEINT so
    * squares of 7-digit cents cannot overflow), with a single final fp
    * division per output. Direct stddev()/var_pop() over doubles would
    * be aggregation-order-dependent and never hash-match. */
  def aggStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = cents($"l_extendedprice")
    val cd = c.cast("decimal(38,0)")
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(c).as("s1"),
        sum(cd * cd).as("s2"))
      .select($"l_returnflag", $"n",
        ($"s1".cast("double") / ($"n" * 100L).cast("double")).as("mean"),
        // denominator in double space: n·n·10000 overflows Long at the
        // billions-of-rows-per-group scale this query targets; the
        // left-associated double product is the same correctly-rounded
        // sequence the oracle computes
        (($"s2" * $"n" - $"s1".cast("decimal(38,0)") * $"s1").cast("double") /
          ($"n".cast("double") * $"n" * 10000.0)).as("var_pop"))
      .withColumn("std_pop", sqrt($"var_pop"))
      .orderBy($"l_returnflag")
  }

  val aggStatsSql: String =
    s"""WITH m AS (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    CAST(SUM(${centsSql("l_extendedprice")}) AS BIGINT) AS s1,
       |    SUM(CAST(${centsSql("l_extendedprice")} AS HUGEINT)
       |      * ${centsSql("l_extendedprice")}) AS s2
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l_returnflag, n,
       |  CAST(s1 AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS mean,
       |  CAST(s2 * n - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
       |    / (CAST(n AS DOUBLE) * n * 10000) AS var_pop,
       |  sqrt(CAST(s2 * n - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
       |    / (CAST(n AS DOUBLE) * n * 10000)) AS std_pop
       |FROM m ORDER BY l_returnflag""".stripMargin

  /** Global aggregate (no grouping — single row). */
  def aggGlobal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      sum($"l_quantity").cast("long").as("sum_qty"),
      (sum(cents($"l_extendedprice")) / 100.0).as("sum_price"),
      min($"l_orderkey").as("min_key"),
      max($"l_orderkey").as("max_key"))
  }

  val aggGlobalSql: String =
    s"""SELECT COUNT(*) AS n_rows, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       | SUM(${centsSql("l_extendedprice")}) / CAST(100.0 AS DOUBLE) AS sum_price,
       | MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
       |FROM lineitem""".stripMargin

  val queries: Map[String, QFn] = Map(
    "set_intersect" -> (setIntersect _),
    "set_except" -> (setExcept _),
    "set_union" -> (setUnion _),
    "set_intersect_all" -> (setIntersectAll _),
    "set_except_all" -> (setExceptAll _),
    "agg_distinct" -> (aggDistinct _),
    "agg_rollup" -> (aggRollup _),
    "agg_cube" -> (aggCube _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "agg_stats" -> (aggStats _),
    "agg_global" -> (aggGlobal _))

  val oracles: Map[String, String] = Map(
    "set_intersect" -> setIntersectSql,
    "set_except" -> setExceptSql,
    "set_union" -> setUnionSql,
    "set_intersect_all" -> setIntersectAllSql,
    "set_except_all" -> setExceptAllSql,
    "agg_distinct" -> aggDistinctSql,
    "agg_rollup" -> aggRollupSql,
    "agg_cube" -> aggCubeSql,
    "agg_grouping_sets" -> aggGroupingSetsSql,
    "agg_stats" -> aggStatsSql,
    "agg_global" -> aggGlobalSql)
}
