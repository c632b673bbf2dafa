package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** Core relational inventory: scans, range filters, point lookups,
  * re-key aggregation, upsert-merge — the messdb operator algebra
  * (SURVEY.md §2.1/§2.2: O1–O3, O7, O9, O12, O15) expressed Spark-first —
  * plus TPC-H-style headline aggregations and joins.
  *
  * Reference semantics: mergeTries n-way last-wins merge
  * (/root/reference/messdb-base/src/MessDB/Trie.hs:297-430),
  * sortTrie map+shuffle+reduce (Trie.hs:433-470),
  * rangeFilterTrie key-range pruning (Trie.hs:472-510).
  */
object Relational {

  /** TPC-H Q1-style pricing summary (flagship aggregate: map-side partial
    * agg + single shuffle on the tiny group key). */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pc = cents($"l_extendedprice")
    val dc = lit(100L) - cents($"l_discount") * 1L // 100 - discount-cents
    val tc = lit(100L) + cents($"l_tax") * 1L
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast("long").as("sum_qty"),
        (sum(pc) / 100.0).as("sum_base_price"),
        (sum(pc * dc) / 10000.0).as("sum_disc_price"),
        (sum(pc * dc * tc) / 1000000.0).as("sum_charge"),
        (sum($"l_quantity").cast("long").cast("double") / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1PricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       | CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       | SUM(${centsSql("l_extendedprice")}) / CAST(100.0 AS DOUBLE) AS sum_base_price,
       | SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) / CAST(10000.0 AS DOUBLE) AS sum_disc_price,
       | SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}) * (100 + ${centsSql("l_tax")})) / CAST(1000000.0 AS DOUBLE) AS sum_charge,
       | CAST(CAST(SUM(l_quantity) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_qty,
       | COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: top-10 BUILDING-segment orders by revenue.
    * customer is the small side → broadcast. */
  def q3TopRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables(s, dir, "customer")
      .where($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ord = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = Tables(s, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg((sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")))
        / 10000.0).as("revenue"))
      .select($"o_orderkey", $"revenue", to_date($"o_orderdate").as("o_orderdate"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  val q3TopRevenueSql: String =
    s"""SELECT o_orderkey,
       | SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) / CAST(10000.0 AS DOUBLE) AS revenue,
       | CAST(o_orderdate AS DATE) AS o_orderdate
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |GROUP BY o_orderkey, o_orderdate
       |ORDER BY revenue DESC, o_orderkey
       |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: revenue per nation for ASIA customers; dims broadcast. */
  def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val region = Tables(s, dir, "region").where($"r_name" === "ASIA")
    val nation = Tables(s, dir, "nation")
    val cust = Tables(s, dir, "customer").select($"c_custkey", $"c_nationkey")
    val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
    val li = Tables(s, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg((sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")))
        / 10000.0).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q5NationRevenueSql: String =
    s"""SELECT n_name,
       | SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) / CAST(10000.0 AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q10-style: top-20 customers by returned-item revenue (4-way
    * join, two broadcast dims, exact-cents revenue, deterministic
    * ordering). */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables(s, dir, "lineitem").where($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
    val cust = Tables(s, dir, "customer")
    val nation = Tables(s, dir, "nation")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name", $"c_acctbal")
      .agg((sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")))
        / 10000.0).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q10ReturnedItemsSql: String =
    s"""SELECT c_custkey, c_name, n_name, c_acctbal,
       | SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) / CAST(10000.0 AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, n_name, c_acctbal
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q2-shaped (adapted: the testdata has no partsupp): the
    * top-account-balance supplier(s) per region through the
    * supplier→nation→region dim chain. The correlated scalar MAX
    * subquery of Q2 is planned as a join against the per-region
    * aggregate — the shape that scales (one pass, broadcast dims)
    * instead of a per-row subquery; the DuckDB oracle keeps the
    * textbook correlated form, proving the two agree. Balances compare
    * in exact cents (no float equality boundary). */
  def q2TopSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = Tables(s, dir, "supplier")
      .select($"s_suppkey", $"s_name", cents($"s_acctbal").as("acctbal_cents"),
        $"s_nationkey")
    val joined = sup
      .join(broadcast(Tables(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
    val maxPerRegion = joined.groupBy($"r_regionkey".as("mrk"))
      .agg(max($"acctbal_cents").as("max_bal"))
    joined.join(broadcast(maxPerRegion),
        $"r_regionkey" === $"mrk" && $"acctbal_cents" === $"max_bal")
      .select($"r_name", $"n_name", $"s_name", $"s_suppkey", $"acctbal_cents")
      .orderBy($"r_name", $"s_suppkey")
  }

  val q2TopSupplierSql: String =
    s"""WITH s AS (
       |  SELECT s_suppkey, s_name, ${centsSql("s_acctbal")} AS acctbal_cents,
       |    s_nationkey
       |  FROM supplier)
       |SELECT r_name, n_name, s_name, s_suppkey, acctbal_cents
       |FROM s
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE acctbal_cents = (
       |  SELECT MAX(${centsSql("s2.s_acctbal")})
       |  FROM supplier s2 JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
       |  WHERE n2.n_regionkey = nation.n_regionkey)
       |ORDER BY r_name, s_suppkey""".stripMargin

  /** TPC-H Q18-shaped: customers with large orders — semi-style join of
    * orders/customer against the AGGREGATED lineitem key set (orders
    * whose total quantity exceeds 250). The aggregate runs FIRST and
    * shrinks the key set before any join touches the fact table twice —
    * the large-IN-on-aggregated-key plan. */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").cast("long").as("total_qty"))
      .where($"total_qty" > 250)
    Tables(s, dir, "orders")
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey",
        to_date($"o_orderdate").as("o_date"),
        cents($"o_totalprice").as("total_cents"), $"total_qty")
      .orderBy($"total_cents".desc, $"o_orderkey")
  }

  val q18LargeOrdersSql: String =
    s"""WITH big AS (
       |  SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING CAST(SUM(l_quantity) AS BIGINT) > 250)
       |SELECT c_name, c_custkey, o_orderkey,
       |  CAST(o_orderdate AS DATE) AS o_date,
       |  ${centsSql("o_totalprice")} AS total_cents, total_qty
       |FROM orders
       |JOIN big ON o_orderkey = l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY total_cents DESC, o_orderkey""".stripMargin

  /** TPC-H Q7-shaped: shipping volume between two nations by year — a
    * 5-way join where the nation dim joins TWICE under different roles
    * (supplier side vs customer side), then revenue by (supp_nation,
    * cust_nation, year). Both dim sides broadcast; the fact table
    * shuffles once per fact-fact join key. */
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nations = Seq("NATION_3", "NATION_7")
    val n1 = Tables(s, dir, "nation")
      .select($"n_nationkey".as("n1_key"), $"n_name".as("supp_nation"))
    val n2 = Tables(s, dir, "nation")
      .select($"n_nationkey".as("n2_key"), $"n_name".as("cust_nation"))
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"n1_key")
      .join(Tables(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(n2), $"c_nationkey" === $"n2_key")
      .where($"supp_nation".isin(nations: _*) && $"cust_nation".isin(nations: _*)
        && $"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").as("l_year"))
      .agg((sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")))
        / 10000.0).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val q7NationVolumeSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
       |  SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) / CAST(10000.0 AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE n1.n_name IN ('NATION_3','NATION_7')
       |  AND n2.n_name IN ('NATION_3','NATION_7')
       |  AND n1.n_name <> n2.n_name
       |GROUP BY 1, 2, 3
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q12-shaped (the testdata has no l_shipmode, so l_returnflag
    * plays the mode role): per flag, how many 1997-shipped lineitems
    * belong to high- vs low-priority orders — join + CONDITIONAL
    * aggregation (sum-of-case), one shuffle on the join key, partial
    * aggregation below it. */
  def q12PriorityShipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    Tables(s, dir, "lineitem")
      .where($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1998-01-01")
      .join(Tables(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_count"))
      .orderBy($"l_returnflag")
  }

  val q12PriorityShippingSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 0 ELSE 1 END) AS BIGINT) AS low_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q4-shaped (adapted: the testdata has no commit/receipt dates,
    * so "late" = has a returned lineitem): order counts per priority for
    * one quarter, where EXISTS a flagged lineitem — the date-windowed
    * EXISTS-semi-join shape. The quarter filter pushes to the orders
    * scan; the semi join never widens rows. */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val flagged = Tables(s, dir, "lineitem")
      .where($"l_returnflag" === "R").select($"l_orderkey")
    Tables(s, dir, "orders")
      .where($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1996-04-01")
      .join(flagged, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q4OrderPrioritySql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q14-shaped: promo revenue share for one month — fact×dim join
    * with a CONDITIONAL-aggregate ratio. Revenue stays exact integer
    * cents through both sums; the single fp step is the final division,
    * identical in both engines. part is broadcast. */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))
    Tables(s, dir, "lineitem")
      .where($"l_shipdate" >= "1997-09-01" && $"l_shipdate" < "1997-10-01")
      .join(broadcast(Tables(s, dir, "part")), $"l_partkey" === $"p_partkey")
      .agg((lit(100.0) * sum(when($"p_type" === "PROMO", rev).otherwise(0L))
        .cast("double") / sum(rev).cast("double")).as("promo_pct"))
  }

  val q14PromoRevenueSql: String =
    s"""SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
       |    THEN ${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})
       |    ELSE 0 END) AS DOUBLE)
       |  / CAST(SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS DOUBLE)
       |  AS promo_pct
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'""".stripMargin

  /** TPC-H Q16-shaped (lineitem plays partsupp): distinct supplier count
    * per surviving (brand, type, size) — dim-filtered join with a NOT-IN
    * supplier exclusion planned as a broadcast ANTI join, then
    * count-distinct. The anti join runs BEFORE the wide join so excluded
    * rows never reach the shuffle. */
  def q16PartsSuppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val excluded = Tables(s, dir, "supplier")
      .where($"s_suppkey" % 7 === 0).select($"s_suppkey")
    Tables(s, dir, "lineitem").select($"l_partkey", $"l_suppkey")
      .join(broadcast(excluded), $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(broadcast(Tables(s, dir, "part")), $"l_partkey" === $"p_partkey")
      .where($"p_brand" =!= "Brand#1" && $"p_type" =!= "PROMO" &&
        $"p_size".isin(1, 5, 9, 13, 17, 21, 25, 29))
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  val q16PartsSuppliersSql: String =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1,5,9,13,17,21,25,29)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** UNPIVOT (wide → long): the measure columns of a lineitem slice
    * melted into (measure, val) rows — the inverse of pivot_status. */
  def unpivotMeasures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem").where($"l_orderkey" <= 1000)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
      .unpivot(Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_discount"), "measure", "val")
      .orderBy($"l_orderkey", $"l_linenumber", $"measure")
  }

  val unpivotMeasuresSql: String =
    """SELECT * FROM (
      |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      |           FROM lineitem WHERE l_orderkey <= 1000)
      |  ON l_quantity, l_discount INTO NAME measure VALUE val)
      |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin

  /** messdb O1/O7/O15: n-way merge with last-wins fold — base table merged
    * with a delta (10% of keys, bumped value); the delta wins per key.
    * `max_by(v, src)` keeps the fold order explicit (Trie.hs:396-401 folds
    * in input order; src index carries that order through the shuffle). */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables(s, dir, "orders")
    val base = ord.select($"o_orderkey".as("k"),
      cents($"o_totalprice").as("v"), lit(0).as("src"))
    val delta = ord.where($"o_orderkey" % 10 === 0)
      .select($"o_orderkey".as("k"),
        (cents($"o_totalprice") + 10000L).as("v"), lit(1).as("src"))
    base.unionByName(delta)
      .groupBy($"k")
      .agg(max_by($"v", $"src").as("v"))
      .orderBy($"k")
  }

  val mergeUpsertSql: String =
    s"""WITH base AS (
       |  SELECT o_orderkey AS k, ${centsSql("o_totalprice")} AS v, 0 AS src
       |  FROM orders),
       |delta AS (
       |  SELECT o_orderkey AS k, ${centsSql("o_totalprice")} + 10000 AS v, 1 AS src
       |  FROM orders WHERE o_orderkey % 10 = 0),
       |u AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
       |SELECT k, MAX_BY(v, src) AS v FROM u GROUP BY k ORDER BY k""".stripMargin

  /** messdb O1 with a summing fold: merge event-value deltas per user —
    * the commutative FoldFunc case. */
  def mergeFoldSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val a = ev.where($"event_type" === "purchase")
      .select($"user_id".as("k"), cents($"value").as("v"))
    val b = ev.where($"event_type" === "click")
      .select($"user_id".as("k"), cents($"value").as("v"))
    a.unionByName(b).groupBy($"k").agg(sum($"v").as("v")).orderBy($"k")
  }

  val mergeFoldSumSql: String =
    s"""WITH u AS (
       |  SELECT user_id AS k, ${centsSql("value")} AS v FROM events
       |  WHERE event_type = 'purchase'
       |  UNION ALL
       |  SELECT user_id AS k, ${centsSql("value")} AS v FROM events
       |  WHERE event_type = 'click')
       |SELECT k, CAST(SUM(v) AS BIGINT) AS v FROM u GROUP BY k ORDER BY k""".stripMargin

  /** messdb O3/O12: PK range filter — pushed to the parquet scan
    * (min/max row-group pruning = the reference's subtree pruning). */
  def rangeFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .where($"l_orderkey" >= 1000 && $"l_orderkey" < 2000)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val rangeFilterSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_orderkey >= 1000 AND l_orderkey < 2000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** messdb O12 singleton range: point lookup by PK. */
  def pointLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .where($"o_orderkey" === 100L)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderpriority")
  }

  val pointLookupSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      | o_orderpriority
      |FROM orders WHERE o_orderkey = 100""".stripMargin

  /** messdb O2/O11 sortTable: re-key lineitem to l_partkey and fold —
    * map + shuffle + reduce-by-key in one declarative plan. */
  def rekeyAggregate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_partkey".as("k"))
      .agg(sum($"l_quantity").cast("long").as("sum_qty"),
        count(lit(1)).as("cnt"))
      .orderBy($"k")
  }

  val rekeyAggregateSql: String =
    """SELECT l_partkey AS k, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
      | COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin

  /** messdb O9 tableToRows: full ordered scan. */
  def scanOrdered(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "nation").orderBy($"n_nationkey")
  }

  val scanOrderedSql: String =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  val queries: Map[String, QFn] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_top_revenue" -> (q3TopRevenue _),
    "q5_nation_revenue" -> (q5NationRevenue _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q2_top_supplier" -> (q2TopSupplier _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q7_nation_volume" -> (q7NationVolume _),
    "q12_priority_shipping" -> (q12PriorityShipping _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q14_promo_revenue" -> (q14PromoRevenue _),
    "q16_parts_suppliers" -> (q16PartsSuppliers _),
    "unpivot_measures" -> (unpivotMeasures _),
    "merge_upsert" -> (mergeUpsert _),
    "merge_fold_sum" -> (mergeFoldSum _),
    "range_filter" -> (rangeFilter _),
    "point_lookup" -> (pointLookup _),
    "rekey_aggregate" -> (rekeyAggregate _),
    "scan_ordered" -> (scanOrdered _))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1PricingSummarySql,
    "q3_top_revenue" -> q3TopRevenueSql,
    "q5_nation_revenue" -> q5NationRevenueSql,
    "q10_returned_items" -> q10ReturnedItemsSql,
    "q2_top_supplier" -> q2TopSupplierSql,
    "q18_large_orders" -> q18LargeOrdersSql,
    "q7_nation_volume" -> q7NationVolumeSql,
    "q12_priority_shipping" -> q12PriorityShippingSql,
    "q4_order_priority" -> q4OrderPrioritySql,
    "q14_promo_revenue" -> q14PromoRevenueSql,
    "q16_parts_suppliers" -> q16PartsSuppliersSql,
    "unpivot_measures" -> unpivotMeasuresSql,
    "merge_upsert" -> mergeUpsertSql,
    "merge_fold_sum" -> mergeFoldSumSql,
    "range_filter" -> rangeFilterSql,
    "point_lookup" -> pointLookupSql,
    "rekey_aggregate" -> rekeyAggregateSql,
    "scan_ordered" -> scanOrderedSql)
}
