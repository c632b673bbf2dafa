package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** The remaining TPC-H query shapes (Q6, Q8, Q9, Q11, Q13, Q15, Q17,
  * Q19, Q20, Q21, Q22), adapted to the driver testdata schema (no
  * partsupp / shipmode / comment columns — lineitem plays partsupp where
  * needed, and Q21's "late" is shipdate > orderdate + 60 days).
  *
  * Together with Relational.scala / Subqueries.scala this completes all
  * 22 TPC-H plan shapes as oracle-checked queries. Money math follows the
  * repo convention (Q.scala): exact integer cents end-to-end, one final
  * fp division, deterministic total ORDER BY.
  */
object TpchRest {

  private def rev(s: SparkSession) = {
    import s.implicits._
    cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))
  }
  private val revSql =
    s"${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})"

  /** TPC-H Q6: scan-only conditional aggregate — no join at all; the
    * date+quantity predicates push to the parquet scan and the whole
    * query is one WholeStageCodegen span over a pruned 3-column read. */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .where($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1998-01-01"
        && cents($"l_discount").between(5L, 7L) && $"l_quantity" < 24)
      .agg((sum(cents($"l_extendedprice") * cents($"l_discount")) / 10000.0)
        .as("revenue"))
  }

  val q6ForecastRevenueSql: String =
    s"""SELECT SUM(${centsSql("l_extendedprice")} * ${centsSql("l_discount")}) / CAST(10000.0 AS DOUBLE) AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
       |  AND ${centsSql("l_discount")} BETWEEN 5 AND 7 AND l_quantity < 24""".stripMargin

  /** TPC-H Q8: market share of one supplier nation within a region's
    * customers for one part type, by order year — the deepest dim chain
    * in the suite (part, orders, customer, nation×2, region, supplier).
    * All dims broadcast; the fact table shuffles only on its join keys;
    * the share is a ratio of two exact-cents conditional sums. */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val part = Tables(s, dir, "part").where($"p_type" === "SMALL")
      .select($"p_partkey")
    val n1 = Tables(s, dir, "nation")
      .select($"n_nationkey".as("c_nkey"), $"n_regionkey")
    val n2 = Tables(s, dir, "nation")
      .select($"n_nationkey".as("s_nkey"), $"n_name".as("supp_nation"))
    val region = Tables(s, dir, "region").where($"r_name" === "ASIA")
    val r = rev(s)
    Tables(s, dir, "lineitem")
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .join(Tables(s, dir, "orders")
          .where($"o_orderdate" >= "1996-01-01" && $"o_orderdate" < "1998-01-01"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(n1), $"c_nationkey" === $"c_nkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .join(Tables(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n2), $"s_nationkey" === $"s_nkey")
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg((sum(when($"supp_nation" === "NATION_3", r).otherwise(0L))
        .cast("double") / sum(r).cast("double")).as("mkt_share"))
      .orderBy($"o_year")
  }

  val q8MarketShareSql: String =
    s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN $revSql ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM($revSql) AS DOUBLE) AS mkt_share
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |JOIN region ON n1.n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |WHERE r_name = 'ASIA' AND p_type = 'SMALL'
       |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
       |GROUP BY 1
       |ORDER BY o_year""".stripMargin

  /** TPC-H Q9-shaped (no ps_supplycost: cost = 80% of p_retailprice per
    * unit): profit by supplier nation and order year for parts matching a
    * name substring. The LIKE filter shrinks part before it broadcasts;
    * profit stays in exact 10^-4-dollar integers until the final divide. */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val part = Tables(s, dir, "part").where($"p_name".like("%gear%"))
      .select($"p_partkey", $"p_retailprice")
    val profit = rev(s) -
      cents($"p_retailprice") * $"l_quantity".cast("long") * 80L
    Tables(s, dir, "lineitem")
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .join(Tables(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(Tables(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name".as("nation"), year($"o_orderdate").as("o_year"))
      .agg((sum(profit) / 10000.0).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  val q9ProductProfitSql: String =
    s"""SELECT n_name AS nation,
       |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       |  SUM($revSql - ${centsSql("p_retailprice")} * CAST(l_quantity AS BIGINT) * 80) / CAST(10000.0 AS DOUBLE) AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%gear%'
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11-shaped (lineitem plays partsupp, region plays the nation
    * filter): per-part value for one region's suppliers, keeping parts
    * whose value exceeds 1/1000 of the regional total. The total is a
    * 1-row broadcast joined back — the GROUP BY ... HAVING > scalar
    * subquery plan without a second fact scan. Exact-integer compare
    * (val*1000 > total), no float threshold. */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asiaSup = Tables(s, dir, "supplier")
      .join(broadcast(Tables(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables(s, dir, "region").where($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey")
    val v = Tables(s, dir, "lineitem")
      .join(broadcast(asiaSup), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey")
      .agg(sum(cents($"l_extendedprice")).as("val_cents"))
    val total = v.agg(sum($"val_cents").as("total_cents"))
    v.crossJoin(broadcast(total))
      .where($"val_cents" * 1000L > $"total_cents")
      .select($"l_partkey", ($"val_cents" / 100.0).as("value"))
      .orderBy($"value".desc, $"l_partkey")
  }

  val q11ImportantPartsSql: String =
    s"""WITH v AS (
       |  SELECT l_partkey, SUM(${centsSql("l_extendedprice")}) AS val_cents
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'ASIA'
       |  GROUP BY l_partkey)
       |SELECT l_partkey, val_cents / CAST(100.0 AS DOUBLE) AS value
       |FROM v
       |WHERE val_cents * 1000 > (SELECT SUM(val_cents) FROM v)
       |ORDER BY value DESC, l_partkey""".stripMargin

  /** TPC-H Q13: customer order-count distribution — LEFT OUTER join with
    * a predicate on the preserved side's join partner (filter the orders
    * side BEFORE the outer join, which is equivalent to the ON-clause
    * filter and lets the scan prune), then two stacked aggregations. */
  def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables(s, dir, "orders")
      .where($"o_orderpriority" =!= "1-URGENT")
      .select($"o_orderkey", $"o_custkey")
    val perCust = Tables(s, dir, "customer").select($"c_custkey")
      .join(ord, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13CustomerDistributionSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15: top supplier by quarterly revenue — the revenue "view"
    * aggregates once, its 1-row MAX broadcasts back, and equality on
    * exact cents (not floats) selects the winner(s). */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val revenue = Tables(s, dir, "lineitem")
      .where($"l_shipdate" >= "1997-01-01" && $"l_shipdate" < "1997-04-01")
      .groupBy($"l_suppkey")
      .agg(sum(rev(s)).as("rev_cents"))
    val mx = revenue.agg(max($"rev_cents").as("max_rev"))
    revenue.join(broadcast(mx), $"rev_cents" === $"max_rev")
      .join(Tables(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", ($"rev_cents" / 10000.0).as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  val q15TopSupplierSql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey, SUM($revSql) AS rev_cents
       |  FROM lineitem
       |  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, rev_cents / CAST(10000.0 AS DOUBLE) AS total_revenue
       |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
       |WHERE rev_cents = (SELECT MAX(rev_cents) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17: revenue from small-quantity orders of one brand — the
    * correlated AVG subquery (qty < 0.2 * per-part avg) decorrelated into
    * a per-part aggregate join, with the brand filter applied BEFORE the
    * per-part stats so only the brand's lineitems aggregate at all.
    * The 0.2·avg compare is exact integers: 5·qty·cnt < sum_qty. */
  def q17SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bparts = Tables(s, dir, "part").where($"p_brand" === "Brand#3")
      .select($"p_partkey")
    val li = Tables(s, dir, "lineitem")
      .join(broadcast(bparts), $"l_partkey" === $"p_partkey")
    val perPart = li.groupBy($"l_partkey".as("pk"))
      .agg(count(lit(1)).as("cnt"), sum($"l_quantity").cast("long").as("sq"))
    li.join(broadcast(perPart), $"l_partkey" === $"pk")
      .where($"l_quantity".cast("long") * 5L * $"cnt" < $"sq")
      .agg((sum(cents($"l_extendedprice")) / 700.0).as("avg_yearly"))
  }

  val q17SmallQtyRevenueSql: String =
    s"""WITH pa AS (
       |  SELECT l_partkey AS pk, COUNT(*) AS cnt,
       |    CAST(SUM(l_quantity) AS BIGINT) AS sq
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_brand = 'Brand#3'
       |  GROUP BY l_partkey)
       |SELECT SUM(${centsSql("l_extendedprice")}) / CAST(700.0 AS DOUBLE) AS avg_yearly
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN pa ON l_partkey = pk
       |WHERE p_brand = 'Brand#3'
       |  AND CAST(l_quantity AS BIGINT) * 5 * cnt < sq""".stripMargin

  /** TPC-H Q19: disjunctive multi-predicate join revenue — three
    * (brand, size, quantity) conjunction groups OR'd together. The join
    * key is still a plain equi-join (partkey); the disjunction stays a
    * residual filter, which is exactly how it should plan — no union of
    * three scans, one pass over the fact table. */
  def q19DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g1 = $"p_brand" === "Brand#1" && $"p_size".between(1, 5) &&
      $"l_quantity".between(1, 11)
    val g2 = $"p_brand" === "Brand#2" && $"p_size".between(1, 10) &&
      $"l_quantity".between(10, 20)
    val g3 = $"p_brand" === "Brand#3" && $"p_size".between(1, 15) &&
      $"l_quantity".between(20, 30)
    Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "part")), $"l_partkey" === $"p_partkey")
      .where(g1 || g2 || g3)
      .agg((sum(rev(s)) / 10000.0).as("revenue"))
  }

  val q19DisjunctiveRevenueSql: String =
    s"""SELECT SUM($revSql) / CAST(10000.0 AS DOUBLE) AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q20-shaped: suppliers in a nation group who shipped more than
    * 80 units of some small-named part — the aggregate-then-semi chain:
    * per-(supplier, part) totals filter FIRST, collapse to a distinct
    * supplier set, then a semi join keeps matching suppliers. No wide
    * row ever survives past the aggregate. */
  def q20PartPromotion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val smallParts = Tables(s, dir, "part").where($"p_name".like("small%"))
      .select($"p_partkey")
    val qualified = Tables(s, dir, "lineitem")
      .join(broadcast(smallParts), $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum($"l_quantity").cast("long").as("tq"))
      .where($"tq" > 80L)
      .select($"l_suppkey").distinct()
    Tables(s, dir, "supplier")
      .join(broadcast(Tables(s, dir, "nation")
          .where($"n_name".isin("NATION_7", "NATION_8", "NATION_9"))),
        $"s_nationkey" === $"n_nationkey")
      .join(qualified, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name", $"n_name")
      .orderBy($"s_suppkey")
  }

  val q20PartPromotionSql: String =
    """SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name IN ('NATION_7','NATION_8','NATION_9')
      |  AND s_suppkey IN (
      |    SELECT l_suppkey
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    WHERE p_name LIKE 'small%'
      |    GROUP BY l_suppkey, l_partkey
      |    HAVING CAST(SUM(l_quantity) AS BIGINT) > 80)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q21-shaped ("late" = shipped >60 days after order date, on
    * finished orders): suppliers whose late lineitems are the ONLY late
    * ones on multi-supplier orders — EXISTS(another supplier) planned as
    * a semi join with a non-equi residual, NOT EXISTS(another late
    * supplier) as an anti join on the late set itself. */
  def q21WaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ordF = Tables(s, dir, "orders").where($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    val late = Tables(s, dir, "lineitem")
      .join(ordF, $"l_orderkey" === $"o_orderkey")
      .where($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .select($"l_orderkey", $"l_suppkey")
    val others = Tables(s, dir, "lineitem")
      .select($"l_orderkey".as("k2"), $"l_suppkey".as("s2"))
    val lateOthers = late.select($"l_orderkey".as("k3"), $"l_suppkey".as("s3"))
    val waiting = late
      .join(others, $"l_orderkey" === $"k2" && $"l_suppkey" =!= $"s2", "left_semi")
      .join(lateOthers, $"l_orderkey" === $"k3" && $"l_suppkey" =!= $"s3", "left_anti")
    waiting
      .join(broadcast(Tables(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
  }

  val q21WaitingSuppliersSql: String =
    """WITH l1 AS (
      |  SELECT l_orderkey, l_suppkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM l1 JOIN supplier ON l_suppkey = s_suppkey
      |WHERE EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND o3.o_orderstatus = 'F'
      |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  /** TPC-H Q22-shaped (custkey%10 plays the country code, "dormant" = no
    * order since 2001): above-average-balance customers with no recent
    * orders, grouped by code. The positive-balance average is a 1-row
    * broadcast compared in exact integers (bal·cnt > total); the no-
    * recent-orders test is an anti join against a date-pruned scan. */
  def q22SalesOpportunity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables(s, dir, "customer")
      .where(($"c_custkey" % 10).isin(1L, 3L, 5L, 7L))
      .select($"c_custkey", ($"c_custkey" % 10).as("code"),
        cents($"c_acctbal").as("bal"))
    val posAvg = cust.where($"bal" > 0L)
      .agg(count(lit(1)).as("pcnt"), sum($"bal").as("ptot"))
    val recent = Tables(s, dir, "orders")
      .where($"o_orderdate" >= "2001-01-01").select($"o_custkey")
    cust.crossJoin(broadcast(posAvg))
      .where($"bal" * $"pcnt" > $"ptot")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"code")
      .agg(count(lit(1)).as("numcust"), (sum($"bal") / 100.0).as("totacctbal"))
      .orderBy($"code")
  }

  val q22SalesOpportunitySql: String =
    s"""WITH cust AS (
       |  SELECT c_custkey, c_custkey % 10 AS code,
       |    ${centsSql("c_acctbal")} AS bal
       |  FROM customer WHERE c_custkey % 10 IN (1,3,5,7))
       |SELECT code, COUNT(*) AS numcust,
       |  SUM(bal) / CAST(100.0 AS DOUBLE) AS totacctbal
       |FROM cust
       |WHERE bal * (SELECT COUNT(*) FROM cust WHERE bal > 0)
       |      > (SELECT SUM(bal) FROM cust WHERE bal > 0)
       |  AND NOT EXISTS (
       |    SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey AND o_orderdate >= DATE '2001-01-01')
       |GROUP BY code
       |ORDER BY code""".stripMargin

  val queries: Map[String, QFn] = Map(
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q8_market_share" -> (q8MarketShare _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q19_disjunctive_revenue" -> (q19DisjunctiveRevenue _),
    "q20_part_promotion" -> (q20PartPromotion _),
    "q21_waiting_suppliers" -> (q21WaitingSuppliers _),
    "q22_sales_opportunity" -> (q22SalesOpportunity _))

  val oracles: Map[String, String] = Map(
    "q6_forecast_revenue" -> q6ForecastRevenueSql,
    "q8_market_share" -> q8MarketShareSql,
    "q9_product_profit" -> q9ProductProfitSql,
    "q11_important_parts" -> q11ImportantPartsSql,
    "q13_customer_distribution" -> q13CustomerDistributionSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q17_small_qty_revenue" -> q17SmallQtyRevenueSql,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenueSql,
    "q20_part_promotion" -> q20PartPromotionSql,
    "q21_waiting_suppliers" -> q21WaitingSuppliersSql,
    "q22_sales_opportunity" -> q22SalesOpportunitySql)
}
