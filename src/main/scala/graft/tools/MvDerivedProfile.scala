package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, FsStore, Ops}
import graft.sql.GraftSql
import graft.queries.Q._

/** Per-statement + per-view-stage wall profile of the DERIVED-view
  * flows (AVG / sketch / quantile: aggregate stage + post stage) — the
  * round-13 fusion sizing probe (VERDICT r12 #3). Run with
  * GRAFT_DEBUG_REFRESH=1 to also get per-view refresh walls. */
object MvDerivedProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir, "orders").cache().count(): Unit

    for (round <- 1 to 3) {
      val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-mvd-"))
      val ops = new Ops(spark, store, 8192)
      val cat = new Catalog(store)
      def run(label: String, sql: String): Unit = {
        val t0 = System.nanoTime()
        GraftSql.execute(spark, ops, cat, sql)
        println(f"[mvd r$round] ${(System.nanoTime() - t0) / 1e6}%7.1f ms  $label")
      }
      Tables(spark, sfDir, "orders")
        .where(col("o_orderkey") % 4 === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("price_c"))
        .createOrReplaceTempView("orders_a_src")
      run("ctas", "CREATE TABLE orders_a PRIMARY KEY (o_orderkey) AS SELECT * FROM orders_a_src")
      run("create-mv", "CREATE MATERIALIZED VIEW cust_avg AS " +
        "SELECT o_custkey % 10 AS bucket, AVG(price_c) AS mean_c, " +
        "COUNT(*) AS n, SUM(price_c) AS total_c " +
        "FROM orders_a GROUP BY bucket")
      run("dml", "INSERT INTO orders_a SELECT o_orderkey + 100000000, " +
        "o_custkey, price_c + 31 FROM orders_a WHERE o_orderkey % 20 = 1")
      run("refresh", "REFRESH MATERIALIZED VIEW cust_avg")
      run("select", "SELECT bucket, mean_c, n, total_c FROM cust_avg ORDER BY bucket")
    }
    spark.stop()
  }
}
