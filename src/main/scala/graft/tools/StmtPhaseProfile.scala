package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, FsStore, Ops, TableRef}
import graft.sql.GraftSql
import graft.queries.Q._

/** Phase breakdown of a warm, repeated sql_matview statement flow: how
  * much of each rerun is temp-view re-registration, Spark analysis, and
  * actual execution — the round-11 statement-plan-cache sizing probe. */
object StmtPhaseProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (round <- 1 to 4) {
      val store = new FsStore(
        java.nio.file.Files.createTempDirectory("graft-sp-prof-").toString)
      val ops = new Ops(spark, store, 8192)
      val cat = new Catalog(store)
      def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)
      def t[T](label: String)(body: => T): T = {
        val t0 = System.nanoTime()
        val r = body
        println(f"[spp] r$round $label%-22s ${(System.nanoTime() - t0) / 1e6}%7.1f ms")
        r
      }

      Tables(spark, sfDir, "orders")
        .where(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("price_c"))
        .createOrReplaceTempView("orders_src")
      t("CTAS")(run(
        "CREATE TABLE orders_g PRIMARY KEY (o_orderkey) AS SELECT * FROM orders_src"))
      t("CREATE MV")(run("CREATE MATERIALIZED VIEW cust_totals AS " +
        "SELECT o_custkey, SUM(price_c) AS total_c, COUNT(*) AS n " +
        "FROM orders_g GROUP BY o_custkey"))
      t("INSERT")(run("INSERT INTO orders_g " +
        "SELECT o_orderkey + 100000000, o_custkey, price_c + 100 " +
        "FROM orders_g WHERE o_orderkey % 20 = 0"))
      t("REFRESH")(run("REFRESH MATERIALIZED VIEW cust_totals"))
      val out = t("SELECT stmt")(run(
        "SELECT o_custkey, total_c, n FROM cust_totals ORDER BY o_custkey"))
      t("SELECT count")(out.left.foreach(_.count()))

      // phase micro-probes against the CURRENT catalog state
      t("catalog.root x10")((1 to 10).foreach(_ => cat.root))
      t("registerViews x10")((1 to 10).foreach { _ =>
        cat.root.keys.foreach { name =>
          ops.scan(TableRef(cat.root(name).tableHash))
            .createOrReplaceTempView(name)
        }
      })
      t("analyze SELECT x10")((1 to 10).foreach { _ =>
        spark.sql("SELECT o_custkey, total_c, n FROM cust_totals ORDER BY o_custkey")
          .queryExecution.analyzed
      })
    }
    spark.stop()
  }
}
