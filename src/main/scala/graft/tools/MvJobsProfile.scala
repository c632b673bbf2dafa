package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, FsStore, Ops}
import graft.sql.GraftSql
import graft.queries.Q._

/** Job-level breakdown of the sql_matview statement flow: prints every
  * Spark job fired per statement with its description and wall time —
  * the round-12 "CREATE MV ≤ 2 jobs" sizing probe (VERDICT r11 #3). */
object MvJobsProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(e.jobId, System.nanoTime()); ()
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val ms = Option(starts.get(e.jobId))
            .map(t0 => (System.nanoTime() - t0) / 1e6).getOrElse(-1.0)
          jobs.add(f"    job ${e.jobId}%3d ${ms}%7.1f ms"); ()
        }
      })
    // job DESCRIPTIONS come through the props at start; simpler: poll
    // the per-job description from the status store after the fact is
    // unreliable — tag via description property instead
    val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("<none>")
          descs.put(e.jobId, d); ()
        }
      })

    for (round <- 1 to 3) {
      val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-mvj-"))
      val ops = new Ops(spark, store, 8192)
      val cat = new Catalog(store)
      def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)
      def t[T](label: String)(body: => T): T = {
        jobs.clear(); descs.clear()
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
        val t0 = System.nanoTime()
        val r = body
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
        println(f"[mvj] r$round $label%-12s ${(System.nanoTime() - t0) / 1e6}%7.1f ms")
        import scala.jdk.CollectionConverters._
        jobs.asScala.foreach { j =>
          val id = j.trim.split("\\s+")(1).toInt
          println(j + "  " + Option(descs.get(id)).getOrElse(""))
        }
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
    }
    spark.stop()
  }
}
