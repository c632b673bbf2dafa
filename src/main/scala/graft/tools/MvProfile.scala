package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, FsStore, Ops}
import graft.queries.Q._
import graft.sql.GraftSql

/** Per-statement wall/IO profile of the sql_matview workflow — where do
  * the ~12 bench seconds go? Run:
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.MvProfile" */
object MvProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val names = s.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
          jobStart.put(s.jobId, (System.nanoTime(),
            s"stages=${s.stageInfos.length} tasks=${s.stageInfos.map(_.numTasks).sum} ${names.mkString(" | ")}"))
        }
        override def onJobEnd(
            s: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStart.remove(s.jobId)).foreach { case (t0, desc) =>
            val ms = (System.nanoTime() - t0) / 1e6
            println(f"[mvprof-job] ${ms}%7.0f ms  $desc")
          }
        }
      })

    val store = new FsStore(
      java.nio.file.Files.createTempDirectory("graft-mv-prof-").toString)
    val ops = new Ops(spark, store, 8192)
    val cat = new Catalog(store)
    def step(label: String)(body: => Unit): Unit = {
      store.stats.reset()
      jobs.set(0)
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[mvprof] $label%-28s ${sec}%6.2f s  jobs=${jobs.get}%-3d " +
        f"chunkSaves=${store.stats.chunkSaves.get}%-4d " +
        f"metaSaves=${store.stats.metaSaves.get}%-4d " +
        f"memoHits=${store.stats.memoHits.get}%-4d " +
        f"memoMisses=${store.stats.memoMisses.get}%-4d")
    }
    def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)

    Tables(spark, sfDir, "orders")
      .where(col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_c"))
      .createOrReplaceTempView("orders_src")

    step("warm count")(Tables(spark, sfDir, "orders").count(): Unit)
    step("CTAS")(run(
      "CREATE TABLE orders_g PRIMARY KEY (o_orderkey) AS SELECT * FROM orders_src"))
    step("CREATE MV")(run("CREATE MATERIALIZED VIEW cust_totals AS " +
      "SELECT o_custkey, SUM(price_c) AS total_c, COUNT(*) AS n " +
      "FROM orders_g GROUP BY o_custkey"))
    step("INSERT delta")(run("INSERT INTO orders_g " +
      "SELECT o_orderkey + 100000000, o_custkey, price_c + 100 " +
      "FROM orders_g WHERE o_orderkey % 20 = 0"))
    step("REFRESH")(run("REFRESH MATERIALIZED VIEW cust_totals"))
    step("SELECT")(run(
      "SELECT o_custkey, total_c, n FROM cust_totals ORDER BY o_custkey") match {
      case Left(df) => df.collect(): Unit
      case _ => ()
    })
    spark.stop()
  }
}
