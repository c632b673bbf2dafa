package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, FsStore, Ops}
import graft.queries.Q._
import graft.sql.GraftSql

/** Per-statement wall/jobs/IO profile of the sql_matview_join_agg bench
  * flow (the suite's most expensive query) — which statement owns the
  * seconds, and is it data or job-count? Run:
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JoinAggProfile" */
object JoinAggProfile {
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
          val desc = Option(s.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("?")
          jobStart.put(s.jobId, (System.nanoTime(),
            s"stages=${s.stageInfos.length} tasks=${s.stageInfos.map(_.numTasks).sum} [$desc] ${names.mkString(" | ")}"))
        }
        override def onJobEnd(
            s: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStart.remove(s.jobId)).foreach { case (t0, desc) =>
            val ms = (System.nanoTime() - t0) / 1e6
            println(f"[japrof-job] ${ms}%7.0f ms  $desc")
          }
        }
      })

    val store = new FsStore(
      java.nio.file.Files.createTempDirectory("graft-ja-prof-").toString)
    val ops = new Ops(spark, store, 8192)
    val cat = new Catalog(store)
    def step(label: String)(body: => Unit): Unit = {
      store.stats.reset()
      jobs.set(0)
      val w0 = java.time.LocalTime.now()
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      // wall-clock window so JFR samples can be attributed per step
      println(f"[japrof] $label%-34s ${sec}%6.2f s  jobs=${jobs.get}%-3d " +
        f"chunkSaves=${store.stats.chunkSaves.get}%-4d " +
        f"memoHits=${store.stats.memoHits.get}%-4d " +
        f"memoMisses=${store.stats.memoMisses.get}%-4d " +
        f"window=$w0..${java.time.LocalTime.now()}")
    }
    def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)

    Tables(spark, sfDir, "orders")
      .where(col("o_orderkey") % 8 === 5)
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_c"))
      .createOrReplaceTempView("orders_ja_src")
    Tables(spark, sfDir, "lineitem")
      .where(col("l_orderkey") % 8 === 5)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
      .select(col("l_orderkey").as("o_orderkey"), col("qty"))
      .createOrReplaceTempView("items_ja_src")

    step("warm count") {
      spark.table("orders_ja_src").count(): Unit
      spark.table("items_ja_src").count(): Unit
    }
    step("CTAS orders_ja")(run(
      "CREATE TABLE orders_ja PRIMARY KEY (o_orderkey) AS SELECT * FROM orders_ja_src"))
    step("CTAS items_ja")(run(
      "CREATE TABLE items_ja PRIMARY KEY (o_orderkey) AS SELECT * FROM items_ja_src"))
    step("CREATE MV cust_qty")(run(
      "CREATE MATERIALIZED VIEW cust_qty AS " +
        "SELECT o_custkey % 50 AS g, SUM(qty) AS total_qty, COUNT(*) AS n, " +
        "SUM(price_c) AS total_c " +
        "FROM orders_ja INNER JOIN items_ja USING (o_orderkey) " +
        "WHERE price_c > 1000000 GROUP BY g HAVING n >= 2"))
    step("INSERT orders_ja")(run(
      "INSERT INTO orders_ja SELECT o_orderkey + 90000000, o_custkey, price_c + 3 " +
        "FROM orders_ja WHERE o_orderkey % 40 = 5"))
    step("INSERT items_ja")(run(
      "INSERT INTO items_ja SELECT o_orderkey + 90000000, qty + 2 " +
        "FROM items_ja WHERE o_orderkey % 80 = 5"))
    step("REFRESH ALL")(run("REFRESH ALL"))
    step("final SELECT")(run(
      "SELECT g, total_qty, n, total_c FROM cust_qty ORDER BY g") match {
      case Left(df) => df.collect(): Unit
      case _ => ()
    })
    spark.stop()
  }
}
