package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, FsStore, Ops}
import graft.queries.Q._
import graft.sql.GraftSql

/** Per-statement wall/jobs/IO profile of the sql_matview_join bench
  * flow — where do its ~11 bench seconds go? Run:
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JoinMvProfile" */
object JoinMvProfile {
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
            println(f"[jmvprof-job] ${ms}%7.0f ms  $desc")
          }
        }
      })

    val store = new FsStore(
      java.nio.file.Files.createTempDirectory("graft-jmv-prof-").toString)
    val ops = new Ops(spark, store, 8192)
    val cat = new Catalog(store)
    def step(label: String)(body: => Unit): Unit = {
      store.stats.reset()
      jobs.set(0)
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[jmvprof] $label%-34s ${sec}%6.2f s  jobs=${jobs.get}%-3d " +
        f"chunkSaves=${store.stats.chunkSaves.get}%-4d " +
        f"memoHits=${store.stats.memoHits.get}%-4d " +
        f"memoMisses=${store.stats.memoMisses.get}%-4d")
    }
    def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)

    Tables(spark, sfDir, "orders")
      .where(col("o_orderkey") % 8 === 3)
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_c"))
      .createOrReplaceTempView("orders_j_src")
    Tables(spark, sfDir, "lineitem")
      .where(col("l_orderkey") % 8 === 3)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
      .select(col("l_orderkey").as("o_orderkey"), col("qty"))
      .createOrReplaceTempView("items_j_src")

    step("warm count") {
      spark.table("orders_j_src").count(): Unit
      spark.table("items_j_src").count(): Unit
    }
    step("CTAS orders_j")(run(
      "CREATE TABLE orders_j PRIMARY KEY (o_orderkey) AS SELECT * FROM orders_j_src"))
    step("CTAS items_j")(run(
      "CREATE TABLE items_j PRIMARY KEY (o_orderkey) AS SELECT * FROM items_j_src"))
    step("CREATE MV oj_inner")(run(
      "CREATE MATERIALIZED VIEW oj_inner AS SELECT * FROM orders_j INNER JOIN items_j USING (o_orderkey)"))
    step("CREATE MV oj_left")(run(
      "CREATE MATERIALIZED VIEW oj_left AS SELECT * FROM orders_j LEFT JOIN items_j USING (o_orderkey)"))
    step("INSERT orders_j")(run(
      "INSERT INTO orders_j SELECT o_orderkey + 90000000, o_custkey, price_c + 7 " +
        "FROM orders_j WHERE o_orderkey % 40 = 3"))
    step("INSERT items_j")(run(
      "INSERT INTO items_j SELECT o_orderkey + 90000000, qty + 1 " +
        "FROM items_j WHERE o_orderkey % 40 = 19"))
    step("REFRESH ALL")(run("REFRESH ALL"))
    step("final SELECT")(run(
      "SELECT 'i' AS side, o_orderkey, o_custkey, price_c, qty " +
        "FROM oj_inner WHERE o_orderkey % 50 = 3 " +
        "UNION ALL " +
        "SELECT 'l' AS side, o_orderkey, o_custkey, price_c, COALESCE(qty, -1) AS qty " +
        "FROM oj_left WHERE o_orderkey % 50 = 3 " +
        "ORDER BY side, o_orderkey") match {
      case Left(df) => df.collect(): Unit
      case _ => ()
    })
    spark.stop()
  }
}
