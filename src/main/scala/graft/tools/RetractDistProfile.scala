package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, FsStore, Ops}
import graft.sql.GraftSql
import graft.queries.Q._

/** Statement walls + driver-thread sampling for the
  * sql_matview_retract_dist flow — the round-14 floor probe (VERDICT
  * r13 #3): the scattered predicate DELETE runs as a ZERO-job driver
  * pass (~1.5 s over ~200k rows at sf0.1); which frames own it. Pass a
  * statement prefix to sample a different statement (default DELETE). */
object RetractDistProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-statement job list (MvJobsProfile's listener, inlined)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(e.jobId, System.nanoTime())
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("<none>")
          jobs.add(f"    job ${e.jobId}%3d  $d"); ()
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val ms = Option(starts.get(e.jobId))
            .map(t0 => (System.nanoTime() - t0) / 1e6).getOrElse(-1.0)
          jobs.add(f"    job ${e.jobId}%3d done ${ms}%7.1f ms"); ()
        }
      })
    Tables(spark, sfDir, "lineitem").cache().count(): Unit

    val main = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = main.getStackTrace
          val frame = st.find(f => f.getClassName.startsWith("graft."))
            .orElse(st.headOption)
            .map(f => f.getClassName + "." + f.getMethodName)
            .getOrElse("<idle>")
          hist.merge(frame, 1, (a, b) => a + b)
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val sampleStmt = args.headOption.getOrElse("DELETE")
    // route matrix for the DELETE (arg2 = "routes"): r1/r4 default
    // driver pass, r2/r5 chunk-read via parquet job (driver patch off),
    // r3/r6 full job chain (driver materialize off)
    val routeMatrix = args.lift(1).contains("routes")
    for (round <- 1 to (if (routeMatrix) 6 else 3)) {
      if (routeMatrix) {
        graft.core.Ops.driverPatchEnabled = round % 3 != 2
        graft.core.Canonical.driverMaterializeEnabled = round % 3 != 0
      }
      val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-rdp-"))
      val ops = new Ops(spark, store, 2048)
      val cat = new Catalog(store)
      def run(label: String, sql: String): Unit = {
        val s = round == 3 && sql.startsWith(sampleStmt)
        if (s) { hist.clear(); sampling = true }
        jobs.clear()
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
        val t0 = System.nanoTime()
        GraftSql.execute(spark, ops, cat, sql)
        sampling = false
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
        println(f"[rdp r$round] ${(System.nanoTime() - t0) / 1e6}%7.1f ms  $label")
        if (round == 3) {
          import scala.jdk.CollectionConverters._
          jobs.asScala.foreach(println)
        }
      }
      Tables(spark, sfDir, "lineitem")
        .where(col("l_orderkey") % 3 === 0)
        .select(
          (col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("lk"),
          col("l_partkey"),
          cents(col("l_extendedprice")).as("price_c0"))
        .groupBy(col("lk"))
        .agg(max(col("l_partkey")).as("l_partkey"),
          sum(col("price_c0")).as("price_c"))
        .createOrReplaceTempView("li_rd_src")
      run("ddl", "CREATE TABLE li_rd (lk bigint PRIMARY KEY, " +
        "l_partkey bigint NOT NULL, price_c bigint NOT NULL)")
      run("load", "INSERT INTO li_rd SELECT * FROM li_rd_src")
      run("create-mv", "CREATE MATERIALIZED VIEW scatter_rd AS " +
        "SELECT lk % 512 AS g, SUM(price_c) AS total_c, COUNT(*) AS n " +
        "FROM li_rd GROUP BY g")
      run("ins", "INSERT INTO li_rd SELECT lk + 1099511627776, l_partkey, " +
        "price_c + 3 FROM li_rd WHERE lk % 1024 = 5")
      run("del", "DELETE FROM li_rd WHERE lk % 512 = 70 OR l_partkey % 5 = 2")
      run("refresh", "REFRESH MATERIALIZED VIEW scatter_rd")
      run("select", "SELECT g, total_c, n FROM scatter_rd ORDER BY g")
    }
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (f, n) =>
      println(f"[rdp] ${n * 5}%6d ms  $f")
    }
    spark.stop()
  }
}
