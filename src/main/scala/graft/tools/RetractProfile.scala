package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, FsStore, Ops}
import graft.sql.GraftSql
import graft.queries.Q._

/** Statement walls + driver-thread sampling for the sql_matview_retract
  * flow — the round-13 floor probe (VERDICT r12 #5): which statement
  * owns the seconds, and what is the driver doing during it. */
object RetractProfile {
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

    val sampleStmt = args.headOption.getOrElse("CREATE MATERIALIZED VIEW")
    for (round <- 1 to 3) {
      val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-rtp-"))
      val ops = new Ops(spark, store, 2048)
      val cat = new Catalog(store)
      def run(label: String, sql: String): Unit = {
        val s = round == 3 && sql.startsWith(sampleStmt)
        if (s) { hist.clear(); sampling = true }
        val t0 = System.nanoTime()
        GraftSql.execute(spark, ops, cat, sql)
        sampling = false
        println(f"[rtp r$round] ${(System.nanoTime() - t0) / 1e6}%7.1f ms  $label")
      }
      Tables(spark, sfDir, "orders")
        .where(col("o_orderkey") % 4 === 3)
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("price_c"))
        .createOrReplaceTempView("ord_rt_src")
      run("ddl", "CREATE TABLE ord_rt (o_orderkey bigint PRIMARY KEY, " +
        "o_custkey bigint NOT NULL, price_c bigint NOT NULL)")
      run("load", "INSERT INTO ord_rt SELECT * FROM ord_rt_src")
      run("create-mv", "CREATE MATERIALIZED VIEW bucket_rt AS " +
        "SELECT o_orderkey div 256 AS g, SUM(price_c) AS total_c, " +
        "COUNT(*) AS n, " +
        "HIST_QUANTILE(price_c div 100000, 0.5) AS median_price_bin " +
        "FROM ord_rt GROUP BY g")
      run("ins", "INSERT INTO ord_rt SELECT o_orderkey + 900000000, " +
        "o_custkey, price_c + 7 FROM ord_rt WHERE o_orderkey % 64 = 3")
      run("del", "DELETE FROM ord_rt WHERE o_orderkey >= 1000 AND o_orderkey < 9000")
      run("refresh", "REFRESH MATERIALIZED VIEW bucket_rt")
      run("select", "SELECT g, total_c, n, median_price_bin FROM bucket_rt ORDER BY g")
    }
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (f, n) =>
      println(f"[rtp] ${n * 5}%6d ms  $f")
    }
    spark.stop()
  }
}
