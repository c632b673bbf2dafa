package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, FsStore, Ops}
import graft.sql.GraftSql
import graft.queries.Q._

/** Poor-man's sampling profiler for the CREATE MV statement's
  * driver-side wall: samples the main thread every 5 ms and histograms
  * the deepest graft/spark frame — locates the non-job 900 ms the
  * MvJobsProfile breakdown shows (VERDICT r11 #3 sizing). */
object MvSampleProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val main = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = main.getStackTrace
          // the most-specific frame that names OUR code, else the top
          // spark frame — "what is the driver doing right now"
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

    for (round <- 1 to 3) {
      val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-mvs-"))
      val ops = new Ops(spark, store, 8192)
      val cat = new Catalog(store)
      def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)
      Tables(spark, sfDir, "orders")
        .where(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("price_c"))
        .createOrReplaceTempView("orders_src")
      run("CREATE TABLE orders_g PRIMARY KEY (o_orderkey) AS SELECT * FROM orders_src")
      if (round == 3) { hist.clear(); sampling = true }
      val t0 = System.nanoTime()
      run("CREATE MATERIALIZED VIEW cust_totals AS " +
        "SELECT o_custkey, SUM(price_c) AS total_c, COUNT(*) AS n " +
        "FROM orders_g GROUP BY o_custkey")
      sampling = false
      if (round == 3) {
        println(f"[mvs] CREATE MV wall ${(System.nanoTime() - t0) / 1e6}%7.1f ms")
        import scala.jdk.CollectionConverters._
        hist.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (f, n) =>
          println(f"[mvs] ${n * 5}%6d ms  $f")
        }
      }
    }
    spark.stop()
  }
}
