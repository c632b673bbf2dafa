package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, FsStore, Ops}
import graft.queries.Q._

/** Per-statement wall/jobs/IO profile of the sql_txn bench flow. Run:
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.TxnProfile" */
object TxnProfile {
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
          val desc = Option(s.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("?")
          jobStart.put(s.jobId, (System.nanoTime(),
            s"stages=${s.stageInfos.length} tasks=${s.stageInfos.map(_.numTasks).sum} [$desc]"))
        }
        override def onJobEnd(
            s: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStart.remove(s.jobId)).foreach { case (t0, desc) =>
            println(f"[txnprof-job] ${(System.nanoTime() - t0) / 1e6}%7.0f ms  $desc")
          }
        }
      })

    (1 to 2).foreach { pass =>
      println(s"=== pass $pass ===")
      val store = new FsStore(
        java.nio.file.Files.createTempDirectory("graft-txn-prof-").toString)
      val ops = new Ops(spark, store, 8192)
      val cat = new Catalog(store)
      val sess = new graft.sql.SqlSession(spark, ops, cat)
      def step(label: String)(body: => Unit): Unit = {
        jobs.set(0)
        val t0 = System.nanoTime()
        body
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[txnprof] p$pass $label%-40s ${sec}%6.2f s  jobs=${jobs.get}")
      }
      def run(sql: String) = sess.execute(sql)

      Tables(spark, sfDir, "orders")
        .where(col("o_orderkey") % 4 === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("price_c"))
        .createOrReplaceTempView("orders_txn_src")
      step("CTAS")(run(
        "CREATE TABLE txn_t PRIMARY KEY (o_orderkey) AS SELECT * FROM orders_txn_src"))
      step("BEGIN 1")(run("BEGIN"))
      step("UPDATE all (rolled back)")(run(
        "UPDATE txn_t SET price_c = 0 WHERE o_orderkey >= 0"))
      step("DELETE half (rolled back)")(run(
        "DELETE FROM txn_t WHERE o_orderkey % 2 = 1"))
      step("ROLLBACK")(run("ROLLBACK"))
      step("BEGIN 2")(run("BEGIN"))
      step("UPDATE %16")(run(
        "UPDATE txn_t SET price_c = price_c + 13 WHERE o_orderkey % 16 = 1"))
      step("DELETE %32")(run(
        "DELETE FROM txn_t WHERE o_orderkey % 32 = 9"))
      step("INSERT..SELECT %24")(run(
        "INSERT INTO txn_t SELECT o_orderkey + 70000000, o_custkey, price_c " +
          "FROM txn_t WHERE o_orderkey % 24 = 1"))
      step("COMMIT")(run("COMMIT"))
      step("final SELECT") {
        val Left(out) = run(
          "SELECT o_custkey % 10 AS g, COUNT(*) AS n, SUM(price_c) AS total_c, " +
            "MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k " +
            "FROM txn_t GROUP BY o_custkey % 10 ORDER BY g"): @unchecked
        out.count(): Unit
      }
    }
    spark.stop()
  }
}
