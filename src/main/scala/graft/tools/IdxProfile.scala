package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, FsStore, Ops}
import graft.queries.Q._
import graft.sql.GraftSql

/** Per-statement wall/jobs profile of the sql_index workflow. */
object IdxProfile {
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
            println(f"[idx-job] ${ms}%7.0f ms  $desc")
          }
        }
      })

    for (round <- 1 to 2) {
      val store = new FsStore(
        java.nio.file.Files.createTempDirectory("graft-idx-prof-").toString)
      val ops = new Ops(spark, store, 2048)
      val cat = new Catalog(store)
      def step(label: String)(body: => Unit): Unit = {
        store.stats.reset()
        jobs.set(0)
        val t0 = System.nanoTime()
        body
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[idxprof] r$round $label%-28s ${sec}%6.2f s  jobs=${jobs.get}%-3d " +
          f"chunkSaves=${store.stats.chunkSaves.get}%-4d " +
          f"metaSaves=${store.stats.metaSaves.get}%-4d " +
          f"memoHits=${store.stats.memoHits.get}%-4d " +
          f"memoMisses=${store.stats.memoMisses.get}%-4d")
      }
      def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)

      Tables(spark, sfDir, "orders")
        .where(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("price_c"))
        .createOrReplaceTempView("orders_idx_src")
      step("CTAS")(run(
        "CREATE TABLE orders_ix PRIMARY KEY (o_orderkey) AS SELECT * FROM orders_idx_src"))
      step("CREATE INDEX")(run("CREATE INDEX orders_ix_cust ON orders_ix (o_custkey)"))
      step("INSERT")(run("INSERT INTO orders_ix SELECT o_orderkey + 80000000, 1, price_c + 5 " +
        "FROM orders_ix WHERE o_custkey = 4"))
      step("DELETE")(run("DELETE FROM orders_ix WHERE o_custkey = 1 AND o_orderkey % 4 = 1"))
      step("probe SELECT")(run(
        "SELECT o_orderkey, o_custkey, price_c FROM orders_ix " +
          "WHERE o_custkey IN (1, 4) ORDER BY o_orderkey") match {
        case Left(df) => df.collect(): Unit
        case _ => ()
      })
    }
    spark.stop()
  }
}
