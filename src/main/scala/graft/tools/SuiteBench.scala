package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated timings for the statement-suite driver queries — the
  * fixed-overhead targets. Run:
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.SuiteBench [names...]" */
object SuiteBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "sql_index", "sql_matview_where", "sql_dml", "sql_changes",
      "sql_matview", "sql_matview_join", "sql_merge", "sql_txn",
      "sql_history", "cdc_apply")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
      })
    // warm codegen/JIT once
    try graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    for (round <- 1 to 2; name <- names) {
      jobs.set(0)
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[suite] r$round $name%-20s ${sec}%6.2f s  jobs=${jobs.get}%-4d rows=$n")
    }
    spark.stop()
  }
}
