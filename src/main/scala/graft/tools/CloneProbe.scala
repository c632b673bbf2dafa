package graft.tools

import org.apache.spark.sql.{GraftBridge, SparkSession}

/** Micro-probe: what does one engineSession clone + transplant cost?
  * Decides whether per-materialization cloning needs a cache. */
object CloneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 1000).toDF("x").selectExpr("x", "x * 2 as y")
    df.count()
    def timeN(label: String, n: Int)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      println(f"[cloneprobe] $label%-28s ${(System.nanoTime() - t0) / 1e6 / n}%8.2f ms/op")
    }
    timeN("cloneSession only", 50) {
      GraftBridge.engineSession(spark): Unit
    }
    timeN("clone + conf.set reads state", 50) {
      val es = GraftBridge.engineSession(spark)
      es.sessionState.conf.numShufflePartitions: Unit
    }
    timeN("clone + transplant", 50) {
      val es = GraftBridge.engineSession(spark)
      GraftBridge.transplant(es, df).queryExecution.analyzed: Unit
    }
    timeN("transplant + full planning", 50) {
      val es = GraftBridge.engineSession(spark)
      GraftBridge.transplant(es, df).queryExecution.executedPlan: Unit
    }
    timeN("conf.getAll snapshot", 200) {
      spark.conf.getAll: Unit
    }
    spark.stop()
  }
}
