package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal probe: why does one partitionBy parquet write launch two
  * jobs? Prints each job's stages with full stage names. Run:
  * sbt "runMain graft.tools.WriteProbe" */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          println(s"[probe-job] id=${s.jobId} stages=${s.stageInfos.length}")
          s.stageInfos.foreach { st =>
            println(s"  [stage] tasks=${st.numTasks} ${st.name}")
            st.details.linesIterator.take(12).foreach(l => println(s"    $l"))
          }
        }
      })
    import spark.implicits._
    val df = (1 to 100000).toDF("k")
      .withColumn("grp", ($"k" % 3).cast("string"))
      .repartition(4, $"grp")
      .sortWithinPartitions($"grp", $"k")
    val tmp = java.nio.file.Files.createTempDirectory("probe-").toString
    println("=== write starts (thread-local AQE off) ===")
    org.apache.spark.sql.GraftBridge.withConfOverrides(spark,
      Map("spark.sql.adaptive.enabled" -> "false")) {
      df.write.mode("overwrite")
        .option("maxRecordsPerFile", 0)
        .partitionBy("grp").parquet(tmp)
    }
    println("=== write 2 starts (session AQE off) ===")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", 0)
      .partitionBy("grp").parquet(tmp + "2")
    println("=== write done ===")
    spark.stop()
  }
}
