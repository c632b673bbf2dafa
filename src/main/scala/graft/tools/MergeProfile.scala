package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-job breakdown of the two MERGE-bearing bench flows (sql_merge,
  * cdc_apply) — the round-11 splice-route sizing probe: which jobs the
  * envelope-spliced MERGE still runs after the bounded driver-route
  * materialization landed, and what each costs. */
object MergeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
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
            println(f"[mrgprof-job] ${ms}%7.0f ms  $desc")
          }
        }
      })

    graft.sql.GraftSql.stmtProbe = Some { (sql, sec) =>
      println(f"[mrgprof-stmt] ${sec}%6.3f s  ${sql.replaceAll("\\s+", " ").take(90)}")
    }

    // two passes: pass 1 is JIT/codegen warm-up, pass 2 is the signal
    (1 to 2).foreach { pass =>
      println(s"=== pass $pass ===")
      for (q <- Seq("sql_merge", "cdc_apply")) {
        println(s"--- $q")
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val nRows = df.count()
        println(f"[mrgprof] $q%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$nRows")
      }
    }
    spark.stop()
  }
}
