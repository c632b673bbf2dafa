package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core._
import graft.operators.IncrementalDedup

/** Step profile of the dedup_incremental flow over the SAME even-ids
  * corpus slice and chunk targets as the bench query, with a per-JOB
  * wall breakdown — how much of each step is Spark jobs vs driver-side
  * work (planning, minis, chunk IO). Run:
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.IncdProfile" */
object IncdProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobWall = new java.util.concurrent.atomic.AtomicLong
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
            s"tasks=${s.stageInfos.map(_.numTasks).sum} [$desc]"))
        }
        override def onJobEnd(
            s: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStart.remove(s.jobId)).foreach { case (t0, desc) =>
            val ms = (System.nanoTime() - t0) / 1e6
            jobWall.addAndGet(ms.toLong)
            println(f"[incd-job] ${ms}%7.0f ms  $desc")
          }
        }
      })
    for (round <- 1 to 2) {
      val store = new FsStore(
        java.nio.file.Files.createTempDirectory("graft-incdp-").toString)
      val ops = new Ops(spark, store, 512)
      val cat = new Catalog(store)
      val views = new Views(ops, cat)
      def step[T](label: String)(body: => T): T = {
        jobs.set(0); jobWall.set(0); store.stats.reset()
        val t0 = System.nanoTime()
        val r = body
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[incd] r$round $label%-16s ${sec}%6.2f s jobs=${jobs.get} " +
          f"jobWall=${jobWall.get / 1000.0}%5.2f s " +
          f"saves=${store.stats.chunkSaves.get} " +
          f"memoMiss=${store.stats.memoMisses.get}")
        r
      }
      val docs = Tables(spark, sfDir, "documents")
        .where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"))
      val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
      val cutoff = 9L * maxId / 10L
      step("load initial")(cat.put("docs", ops.fromDataFrame(
        docs.where(col("doc_id") <= cutoff), Seq("doc_id"))))
      IncrementalDedup.declareIndex(views, "shingle_idx", "docs",
        indexTarget = Some(8192L))
      step("build index")(views.refresh("shingle_idx"))
      step("ingest tail")(cat.put("docs", ops.upsert(
        TableRef(cat.root("docs").tableHash),
        ops.fromDataFrame(docs.where(col("doc_id") > cutoff), Seq("doc_id")))))
      step("refresh index")(views.refresh("shingle_idx"))
    }
    spark.stop()
  }
}
