package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core._
import graft.operators.IncrementalDedup

/** Step profile of the dedup_incremental flow. */
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
      })
    for (round <- 1 to 2) {
      def step[T](label: String)(body: => T): T = {
        jobs.set(0)
        val t0 = System.nanoTime()
        val r = body
        println(f"[incd] r$round $label%-22s ${(System.nanoTime()-t0)/1e9}%6.2f s jobs=${jobs.get}")
        r
      }
      val store = new FsStore(
        java.nio.file.Files.createTempDirectory("graft-incdp-").toString)
      val ops = new Ops(spark, store, 512)
      val cat = new Catalog(store)
      val views = new Views(ops, cat)
      val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
      val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
      val cutoff = 9L * maxId / 10L
      step("load initial")(cat.put("docs", ops.fromDataFrame(
        docs.where(col("doc_id") <= cutoff), Seq("doc_id"))))
      IncrementalDedup.declareIndex(views, "shingle_idx", "docs")
      step("build index")(views.refresh("shingle_idx"))
      step("ingest tail")(cat.put("docs", ops.upsert(
        TableRef(cat.root("docs").tableHash),
        ops.fromDataFrame(docs.where(col("doc_id") > cutoff), Seq("doc_id")))))
      step("refresh index")(views.refresh("shingle_idx"))
      val n = step("pairs join") {
        import spark.implicits._
        val idx = ops.scan(TableRef(cat.root("shingle_idx").tableHash))
          .select($"s", $"doc_id")
        val sz = idx.groupBy($"doc_id").agg(count(lit(1)).as("n"))
        val sized = idx.join(sz, "doc_id")
        sized.as("a").join(sized.as("b"),
            $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
          .groupBy($"a.doc_id".as("i"), $"b.doc_id".as("j"))
          .agg(count(lit(1)).as("c"),
            max($"a.n").as("n_i"), max($"b.n").as("n_j"))
          .where(lit(10) * $"c" >= lit(5) * ($"n_i" + $"n_j" - $"c"))
          .count()
      }
      println(s"[incd] pairs=$n")
    }
    spark.stop()
  }
}
