package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core._
import graft.operators.IncrementalDedup

/** Step profile of the dedup_incremental_patch flow (where do its bench
  * seconds go — build files vs patch vs readback join?). */
object IncdPatchProfile {
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
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (sys.env.contains("INCDP_JOBS")) {
            val desc = Option(s.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse("?")
            val names = s.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
            println(s"[incdp-job] [$desc] ${names.mkString(" | ")}")
          }
        }
      })
    for (round <- 1 to 2) {
      val store = new FsStore(
        java.nio.file.Files.createTempDirectory("graft-incdpp-").toString)
      def step[T](label: String)(body: => T): T = {
        jobs.set(0)
        store.stats.reset()
        val t0 = System.nanoTime()
        val r = body
        println(f"[incdp] r$round $label%-18s ${(System.nanoTime()-t0)/1e9}%6.2f s " +
          f"jobs=${jobs.get}%-3d saves=${store.stats.snapshot("chunkSaves")}")
        r
      }
      val docs = Tables(spark, sfDir, "documents")
        .where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      val target = math.max(16L, nDocs / 24L)
      println(s"[incdp] r$round nDocs=$nDocs target=$target")
      val ops = new Ops(spark, store, target)
      val cat = new Catalog(store)
      val views = new Views(ops, cat)
      val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
      step("load initial")(cat.put("docs", ops.fromDataFrame(
        docs.where(col("doc_id") < maxId), Seq("doc_id"))))
      IncrementalDedup.declareIndex(views, "shingle_idx", "docs", indexTarget = Some(256L))
      step("build index")(views.refresh("shingle_idx"))
      println(s"[incdp] r$round idxChunks=" +
        ops.meta(TableRef(cat.root("shingle_idx").tableHash)).chunks.length)
      step("ingest 1 doc")(cat.put("docs", ops.upsert(
        TableRef(cat.root("docs").tableHash),
        ops.fromDataFrame(docs.where(col("doc_id") === maxId), Seq("doc_id")))))
      step("patch refresh")(views.refresh("shingle_idx"))
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
      println(s"[incdp] pairs=$n")
    }
    spark.stop()
  }
}
