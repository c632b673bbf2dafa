package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{Catalog, FsStore, Ops}
import graft.sql.GraftSql
import graft.queries.Q._

/** Job-level breakdown of the canonical bulk-load (CTAS / bulk INSERT)
  * path — the statement shape shared by nearly every sql_* flow. Prints
  * per-job walls (by job description) and the driver-side gap for each
  * repetition, so "where does a 0.8 s CTAS go" is a measurement, not a
  * guess. */
object CtasProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var jobWallNs = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("<none>")
          starts.put(e.jobId, (System.nanoTime(), d)); ()
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.get(e.jobId)).foreach { case (t0, d) =>
            val ns = System.nanoTime() - t0
            jobWallNs += ns
            jobs.add(f"    job ${e.jobId}%3d ${ns / 1e6}%7.1f ms  $d")
          }
          ()
        }
      })
    val li = Tables(spark, sfDir, "lineitem")
    li.cache().count(): Unit

    // A/B variants of the same statement flow: the interpreted-collect
    // crossover (default vs disabled = the pre-change interpreted
    // behavior) and the Spark job route (driver materialize off).
    val variants: Seq[(String, () => Unit, () => Unit)] = Seq(
      ("codegen-collect (new default)", () => (), () => ()),
      ("interpreted-collect (old)",
        () => graft.core.Canonical.InterpretedCollectMaxBytes = Long.MaxValue,
        () => graft.core.Canonical.InterpretedCollectMaxBytes = 16L << 20),
      ("spark-job route",
        () => graft.core.Canonical.driverMaterializeEnabled = false,
        () => graft.core.Canonical.driverMaterializeEnabled = true))

    def flow(label: String)(body: (String => Unit) => Unit): Unit = {
      println(s"== $label")
      (1 to reps).foreach { i =>
        variants.foreach { case (vlabel, set, unset) =>
          val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-prof-"))
          val ops = new Ops(spark, store, 2048)
          val cat = new Catalog(store)
          def run(sql: String): Unit = { GraftSql.execute(spark, ops, cat, sql); () }
          jobs.clear(); jobWallNs = 0L
          set()
          val t0 = System.nanoTime()
          try body(run) finally unset()
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"  rep $i [$vlabel%-28s] wall $wall%6.3f s  jobs-wall ${jobWallNs / 1e9}%6.3f s  driver-gap ${wall - jobWallNs / 1e9}%6.3f s")
          jobs.forEach(println(_))
        }
      }
    }

    // 1. the sql_dml-shaped CTAS: 600k-row lineitem projection, 4-col PK
    li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_returnflag"),
        cents(col("l_extendedprice")).as("price_c"),
        col("l_quantity").cast("long").as("qty"))
      .createOrReplaceTempView("li_src")
    flow("CTAS lineitem-600k (sql_dml shape)") { run =>
      run("CREATE TABLE li PRIMARY KEY (l_orderkey, l_linenumber, " +
        "l_partkey, l_suppkey) AS SELECT * FROM li_src")
    }

    // 2. the retract_dist-shaped INSERT into an empty declared table:
    // 200k-row aggregated source
    Tables(spark, sfDir, "lineitem")
      .where(col("l_orderkey") % 3 === 0)
      .select((col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("lk"),
        col("l_partkey"), cents(col("l_extendedprice")).as("price_c0"))
      .groupBy(col("lk"))
      .agg(max(col("l_partkey")).as("l_partkey"),
        sum(col("price_c0")).as("price_c"))
      .createOrReplaceTempView("li_rd_src")
    flow("INSERT-into-empty agg-200k (retract_dist shape)") { run =>
      run("CREATE TABLE li_rd (lk bigint PRIMARY KEY, " +
        "l_partkey bigint NOT NULL, price_c bigint NOT NULL)")
      run("INSERT INTO li_rd SELECT * FROM li_rd_src")
    }
    spark.stop()
  }
}
