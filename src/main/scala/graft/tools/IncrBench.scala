package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._

/** Measures the incremental-refresh advantage at bench scale: build a
  * lineitem-sized keyed table plus a re-keying aggregate view, upsert a
  * tiny delta, and time the memoized view refresh against a cold
  * from-scratch rebuild of the same content. The numbers back SCALE.md's
  * O(delta) claims with wall-clock instead of chunk counters.
  *
  * Usage: runMain graft.tools.IncrBench [sfDir] (default sf0.1)
  */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // 8192-row chunks so the table spans enough chunks for region
    // memoization to matter (the default 2^20 target would put all of
    // sf0.1 in one chunk and trivialize the measurement)
    val store = new FsStore(Files.createTempDirectory("graft-incr-").toString)
    val ops = new Ops(spark, store, 8192)
    val cat = new Catalog(store)
    val views = new Views(ops, cat)

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber",
        round($"l_quantity" * 100).cast("long").as("qty_c"),
        round($"l_extendedprice" * 100).cast("long").as("price_c"))
    val (base, tIngest) = timed {
      cat.put("lineitem", ops.fromDataFrame(li, Seq("l_orderkey", "l_linenumber")))
      cat.get("lineitem").get
    }
    val nRows = ops.rowCount(base)
    val nChunks = ops.meta(base).chunks.length

    // re-keying aggregate view: per-order totals (the incremental path)
    val perOrder = ColTransform("incrbench_order_totals_v1", Seq("l_orderkey"),
      Seq(col("l_orderkey"), col("qty_c"), col("price_c")))
    val (_, tViewBuild) = timed {
      views.define("order_totals", "lineitem", perOrder, FoldSpec.FoldSum)
    }

    // 1-row upsert, then refresh the aggregate view
    val delta = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(42L, 99, 100L, 100L)), 1),
      StructType(Seq(
        StructField("l_orderkey", LongType, nullable = false),
        StructField("l_linenumber", IntegerType, nullable = false),
        StructField("qty_c", LongType, nullable = false),
        StructField("price_c", LongType, nullable = false))))
    val (_, tUpsert) = timed {
      cat.put("lineitem", ops.upsert(cat.get("lineitem").get,
        ops.fromDataFrame(delta, Seq("l_orderkey", "l_linenumber"))))
    }
    val (refreshed, tRefresh) = timed { views.refresh("order_totals") }

    // cold rebuild of the SAME view content in a fresh store
    val store2 = new FsStore(Files.createTempDirectory("graft-incr2-").toString)
    val ops2 = new Ops(spark, store2, 8192)
    val (rebuilt, tRebuild) = timed {
      val src = ops2.fromDataFrame(ops.scan(cat.get("lineitem").get),
        Seq("l_orderkey", "l_linenumber"))
      ops2.transform(src, perOrder, FoldSpec.FoldSum)
    }
    val same = refreshed.hash == rebuilt.hash

    println(f"[incrbench] rows=$nRows chunks=$nChunks " +
      f"ingest=$tIngest%.1fs viewBuild=$tViewBuild%.1fs " +
      f"upsert1row=$tUpsert%.2fs refresh=$tRefresh%.2fs " +
      f"rebuild=$tRebuild%.1fs speedup=${tRebuild / tRefresh}%.0fx hashEqual=$same")
    spark.stop()
  }
}
