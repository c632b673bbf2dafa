package graft.core

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The classic 100x scale-up killer for re-keying aggregation is a
  * zipfian group key: if raw rows hash-shuffled on the output key, the
  * hot key's entire row set would land on ONE reduce task. For
  * combinable folds the engine's re-key lowers to Spark's native
  * aggregates (FoldSpec.aggs — sum/min/max/bit_*), which plan as
  * partial-aggregate → exchange → final-aggregate: every map task
  * collapses the hot key to AT MOST ONE partial row before the shuffle
  * — exactly the salted two-phase fold, with the map task as the salt.
  * This spec PROVES it on a skewed fixture by measuring actual shuffle
  * traffic: a 4:1-hot-key re-key transform must move orders of
  * magnitude fewer records through the exchange than it reads. */
class SkewFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Total + max-per-task shuffle-READ records across every task that
    * completes while `body` runs — reduce-side volume, the quantity a
    * hot key would blow up. */
  private def shuffleRead[T](body: => T): (T, Long, Long) = {
    val total = new AtomicLong; val maxTask = new AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val r = m.shuffleReadMetrics.recordsRead
          total.addAndGet(r)
          maxTask.getAndUpdate(x => math.max(x, r)): Unit
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      Thread.sleep(300) // listener events are async — settle
      (r, total.get, maxTask.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("zipf re-key fold pre-aggregates map-side: hot key never ships raw rows") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("g", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val n = 200000
    // zipf-ish: half of all rows land on group 0, the rest spread over 63
    val rows = (0 until n).map { i =>
      val g = if (i % 2 == 0) 0L else 1L + (i % 63)
      Row(i.toLong, g, (i % 1000).toLong)
    }
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-skew-"))
    val ops = new Ops(spark, store, 4096)
    val base = ops.fromDataFrame(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 8), schema),
      Seq("id"))

    val rekey = ColTransform("skew_rekey_sum_v1", Seq("g"),
      Seq(col("g"), col("v")), preservesKeys = false)
    val (out, total, maxTask) = shuffleRead {
      ops.transform(base, rekey, FoldSpec.FoldSum)
    }

    // correctness: matches a driver-side fold
    val want = rows.groupBy(_.getLong(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val got = ops.scan(out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)

    // scale: every exchange carried PARTIAL rows — bounded by
    // (source chunks x distinct keys) on the per-chunk-mini path, by
    // (map tasks x distinct keys) on the direct path — never the hot
    // key's 100k raw rows. Budget: ~3 small exchanges of partials
    // (fold, grouped write, mini merge) stays an order of magnitude
    // under the raw count; a raw-row shuffle would read ~n.
    assert(total < n / 10,
      s"shuffle moved $total records for a $n-row re-key — partial " +
        "aggregation is not collapsing the hot key map-side")
    assert(maxTask < n / 40,
      s"one reduce task read $maxTask records — hot-key rows are " +
        "reaching a single task")
  }
}
