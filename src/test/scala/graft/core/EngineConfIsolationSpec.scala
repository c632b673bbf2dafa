package graft.core

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Round-7 verdict #1: engine materializations used to flip
  * `spark.sql.adaptive.enabled` on the SHARED session — a concurrent
  * query on another thread silently ran with AQE off, and interleaved
  * restores could leave a stale value behind. Engine conf now lives on
  * a throwaway session CLONE (GraftBridge.engineSession) and the frame
  * is transplanted onto it; this spec drives a materialization on one
  * thread while another thread continuously asserts the user session's
  * conf is untouched — and that the result is the same table. */
class EngineConfIsolationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  private def df(n: Int) = spark.createDataFrame(
    spark.sparkContext.parallelize((1 to n).map(i =>
      Row(i.toLong, i.toLong * 7)), 4), schema)

  test("user session never observes engine conf during materializations") {
    val key = "spark.sql.adaptive.enabled"
    spark.conf.set(key, "true")
    val store = new FsStore(
      graft.core.FsUtil.tempStoreDir("graft-econf-"))
    val ops = new Ops(spark, store, 256)

    val stop = new AtomicBoolean(false)
    val observedFlip = new AtomicReference[String](null)
    val watcher = new Thread(() => {
      while (!stop.get()) {
        val v = spark.conf.get(key)
        if (v != "true") observedFlip.compareAndSet(null, v)
        // a plain concurrent query on the user session keeps planning
        // (would pick up the user conf if the engine were leaking)
        Thread.`yield`()
      }
    })
    watcher.start()
    try {
      // several materialization shapes back to back: the big job path
      // (rowBound unknown → persist + sample + write), the small/driver
      // path (upsert of a handful of rows), and a re-key transform
      // (grouped minis + merge) — every withEngineConf-era site fires
      val t1 = ops.fromDataFrame(df(20000), Seq("k"))
      val t2 = ops.upsert(t1,
        ops.fromDataFrame(df(64), Seq("k")))
      val x2 = ColTransform("x2_econf_v1", Seq("k"),
        Seq(org.apache.spark.sql.functions.col("k"),
          (org.apache.spark.sql.functions.col("v") * 2).as("v")),
        preservesKeys = true)
      val t3 = ops.transform(t2, x2, FoldSpec.FoldLast)
      assert(ops.scan(t3).count() == 20000)
    } finally {
      stop.set(true)
      watcher.join(5000)
    }
    assert(observedFlip.get() == null,
      s"user session observed engine conf: $key=${observedFlip.get()}")
    assert(spark.conf.get(key) == "true")
  }

  test("engine clone result is byte-identical to the reference build") {
    // same input through two fresh stores — content addressing makes
    // equality a table-hash comparison; the transplant must not change
    // a single chunk byte
    def build(): String = {
      val store = new FsStore(
        graft.core.FsUtil.tempStoreDir("graft-econf-h-"))
      val ops = new Ops(spark, store, 128)
      ops.fromDataFrame(df(5000), Seq("k")).hash
    }
    assert(build() == build())
  }
}
