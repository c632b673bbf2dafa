package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core._

/** CDC apply (StreamCdc): a stream of I/U/D change events keeps a
  * catalog table equal to replaying the change log in order; crash
  * replay of a delivered batch is exactly-once via the marker memo. */
class StreamCdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cdcSchema = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = true),
    StructField("s", StringType, nullable = true)))

  private def writeBatch(dir: java.nio.file.Path,
      rows: Seq[(String, Long, Long, Long, String)], n: Int): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(r._1, r._2, r._3, r._4, r._5)), 2), cdcSchema)
    df.write.parquet(dir.resolve(s"batch$n").toString)
  }

  test("I/U/D micro-batches replay the change log exactly; replay is exactly-once") {
    val srcDir = Files.createTempDirectory("graft-cdc-src-")
    val ckpt = graft.core.FsUtil.tempStoreDir("graft-cdc-ckpt-")
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-cdc-store-"))
    val ops = new Ops(spark, store, 64)
    val catalog = new Catalog(store)
    def run(sql: String) = graft.sql.GraftSql.execute(spark, ops, catalog, sql)
    run("CREATE TABLE mirror (k bigint PRIMARY KEY, v bigint, s text)")
    run("INSERT INTO mirror SELECT id, id, 'init' FROM range(0, 10)")

    // batch 1: insert-then-update of a NEW key inside one batch (last
    // seq wins → lands as one INSERT), update, delete, delete-of-absent
    val batch1 = Seq(
      ("I", 1L, 10L, 100L, "i10"),
      ("U", 2L, 1L, 11L, "u1"),
      ("D", 3L, 2L, 0L, ""),
      ("U", 4L, 10L, 101L, "u10"), // same key as the insert, later seq
      ("D", 5L, 99L, 0L, ""))      // absent key: no-op
    // batch 2: re-insert after delete, update, delete of batch-1 insert
    val batch2 = Seq(
      ("I", 6L, 2L, 22L, "r2"),
      ("U", 7L, 3L, 33L, "u3"),
      ("D", 8L, 10L, 0L, ""))

    def runOnce(): Unit = {
      val changes = spark.readStream.schema(cdcSchema)
        .parquet(srcDir.toString + "/batch*")
      val q = StreamCdc.applyStream(spark, ops, catalog, changes,
        "mirror", "op", "seq", ckpt)
      q.awaitTermination()
    }

    writeBatch(srcDir, batch1, 1)
    runOnce()
    val after1 = ops.scanOrdered(catalog.get("mirror").get).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(after1(10L) == (101L, "u10"), "in-batch insert+update lands once, updated")
    assert(after1(1L) == (11L, "u1"))
    assert(!after1.contains(2L), "deleted key gone")
    assert(after1.size == 10)

    writeBatch(srcDir, batch2, 2)
    runOnce()
    val after2 = ops.scanOrdered(catalog.get("mirror").get).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(after2(2L) == (22L, "r2"), "re-insert after delete")
    assert(after2(3L) == (33L, "u3"))
    assert(!after2.contains(10L), "batch-2 delete of batch-1 insert")
    assert(after2.size == 10)
    // untouched keys keep their seed values
    (4L until 10L).foreach(k => assert(after2(k) == (k, "init")))

    // exactly-once: re-delivering an applied batch is a marker hit —
    // no chunk writes, table content unchanged
    val hashBefore = catalog.root("mirror").tableHash
    val replayDf = spark.createDataFrame(
      spark.sparkContext.parallelize(batch2.map(r =>
        Row(r._1, r._2, r._3, r._4, r._5)), 2), cdcSchema)
    ops.store.stats.reset()
    StreamCdc.applyBatch(spark, ops, catalog, replayDf, "mirror",
      "op", "seq", ckpt, batchId = 1)
    assert(catalog.root("mirror").tableHash == hashBefore,
      "replayed batch must not change table content")
    assert(ops.store.stats.snapshot("chunkSaves") == 0,
      "replayed batch must write no chunks")
  }
}
