package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Stateful streaming sessionization: sessions close via event-time
  * timeout as the watermark advances; results must match the batch
  * gaps-and-islands computation. */
class SessionizeStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  test("flatMapGroupsWithState sessions match batch gaps-and-islands") {
    val srcDir = Files.createTempDirectory("graft-sess-src-")
    val ckpt = graft.core.FsUtil.tempStoreDir("graft-sess-ckpt-")
    val outDir = graft.core.FsUtil.tempStoreDir("graft-sess-out-")

    // user 1: two sessions (gap > 30 min); user 2: one session
    val batch1 = Seq(
      ("2024-01-01 10:00:00", 1L, 1.00), ("2024-01-01 10:10:00", 1L, 2.00),
      ("2024-01-01 12:00:00", 1L, 4.00), // new session (110-min gap)
      ("2024-01-01 10:05:00", 2L, 8.00))
    // batch 2 advances watermark far enough to close everything
    val batch2 = Seq(("2024-01-02 00:00:00", 99L, 0.01))

    def writeBatch(rows: Seq[(String, Long, Double)], n: Int): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => Row(Timestamp.valueOf(r._1), r._2, r._3)), 2), schema)
        .write.parquet(srcDir.resolve(s"b$n").toString)

    def runOnce(): Unit = {
      val events = spark.readStream.schema(schema)
        .parquet(srcDir.toString + "/b*")
      val q = SessionizeStream.sessions(events)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", outDir)
        .start()
      q.awaitTermination()
    }

    writeBatch(batch1, 1)
    runOnce()
    writeBatch(batch2, 2)
    runOnce()

    val sessions = spark.read.parquet(outDir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("start").toString,
        r.getAs[Timestamp]("end").toString,
        r.getAs[Int]("n_events"), r.getAs[Long]("total_cents")))
      .toSet
    // user 1 session 1: 10:00-10:10, 2 events, 300 cents
    assert(sessions.contains(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2, 300L)))
    // user 1 session 2: single event at 12:00, 400 cents
    assert(sessions.contains(
      (1L, "2024-01-01 12:00:00.0", "2024-01-01 12:00:00.0", 1, 400L)))
    // user 2: single event session
    assert(sessions.contains(
      (2L, "2024-01-01 10:05:00.0", "2024-01-01 10:05:00.0", 1, 800L)))
    assert(sessions.size >= 3)
  }

  test("late in-watermark event forms its own earlier session, not a merge into the open one") {
    val srcDir = Files.createTempDirectory("graft-sess2-src-")
    val ckpt = graft.core.FsUtil.tempStoreDir("graft-sess2-ckpt-")
    val outDir = graft.core.FsUtil.tempStoreDir("graft-sess2-out-")
    def writeBatch(rows: Seq[(String, Long, Double)], n: Int): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => Row(Timestamp.valueOf(r._1), r._2, r._3)), 2), schema)
        .write.parquet(srcDir.resolve(s"b$n").toString)
    def runOnce(): Unit = {
      val q = SessionizeStream.sessions(
          spark.readStream.schema(schema).parquet(srcDir.toString + "/b*"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", outDir)
        .start()
      q.awaitTermination()
    }
    // batch 1 opens a session at 10:00; watermark stays at 09:00
    writeBatch(Seq(("2024-01-01 10:00:00", 1L, 1.00)), 1)
    runOnce()
    // batch 2 delivers a LATE event at 09:05 (inside the 1h watermark,
    // 55 min before the open session — batch semantics: separate session)
    writeBatch(Seq(("2024-01-01 09:05:00", 1L, 2.00)), 2)
    runOnce()
    // batch 3 pushes the watermark past everything to close both
    writeBatch(Seq(("2024-01-02 00:00:00", 99L, 0.01)), 3)
    runOnce()
    val sessions = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("start").toString, r.getAs[Int]("n_events")))
      .filter(_._1 == 1L).toSet
    assert(sessions == Set(
      (1L, "2024-01-01 09:05:00.0", 1),
      (1L, "2024-01-01 10:00:00.0", 1)),
      s"late event must be its own session; got $sessions")
  }

  test("past-watermark straggler is dropped, not re-emitted as a duplicate session") {
    val srcDir = Files.createTempDirectory("graft-sess3-src-")
    val ckpt = graft.core.FsUtil.tempStoreDir("graft-sess3-ckpt-")
    val outDir = graft.core.FsUtil.tempStoreDir("graft-sess3-out-")
    def writeBatch(rows: Seq[(String, Long, Double)], n: Int): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => Row(Timestamp.valueOf(r._1), r._2, r._3)), 2), schema)
        .write.parquet(srcDir.resolve(s"b$n").toString)
    def runOnce(): Unit = {
      val q = SessionizeStream.sessions(
          spark.readStream.schema(schema).parquet(srcDir.toString + "/b*"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", outDir)
        .start()
      q.awaitTermination()
    }
    // batch 1 opens + batch 2 closes user 1's session (watermark → 23:00)
    writeBatch(Seq(("2024-01-01 10:00:00", 1L, 1.00)), 1)
    runOnce()
    writeBatch(Seq(("2024-01-02 00:00:00", 99L, 0.01)), 2)
    runOnce()
    // batch 3 delivers a PAST-WATERMARK straggler inside the already
    // emitted session's interval — must be dropped, not re-opened
    writeBatch(Seq(("2024-01-01 10:01:00", 1L, 5.00)), 3)
    runOnce()
    // batch 4 pushes the watermark further so anything re-opened would emit
    writeBatch(Seq(("2024-01-03 00:00:00", 99L, 0.01)), 4)
    runOnce()
    val user1 = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("start").toString, r.getAs[Int]("n_events")))
      .filter(_._1 == 1L).toSeq
    assert(user1 == Seq((1L, "2024-01-01 10:00:00.0", 1)),
      s"straggler below the watermark must not duplicate the session; got $user1")
  }

  test("below-watermark straggler is dropped even inside a still-open session (Spark pre-filters late rows)") {
    val srcDir = Files.createTempDirectory("graft-sess4-src-")
    val ckpt = graft.core.FsUtil.tempStoreDir("graft-sess4-ckpt-")
    val outDir = graft.core.FsUtil.tempStoreDir("graft-sess4-out-")
    def writeBatch(rows: Seq[(String, Long, Double)], n: Int): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => Row(Timestamp.valueOf(r._1), r._2, r._3)), 2), schema)
        .write.parquet(srcDir.resolve(s"b$n").toString)
    def runOnce(): Unit = {
      val q = SessionizeStream.sessions(
          spark.readStream.schema(schema).parquet(srcDir.toString + "/b*"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", outDir)
        .start()
      q.awaitTermination()
    }
    // batch 1: a LONG open session 09:00..11:45 (every gap < 30 min);
    // watermark advances to 10:45 (max ts - 1h), INSIDE the open interval
    writeBatch(Seq("09:00", "09:25", "09:50", "10:15", "10:40", "11:05",
      "11:30", "11:45").map(t => (s"2024-01-01 $t:00", 1L, 1.00)), 1)
    runOnce()
    // batch 2: straggler at 10:00 — BELOW the 10:45 watermark, inside
    // the open interval. Spark's FlatMapGroupsWithStateExec filters
    // below-watermark rows before the state function runs, so it never
    // arrives: below-watermark divergence from the batch result is the
    // standard streaming contract this pin DOCUMENTS (and the session
    // count must stay exactly one — no duplicate, no partial re-open)
    writeBatch(Seq(("2024-01-01 10:00:00", 1L, 2.00)), 2)
    runOnce()
    // batch 3: close everything
    writeBatch(Seq(("2024-01-02 12:00:00", 99L, 0.01)), 3)
    runOnce()
    val user1 = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("n_events"),
        r.getAs[Long]("total_cents")))
      .filter(_._1 == 1L).toSeq
    assert(user1 == Seq((1L, 8, 800L)),
      s"below-watermark straggler is pre-filtered by the engine; got $user1")
  }
}
