package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core._

/** Structured Streaming → memoized merge: the stream-maintained catalog
  * table must equal the batch recompute over all data (exactly-once
  * materialized view), and each micro-batch only touches the chunks its
  * keys overlap. */
class StreamIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private def writeBatch(dir: java.nio.file.Path, rows: Seq[(String, Long, Double)], n: Int): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(Timestamp.valueOf(r._1), r._2, r._3)), 2), schema)
    df.write.parquet(dir.resolve(s"batch$n").toString)
  }

  test("stream AvailableNow over growing dir maintains exact running aggregate") {
    val srcDir = Files.createTempDirectory("graft-stream-src-")
    val ckpt = graft.core.FsUtil.tempStoreDir("graft-stream-ckpt-")
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-stream-store-"))
    val ops = new Ops(spark, store, 64)
    val catalog = new Catalog(store)

    val batch1 = Seq(
      ("2024-01-01 10:00:00", 1L, 10.50), ("2024-01-01 11:00:00", 1L, 2.25),
      ("2024-01-01 10:30:00", 2L, 5.00), ("2024-01-02 09:00:00", 1L, 1.00))
    val batch2 = Seq(
      ("2024-01-01 12:00:00", 1L, 4.25), // same (day,user) as batch1 → fold
      ("2024-01-02 10:00:00", 3L, 7.77)) // new key

    def runOnce(): Unit = {
      val events = spark.readStream.schema(schema)
        .parquet(srcDir.toString + "/batch*")
      val q = StreamIngest.runningDailyAgg(spark, ops, catalog, events,
        "daily_agg", ckpt)
      q.awaitTermination()
    }

    writeBatch(srcDir, batch1, 1)
    runOnce()
    val after1 = ops.scan(catalog.get("daily_agg").get).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(after1(("2024-01-01", 1L)) == (2L, 1275L))
    assert(after1(("2024-01-01", 2L)) == (1L, 500L))
    assert(after1(("2024-01-02", 1L)) == (1L, 100L))

    writeBatch(srcDir, batch2, 2)
    runOnce() // same checkpoint: processes ONLY the new files
    val after2 = ops.scan(catalog.get("daily_agg").get).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(after2(("2024-01-01", 1L)) == (3L, 1700L), "incremental fold")
    assert(after2(("2024-01-02", 3L)) == (1L, 777L), "new key")
    assert(after2.size == 4)

    // equals batch recompute over everything (exactly-once view)
    val allRows = batch1 ++ batch2
    val model = allRows.groupBy(r => (r._1.substring(0, 10), r._2))
      .view.mapValues(rs => (rs.size.toLong,
        rs.map(r => math.round(r._3 * 100)).sum)).toMap
    assert(after2 == model)
  }

  test("native streaming windowed agg equals the batch windowed agg") {
    val srcDir = Files.createTempDirectory("graft-swin-src-")
    val rows = Seq(
      ("2024-01-01 10:05:00", 1L, 10.00), ("2024-01-01 10:55:00", 2L, 5.50),
      ("2024-01-01 11:05:00", 1L, 2.25), ("2024-01-01 12:30:00", 3L, 7.00))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(Timestamp.valueOf(r._1), r._2, r._3)), 2), schema)
      .write.parquet(srcDir.resolve("b1").toString)
    // batch ground truth through the same operator (user_id plays the
    // event_type role in this 3-column schema)
    val batchDf = spark.read.schema(schema).parquet(srcDir.toString + "/b*")
      .withColumnRenamed("user_id", "event_type")
    val want = StreamWindow.tumblingCounts(batchDf).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq

    val q = StreamWindow.tumblingCounts(
        spark.readStream.schema(schema).parquet(srcDir.toString + "/b*")
          .withColumnRenamed("user_id", "event_type"))
      .writeStream.format("memory").queryName("swin")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("swin").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(got == want, "stream windowed agg must equal batch")
    assert(got.map(_._1).distinct.size == 3, "three hourly windows")
  }

  test("streaming dedup drops in-horizon redeliveries; state is watermark-bounded") {
    val schemaD = StructType(Seq(
      StructField("ts", TimestampType, nullable = false),
      StructField("event_id", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    val srcDir = Files.createTempDirectory("graft-sdedup-src-")
    val rows = Seq(
      ("2024-01-01 10:00:00", 1L, 1.0),
      ("2024-01-01 10:05:00", 1L, 1.0), // redelivery of event 1
      ("2024-01-01 10:10:00", 2L, 2.0),
      ("2024-01-01 10:10:00", 2L, 2.0), // same-batch duplicate
      ("2024-01-01 11:00:00", 3L, 3.0))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(Timestamp.valueOf(r._1), r._2, r._3)), 2), schemaD)
      .write.parquet(srcDir.resolve("b1").toString)

    val out = graft.core.FsUtil.tempStoreDir("graft-sdedup-out-")
    val q = StreamDedup.dedupEvents(
        spark.readStream.schema(schemaD).parquet(srcDir.toString + "/b*"))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation",
        graft.core.FsUtil.tempStoreDir("graft-sdedup-ckpt-"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ids = spark.read.parquet(out).collect().map(_.getAs[Long]("event_id")).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), "one row per event_id")
  }

  test("streaming keeps registered aggregate views fresh; refresh work is memoized O(delta)") {
    import org.apache.spark.sql.functions._
    val srcDir = Files.createTempDirectory("graft-sview-src-")
    val ckpt = graft.core.FsUtil.tempStoreDir("graft-sview-ckpt-")
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-sview-store-"))
    val ops = new Ops(spark, store, 64)
    val catalog = new Catalog(store)
    val views = new Views(ops, catalog)

    val batch1 = Seq(
      ("2024-01-01 10:00:00", 1L, 10.50), ("2024-01-01 11:00:00", 1L, 2.25),
      ("2024-01-01 10:30:00", 2L, 5.00), ("2024-01-02 09:00:00", 1L, 1.00))
    val batch2 = Seq(
      ("2024-01-01 12:00:00", 1L, 4.25),
      ("2024-01-02 10:00:00", 3L, 7.77))

    def runOnce(v: Option[Views]): Unit = {
      val events = spark.readStream.schema(schema)
        .parquet(srcDir.toString + "/batch*")
      val q = StreamIngest.runningDailyAgg(spark, ops, catalog, events,
        "daily_agg", ckpt, v)
      q.awaitTermination()
    }

    writeBatch(srcDir, batch1, 1)
    runOnce(None)
    // a RE-KEYING aggregate view over the stream-maintained table:
    // per-user totals across days (user_totals = sum over the day axis)
    val userTotals = graft.core.ColTransform("user_totals_v1", Seq("uid"),
      Seq(col("user_id").as("uid"), col("n"), col("cents")))
    views.define("user_totals", "daily_agg", userTotals, FoldSpec.FoldSum)
    // ...and a JOIN view pairing the totals with a static user dim —
    // the chained shape (join-over-transform) the stream must keep fresh
    val dimSchema = StructType(Seq(
      StructField("uid", LongType, nullable = false),
      StructField("segment", StringType, nullable = false)))
    catalog.put("user_dim", ops.fromDataFrame(
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(1L, "a"), Row(3L, "b")), 2),
        dimSchema), Seq("uid")))
    views.defineJoin("user_join", "user_totals", "user_dim")

    writeBatch(srcDir, batch2, 2)
    runOnce(Some(views)) // foreachBatch merges AND refreshes the views

    val all = batch1 ++ batch2
    val model = all.groupBy(_._2).view.mapValues(rs =>
      (rs.size.toLong, rs.map(r => math.round(r._3 * 100)).sum)).toMap
    val got = ops.scan(catalog.get("user_totals").get).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == model, "view after streamed batches must equal batch recompute")
    // the join view saw batch2's totals (dependency-ordered refresh) and
    // keeps full-outer semantics (user 2: no dim; user 3: dim, data)
    val j = ops.scan(catalog.get("user_join").get).collect()
      .map(r => r.getLong(0) -> (
        (if (r.isNullAt(2)) None else Some(r.getLong(2))),
        (if (r.isNullAt(3)) None else Some(r.getString(3))))).toMap
    assert(j.keySet == model.keySet ++ Set(1L, 3L))
    assert(j(1L) == (Some(model(1L)._2), Some("a")),
      "join view missed the streamed delta")
    assert(j(2L)._2.isEmpty && j(3L)._2 == Some("b"))

    // the streamed refresh was memoized work, and a re-refresh with no
    // new data is a whole-op memo hit with zero writes and no new root
    val rootBefore = store.currentRootHash
    store.stats.reset()
    views.refreshAll()
    assert(store.stats.snapshot("chunkSaves") == 0, "idle refresh did work")
    assert(store.stats.snapshot("memoHits") >= 1)
    assert(store.currentRootHash == rootBefore, "idle refresh minted a root")
  }

  test("streaming keeps SQL-defined materialized views fresh (defs rebuilt from the root)") {
    val srcDir = Files.createTempDirectory("graft-sqlmv-src-")
    val ckpt = graft.core.FsUtil.tempStoreDir("graft-sqlmv-ckpt-")
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-sqlmv-store-"))
    val ops = new Ops(spark, store, 64)
    val catalog = new Catalog(store)
    def sql(s: String) = graft.sql.GraftSql.execute(spark, ops, catalog, s)

    val batch1 = Seq(
      ("2024-01-01 10:00:00", 1L, 10.50), ("2024-01-01 11:00:00", 1L, 2.25),
      ("2024-01-01 10:30:00", 2L, 5.00), ("2024-01-02 09:00:00", 1L, 1.00))
    val batch2 = Seq(
      ("2024-01-01 12:00:00", 1L, 4.25),
      ("2024-01-02 10:00:00", 3L, 7.77))

    def runOnce(v: Option[Views]): Unit = {
      val events = spark.readStream.schema(schema)
        .parquet(srcDir.toString + "/batch*")
      val q = StreamIngest.runningDailyAgg(spark, ops, catalog, events,
        "daily_agg", ckpt, v)
      q.awaitTermination()
    }

    writeBatch(srcDir, batch1, 1)
    runOnce(None)
    // the views are defined in SQL (defs persist in the ROOT): a mixed-
    // fold aggregate over the stream-maintained table, and a filtered
    // key-preserving projection — both round-5 MV shapes under streaming
    sql("CREATE MATERIALIZED VIEW stream_totals AS " +
      "SELECT user_id AS uid, SUM(cents) AS cents, COUNT(*) AS days, " +
      "MAX(cents) AS best FROM daily_agg GROUP BY uid")
    sql("CREATE MATERIALIZED VIEW big_days AS " +
      "SELECT day, user_id, cents FROM daily_agg WHERE cents >= 500")

    // a FRESH session rebuilds the registry from the persisted SQL alone
    val views = graft.sql.SqlViews.fromCatalog(ops, new Catalog(store))
    writeBatch(srcDir, batch2, 2)
    runOnce(Some(views))

    val all = batch1 ++ batch2
    val daily = all.groupBy(r => (r._1.take(10), r._2)).view
      .mapValues(rs => rs.map(r => math.round(r._3 * 100)).sum).toMap
    val model = daily.groupBy(_._1._2).map { case (u, m) =>
      u -> ((m.values.sum, m.size.toLong, m.values.max)) }
    val got = ops.scan(catalog.get("stream_totals").get).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == model,
      "SQL materialized view after streamed batches must equal batch recompute")
    val bigGot = ops.scan(catalog.get("big_days").get).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val bigWant = daily.collect { case ((d, u), c) if c >= 500 => (d, u, c) }.toSet
    assert(bigGot == bigWant, "filtered SQL view missed the streamed delta")
  }

  test("batch replay is idempotent: same batchId merged twice applies once") {
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-replay-store-"))
    val ops = new Ops(spark, store, 64)
    val catalog = new Catalog(store)
    val rows = Seq(("2024-03-01 10:00:00", 1L, 10.00), ("2024-03-01 11:00:00", 1L, 5.00))
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(Timestamp.valueOf(r._1), r._2, r._3)), 2), schema)

    StreamIngest.mergeBatch(ops, catalog, batch, "t", "ckpt-A", batchId = 0L)
    val once = ops.scan(catalog.get("t").get).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(once(("2024-03-01", 1L)) == (2L, 1500L))

    // crash-replay of the SAME batch: foreachBatch re-delivers (ckpt, id)
    StreamIngest.mergeBatch(ops, catalog, batch, "t", "ckpt-A", batchId = 0L)
    val twice = ops.scan(catalog.get("t").get).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(twice == once, "sum fold must not double-count on replay")

    // a genuinely new batch (next id) still merges
    StreamIngest.mergeBatch(ops, catalog, batch, "t", "ckpt-A", batchId = 1L)
    val next = ops.scan(catalog.get("t").get).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(next(("2024-03-01", 1L)) == (4L, 3000L))
  }
}
