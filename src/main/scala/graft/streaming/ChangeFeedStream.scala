package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core._

/** Change-feed SOURCE: subscribe to a catalog table's row-level changes
  * as a micro-batch stream — the read-side complement of [[StreamCdc]]
  * (which APPLIES a change stream). Together they close the streaming
  * replication loop: follow(src) |> apply(dst) keeps a replica
  * converged to the source, version by version.
  *
  * There is no log to tail — the root CHAIN is the log. Each trigger
  * compares the last-served version (the cursor) with the current one
  * and serves `Ops.changes` between them: full rows tagged
  * `_change_type` ∈ insert|delete|update_preimage|update_postimage,
  * computed reading ONLY chunks the two versions do not share (the
  * structural-sharing diff economics — a poll that finds nothing new
  * reads nothing at all, so tight poll intervals are free).
  *
  * Exactly-once feed DELIVERY via cursor memos in the store, the same
  * marker discipline as [[StreamIngest]]: batch b serves the interval
  * (cursor(b−1), cursor(b)], where cursor(b) pins to the table's
  * current version the first time b runs. A crash-replayed batch finds
  * its cursor already pinned and re-serves the IDENTICAL interval —
  * deterministic replay; consumer side effects get the standard
  * foreachBatch at-least-once contract with replay-identical input.
  *
  * The clock is Spark's rate source (one row per trigger tick, rows
  * discarded) — the feed needs a trigger, not data, and this keeps the
  * whole pipeline inside Structured Streaming's checkpoint/trigger
  * machinery without a custom DataSource V2.
  */
object ChangeFeedStream {

  /** Follow `tableName`'s change feed from the table's CURRENT version
    * (or `startRoot`); `consume` runs once per trigger with that tick's
    * change rows (possibly empty) and the batch id — replay-stable, so
    * it can key consumer-side idempotence markers. */
  def follow(spark: SparkSession, ops: Ops, catalog: Catalog,
      tableName: String, checkpointDir: String,
      startRoot: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow())(
      consume: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        serveBatch(spark, ops, catalog, tableName, checkpointDir, startRoot,
          batchId, consume)
      }
      .start()

  private def checkpointIdentity(checkpointDir: String): String = {
    val p = java.nio.file.Paths.get(checkpointDir, "metadata")
    if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p)
    else checkpointDir
  }

  private def cursorKey(identity: String, table: String, b: Long): String =
    Hashing.opHash(Seq("graft-feed-cursor-v1", identity, table, b.toString))

  /** The table hash `tableName` had at root `rootHash` (None when the
    * table does not exist in that version). */
  private def hashAt(catalog: Catalog, rootHash: String,
      tableName: String): Option[String] =
    catalog.rootAt(rootHash).get(tableName).map(_.tableHash)

  def serveBatch(spark: SparkSession, ops: Ops, catalog: Catalog,
      tableName: String, checkpointDir: String, startRoot: Option[String],
      batchId: Long, consume: (DataFrame, Long) => Unit): Unit = {
    val id = checkpointIdentity(checkpointDir)
    val store = ops.store
    // the stream's origin version pins ONCE (write-once memo): replays
    // and later batches all measure from the same recorded chain
    val startKey = cursorKey(id, tableName, -1L)
    val from: String = (if (batchId == 0) None
      else store.memoGet(cursorKey(id, tableName, batchId - 1))).getOrElse {
        store.memoGet(startKey).getOrElse {
          val s = startRoot.orElse(store.currentRootHash).getOrElse(
            sys.error(s"change feed over an empty store: $tableName"))
          store.memoPut(startKey, s)
          s
        }
      }
    // replay pins to the SAME upper bound; first run pins to current
    val key = cursorKey(id, tableName, batchId)
    val to: String = store.memoGet(key).getOrElse(
      store.currentRootHash.getOrElse(from))
    val (oldHash, newHash) = (hashAt(catalog, from, tableName),
      hashAt(catalog, to, tableName))
    val feed: DataFrame = (oldHash, newHash) match {
      case (Some(a), Some(b)) if a != b =>
        ops.changes(TableRef(a), TableRef(b))
      case (None, Some(b)) => // table born inside the interval: all inserts
        ops.scan(TableRef(b)).withColumn("_change_type", lit("insert"))
      case (Some(a), None) => // table dropped: all deletes
        ops.scan(TableRef(a)).withColumn("_change_type", lit("delete"))
      case _ =>
        val schema = (oldHash orElse newHash)
          .map(h => ops.meta(TableRef(h)).schema)
          .map(s => s.add("_change_type", "string"))
          .getOrElse(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("_change_type",
              org.apache.spark.sql.types.StringType))))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    // pin the upper bound BEFORE delivery: a crash after consume's side
    // effects but before the pin would otherwise let the replay compute
    // a WIDER interval from an advanced root — and a consumer-side
    // idempotence marker keyed on batchId would then silently skip the
    // widened part. Pinning first makes replays interval-identical.
    if (store.memoGet(key).isEmpty) store.memoPut(key, to)
    consume(feed, batchId)
    ()
  }

  /** The streaming replication loop in one call: follow `srcTable`'s
    * feed and CDC-apply every tick to `dstTable` (which must exist,
    * e.g. created by `CLONE TABLE`). Update preimages are dropped;
    * insert/update_postimage/delete map to I/U/D. After the stream
    * drains, dst's table hash equals src's — convergence is pinned in
    * `ChangeFeedStreamSpec`. */
  def mirror(spark: SparkSession, ops: Ops, catalog: Catalog,
      srcTable: String, dstTable: String, checkpointDir: String,
      startRoot: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    follow(spark, ops, catalog, srcTable, checkpointDir, startRoot,
      trigger) { (feed, batchId) =>
      val events = feed
        .where(col("_change_type") =!= "update_preimage")
        .withColumn("__op",
          when(col("_change_type") === "delete", "D")
            .when(col("_change_type") === "insert", "I")
            .otherwise("U"))
        .drop("_change_type")
        .withColumn("__seq", lit(0L))
      if (!events.isEmpty)
        // feed batches are replay-identical, so the feed's batch id is
        // the apply marker's idempotence key too
        StreamCdc.applyBatch(spark, ops, catalog, events, dstTable,
          "__op", "__seq", checkpointDir + "-apply", batchId)
    }
}
