package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core._

/** Structured Streaming front door: a stream of events becomes an
  * incrementally-maintained canonical table via foreachBatch → the same
  * memoized merge operator used for batch (SURVEY.md §2.6 "Streaming":
  * the reference has none; its incremental story is memoized batch
  * recomputation — this wires Spark's native streaming to that story).
  *
  * Each micro-batch is aggregated to partial per-key aggregates, then
  * merged into the named catalog table with a summing fold — so the
  * catalog table always holds the exact running aggregate, every
  * intermediate version remains addressable by hash, and a crashed job
  * resumes idempotently (merge of an already-applied batch is a no-op
  * memo hit when the batch content is unchanged).
  */
object StreamIngest {

  /** Maintain `tableName` = running (count, value-cents sum) per
    * (day, user_id) from a stream of events rows.
    *
    * When `views` is given, every registered view refreshes after each
    * micro-batch merge — streaming keeps the whole DOWNSTREAM view graph
    * fresh, and each refresh is the memoized O(delta) transform (views
    * over unrelated tables are whole-op memo hits; views over
    * `tableName` recompute only the regions the batch touched). View
    * refresh is idempotent, so a crash-replayed batch re-refreshes to
    * the identical hashes and mints no new roots. */
  def runningDailyAgg(spark: SparkSession, ops: Ops, catalog: Catalog,
      events: DataFrame, tableName: String, checkpointDir: String,
      views: Option[Views] = None): StreamingQuery = {
    val agg = events
      .withWatermark("ts", "1 hour")
    agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(ops, catalog, batch, tableName, checkpointDir, batchId)
        views.foreach(_.refreshAll())
      }
      .start()
  }

  /** The per-batch increment: batch rows → partial aggregate → merge
    * (fold_sum) into the catalog table.
    *
    * Exactly-once on replay: foreachBatch re-delivers a batch (same
    * batchId, same rows) if the job crashes between our catalog commit
    * and the streaming checkpoint commit. A sum fold is NOT idempotent,
    * so the applied result hash is recorded in the memo store under
    * (checkpointDir, tableName, batchId) — the replayed batch finds the
    * marker and only re-points the catalog instead of merging twice
    * (the standard foreachBatch exactly-once pattern). */
  /** Identity of the checkpoint CONTENTS, not its path: Spark writes a
    * fresh query id into <ckpt>/metadata whenever the checkpoint is
    * (re)created, so wiping and recreating a checkpoint at the same
    * path restarts batchIds AND rotates this id — stale replay markers
    * from the old incarnation can then never match. */
  private def checkpointIdentity(checkpointDir: String): String = {
    val p = java.nio.file.Paths.get(checkpointDir, "metadata")
    if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p)
    else checkpointDir
  }

  def mergeBatch(ops: Ops, catalog: Catalog, batch: DataFrame,
      tableName: String, checkpointDir: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val batchKey = Hashing.opHash(Seq(
      "graft-stream-batch-v3", checkpointIdentity(checkpointDir),
      tableName, batchId.toString))
    val merged = ops.store.memoGet(batchKey) match {
      case Some(applied) => TableRef(applied) // replay: already merged
      case None =>
        val delta = batch
          .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
            col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(graft.queries.Q.cents(col("value"))).as("cents"))
        val deltaRef = ops.fromDataFrame(delta, Seq("day", "user_id"),
          FoldSpec.FoldSum)
        val out = catalog.get(tableName) match {
          case Some(existing) => ops.merge(Seq(existing, deltaRef), FoldSpec.FoldSum)
          case None => deltaRef
        }
        ops.store.memoPut(batchKey, out.hash)
        out
    }
    catalog.put(tableName, merged)
    ()
  }
}
