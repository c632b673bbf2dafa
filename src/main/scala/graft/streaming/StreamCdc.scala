package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core._
import graft.sql.GraftSql

/** Change-data-capture APPLY: a stream of row-level change events
  * (op ∈ I/U/D, the target's key columns, the target's value columns, a
  * per-key ordering column) keeps a catalog table in sync with its
  * source-of-truth — the standard lakehouse CDC-mirror pattern
  * (Debezium → MERGE), wired to the engine's envelope-splice MERGE.
  *
  * Each micro-batch reduces to the LAST event per key (by the ordering
  * column), then applies as ONE `MERGE INTO`: matched D deletes, matched
  * I/U updates, unmatched I/U inserts, unmatched D is a no-op. All the
  * MERGE economics carry over: chunk writes are bounded by the batch key
  * envelope, untouched chunks share objects across versions, and an
  * all-no-op batch mints no root.
  *
  * Exactly-once on crash-replay via the same marker discipline as
  * [[StreamIngest]]: the applied result hash is memoized under
  * (checkpoint identity, table, batchId); a re-delivered batch re-points
  * the catalog instead of re-merging. (MERGE with D/U is not idempotent
  * against later batches, so the marker — not memoization of the merge
  * itself — is what makes replay safe.)
  *
  * Column names must be plain identifiers (word characters); the op and
  * ordering columns must not collide with table columns.
  */
object StreamCdc {

  /** Start applying `changes` to `tableName` (must already exist in the
    * catalog). `opCol` values: "I", "U", "D"; `seqCol` orders events of
    * one key within a batch (e.g. a log sequence number). */
  def applyStream(spark: SparkSession, ops: Ops, catalog: Catalog,
      changes: DataFrame, tableName: String, opCol: String, seqCol: String,
      checkpointDir: String): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, ops, catalog, batch, tableName, opCol, seqCol,
          checkpointDir, batchId)
      }
      .start()

  private def checkpointIdentity(checkpointDir: String): String = {
    val p = java.nio.file.Paths.get(checkpointDir, "metadata")
    if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p)
    else checkpointDir
  }

  def applyBatch(spark: SparkSession, ops: Ops, catalog: Catalog,
      batch: DataFrame, tableName: String, opCol: String, seqCol: String,
      checkpointDir: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val entry = catalog.root.getOrElse(tableName,
      sys.error(s"CDC target table does not exist: $tableName"))
    val keyCols = entry.keyCols
    val schema = org.apache.spark.sql.types.DataType.fromJson(entry.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val valueCols = schema.fieldNames.toSeq.filterNot(keyCols.contains)

    val batchKey = Hashing.opHash(Seq(
      "graft-cdc-batch-v1", checkpointIdentity(checkpointDir),
      tableName, batchId.toString))
    ops.store.memoGet(batchKey) match {
      case Some(applied) => // replay: already merged — just re-point
        catalog.put(tableName, TableRef(applied))
        ()
      case None =>
        // last event per key wins inside the batch (CDC log order)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
        val latest = batch
          .withColumn("__cdc_rn", row_number().over(w))
          .where(col("__cdc_rn") === 1)
          .drop("__cdc_rn", seqCol)
        // a GLOBAL temp view: foreachBatch hands us a per-microbatch
        // session CLONE, so a plain temp view would be invisible to the
        // session executing the MERGE statement
        val view = s"__graft_cdc_${tableName}_$batchId"
        latest.createOrReplaceGlobalTempView(view)

        val on = keyCols.map(k => s"tgt.$k = src.$k").mkString(" AND ")
        val sets = valueCols.map(v => s"$v = src.$v").mkString(", ")
        val insCols = (keyCols ++ valueCols).mkString(", ")
        val insVals = (keyCols ++ valueCols).map(c => s"src.$c").mkString(", ")
        val updateClause =
          if (valueCols.isEmpty) "" // key-only table: a matched I/U keeps the row
          else s"WHEN MATCHED AND src.$opCol <> 'D' THEN UPDATE SET $sets\n"
        try GraftSql.execute(spark, ops, catalog,
          s"""MERGE INTO $tableName AS tgt USING (SELECT * FROM global_temp.$view) AS src ON $on
             |WHEN MATCHED AND src.$opCol = 'D' THEN DELETE
             |${updateClause}WHEN NOT MATCHED AND src.$opCol <> 'D' THEN
             |  INSERT ($insCols) VALUES ($insVals)""".stripMargin)
        finally { spark.catalog.dropGlobalTempView(view); () }
        ops.store.memoPut(batchKey,
          catalog.root(tableName).tableHash)
        ()
    }
  }
}
