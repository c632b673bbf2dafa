package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.{FsStore, Ops}
import graft.functions.Zorder
import Q._

/** Multi-dimensional clustering: a graft table KEYED by the Z-order
  * address of (user bucket, hour bucket) serves a rectangle query on
  * both dimensions from zone maps alone — the `OPTIMIZE ZORDER BY`
  * layout as an ordinary key choice (see [[graft.functions.Zorder]]).
  * The result is layout-independent (the z key never appears in the
  * output), so the DuckDB oracle is the plain aggregation + rectangle —
  * the physical clustering only decides how FEW chunks the scan opens
  * (pinned in GraftScanSpec). */
object Cluster {

  def zorderRect(s: SparkSession, dir: String): DataFrame = {
    val store = new FsStore(
      graft.core.FsUtil.tempStoreDir("graft-z-q-"))
    val ops = new Ops(s, store, 1024)
    val agg = Tables(s, dir, "events")
      .select((col("user_id") % 64).as("ub"),
        expr("cast(ts as long) div 3600").as("tb"),
        cents(col("value")).as("v_c"))
      .groupBy(col("ub"), col("tb"))
      .agg(count(lit(1)).as("n"), sum(col("v_c")).as("total_c"))
    val t0 = agg.agg(min(col("tb"))).head().getLong(0)
    val keyed = agg.select(
      Zorder.zhex(32, col("ub"), col("tb")).as("z"),
      col("ub"), col("tb"), col("n"), col("total_c"))
    val ref = ops.fromDataFrame(keyed, Seq("z"))
    // rectangle on BOTH dimensions: value-column zone maps prune the
    // z-clustered chunks; the oracle computes the same rectangle logically
    ops.scan(ref)
      .where(col("ub").between(8, 23) &&
        col("tb").between(t0 + 24, t0 + 95))
      .select(col("ub"), col("tb"), col("n"), col("total_c"))
      .orderBy(col("ub"), col("tb"))
  }

  val zorderRectSql: String =
    s"""WITH agg AS (
       |  SELECT user_id % 64 AS ub, epoch_us(ts) // 1000000 // 3600 AS tb,
       |         COUNT(*) AS n, SUM(${centsSql("value")}) AS total_c
       |  FROM events GROUP BY 1, 2),
       |b AS (SELECT MIN(tb) AS t0 FROM agg)
       |SELECT ub, tb, n, CAST(total_c AS BIGINT) AS total_c FROM agg, b
       |WHERE ub BETWEEN 8 AND 23 AND tb BETWEEN t0 + 24 AND t0 + 95
       |ORDER BY ub, tb""".stripMargin

  val queries: Map[String, QFn] = Map("zorder_rect" -> (zorderRect _))
  val oracles: Map[String, String] = Map("zorder_rect" -> zorderRectSql)
}
