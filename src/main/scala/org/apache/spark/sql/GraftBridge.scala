package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column ↔ Expression converters — the one
  * place this library reaches into Spark's package-private API (the
  * Column constructor taking a raw Expression is no longer public in
  * Spark 4's split Column-node API). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over a custom [[execution.datasources.FileIndex]] — the
    * pruned chunk scan. LogicalRelation/HadoopFsRelation/Dataset.ofRows
    * are private[sql] / classic-session-typed in Spark 4, hence bridged
    * here. */
  def fileIndexScan(spark: SparkSession,
      index: execution.datasources.FileIndex,
      dataSchema: types.StructType): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val rel = execution.datasources.HadoopFsRelation(
      index, new types.StructType(), dataSchema, None,
      new execution.datasources.parquet.ParquetFileFormat, Map.empty)(cs)
    classic.Dataset.ofRows(cs,
      execution.datasources.LogicalRelation(rel))
  }

  /** Upper-bound (rows, bytes) of a ROW-LOCAL plan over ONE graft
    * scan: Project/Filter/alias chains above a single
    * LogicalRelation(HadoopFsRelation(GraftFileIndex)). Projections
    * are 1→1 in Catalyst (generators become a Generate node, never a
    * Project expression), so the scan's totals bound the plan's
    * output. (None, None) when the plan can change cardinality
    * upward (join, generator, union) or reads anything else — callers
    * then skip the byte-admitted driver route. */
  def rowLocalScanBounds(df: DataFrame)
      : (Option[Long], Option[Long]) = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def walk(p: LogicalPlan): Option[graft.core.GraftFileIndex] = p match {
      case Project(_, child) => walk(child)
      case Filter(_, child) => walk(child)
      case SubqueryAlias(_, child) => walk(child)
      case lr: execution.datasources.LogicalRelation => lr.relation match {
        case fs: execution.datasources.HadoopFsRelation => fs.location match {
          case g: graft.core.GraftFileIndex => Some(g)
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
    walk(df.queryExecution.optimizedPlan) match {
      case Some(g) => (Some(g.totalRows), Some(g.totalBytes))
      case None => (None, None)
    }
  }

  /** Run `body` with conf overrides visible to planning done on the
    * calling thread (`SQLConf.withExistingConf`). CAVEAT (measured,
    * tools/WriteProbe): write commands execute on Spark's async
    * command thread pool (`SQLExecution.withThreadLocalCaptured`),
    * which does NOT carry this thread-local — so this scopes READ-side
    * planning only; engine write jobs use the session-conf flip in
    * `Canonical.withEngineConf` instead. */
  def withConfOverrides[T](spark: SparkSession,
      overrides: Map[String, String])(body: => T): T = {
    val conf = spark.sessionState.conf.clone()
    overrides.foreach { case (k, v) => conf.setConfString(k, v) }
    internal.SQLConf.withExistingConf(conf)(body)
  }
}
