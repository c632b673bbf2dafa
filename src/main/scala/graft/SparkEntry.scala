package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a query here,
  * and (when ANSI-SQL-expressible) a DuckDB oracle with IDENTICAL output
  * column names — the driver sorts columns by name and hash-compares
  * values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TpchRest.queries ++ Joins.queries ++ Windows.queries ++
      SetOps.queries ++ Scalars.queries ++ Events.queries ++
      Sketches.queries ++ Subqueries.queries ++ Generators.queries ++
      MatView.queries ++ Cluster.queries ++
      operators.Text.queries ++ operators.Dedup.queries ++
      operators.IncrementalDedup.queries ++ operators.Search.queries ++
      operators.Vectors.queries ++ operators.Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TpchRest.oracles ++ Joins.oracles ++ Windows.oracles ++
      SetOps.oracles ++ Scalars.oracles ++ Events.oracles ++
      Sketches.oracles ++ Subqueries.oracles ++ Generators.oracles ++
      MatView.oracles ++ Cluster.oracles ++
      operators.Text.oracles ++ operators.Dedup.oracles ++
      operators.IncrementalDedup.oracles ++ operators.Search.oracles ++
      operators.Vectors.oracles ++ operators.Pipeline.oracles
}
