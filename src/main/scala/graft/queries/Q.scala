package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the query inventory.
  *
  * Oracle-hash stability: the driver compares our parquet output against
  * DuckDB running `SparkEntry.oracleSql` on the same tables. Raw column
  * values pass through bit-identically, but float aggregation order differs
  * between engines — so every derived money aggregate goes through exact
  * integer cents: all money columns in the testdata are 2-decimal
  * (verified), hence `round(x*100)` is an exact integer and `sum` over
  * longs is order-independent in both engines.
  */
object Q {
  type QFn = (SparkSession, String) => DataFrame

  /** Exact integer cents from a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** SQL-side twin of [[cents]] for the DuckDB oracle. */
  def centsSql(e: String): String = s"CAST(ROUND(($e)*100) AS BIGINT)"
}
