package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, hex, lower, unhex}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Reference parity for binary columns in text formats: `Bytes`
  * serializes as Base16 (lowercase hex) in both JSON and CSV, and
  * parses hex back on ingest
  * (/root/reference/messdb-schema/src/MessDB/Table/Bytes.hs:16-28).
  * Every text export path ([[graft.Cli]] export-json/export-csv, SQL
  * `COPY TO` csv/json) routes through [[encode]]; the by-name readers
  * ([[Csv]], [[Json]]) parse with [[importCol]], so an export → import
  * round trip reproduces the table bit-exactly, binary included. */
object Hex {

  /** Rewrite BinaryType columns to lowercase-hex strings; a no-op (same
    * plan) for tables without binary columns. */
  def encode(df: DataFrame): DataFrame =
    if (!df.schema.fields.exists(_.dataType == BinaryType)) df
    else df.select(df.schema.fields.toSeq.map { f =>
      if (f.dataType == BinaryType) lower(hex(col(f.name))).as(f.name)
      else col(f.name)
    }: _*)

  /** Cast a text-source column to the target type; binary targets parse
    * hex (either case — `unhex` is case-insensitive, matching the
    * reference's Base16 decoder). */
  def importCol(c: Column, dt: DataType): Column =
    if (dt == BinaryType) unhex(c) else c.cast(dt)
}
