package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** CSV ingest with BY-NAME column matching against a target schema —
  * the reference parses each record through a header-reordering map so
  * column order in the file is irrelevant and extra columns are ignored
  * (/root/reference/messdb-schema/src/MessDB/Table/Row.hs:117-124,
  * messdb-tool/src/MessDB/Tool/Csv.hs:50-62). Spark's CSV reader with an
  * explicit schema matches positionally, so we read with the header,
  * then select+cast the target columns by name. */
object Csv {

  def readNameMatched(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .csv(path)
    val present = raw.columns.toSet
    val missing = schema.fieldNames.filterNot(present)
    require(missing.isEmpty,
      s"CSV at $path is missing required columns: ${missing.mkString(", ")}")
    raw.select(schema.fields.toSeq.map(f =>
      Hex.importCol(col(f.name), f.dataType).as(f.name)): _*)
  }
}
