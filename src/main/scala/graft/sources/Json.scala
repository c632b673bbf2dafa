package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** JSON-lines ingest with the same BY-NAME discipline as [[Csv]]: field
  * order in the file is irrelevant, extra fields are ignored, and the
  * target schema's types are enforced by cast. The inverse of the CLI's
  * export-json (Tool/Json.hs:16-32 writes the same shape), so an
  * export → import round trip reproduces the table bit-exactly. */
object Json {

  def readNameMatched(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val raw = spark.read.json(path)
    val present = raw.columns.toSet
    val missing = schema.fieldNames.filterNot(present)
    require(missing.isEmpty,
      s"JSON at $path is missing required fields: ${missing.mkString(", ")}")
    raw.select(schema.fields.toSeq.map(f =>
      Hex.importCol(col(f.name), f.dataType).as(f.name)): _*)
  }
}
