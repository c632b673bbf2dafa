package graft.core

import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Per-column zone map: min/max of the ORDER-PRESERVING KeyCodec
  * encoding over the chunk's NON-NULL values (hex), plus the null
  * count. Byte order == value order, so pruning is the same unsigned
  * byte compare as key pruning — one arithmetic for both. None/None
  * with nulls > 0 marks an all-null chunk column; a column is simply
  * absent when stats were not collected (non-whitelisted type,
  * oversized values, or a meta predating stats) — absence always reads
  * as "cannot prune".
  *
  * `dictHex` is the chunk DICTIONARY: when the column holds at most
  * [[Canonical.DictMaxValues]] distinct non-null values in this chunk,
  * the complete sorted set of their encodings. Low-cardinality
  * (categorical) columns are exactly where min/max is weakest — an
  * unclustered status column spans its whole alphabet in every chunk,
  * so the [min, max] envelope never excludes anything — while the
  * dictionary answers `=` / `IN` EXACTLY (parquet row-group
  * dictionaries, lifted to chunk metadata where pruning happens before
  * any file opens). None = cardinality exceeded the cap or stats
  * predate dictionaries; pruning then falls back to the envelope. */
final case class ColStats(minHex: Option[String], maxHex: Option[String],
    nulls: Long, dictHex: Option[Seq[String]] = None,
    /** EXACT sum of the chunk's non-null values for integral/decimal
      * columns, as a decimal string of the (unscaled, for decimals)
      * BigInteger — overflow-free at any chunk size, and the input of
      * metadata-only SUM ([[MetaAgg]]). None for non-summable types
      * and metas predating sums. */
    sumDec: Option[String] = None)

/** One immutable chunk: a PK-sorted parquet file named by the SHA-256 of
  * its canonical row bytes; min/max key kept for pruning (the analogue of
  * the reference's trie path prefixes). Keys are hex of the
  * order-preserving KeyCodec encoding. `stats` are value-column zone
  * maps — per-TABLE metadata about a shared chunk object, so two tables
  * sharing a chunk under different column names each carry their own
  * names. Stats are deliberately NOT part of the table hash (tableHash
  * covers schema + key cols + chunk content hashes): equal logical
  * content hashes equal whether or not stats were collected. */
final case class ChunkMeta(hash: String, minKeyHex: String, maxKeyHex: String,
    rows: Long, stats: Map[String, ColStats] = Map.empty) {
  def minKey: Array[Byte] = Hashing.unhex(minKeyHex)
  def maxKey: Array[Byte] = Hashing.unhex(maxKeyHex)
}

/** Canonical table = schema + key columns + chunk list sorted by minKey.
  * Table hash (content identity, the trieHash analogue —
  * /root/reference/messdb-base/src/MessDB/Trie.hs:237-240) is the SHA-256
  * of the canonical meta string; equal logical content ⇒ equal chunking
  * (content-defined boundaries) ⇒ equal hash, independent of history. */
final case class TableMeta(schemaJson: String, keyCols: Seq[String],
    chunkTargetRows: Long, chunks: Seq[ChunkMeta]) {

  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  def valueCols: Seq[String] = schema.fieldNames.toSeq.filterNot(keyCols.contains)
  def rows: Long = chunks.map(_.rows).sum

  /** The content identity: depends only on schema, key cols, chunk
    * granularity, and the ordered chunk content hashes — NOT on the meta
    * storage encoding (a storage-format swap never changes identities).
    * Parts are length-prefixed (opHash) so no two distinct component
    * lists can concatenate to the same byte stream. */
  def tableHash: String = Hashing.opHash(
    Seq("graft-table-v2", schemaJson, chunkTargetRows.toString,
      keyCols.length.toString) ++ // count delimits the two variadic lists
      keyCols ++ chunks.map(_.hash))

  def toJson: String = {
    import JsonDSL._
    val j: JObject =
      ("schema" -> JsonMethods.parse(schemaJson)) ~
      ("keyCols" -> keyCols) ~
      ("chunkTargetRows" -> chunkTargetRows) ~
      ("chunks" -> chunks.map(c => {
        val base = ("hash" -> c.hash) ~ ("min" -> c.minKeyHex) ~
          ("max" -> c.maxKeyHex) ~ ("rows" -> c.rows)
        if (c.stats.isEmpty) base
        else base ~ ("stats" -> TableMeta.statsToJson(c.stats))
      }))
    JsonMethods.compact(JsonMethods.render(j))
  }

  /** Envelope for metas whose chunk list lives in a parquet sidecar
    * ([[ChunkIndex]]): the JSON carries everything EXCEPT the chunk
    * array, plus the expected count as a consistency check. The table
    * hash is unchanged either way — it is defined over the logical
    * components, never the storage encoding. */
  def toJsonIndexed: String = {
    import JsonDSL._
    val j: JObject =
      ("schema" -> JsonMethods.parse(schemaJson)) ~
      ("keyCols" -> keyCols) ~
      ("chunkTargetRows" -> chunkTargetRows) ~
      ("chunksIndexed" -> chunks.length)
    JsonMethods.compact(JsonMethods.render(j))
  }
}

object TableMeta {
  /** Above this chunk count, stores keep the chunk list as a parquet
    * sidecar instead of inline JSON (multi-MB tree-parsed JSON arrays
    * are the wrong driver cost for 1e5+-chunk tables). */
  val InlineChunkLimit = 10000

  /** stats ⇄ JSON: {"col": [minHexOrNull, maxHexOrNull, nulls]} with
    * optional positional tails — 4th the sorted dictionary
    * ([[ColStats.dictHex]]; JNull when absent but a later field is
    * present), 5th the exact sum ([[ColStats.sumDec]]) — shared by the
    * inline meta and the ChunkIndex sidecar. Shorter arrays (older
    * metas) read back with the absent fields as None. */
  def statsToJson(stats: Map[String, ColStats]): JObject =
    JObject(stats.toList.sortBy(_._1).map { case (c, s) =>
      val base = List(
        s.minHex.map(JString(_)).getOrElse(JNull),
        s.maxHex.map(JString(_)).getOrElse(JNull),
        JInt(s.nulls))
      val dictJ = s.dictHex.map(ds => JArray(ds.toList.map(JString(_))))
      val tail: List[JValue] = (dictJ, s.sumDec) match {
        case (None, None) => Nil
        case (Some(d), None) => List(d)
        case (d, Some(sum)) =>
          List(d.getOrElse(JNull), JString(sum))
      }
      c -> (JArray(base ++ tail): JValue)
    })

  def statsFromJson(j: JValue): Map[String, ColStats] = j match {
    case JObject(fields) => fields.map {
      case (c, JArray(mn :: mx :: JInt(n) :: rest)) =>
        def str(v: JValue): Option[String] =
          v match { case JString(s) => Some(s); case _ => None }
        val dict = rest.headOption match {
          case Some(JArray(ds)) => Some(ds.collect { case JString(s) => s })
          case _ => None
        }
        val sum = rest.drop(1).headOption.flatMap(str)
        c -> ColStats(str(mn), str(mx), n.toLong, dict, sum)
      case (c, other) => sys.error(s"bad stats for $c: $other")
    }.toMap
    case _ => Map.empty
  }

  def statsToJsonString(stats: Map[String, ColStats]): String =
    JsonMethods.compact(JsonMethods.render(statsToJson(stats)))

  def statsFromJsonString(s: String): Map[String, ColStats] =
    statsFromJson(JsonMethods.parse(s))

  /** Parse ONLY the envelope fields — (schemaJson, keyCols,
    * chunkTargetRows, Some(count) when the chunk list is in a sidecar /
    * None when inline). The cheap half of [[fromJson]]: callers that
    * plan by streaming the sidecar ([[ChunkIndex.iterate]]) never build
    * the chunk list at all. */
  def envelopeFromJson(json: String): (String, Seq[String], Long, Option[Long]) = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    (JsonMethods.compact(JsonMethods.render(j \ "schema")),
      (j \ "keyCols").extract[Seq[String]],
      (j \ "chunkTargetRows").extract[Long],
      (j \ "chunksIndexed").extractOpt[Long])
  }

  /** Parse a meta; `loadIndex` supplies the chunk list when the JSON is
    * the indexed envelope. */
  def fromJson(json: String,
      loadIndex: () => Seq[ChunkMeta] = () =>
        sys.error("indexed table meta requires an index loader")): TableMeta = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    val chunks = (j \ "chunksIndexed").extractOpt[Long] match {
      case Some(n) =>
        val loaded = loadIndex()
        require(loaded.length.toLong == n,
          s"chunk index holds ${loaded.length} entries, meta expects $n")
        loaded
      case None =>
        (j \ "chunks").extract[Seq[JValue]].map { c =>
          ChunkMeta((c \ "hash").extract[String], (c \ "min").extract[String],
            (c \ "max").extract[String], (c \ "rows").extract[Long],
            statsFromJson(c \ "stats"))
        }
    }
    TableMeta(
      schemaJson = JsonMethods.compact(JsonMethods.render(j \ "schema")),
      keyCols = (j \ "keyCols").extract[Seq[String]],
      chunkTargetRows = (j \ "chunkTargetRows").extract[Long],
      chunks = chunks)
  }
}
