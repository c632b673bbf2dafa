package graft.core

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonicalization: DataFrame → content-addressed, PK-sorted,
  * content-defined chunks.
  *
  * The reference's trie shape is a pure function of the key set (canonical
  * form invariants, /root/reference/messdb-base/src/MessDB/Trie.hs:124-129),
  * which is what makes hashing history-independent. We get the same
  * property with content-defined chunking: a key k starts a new chunk iff
  * xxhash64(keyBytes(k)) % chunkTargetRows == 0. Boundary-ness is
  * intrinsic to the key, so the chunk decomposition depends only on the
  * key SET — not on insertion order, partitioning, or prior versions —
  * and an insert/delete only perturbs its own chunk (and possibly one
  * neighbor), the analogue of radix-trie locality.
  *
  * Scale posture: neither materialization path drivers the boundary
  * list — both collect only an intrinsic O(shuffle-partitions)
  * subsample of the boundary keys as range splits and derive chunk
  * membership locally per task, so driver memory is independent of
  * table size.
  */
object Canonical {

  val KB = "_graft_kb" // order-preserving key bytes
  val CHUNK = "_graft_chunk"
  private val PART = "_graft_part" // split-interval id during materialize

  /** Seed for the boundary hash — part of the format version. */
  private val BoundarySeed = 42L

  def boundaryHash(keyBytes: Array[Byte]): Long =
    // xxhash64, same function Spark's `xxhash64` expression uses, so the
    // executor-side column and driver-side meta checks agree.
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      keyBytes, BinaryType, BoundarySeed)

  def isBoundaryKey(keyBytes: Array[Byte], target: Long): Boolean = {
    val m = boundaryHash(keyBytes) % target
    (if (m < 0) m + target else m) == 0
  }

  /** Reorder to canonical column order: key cols first, then remaining in
    * schema order. */
  def canonicalColumns(schema: StructType, keyCols: Seq[String]): Seq[String] =
    keyCols ++ schema.fieldNames.filterNot(keyCols.contains)

  /** First index i with bs(i) > kb — equivalently the count of sorted
    * boundary keys <= kb, i.e. the chunk/region id of kb. THE one
    * boundary binary search: every path that assigns rows or chunks to
    * boundary intervals (materialize, grouped materialize, merge region
    * planning, spanning-chunk splits) must use it, or the canonical
    * chunking silently diverges between paths. */
  def boundaryIndex(bs: Array[Array[Byte]], kb: Array[Byte]): Int = {
    var lo = 0; var hi = bs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (Hashing.compareBytes(bs(mid), kb) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Driver-side IO parallelism: map `f` over `items` on a transient
    * fixed pool (file reads/writes dominate; 16 ways saturates local
    * disks without starving the JVM). Results keep item order; the
    * first failure propagates (wrapped in ExecutionException — callers'
    * NonFatal fallbacks treat it like any other surprise). */
  private[core] def parIo[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    if (items.lengthCompare(2) < 0) return items.map(f)
    val n = math.min(16, math.max(2, Runtime.getRuntime.availableProcessors))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      val futs = items.map(a => pool.submit(
        new java.util.concurrent.Callable[B] { def call(): B = f(a) }))
      futs.map(_.get())
    } finally pool.shutdown()
  }

  /** UDF resolving input_file_name() URIs to a caller tag (chunk hash /
    * region op) through a broadcast path map — the one place the
    * URI-to-path normalization lives. */
  def fileTagUdf(spark: SparkSession,
      pathToTag: Map[String, String]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bc = spark.sparkContext.broadcast(pathToTag)
    udf { (f: String) =>
      val p = new java.net.URI(f).getPath
      bc.value.getOrElse(p, sys.error(s"unknown chunk file $f"))
    }
  }

  /** Canonical nullability: key columns non-null, value columns nullable —
    * aggregation/union plans flip nullability flags incidentally, and the
    * canonical form must not depend on plan history. */
  /** Canonical logical schema: key columns non-null, and NO column
    * metadata — schemaJson is part of the table identity, so incidental
    * metadata (source parquet annotations, the positional field ids the
    * chunk writer attaches below) must never leak into it. */
  def normalizeSchema(schema: StructType, keyCols: Seq[String]): StructType =
    StructType(schema.fields.map(f => f.copy(
      nullable = !keyCols.contains(f.name), metadata = Metadata.empty)))

  /** Positional parquet field ids — the rename-proof column identity
    * (Iceberg's mechanism). Chunk identity is over row VALUE bytes
    * (name-free), so a renamed table shares chunk OBJECTS with its
    * pre-rename versions; the files carry whatever names were current
    * when first written. Chunk writers therefore attach field id =
    * canonical position to every data column, and every chunk read
    * requests the CURRENT schema with the same positional ids — Spark
    * then matches columns by id, immune to renames. Positions are
    * stable between rewrites: renames never move columns (canonical
    * order is keys first, then schema order), and ADD/DROP COLUMN
    * rewrite chunks through a transform anyway. */
  private[core] val FieldIdKey = "parquet.field.id"
  def withFieldIds(schema: StructType): StructType =
    StructType(schema.fields.zipWithIndex.map { case (f, i) =>
      f.copy(metadata = new MetadataBuilder()
        .putLong(FieldIdKey, i.toLong).build())
    })

  /** Add the key-bytes column via the order-preserving codec. Key
    * columns are non-null by the table contract (normalizeSchema marks
    * them so); a null key is reported with a clear error instead of an
    * opaque encoder failure deep in the job. */
  def withKeyBytes(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val schema = normalizeSchema(df.schema, keyCols)
    val enc = KeyCodec.rowEncoder(schema, keyCols)
    val keyIdx = keyCols.map(schema.fieldIndex)
    val outSchema = schema.add(StructField(KB, BinaryType, nullable = false))
    val outEnc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        keyIdx.foreach { i =>
          if (r.isNullAt(i)) throw new IllegalArgumentException(
            s"null key in key column '${schema.fieldNames(i)}' — key columns are non-nullable")
        }
        Row.fromSeq(r.toSeq :+ enc(r))
      }
    }(outEnc)
  }

  private def listFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] =
    FsUtil.listDir(dir)

  /** Per-chunk digest with CONSTANT task memory: input rows carry
    * (groupKeyCols..., kb, rb); rows are shuffled by group, sorted
    * within partitions by (group, rb) — rb is the canonical row bytes
    * with the key bytes as prefix, so rb order == key order — and a
    * single pass folds each consecutive group into (minkb, maxkb, rows,
    * sha256 of the concatenated sorted rb). Replaces the former
    * `sort_array(collect_list(rb))` aggregation, which buffered a whole
    * chunk (up to the 64–256 MB scale-guidance sizes) in one
    * aggregation buffer. The digested bytes are identical, so chunk
    * hashes are unchanged. */
  // ---- value-column zone maps -------------------------------------------

  /** Value columns that get zone maps: scalar types with an
    * order-preserving encoding and (usually) bounded encoded size.
    * Binary/array/struct columns are skipped — rarely predicated, and
    * their encodings are unbounded. */
  private[core] def statableType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | BooleanType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }
  /** Caps: stat columns per table (meta size), encoded bytes per stat
    * value (a chunk whose min/max string is a whole document would bloat
    * the chunk index — such a column's stats drop for that chunk,
    * reading as "cannot prune"). */
  private[core] val MaxStatCols = 16
  private[core] val MaxStatBytes = 64
  private[core] def statColumns(schema: StructType, keyCols: Seq[String]): Seq[String] =
    schema.fields.toSeq.filterNot(f => keyCols.contains(f.name))
      .filter(f => statableType(f.dataType)).map(_.name).take(MaxStatCols)
  /** The oversize sentinel in chunkDigests output: nulls == -1 means
    * "no stats for this column in this chunk". */
  private[core] val StatsDropped = -1L
  /** Chunk-dictionary cap ([[ColStats.dictHex]]): a stat column holding
    * at most this many distinct non-null values in a chunk records the
    * complete value set. 8 values × ≤64 B × ≤16 columns ≤ 8 KB of
    * metadata per chunk worst-case — bounded at any table size — while
    * covering the categorical columns (status flags, enum codes,
    * partition-ish labels) where the [min,max] envelope never prunes. */
  private[core] val DictMaxValues = 8

  /** Per-chunk digests + zone maps in ONE sorted pass. Stats come FREE
    * out of the row bytes: `rb` is the concatenation of the per-column
    * encodings, and the input's `ends` column carries each column's end
    * offset, so the pass slices a stat column's encoding out of rb
    * in place — no re-encoding, no duplicated bytes through the
    * shuffle, and min/max candidates compare by offset (an allocation
    * only when a new extreme is retained). `statPos` gives each stat
    * column's position in the canonical column order; output appends
    * per stat column (smin_i, smax_i, snulls_i). A null value encodes
    * as the single byte 0x00; values over MaxStatBytes drop the
    * column's stats for the chunk (StatsDropped sentinel). */
  private[core] def chunkDigests(df: DataFrame, groupCols: Seq[String],
      statPos: Array[Int] = Array.empty, width: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nPart =
      if (width > 0) width else spark.sessionState.conf.numShufflePartitions
    val nStats = statPos.length
    val inSchema = df.schema
    val gIdx = groupCols.map(inSchema.fieldIndex)
    val kbIdx = inSchema.fieldIndex("kb")
    val rbIdx = inSchema.fieldIndex("rb")
    val endsIdx = if (nStats == 0) -1 else inSchema.fieldIndex("ends")
    val outSchema = StructType(
      groupCols.map(c => inSchema(c)) ++ Seq(
        StructField("minkb", BinaryType), StructField("maxkb", BinaryType),
        StructField("rows", LongType), StructField("hash", StringType)) ++
      (0 until nStats).flatMap(i => Seq(
        StructField(s"smin$i", BinaryType), StructField(s"smax$i", BinaryType),
        StructField(s"snulls$i", LongType),
        StructField(s"sdict$i", ArrayType(BinaryType)))))
    val enc = RowEncoder.encoderFor(outSchema)
    // unsigned lexicographic compare of rb[from,to) vs a retained extreme
    def cmpRange(rb: Array[Byte], from: Int, to: Int, other: Array[Byte]): Int = {
      val n = math.min(to - from, other.length)
      var i = 0
      while (i < n) {
        val a = rb(from + i) & 0xff; val b = other(i) & 0xff
        if (a != b) return a - b
        i += 1
      }
      (to - from) - other.length
    }
    df.repartition(nPart, groupCols.map(col): _*)
      .sortWithinPartitions((groupCols.map(col) :+ col("rb")): _*)
      .mapPartitions { it =>
        val base = it.buffered
        new Iterator[Row] {
          def hasNext: Boolean = base.hasNext
          def next(): Row = {
            val key: Seq[Any] = gIdx.map(base.head.get)
            val md = java.security.MessageDigest.getInstance("SHA-256")
            var minKb: Array[Byte] = null
            var maxKb: Array[Byte] = null
            var n = 0L
            val mins = Array.fill[Array[Byte]](nStats)(null)
            val maxs = Array.fill[Array[Byte]](nStats)(null)
            val nulls = Array.fill[Long](nStats)(0L)
            val dead = Array.fill[Boolean](nStats)(false)
            // chunk dictionary: distinct encodings up to DictMaxValues,
            // then the column's dictionary (only) goes dead
            val dicts = Array.fill(nStats)(
              new scala.collection.mutable.ArrayBuffer[Array[Byte]](DictMaxValues))
            val dictDead = Array.fill[Boolean](nStats)(false)
            while (base.hasNext && gIdx.map(base.head.get) == key) {
              val r = base.next()
              val rb = r.getAs[Array[Byte]](rbIdx)
              md.update(rb)
              val kb = r.getAs[Array[Byte]](kbIdx)
              if (minKb == null) minKb = kb
              maxKb = kb
              n += 1
              if (nStats > 0) {
                val ends = r.getAs[scala.collection.Seq[Int]](endsIdx)
                var i = 0
                while (i < nStats) {
                  if (!dead(i)) {
                    val p = statPos(i)
                    val from = if (p == 0) 0 else ends(p - 1)
                    val to = ends(p)
                    if (to - from == 1 && rb(from) == 0) nulls(i) += 1
                    else if (to - from > MaxStatBytes) dead(i) = true
                    else {
                      if (mins(i) == null || cmpRange(rb, from, to, mins(i)) < 0)
                        mins(i) = java.util.Arrays.copyOfRange(rb, from, to)
                      if (maxs(i) == null || cmpRange(rb, from, to, maxs(i)) > 0)
                        maxs(i) = java.util.Arrays.copyOfRange(rb, from, to)
                      if (!dictDead(i)) {
                        val buf = dicts(i)
                        var j = 0
                        while (j < buf.length && cmpRange(rb, from, to, buf(j)) != 0)
                          j += 1
                        if (j == buf.length) {
                          if (buf.length >= DictMaxValues) dictDead(i) = true
                          else buf += java.util.Arrays.copyOfRange(rb, from, to)
                        }
                      }
                    }
                  }
                  i += 1
                }
              }
            }
            val statOut = (0 until nStats).flatMap { i =>
              if (dead(i)) Seq(null, null, StatsDropped, null)
              else Seq(mins(i), maxs(i), nulls(i),
                // sorted for a canonical meta encoding (insertion order
                // is already deterministic — rows arrive rb-sorted —
                // but the sorted set is the natural identity)
                if (dictDead(i)) null
                else dicts(i).sortWith(Hashing.compareBytes(_, _) < 0).toSeq)
            }
            Row.fromSeq(key ++ Seq(minKb, maxKb, n, Hashing.hex(md.digest())) ++ statOut)
          }
        }
      }(enc)
  }

  /** One finished chunk digest as produced executor-side by the FUSED
    * write+digest pass: chunk identity fields plus the temp-dir tag that
    * names the written file. Stats are already in their meta (hex)
    * representation. */
  private[core] final case class FusedDigest(group: String, tag: String,
      minKey: String, maxKey: String, rows: Long, hash: String,
      stats: Map[String, ColStats])

  /** Mutable per-chunk digest accumulation for the fused pass — the
    * same arithmetic as [[chunkDigests]]'s per-group loop (sha-256 over
    * concatenated canonical row bytes in key order; zone-map min/max by
    * unsigned compare over rb slices; null markers; MaxStatBytes drop;
    * DictMaxValues dictionary), so fused and standalone digests are
    * byte-identical. */
  private[core] final class DigestState(statCols: Seq[String],
      statPos: Array[Int],
      statDts: Array[org.apache.spark.sql.types.DataType] = Array.empty) {
    private val nStats = statPos.length
    // exact per-chunk sums for integral/decimal stat columns: decode the
    // already-encoded slice (same marker-prefixed KeyCodec layout the
    // min/max compares use) and accumulate a BigInteger — overflow-free,
    // order-independent, and free of any fp non-associativity (fp
    // columns are excluded by construction). null = not summable.
    // per-type decoders: reuse fieldDecoder for the exact dt so the
    // value arithmetic cannot drift from the encoding
    private val sumTypeDecs: Array[KeyCodec.FieldDec] =
      if (statDts.isEmpty) new Array(nStats)
      else statDts.map {
        case dt @ (LongType | IntegerType | ShortType | ByteType) =>
          KeyCodec.fieldDecoder(dt).orNull
        case dt: org.apache.spark.sql.types.DecimalType =>
          KeyCodec.fieldDecoder(dt).orNull
        case _ => null
      }
    private val sums = new Array[java.math.BigInteger](nStats)
    private val md = java.security.MessageDigest.getInstance("SHA-256")
    private var minKb: Array[Byte] = _
    private var maxKb: Array[Byte] = _
    private var n = 0L
    private val mins = new Array[Array[Byte]](nStats)
    private val maxs = new Array[Array[Byte]](nStats)
    private val nulls = new Array[Long](nStats)
    private val dead = new Array[Boolean](nStats)
    private val dicts = Array.fill(nStats)(
      new scala.collection.mutable.ArrayBuffer[Array[Byte]](DictMaxValues))
    private val dictDead = new Array[Boolean](nStats)

    def reset(): Unit = {
      md.reset(); minKb = null; maxKb = null; n = 0L
      var i = 0
      while (i < nStats) {
        mins(i) = null; maxs(i) = null; nulls(i) = 0L; dead(i) = false
        dicts(i).clear(); dictDead(i) = false; sums(i) = null
        i += 1
      }
    }

    private def cmpRange(rb: Array[Byte], from: Int, to: Int,
        other: Array[Byte]): Int = {
      val len = math.min(to - from, other.length)
      var i = 0
      while (i < len) {
        val a = rb(from + i) & 0xff; val b = other(i) & 0xff
        if (a != b) return a - b
        i += 1
      }
      (to - from) - other.length
    }

    def update(kb: Array[Byte], rb: Array[Byte], ends: Array[Int]): Unit = {
      md.update(rb)
      if (minKb == null) minKb = kb
      maxKb = kb
      n += 1
      var i = 0
      while (i < nStats) {
        if (!dead(i)) {
          val p = statPos(i)
          val from = if (p == 0) 0 else ends(p - 1)
          val to = ends(p)
          if (to - from == 1 && rb(from) == 0) nulls(i) += 1
          else if (to - from > MaxStatBytes) dead(i) = true
          else {
            if (mins(i) == null || cmpRange(rb, from, to, mins(i)) < 0)
              mins(i) = java.util.Arrays.copyOfRange(rb, from, to)
            if (maxs(i) == null || cmpRange(rb, from, to, maxs(i)) > 0)
              maxs(i) = java.util.Arrays.copyOfRange(rb, from, to)
            if (sumTypeDecs.length > i && sumTypeDecs(i) != null) {
              val unscaled: java.math.BigInteger =
                sumTypeDecs(i)(rb, from)._1 match {
                  case l: Long => java.math.BigInteger.valueOf(l)
                  case x: Int => java.math.BigInteger.valueOf(x.toLong)
                  case x: Short => java.math.BigInteger.valueOf(x.toLong)
                  case x: Byte => java.math.BigInteger.valueOf(x.toLong)
                  case d: org.apache.spark.sql.types.Decimal =>
                    d.toJavaBigDecimal.unscaledValue()
                  case _ => java.math.BigInteger.ZERO
                }
              sums(i) =
                if (sums(i) == null) unscaled else sums(i).add(unscaled)
            }
            if (!dictDead(i)) {
              val buf = dicts(i)
              var j = 0
              while (j < buf.length && cmpRange(rb, from, to, buf(j)) != 0)
                j += 1
              if (j == buf.length) {
                if (buf.length >= DictMaxValues) dictDead(i) = true
                else buf += java.util.Arrays.copyOfRange(rb, from, to)
              }
            }
          }
        }
        i += 1
      }
    }

    def result(group: String, tag: String): FusedDigest = {
      val stats = statCols.indices.flatMap { i =>
        if (dead(i)) None
        else Some(statCols(i) -> ColStats(
          Option(mins(i)).map(Hashing.hex),
          Option(maxs(i)).map(Hashing.hex),
          nulls(i),
          if (dictDead(i)) None
          else Some(dicts(i).sortWith(Hashing.compareBytes(_, _) < 0)
            .toSeq.map(Hashing.hex)),
          sumDec =
            if (sumTypeDecs.length > i && sumTypeDecs(i) != null)
              // all-null chunk sums to 0; MetaAgg derives NULL-vs-0
              // from the null counts, so 0 is the right identity here
              Some(Option(sums(i))
                .getOrElse(java.math.BigInteger.ZERO).toString)
            else None))
      }.toMap
      FusedDigest(group, tag, Hashing.hex(minKb), Hashing.hex(maxKb), n,
        Hashing.hex(md.digest()), stats)
    }
  }

  /** Assemble the stats map of one chunkDigests output row. */
  private def statsOfRow(r: Row, statCols: Seq[String], baseIdx: Int)
      : Map[String, ColStats] =
    statCols.zipWithIndex.flatMap { case (c, i) =>
      val nulls = r.getLong(baseIdx + 4 * i + 2)
      if (nulls == StatsDropped) None
      else Some(c -> ColStats(
        Option(r.getAs[Array[Byte]](baseIdx + 4 * i)).map(Hashing.hex),
        Option(r.getAs[Array[Byte]](baseIdx + 4 * i + 1)).map(Hashing.hex),
        nulls,
        Option(r.getAs[scala.collection.Seq[Array[Byte]]](baseIdx + 4 * i + 3))
          .map(_.toSeq.map(Hashing.hex))))
    }.toMap

  /** Materialize df (one row per key, columns already canonical-ordered)
    * into the store; returns the stored TableMeta. */
  /** ONE-pass row count + split-key sample over the persisted
    * materialization input (replaces the former count-then-collect job
    * pair — one fewer full pass over the data, which at 100 TB is a
    * full read of the spilled cache). Each partition counts its rows
    * and retains boundary keys at a locally ADAPTED power-of-two
    * subsampling rate — the criteria nest (hash % (t·2s) == 0 ⇒
    * hash % (t·s) == 0), so doubling the local rate whenever the buffer
    * exceeds `localCap` never needs a re-scan. The driver re-subsamples
    * everything to the final uniform rate: the max of the local rates
    * and the global-count-derived rate. Driver memory stays
    * O(partitions · localCap). The split set only shapes write tasks —
    * chunk content is a pure function of the key set — so a different
    * (power-of-two) subsampling factor than the old exact-ceil one
    * leaves every table hash unchanged. */
  private def sampleSplits(df: DataFrame, groupCol: Option[String],
      target: Long, nPart: Int): (Long, Array[(String, Array[Byte])]) = {
    val kbIdx = df.schema.fieldIndex(KB)
    val gIdx = groupCol.map(df.schema.fieldIndex).getOrElse(-1)
    val maxSplits = 4L * nPart
    val localCap = math.max(64L, 8L * maxSplits / math.max(nPart, 1)).toInt
    val perPart: Array[(Long, Long, Array[(String, Array[Byte], Long)])] =
      df.rdd.mapPartitions { it =>
        var n = 0L; var sub = 1L
        val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte], Long)]
        def crit(h: Long, s: Long): Boolean =
          java.lang.Math.floorMod(h, target * s) == 0
        it.foreach { r =>
          n += 1
          val kb = r.getAs[Array[Byte]](kbIdx)
          val h = boundaryHash(kb)
          if (crit(h, sub)) {
            buf += (((if (gIdx >= 0) r.getString(gIdx) else ""), kb, h))
            if (buf.length > localCap) {
              sub *= 2
              val kept = buf.filter(t => crit(t._3, sub)).toArray
              buf.clear()
              buf ++= kept
            }
          }
        }
        Iterator.single((n, sub, buf.toArray))
      }.collect()
    val nRows = perPart.foldLeft(0L)(_ + _._1)
    var sub = perPart.foldLeft(1L)((a, p) => math.max(a, p._2))
    while (nRows / target / sub > maxSplits) sub *= 2
    val finalSub = sub
    val keys = perPart.flatMap(_._3).collect {
      case (g, kb, h)
        if java.lang.Math.floorMod(h, target * finalSub) == 0 => (g, kb)
    }
    (nRows, keys)
  }

  /** `rowBound`: caller-known upper bound on the input row count (from
    * chunk metadata — merges, transforms, and patches know it; bulk
    * ingest does not). Materializations provably SMALL
    * ([[smallJob]]) skip the split-sample job, the input persist, and
    * run width-1 — for a statement flow of metadata-sized jobs this
    * halves the per-materialization job count and strips the fixed
    * shuffle overhead. Splits and widths only shape tasks: chunk
    * content is a pure function of the key set, so hashes are
    * identical either way. */
  def materialize(spark: SparkSession, store: GraftStore, df0: DataFrame,
      keyCols: Seq[String], chunkTargetRows: Long,
      rowBound: Option[Long] = None,
      byteBound: Option[Long] = None,
      rowProbe: Option[Long] = None,
      probeFold: Boolean = false): TableMeta = {
    require(keyCols.nonEmpty, "key columns required")
    val cols = canonicalColumns(df0.schema, keyCols)
    // strip inherited column metadata: projections built over chunk
    // reads carry the SOURCE table's positional field ids, which are
    // stale for this OUTPUT's positions — the hash-pass read below must
    // match the tmp files by name, never by a stale id
    val df = df0.select(cols.map(c => col(c).as(c, Metadata.empty)): _*)
    val schemaJson = normalizeSchema(df.schema, keyCols).json

    val small = smallJob(rowBound, chunkTargetRows)
    // observed-bytes admission — see materializeGrouped
    val bytesOk = byteBound.exists(_ <= Ops.DriverPatchMaxBytes) &&
      rowBound.exists(_ <= Ops.DriverPatchHardRowCap) &&
      driverMaterializeEnabled && DriverChunks.supported(df.schema)
    // ZERO-JOB branch (mirrors materializeGrouped's): a driver-admitted
    // input whose plan folded to a LocalRelation (the driver-read range
    // edge rewrite, a small CTAS over driver-resident rows) collects
    // without any job; key bytes encode on the driver with the same
    // KeyCodec arithmetic the mapPartitions encoder applies.
    if (bytesOk || driverMaterializeOk(rowBound, chunkTargetRows, df.schema))
      if (df.queryExecution.analyzed.collectLeaves().forall(
            _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]) &&
          df.queryExecution.optimizedPlan
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]) {
        try {
          val norm = normalizeSchema(df.schema, keyCols)
          val enc = KeyCodec.rowEncoder(norm, keyCols)
          val kbSchema = norm.add(StructField(KB, BinaryType, nullable = false))
          // same null-key contract as withKeyBytes: raise clearly rather
          // than letting KeyCodec silently encode a null key as 0x00
          val keyIdx = keyCols.map(norm.fieldIndex)
          val rows: Array[Row] =
            df.collect().map { r =>
              keyIdx.foreach { i =>
                if (r.isNullAt(i)) throw new IllegalArgumentException(
                  s"null key in key column '${norm.fieldNames(i)}' — key columns are non-nullable")
              }
              Row.fromSeq(r.toSeq :+ enc(r))
            }
          val got = driverMaterializeRows(store, rows, kbSchema, df.schema,
            schemaJson, keyCols, chunkTargetRows)
          got.foreach(return _)
        } catch {
          // a null key is USER error, not a driver-route infrastructure
          // failure: propagate it directly instead of falling back to a
          // job that would only re-raise the same error from a task
          case e: IllegalArgumentException
              if e.getMessage != null &&
                e.getMessage.startsWith("null key in key column") =>
            throw e
          case scala.util.control.NonFatal(e) =>
            Ops.warnDriverPatchFallback(e)
        }
      }
    val kbDf0 = withKeyBytes(df, keyCols)
    val kbDf = if (small || bytesOk) kbDf0
      else kbDf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (bytesOk || driverMaterializeOk(rowBound, chunkTargetRows, df.schema)) {
      val (es, ekb) = onEngine(spark, kbDf, smallShuffle = true,
        interpretedOk = interpretedCollectOk(rowBound, df.schema))
      val got = driverMaterialize(es, store, ekb, df.schema, schemaJson,
        keyCols, chunkTargetRows, rowBound.get)
      got.foreach(return _)
    } else if (rowBound.isEmpty && driverMaterializeEnabled &&
        (probeFold || smallJob(rowProbe, chunkTargetRows)) &&
        DriverChunks.supported(df.schema)) {
      // OPTIMISTIC probe (generator size gating) — same bet as the
      // grouped variant: the output size is unknown (a generator fans
      // 1→N) but the INPUT is tiny, so try ONE limit-guarded collect
      // job; over the cap, the bet is off and the job path below
      // recomputes. This is what lets a small-corpus generator INDEX
      // BUILD (the full shingle index, not just its minis) run as one
      // collect + driver-side chunk writes instead of a sample +
      // multi-file write job pair. (Probe conf — one-job limit — lives
      // on the engine clone, see GraftBridge.engineSession.)
      // `probeFold` is the caller's OPPOSITE-direction bet: the input
      // is a grouped FOLD whose output collapses to the group count
      // (a retraction's net delta at result granularity — VERDICT r13
      // #3: the sample + write job pair cost ~570 ms for a 512-row
      // delta). Over the cap, the same bounded fallback applies.
      val cap = Ops.adaptiveRowCap(df.schema, Ops.DriverPatchMaxRows)
      val probed: Option[Array[Row]] =
        try Some(withJobDesc(spark, "graft:probe") {
          val (_, ekb) =
            onEngine(spark, kbDf, smallShuffle = true, interpretedOk = false)
          ekb.limit(cap.toInt + 1).collect()
        })
        catch { case scala.util.control.NonFatal(e) =>
          Ops.warnDriverPatchFallback(e); None }
      probed.filter(_.length <= cap).foreach { rs =>
        val got = driverMaterializeRows(store, rs, kbDf.schema, df.schema,
          schemaJson, keyCols, chunkTargetRows)
        got.foreach(return _)
      }
    }
    try {
      val (es, ekb) = onEngine(spark, kbDf)
      // 1. range SPLITS: an intrinsic subsample of the boundary keys.
      //    hash(kb) % (target·sub) == 0 implies hash(kb) % target == 0,
      //    so every split is a boundary key and chunk intervals nest
      //    inside split intervals. The driver holds only O(4·nPart)
      //    split keys — never the full boundary list (which is
      //    O(rows/target) and was the 100 TB driver-memory ceiling).
      //    Small jobs skip the pass: no splits, one write task.
      val target = chunkTargetRows
      val nPart =
        if (small) 1 else es.sessionState.conf.numShufflePartitions
      // one fused pass: row count + subsampled split keys (also
      // materializes the persisted frame for the write pass below)
      val sampled =
        if (small) Array.empty[(String, Array[Byte])]
        else withJobDesc(spark, "graft:sample")(
          sampleSplits(ekb, None, target, nPart)._2)
      val splits: Array[Array[Byte]] = sampled.map(_._2)
        .sortWith(Hashing.compareBytes(_, _) < 0)
      val bcS = es.sparkContext.broadcast(splits)

      // 2. partition id = split interval of the key. Hash-shuffling on it
      //    sends each interval to exactly one task; a split key is a
      //    boundary key AND a present row, so every interval (except the
      //    leading "head") STARTS with a boundary row and no chunk ever
      //    crosses a task — each chunk becomes exactly one file below.
      //    Small jobs coalesce instead: no exchange at all, one task.
      val partIdUdf = udf { (kb: Array[Byte]) => boundaryIndex(bcS.value, kb) }

      val tmpDir = Files.createTempDirectory("graft-canon-").toString
      val parted0 = ekb.withColumn(PART, partIdUdf(col(KB)))
      val parted = (if (small) parted0.coalesce(1)
        else parted0.repartition(nPart, col(PART)))
        .sortWithinPartitions(col(PART), col(KB))
      // 3. ONE fused write+digest job: the tagging pass streams each
      //    task's rows in (interval, key) order — a boundary key opens a
      //    new chunk — and computes the per-chunk canonical digest (and
      //    zone maps) from each row's canonical bytes AS the row flows to
      //    the parquet writer; finished digests reach the driver through
      //    an accumulator. Chunk CONTENT stays a pure function of the key
      //    set (tags only name temp dirs), the digested bytes are the
      //    same rb stream the former read-back pass produced, and result
      //    tasks report accumulator updates exactly once — so hashes are
      //    unchanged while the former full re-read of every
      //    materialization disappears.
      val inSchema = parted.schema
      val kbI = inSchema.fieldIndex(KB)
      val pI = inSchema.fieldIndex(PART)
      val rbEnc = KeyCodec.rowEncoderSliced(StructType(df.schema.fields), cols)
      val statCols = statColumns(df.schema, keyCols)
      val statPos = statCols.map(cols.indexOf).toArray
      val statDts = statCols.map(df.schema(_).dataType).toArray
      val dataIdx = cols.map(inSchema.fieldIndex)
      val acc = es.sparkContext
        .collectionAccumulator[FusedDigest]("graft-chunk-digests")
      val tagEnc = RowEncoder.encoderFor(
        inSchema.add(StructField(CHUNK, StringType, nullable = false)))
      val tagged = parted.mapPartitions { base =>
        val st = new DigestState(statCols, statPos, statDts)
        var curP = -1; var ord = -1; var tag = ""; var open = false
        def flush(): Unit = if (open) { acc.add(st.result("", tag)); open = false }
        new Iterator[Row] {
          def hasNext: Boolean = { val h = base.hasNext; if (!h) flush(); h }
          def next(): Row = {
            val r = base.next()
            val p = r.getInt(pI)
            val kb = r.getAs[Array[Byte]](kbI)
            if (p != curP) { flush(); curP = p; ord = -1; tag = s"$p-head" }
            if (isBoundaryKey(kb, target)) { flush(); ord += 1; tag = s"$p-$ord" }
            if (!open) { st.reset(); open = true }
            val proj = Row.fromSeq(dataIdx.map(i => r.get(i)))
            val (rb, ends) = rbEnc(proj)
            st.update(kb, rb, ends)
            Row.fromSeq(r.toSeq :+ tag)
          }
        }
      }(tagEnc)
      // positional field ids with EXPLICIT metadata: inherited metadata
      // (e.g. stale ids riding a projection from a chunk read) must
      // never reach the files — the id IS the position in THIS schema
      withJobDesc(spark, "graft:write") {
        tagged.select(cols.zipWithIndex.map { case (c, i) =>
            col(c).as(c, new MetadataBuilder().putLong(FieldIdKey, i.toLong).build())
          } :+ col(CHUNK): _*)
          .write.mode("overwrite")
          // one file per chunk is a format invariant; don't let a session
          // maxRecordsPerFile split chunk files
          .option("maxRecordsPerFile", 0)
          .option("compression", store.chunkCodec)
          .partitionBy(CHUNK).parquet(tmpDir)
      }

      // 4. commit chunk files into the content-addressed store — ONE
      //    batched commit for the whole materialization (object-store
      //    backends turn this into a single commit op, not N renames)
      import scala.jdk.CollectionConverters._
      val batch = Vector.newBuilder[(String, java.nio.file.Path)]
      val metas = acc.value.asScala.toArray.map { d =>
        val dir = Paths.get(tmpDir, s"$CHUNK=${d.tag}")
        val files = listFiles(dir).filter(_.toString.endsWith(".parquet"))
        require(files.length == 1,
          s"expected exactly one file per chunk, got ${files.length} for chunk ${d.tag}")
        batch += ((d.hash, files.head))
        ChunkMeta(d.hash, d.minKey, d.maxKey, d.rows, d.stats)
      }.sortWith((a, b) => Hashing.compareBytes(a.minKey, b.minKey) < 0)
      store.saveChunks(batch.result())

      deleteRecursively(Paths.get(tmpDir))
      val meta = TableMeta(schemaJson, keyCols, chunkTargetRows, metas.toSeq)
      store.saveTableMeta(meta)
      meta
    } finally {
      if (!small) kbDf.unpersist()
      ()
    }
  }

  /** Engine-internal actions run with AQE disabled: every
    * materialization plan is a fixed scan → encode → explicit
    * repartition(n) → sort → write shape whose partitioning the engine
    * already chose, so adaptive re-planning only adds
    * stage-materialization jobs (`df.rdd` under AQE splits the sample
    * pass into 2–3 jobs; the write grows an extra exchange job) —
    * ~2 extra job launches per materialization of pure fixed overhead.
    * Scale-safe: AQE never coalesces an explicit repartition(n) and no
    * joins run inside these plans.
    *
    * Engine conf lives on a THROWAWAY SESSION CLONE
    * ([[GraftBridge.engineSession]]), never on the user's session: a
    * thread-scoped `SQLConf.withExistingConf` override does not survive
    * the hop to Spark's async command-execution thread pool (measured,
    * tools/WriteProbe), and the former session-global flip let a
    * concurrent query on another thread observe AQE off — or restore a
    * stale value under interleaving (round-7 verdict #1). The frame is
    * rebound to the clone ([[GraftBridge.transplant]]), so its write
    * commands read the clone's conf wherever they execute; the user
    * session's conf is never touched (pinned two-threaded in
    * EngineConfIsolationSpec). */
  private[core] def onEngine(spark: SparkSession, df: DataFrame,
      smallShuffle: Boolean = false, interpretedOk: Boolean = true)
      : (SparkSession, DataFrame) = {
    val es = org.apache.spark.sql.GraftBridge.engineSession(spark)
    // byte-admitted driver routes collect a PROVABLY small frame; any
    // fold exchange inside it needs a handful of partitions, not the
    // session's full width — 30+ near-empty shuffle tasks were most of
    // those jobs' wall time. Plan shape only: partial aggregates
    // combine identically at any partition count, and the driver
    // writer re-sorts collected rows by key bytes. (A thread-local
    // override instead of the clone was tried and measured WORSE: the
    // conf does not survive into job execution — AQE re-enabled and
    // split every driver-route collect into 2-4 jobs.)
    if (smallShuffle) {
      val cur = es.sessionState.conf.numShufflePartitions
      es.conf.set("spark.sql.shuffle.partitions", math.min(cur, 8).toString)
      // a byte-admitted plan touches at most the driver budget of
      // data: interpreted expressions beat paying janino compilation
      // per plan (semantics identical — interpreted mode IS Spark's
      // codegen fallback path). NOT for optimistic PROBES
      // (interpretedOk = false): a probe's OUTPUT size is unknown —
      // that is why it probes — and generator fan-out runs real
      // expression work per output row (measured: the shingle-index
      // probe doubled interpreted), so probes keep codegen.
      if (interpretedOk) {
        es.conf.set("spark.sql.codegen.wholeStage", "false")
        es.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      }
    }
    (es, org.apache.spark.sql.GraftBridge.transplant(es, df))
  }

  /** Label the Spark jobs an engine phase launches (shows up in the UI
    * and in SparkListener job properties) — cheap thread-local tagging
    * that makes "where did this statement's N jobs come from" a
    * one-listener question instead of a guess. */
  private[graft] def withJobDesc[T](spark: SparkSession, desc: String)
      (body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  /** A materialization is "small" when the caller-known row bound fits
    * comfortably in one task: fixed per-job overhead (sample pass,
    * persist, multi-task shuffles) then dominates the data work. At
    * production chunk targets (~1M rows) this covers the metadata-sized
    * jobs of DML/refresh statement flows without ever narrowing a
    * genuinely large materialization. */
  private[core] val SmallJobRows = 1L << 16
  /** Task width of a SMALL grouped materialization (see the grouped
    * small path): enough to overlap parquet writer setup across groups,
    * low enough that task overhead stays negligible. */
  private[core] val SmallGroupedWidth = 8
  private[core] def smallJob(rowBound: Option[Long], target: Long): Boolean =
    rowBound.exists(_ <= math.max(2 * target, SmallJobRows))

  /** Grouped materialization: like [[materialize]], but the input carries
    * a group column and every group becomes its own canonical table in
    * one pass (one write job + one hash job for ALL groups). Used by the
    * chunk-level incremental transform, where each source chunk's
    * transformed rows are materialized as an independent memoizable
    * sub-table (the per-subtree results of sortNode,
    * /root/reference/messdb-base/src/MessDB/Trie.hs:467-470). */
  def materializeGrouped(spark: SparkSession, store: GraftStore,
      df0: DataFrame, groupCol: String, keyCols: Seq[String],
      chunkTargetRows: Long,
      rowBound: Option[Long] = None,
      rowProbe: Option[Long] = None,
      byteBound: Option[Long] = None): Map[String, TableMeta] = {
    val cols = canonicalColumns(
      StructType(df0.schema.filterNot(_.name == groupCol)), keyCols)
    // strip inherited metadata (stale field ids) — see materialize
    val df = df0.select(cols.map(c => col(c).as(c, Metadata.empty)) :+
      col(groupCol): _*)
    val dataSchema = StructType(df.schema.filterNot(_.name == groupCol))
    val schemaJson = normalizeSchema(dataSchema, keyCols).json

    val small = smallJob(rowBound, chunkTargetRows)
    // OBSERVED-bytes admission: when the caller knows the input's
    // compressed size (it read known chunk files), a metadata-sized
    // materialization takes the ONE-collect-job driver route even when
    // the row count is above the one-task smallJob rule — at scale the
    // same statement exceeds the byte budget and runs the job path.
    val bytesOk = byteBound.exists(_ <= Ops.DriverPatchMaxBytes) &&
      rowBound.exists(_ <= Ops.DriverPatchHardRowCap) &&
      driverMaterializeEnabled && DriverChunks.supported(dataSchema)
    // ZERO-JOB route: a driver-admitted input whose plan FOLDED to a
    // LocalRelation (ConvertToLocalRelation consumes deterministic
    // Project/Filter over driver-resident rows — the per-chunk
    // transform's driver-read source takes exactly this shape) collects
    // without any job, and the key bytes encode on the driver with the
    // same KeyCodec arithmetic the mapPartitions encoder applies — the
    // kbDf plan below can never fold (typed mapPartitions), so going
    // through it costs a parallelize-and-scan job for rows we already
    // hold. Any surprise (incl. the null-key guard, raised cleanly by
    // the standard path) falls through.
    if (bytesOk || driverMaterializeOk(rowBound, chunkTargetRows, dataSchema))
      // leaf pre-check on the ANALYZED plan (computed anyway for the
      // transplant) keeps the extra optimizer pass off non-local
      // driver-route inputs — only all-local-leaf plans can fold
      if (df.queryExecution.analyzed.collectLeaves().forall(
            _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]) &&
          df.queryExecution.optimizedPlan
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]) {
        try {
          val enc = KeyCodec.rowEncoder(normalizeSchema(dataSchema, keyCols), keyCols)
          val gIdx = df.schema.fieldIndex(groupCol)
          val dIdx = dataSchema.fieldNames.map(df.schema.fieldIndex)
          val kbSchema = normalizeSchema(dataSchema, keyCols)
            .add(StructField(groupCol, StringType))
            .add(StructField(KB, BinaryType, nullable = false))
          val rows: Array[Row] = df.collect().map { r =>
            val data = Row.fromSeq(dIdx.map(i => r.get(i)).toSeq)
            Row.fromSeq(data.toSeq :+ r.getString(gIdx) :+ enc(data))
          }
          val got = driverMaterializeGroupedRows(spark, store, rows, kbSchema,
            dataSchema, schemaJson, groupCol, keyCols, chunkTargetRows)
          got.foreach(return _)
        } catch { case scala.util.control.NonFatal(e) =>
          Ops.warnDriverPatchFallback(e) }
      }
    val kbDf0 = withKeyBytesKeeping(df, keyCols, groupCol)
    // no persist when a driver route will be attempted: its one collect
    // is the only read (a rare fallback recomputes — the cheap branch)
    val kbDf = if (small || bytesOk) kbDf0
      else kbDf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (bytesOk || driverMaterializeOk(rowBound, chunkTargetRows, dataSchema)) {
      val (es, ekb) = onEngine(spark, kbDf, smallShuffle = true,
        interpretedOk = interpretedCollectOk(rowBound, dataSchema))
      val got = driverMaterializeGrouped(es, store, ekb, dataSchema,
        schemaJson, groupCol, keyCols, chunkTargetRows, rowBound.get)
      got.foreach(return _)
    } else if (rowBound.isEmpty && driverMaterializeEnabled &&
        smallJob(rowProbe, chunkTargetRows) &&
        DriverChunks.supported(dataSchema)) {
      // OPTIMISTIC probe (generator-transform size gating): the output
      // size is unknown — a generator can fan 1→N — but the INPUT is
      // tiny (`rowProbe` = source rows, under the small-job rule), so
      // bet the output fits the driver cap: ONE limit-guarded collect
      // job; over the cap, the bet is off and the standard path below
      // recomputes (bounded waste, rare by construction). Probe conf
      // (one-job limit: all partitions in the first pass, not
      // incremental-limit's partition doubling) rides the thread-local
      // driver-route override.
      val cap = Ops.adaptiveRowCap(dataSchema, Ops.DriverPatchMaxRows)
      val probed: Option[Array[Row]] =
        try Some(withJobDesc(spark, "graft:probe-g") {
          val (_, ekb) =
            onEngine(spark, kbDf, smallShuffle = true, interpretedOk = false)
          ekb.limit(cap.toInt + 1).collect()
        })
        catch { case scala.util.control.NonFatal(e) =>
          Ops.warnDriverPatchFallback(e); None }
      probed.filter(_.length <= cap).foreach { rs =>
        val got = driverMaterializeGroupedRows(spark, store, rs, kbDf.schema,
          dataSchema, schemaJson, groupCol, keyCols, chunkTargetRows)
        got.foreach(return _)
      }
    }
    try {
      val (es, ekb) = onEngine(spark, kbDf)
      // same fused one-pass sampled-split scheme as [[materialize]],
      // compounded with the group: the driver holds an
      // O(shuffle-partitions) subsample of (group, boundary-key) pairs,
      // never the full per-group boundary lists. Chunk membership is
      // derived locally per task. Small jobs skip the pass (see
      // materialize).
      val target = chunkTargetRows
      val nPart =
        if (small) 1 else es.sessionState.conf.numShufflePartitions
      val sampled =
        if (small) Array.empty[(String, Array[Byte])]
        else withJobDesc(spark, "graft:sample-g")(
          sampleSplits(ekb, Some(groupCol), target, nPart)._2)
      val splits: Map[String, Array[Array[Byte]]] = sampled
        .groupBy(_._1)
        .map { case (g, pairs) =>
          g -> pairs.map(_._2).sortWith(Hashing.compareBytes(_, _) < 0)
        }
      val bcS = es.sparkContext.broadcast(splits)
      val partIdUdf = udf { (g: String, kb: Array[Byte]) =>
        boundaryIndex(bcS.value.getOrElse(g, Array.empty[Array[Byte]]), kb)
      }

      val tmpDir = Files.createTempDirectory("graft-canon-g-").toString
      val parted0 = ekb.withColumn(PART, partIdUdf(col(groupCol), col(KB)))
      // small GROUPED jobs still parallelize across groups: hashing on
      // the group column alone keeps every group inside one task (the
      // 1-file-per-chunk invariant) while spreading the encode+write
      // work — a per-chunk mini pass with dozens of groups was a
      // single-threaded straggler under coalesce(1). Width capped low:
      // the rows are small by definition, the win is concurrency of
      // parquet writer setup, not data parallelism.
      val parted = (if (small)
          parted0.repartition(
            math.min(es.sessionState.conf.numShufflePartitions,
              SmallGroupedWidth), col(groupCol))
        else parted0.repartition(nPart, col(groupCol), col(PART)))
        .sortWithinPartitions(col(groupCol), col(PART), col(KB))
      // fused write+digest job, exactly as in [[materialize]] but with
      // the group in the chunk scope: a (group, interval) change or a
      // boundary key closes the running digest
      val inSchema = parted.schema
      val kbI = inSchema.fieldIndex(KB)
      val pI = inSchema.fieldIndex(PART)
      val gI = inSchema.fieldIndex(groupCol)
      val rbEnc = KeyCodec.rowEncoderSliced(dataSchema, cols)
      val statCols = statColumns(dataSchema, keyCols)
      val statPos = statCols.map(cols.indexOf).toArray
      val statDts = statCols.map(dataSchema(_).dataType).toArray
      val dataIdx = cols.map(inSchema.fieldIndex)
      val acc = es.sparkContext
        .collectionAccumulator[FusedDigest]("graft-chunk-digests")
      val tagEnc = RowEncoder.encoderFor(
        inSchema.add(StructField(CHUNK, StringType, nullable = false)))
      val tagged = parted.mapPartitions { base =>
        val st = new DigestState(statCols, statPos, statDts)
        var curG: String = null; var curP = -1; var ord = -1
        var tag = ""; var open = false
        def flush(): Unit =
          if (open) { acc.add(st.result(curG, tag)); open = false }
        new Iterator[Row] {
          def hasNext: Boolean = { val h = base.hasNext; if (!h) flush(); h }
          def next(): Row = {
            val r = base.next()
            val g = r.getString(gI); val p = r.getInt(pI)
            val kb = r.getAs[Array[Byte]](kbI)
            if (g != curG || p != curP) {
              flush(); curG = g; curP = p; ord = -1; tag = s"$p-head"
            }
            if (isBoundaryKey(kb, target)) { flush(); ord += 1; tag = s"$p-$ord" }
            if (!open) { st.reset(); open = true }
            val proj = Row.fromSeq(dataIdx.map(i => r.get(i)))
            val (rb, ends) = rbEnc(proj)
            st.update(kb, rb, ends)
            Row.fromSeq(r.toSeq :+ tag)
          }
        }
      }(tagEnc)
      // positional field ids, explicit metadata (see materialize)
      withJobDesc(spark, "graft:write-g") {
        tagged.select(cols.zipWithIndex.map { case (c, i) =>
            col(c).as(c, new MetadataBuilder().putLong(FieldIdKey, i.toLong).build())
          } ++ Seq(col(groupCol), col(CHUNK)): _*)
          .write.mode("overwrite")
          .option("maxRecordsPerFile", 0) // format invariant: 1 file/chunk
          .option("compression", store.chunkCodec)
          .partitionBy(groupCol, CHUNK).parquet(tmpDir)
      }

      import scala.jdk.CollectionConverters._
      val batch = Vector.newBuilder[(String, java.nio.file.Path)]
      val out = acc.value.asScala.toArray.groupBy(_.group).map { case (g, ds) =>
        // group values become partition directory names; only accept
        // characters Spark's path escaping leaves untouched so the
        // constructed read-back path cannot diverge (all callers pass
        // hex hashes; richer values need escapePathName-aware listing)
        require(g.matches("[A-Za-z0-9_-]+"),
          s"group value '$g' is not path-safe")
        val metas = ds.map { d =>
          val dir = Paths.get(tmpDir, s"$groupCol=$g", s"$CHUNK=${d.tag}")
          val files = listFiles(dir).filter(_.toString.endsWith(".parquet"))
          require(files.length == 1, s"expected 1 file for ($g, ${d.tag})")
          batch += ((d.hash, files.head))
          ChunkMeta(d.hash, d.minKey, d.maxKey, d.rows, d.stats)
        }.sortWith((a, b) => Hashing.compareBytes(a.minKey, b.minKey) < 0)
        val meta = TableMeta(schemaJson, keyCols, chunkTargetRows, metas.toSeq)
        g -> meta
      }
      // one batched chunk commit for ALL groups, then the metas (a meta
      // must never be readable before its chunks are durable)
      store.saveChunks(batch.result())
      out.values.foreach(store.saveTableMeta)
      deleteRecursively(Paths.get(tmpDir))
      out
    } finally {
      if (!small) kbDf.unpersist()
      ()
    }
  }

  /** Driver-side canonical chunk writer: splits key-sorted rows at
    * boundary keys (first segment = the run head), digests each chunk
    * with the shared [[DigestState]] arithmetic, writes the
    * files via [[DriverChunks]], and registers them in `batch`. */
  private[core] final class DriverRunWriter(schema: StructType,
      keyCols: Seq[String], target: Long, chunkCodec: String,
      tmp: java.nio.file.Path,
      batch: scala.collection.mutable.Builder[(String, java.nio.file.Path), Vector[(String, java.nio.file.Path)]]) {
    private val cols = schema.fieldNames.toSeq
    private val rbEnc = KeyCodec.rowEncoderSliced(schema, cols)
    private val statCols = statColumns(schema, keyCols)
    private val statPos = statCols.map(cols.indexOf).toArray
    private val statDts = statCols.map(schema(_).dataType).toArray
    private val fileN = new java.util.concurrent.atomic.AtomicInteger
    /** Thread-safe: concurrent writeRun calls (and the parallel chunk
      * writes within one call) contend only on the file counter and the
      * batch builder. */
    def writeRun(rows: Seq[(org.apache.spark.sql.Row, Array[Byte])])
        : Seq[ChunkMeta] = {
      // split at boundary keys (one sequential scan), then digest +
      // write each chunk CONCURRENTLY (driver IO parallelism, parIo)
      val segs = Vector.newBuilder[Vector[(org.apache.spark.sql.Row, Array[Byte])]]
      var cur = Vector.newBuilder[(org.apache.spark.sql.Row, Array[Byte])]
      var curN = 0
      rows.foreach { case t @ (_, kb) =>
        if (curN > 0 && isBoundaryKey(kb, target)) {
          segs += cur.result()
          cur = Vector.newBuilder[(org.apache.spark.sql.Row, Array[Byte])]
          curN = 0
        }
        cur += t; curN += 1
      }
      if (curN > 0) segs += cur.result()
      parIo(segs.result()) { chunkRows =>
        val st = new DigestState(statCols, statPos, statDts)
        chunkRows.foreach { case (row, kb) =>
          val (rb, ends) = rbEnc(row)
          st.update(kb, rb, ends)
        }
        val d = st.result("", "")
        val f = tmp.resolve(s"c${fileN.getAndIncrement()}.parquet")
        DriverChunks.writeChunk(f, schema, chunkRows.map(_._1), chunkCodec)
        batch.synchronized { batch += ((d.hash, f)) }
        ChunkMeta(d.hash, d.minKey, d.maxKey, d.rows, d.stats)
      }
    }
  }


  /** Test seam + production gate for the ZERO-SHUFFLE driver
    * materialization below. Always true in production; specs flip it to
    * pin driver-route == Spark-route hash equality. */
  @volatile private[graft] var driverMaterializeEnabled = true

  /** Interpreted-vs-codegen crossover for the BYTE-ADMITTED driver-route
    * collects: the interpreted discipline (see [[onEngine]]) exists
    * because a metadata-sized frame's data work is dwarfed by janino
    * compilation per plan shape — but the byte budget admits up to
    * [[Ops.DriverPatchHardRowCap]] (1M) rows, and above ~64Ki rows the
    * interpreted evaluation of the collect's own plan (key-encode UDF +
    * the ingest fold) loses to paying one codegen compile. Measured
    * with tools/CtasProfile (A/B interleaved, 2×3 reps, sf0.1/
    * local[32]): a 600k-row × ~80 B/row CTAS collect halves under
    * codegen (job 2.1–2.8 s vs 3.6–6.6 s across both runs) while a
    * 600k-row-bound × 24 B/row aggregated ingest consistently favors
    * interpreted (its per-row work is a narrow hash-agg probe; the
    * compile cost of the two-level fold plan dominates) — so the edge
    * is a BYTE threshold scaled by estimated row width (the
    * [[Ops.adaptiveRowCap]] idiom), not a row count: 16 MB of
    * estimated row bytes sits between the two measured points.
    * `var` as a measurement seam (tools/CtasProfile A/Bs it);
    * production never writes it. */
  @volatile private[graft] var InterpretedCollectMaxBytes: Long = 16L << 20

  /** The byte-admitted collect sites' interpreted admission: estimated
    * row bytes (row bound × schema width) under the measured crossover.
    * Unknown bounds stay interpreted — every such caller is
    * metadata-sized by construction. */
  private[graft] def interpretedCollectOk(rowBound: Option[Long],
      schema: StructType): Boolean =
    rowBound.forall(r =>
      r * math.max(16, schema.defaultSize) <= InterpretedCollectMaxBytes)

  /** A small materialization whose schema the driver writer handles and
    * whose caller-known row bound fits the driver cap takes the DRIVER
    * route: ONE collect job (no exchange, no write tasks, no
    * FileFormatWriter commit protocol), then encode + digest + chunk
    * files written on the driver — the same statement-flow economics as
    * the zero-job point DML, applied to every metadata-sized engine
    * materialization (per-chunk minis, merge regions, small CTAS
    * deltas). Chunk bytes and hashes are identical to the Spark route:
    * same boundary rule, same [[DigestState]] arithmetic, same
    * [[DriverChunks]] writer the patch path already pins. */
  private def driverMaterializeOk(rowBound: Option[Long], target: Long,
      dataSchema: StructType): Boolean =
    driverMaterializeEnabled && smallJob(rowBound, target) &&
      rowBound.exists(_ <=
        Ops.adaptiveRowCap(dataSchema, Ops.DriverPatchMaxRows)) &&
      DriverChunks.supported(dataSchema)

  /** Driver route of [[materialize]]: collect the (data ++ kb) rows,
    * sort by key bytes, split at boundary keys, write chunks driver-side.
    * None — caller falls through to the Spark route — on any surprise. */
  private def driverMaterialize(spark: SparkSession, store: GraftStore,
      kbDf: DataFrame, dataSchema0: StructType, schemaJson: String,
      keyCols: Seq[String], target: Long,
      rowBound: Long): Option[TableMeta] =
    try {
      // a row bound of 0 asserts the input is empty — no job at all
      val rows: Array[Row] =
        if (rowBound == 0L) Array.empty
        else withJobDesc(spark, "graft:collect")(kbDf.collect())
      driverMaterializeRows(store, rows, kbDf.schema, dataSchema0,
        schemaJson, keyCols, target)
    } catch { case scala.util.control.NonFatal(e) =>
      Ops.warnDriverPatchFallback(e); None }

  /** [[driverMaterialize]] over already-collected (data ++ kb) rows —
    * shared by the known-bound route and the optimistic probe route. */
  private def driverMaterializeRows(store: GraftStore, rows: Array[Row],
      kbSchema: StructType, dataSchema0: StructType, schemaJson: String,
      keyCols: Seq[String], target: Long): Option[TableMeta] =
    try {
      val schema = normalizeSchema(dataSchema0, keyCols)
      val kbIdx = kbSchema.fieldIndex(KB)
      val n = schema.length
      val pairs = rows.map(r =>
          (Row.fromSeq(r.toSeq.take(n)), r.getAs[Array[Byte]](kbIdx)))
      java.util.Arrays.sort(pairs,
        (a: (Row, Array[Byte]), b: (Row, Array[Byte])) =>
          Hashing.compareBytes(a._2, b._2))
      val tmp = Files.createTempDirectory("graft-driver-mat-")
      try {
        val batch = Vector.newBuilder[(String, java.nio.file.Path)]
        val w = new DriverRunWriter(schema, keyCols, target,
          store.chunkCodec, tmp, batch)
        val metas = w.writeRun(pairs.toSeq)
        store.saveChunks(batch.result())
        val meta = TableMeta(schemaJson, keyCols, target, metas)
        store.saveTableMeta(meta)
        Some(meta)
      } finally deleteRecursively(tmp)
    } catch { case scala.util.control.NonFatal(e) =>
      Ops.warnDriverPatchFallback(e); None }

  /** Driver route of [[materializeGrouped]]: one collect for ALL groups,
    * then per-group sort/split/write on the driver. */
  private def driverMaterializeGrouped(spark: SparkSession,
      store: GraftStore, kbDf: DataFrame, dataSchema: StructType,
      schemaJson: String, groupCol: String, keyCols: Seq[String],
      target: Long, rowBound: Long): Option[Map[String, TableMeta]] = {
    val rows: Array[Row] =
      if (rowBound == 0L) Array.empty
      else
        try withJobDesc(spark, "graft:collect-g")(kbDf.collect())
        catch { case scala.util.control.NonFatal(e) =>
          Ops.warnDriverPatchFallback(e); return None }
    driverMaterializeGroupedRows(spark, store, rows, kbDf.schema,
      dataSchema, schemaJson, groupCol, keyCols, target)
  }

  /** [[driverMaterializeGrouped]] over already-collected (data ++ group
    * ++ kb) rows — shared by the known-bound route and the optimistic
    * probe route. */
  private def driverMaterializeGroupedRows(spark: SparkSession,
      store: GraftStore, rows: Array[Row],
      kbSchema: StructType, dataSchema: StructType,
      schemaJson: String, groupCol: String, keyCols: Seq[String],
      target: Long): Option[Map[String, TableMeta]] =
    try {
      val schema = normalizeSchema(dataSchema, keyCols)
      val gIdx = kbSchema.fieldIndex(groupCol)
      val kbIdx = kbSchema.fieldIndex(KB)
      val n = schema.length
      val tmp = Files.createTempDirectory("graft-driver-mat-g-")
      try {
        val batch = Vector.newBuilder[(String, java.nio.file.Path)]
        val w = new DriverRunWriter(schema, keyCols, target,
          store.chunkCodec, tmp, batch)
        val out = parIo(rows.groupBy(_.getString(gIdx)).toSeq) {
          case (g, rs) =>
            val pairs = rs.map(r =>
              (Row.fromSeq(r.toSeq.take(n)), r.getAs[Array[Byte]](kbIdx)))
            java.util.Arrays.sort(pairs,
              (a: (Row, Array[Byte]), b: (Row, Array[Byte])) =>
                Hashing.compareBytes(a._2, b._2))
            val metas = w.writeRun(pairs.toSeq)
            g -> TableMeta(schemaJson, keyCols, target, metas)
        }.toMap
        store.saveChunks(batch.result())
        out.values.foreach(store.saveTableMeta)
        Some(out)
      } finally deleteRecursively(tmp)
    } catch { case scala.util.control.NonFatal(e) =>
      Ops.warnDriverPatchFallback(e); None }

  /** withKeyBytes preserving an extra column outside the canonical set. */
  private[core] def withKeyBytesKeeping(df: DataFrame, keyCols: Seq[String],
      keep: String): DataFrame = {
    val dataSchema = StructType(df.schema.filterNot(_.name == keep))
    val enc = KeyCodec.rowEncoder(normalizeSchema(dataSchema, keyCols), keyCols)
    val keepIdx = df.schema.fieldIndex(keep)
    val dataIdx = dataSchema.fieldNames.map(df.schema.fieldIndex)
    val outSchema = normalizeSchema(dataSchema, keyCols)
      .add(StructField(keep, StringType))
      .add(StructField(KB, BinaryType, nullable = false))
    val outEnc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.map { r =>
        val data = Row.fromSeq(dataIdx.map(i => r.get(i)).toSeq)
        Row.fromSeq(data.toSeq :+ r.getString(keepIdx) :+ enc(data))
      }
    }(outEnc)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
    }
  }
}
