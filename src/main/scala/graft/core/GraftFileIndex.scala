package graft.core

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Catalyst [[FileIndex]] over a table's chunk list — the Delta/Iceberg-
  * style scan integration: Spark pushes each query's data filters into
  * `listFiles`, and chunks provably outside the predicate's leading-key
  * range are never listed, so SQL over catalog tables (`SELECT ... WHERE
  * k >= a AND k < b`) reads only the matching chunk files. Pruning uses
  * the SAME [[RangeBounds]] arithmetic as rangeFilter/deleteRange, one
  * level above parquet row-group min/max skipping (which still applies
  * inside each surviving file).
  *
  * Also fixes scan statistics: `sizeInBytes` comes from chunk metadata,
  * so joins against small graft tables plan as broadcasts without a
  * separate file-listing pass, and the driver never runs the
  * InMemoryFileIndex directory crawl (the chunk list IS the listing).
  *
  * Conservative by construction: unrecognized predicates prune nothing;
  * every kept chunk is re-filtered by the engine's normal row-level
  * predicates, so pruning can only remove provably-disjoint files.
  */
final class GraftFileIndex(spark: SparkSession, store: GraftStore,
    m: TableMeta) extends FileIndex {

  /** Size upper bounds of this scan (all chunks, pre-pruning) — the
    * inputs of the byte-admitted driver routes for row-local plans
    * over this relation. */
  def totalRows: Long = m.chunks.iterator.map(_.rows).sum
  def totalBytes: Long = chunkFiles.iterator.map(_._2.getLen).sum

  /** The scanned table's metadata — chunk row counts, key bounds, and
    * zone-map stats. What the metadata-only aggregate rewrite
    * ([[MetaAgg]]) answers COUNT/MIN/MAX from without opening files. */
  def tableMeta: TableMeta = m

  /** The same table restricted to a chunk subset — the edge-chunk scan
    * of the metadata range-count rewrite. */
  def withChunks(cs: Seq[ChunkMeta]): GraftFileIndex =
    new GraftFileIndex(spark, store, m.copy(chunks = cs))

  private val chunkFiles: Seq[(ChunkMeta, FileStatus)] = m.chunks.map { c =>
    val f = new java.io.File(store.chunkPath(c.hash))
    c -> new FileStatus(f.length(), false, 1, 128L * 1024 * 1024,
      f.lastModified(), new Path(f.toURI))
  }

  private val keyDts = m.keyCols.map(k => m.schema(k).dataType)
  private val toExternal =
    keyDts.map(CatalystTypeConverters.createToScalaConverter)

  override def rootPaths: Seq[Path] =
    chunkFiles.map(_._2.getPath.getParent).distinct

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val bounds = extractBounds(dataFilters)
    val stats = statPredicates(dataFilters)
    val kept = chunkFiles
      .filter { case (c, _) =>
        bounds.forall { case (lo, hi) => RangeBounds.chunkIntersects(c, lo, hi) }
      }
      .filter { case (c, _) => stats.forall(_(c)) }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._2).toArray))
  }

  /** Zone-map pruning on VALUE columns: each conjunct comparing a
    * stats-carrying column to a literal becomes a chunk predicate over
    * the column's per-chunk (min, max, nulls) — the data-skipping layer
    * at file-open level, above parquet row-group stats. The evaluator
    * lives in [[ZoneMaps]] (shared with transform/DML chunk skipping)
    * and recurses through AND/OR/NOT, so a pushed disjunction
    * (`status = 'A' OR status = 'R'`) prunes too. */
  private def statPredicates(filters: Seq[Expression]): Seq[ChunkMeta => Boolean] =
    ZoneMaps.keepTests(m.schema, filters)

  override def inputFiles: Array[String] =
    chunkFiles.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = () // chunks are immutable (content-addressed)

  override val sizeInBytes: Long = chunkFiles.map(_._2.getLen).sum

  override def partitionSchema: StructType = StructType(Nil)

  /** Bounds from conjunct predicates on the LEADING key column compared
    * to literals (both operand orders). Anything else contributes no
    * bound. Null literals match no rows but are left to the row filter
    * (pruning must never reason about null semantics).
    *
    * Composite keys: an equality chain on the leading columns,
    * optionally followed by range comparison(s) on the next one —
    * `k1 = a AND k2 >= b AND k2 < c` prunes on the (a,b)…(a,c) tuple
    * prefix via the Bound encoding's prefix semantics. */
  private def extractBounds(filters: Seq[Expression])
      : Seq[(Option[RangeBounds.Bnd], Option[RangeBounds.Bnd])] = {
    // (key column index, op, external value) per usable conjunct
    val cmps: Seq[(Int, String, Any)] = filters.flatMap { f =>
      def at(e: Expression): Option[Int] = e match {
        case a: AttributeReference =>
          val i = m.keyCols.indexOf(a.name); if (i >= 0) Some(i) else None
        case _ => None
      }
      // IN-list: bound by the list's min/max VALUES under the ORDER-
      // PRESERVING key encoding (byte order == value order, so no
      // per-type comparator); the row filter enforces exact membership
      def inValuesBounds(e: Expression, vs0: Seq[Any], complete: Boolean)
          : Seq[(Int, String, Any)] =
        at(e).toSeq.flatMap { i =>
          val vs = vs0.filter(_ != null)
          if (vs.isEmpty || !complete) Nil
          else {
            try {
              val enc = KeyCodec.fieldEncoder(keyDts(i))
              val encoded = vs.map { v =>
                val buf = new KeyCodec.ByteBuf(16)
                enc(buf, toExternal(i)(v))
                (buf.toBytes, v)
              }
              // compareBytes is UNSIGNED lexicographic — the order the
              // codec preserves (a signed Byte ordering would misrank)
              val sorted = encoded.sortWith((x, y) =>
                Hashing.compareBytes(x._1, y._1) < 0)
              Seq((i, ">=", sorted.head._2), (i, "<=", sorted.last._2))
            } catch { case scala.util.control.NonFatal(_) => Nil }
          }
        }
      val parsed: Seq[(Int, String, Any)] = f match {
        case In(a, list) =>
          val lits = list.collect { case Literal(v, _) => v }
          inValuesBounds(a, lits, complete = lits.length == list.length)
        // long IN lists optimize to InSet (inSetConversionThreshold);
        // a null in the set matches no rows anyway — drop it, bound the rest
        case InSet(a, hset) => inValuesBounds(a, hset.toSeq, complete = true)
        case other => (other match {
        case EqualTo(a, Literal(v, _)) => at(a).map(i => (i, "=", v))
        case EqualTo(Literal(v, _), a) => at(a).map(i => (i, "=", v))
        case GreaterThanOrEqual(a, Literal(v, _)) => at(a).map(i => (i, ">=", v))
        case GreaterThan(a, Literal(v, _)) => at(a).map(i => (i, ">", v))
        case LessThanOrEqual(a, Literal(v, _)) => at(a).map(i => (i, "<=", v))
        case LessThan(a, Literal(v, _)) => at(a).map(i => (i, "<", v))
        // literal-first forms flip the comparison direction
        case GreaterThanOrEqual(Literal(v, _), a) => at(a).map(i => (i, "<=", v))
        case GreaterThan(Literal(v, _), a) => at(a).map(i => (i, "<", v))
        case LessThanOrEqual(Literal(v, _), a) => at(a).map(i => (i, ">=", v))
        case LessThan(Literal(v, _), a) => at(a).map(i => (i, ">", v))
        case _ => None
        }).toSeq
      }
      parsed.flatMap { case (i, op, v) =>
        Option(v).flatMap { raw =>
          try Some((i, op, toExternal(i)(raw)))
          catch { case scala.util.control.NonFatal(_) => None }
        }
      }
    }
    def enc(prefix: Seq[Any], inclusive: Boolean): Option[RangeBounds.Bnd] =
      try Some((RangeBounds.boundBytes(m.schema, m.keyCols,
        Bound(prefix, inclusive)), inclusive))
      catch { case scala.util.control.NonFatal(_) => None }
    // walk key columns: extend the equality prefix while each column has
    // an equality; the first column without one contributes its range
    // comparisons (first lower + first upper seen) and ends the prefix
    val prefix = Vector.newBuilder[Any]
    var depth = 0
    var done = false
    var lo: Option[RangeBounds.Bnd] = None
    var hi: Option[RangeBounds.Bnd] = None
    while (!done && depth < m.keyCols.length) {
      cmps.collectFirst { case (i, "=", v) if i == depth => v } match {
        case Some(v) => prefix += v; depth += 1
        case None =>
          val p = prefix.result()
          val lower = cmps.collectFirst {
            case (i, ">=", v) if i == depth => (v, true)
            case (i, ">", v) if i == depth => (v, false)
          }
          val upper = cmps.collectFirst {
            case (i, "<=", v) if i == depth => (v, true)
            case (i, "<", v) if i == depth => (v, false)
          }
          lo = lower.flatMap { case (v, inc) => enc(p :+ v, inc) }
          hi = upper.flatMap { case (v, inc) => enc(p :+ v, inc) }
          // a non-empty equality prefix caps any side the range
          // comparisons left open (including both, when absent) — a
          // one-sided range would otherwise list every chunk of later
          // prefix values
          if (p.nonEmpty) {
            if (lo.isEmpty) lo = enc(p, inclusive = true)
            if (hi.isEmpty) hi = enc(p, inclusive = true)
          }
          done = true
      }
    }
    if (!done) { // every key column pinned by an equality
      val p = prefix.result()
      lo = enc(p, inclusive = true)
      hi = enc(p, inclusive = true)
    }
    if (lo.isEmpty && hi.isEmpty) Nil else Seq((lo, hi))
  }
}
