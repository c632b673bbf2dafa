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

  private val chunkFiles: Seq[(ChunkMeta, FileStatus)] = m.chunks.map { c =>
    val f = new java.io.File(store.chunkPath(c.hash))
    c -> new FileStatus(f.length(), false, 1, 128L * 1024 * 1024,
      f.lastModified(), new Path(f.toURI))
  }

  private val leadKey = m.keyCols.head
  private val leadDt = m.schema(leadKey).dataType
  private val toExternal = CatalystTypeConverters.createToScalaConverter(leadDt)

  override def rootPaths: Seq[Path] =
    chunkFiles.map(_._2.getPath.getParent).distinct

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val bounds = extractBounds(dataFilters)
    val kept =
      if (bounds.isEmpty) chunkFiles
      else chunkFiles.filter { case (c, _) =>
        bounds.forall { case (lo, hi) => RangeBounds.chunkIntersects(c, lo, hi) }
      }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._2).toArray))
  }

  override def inputFiles: Array[String] =
    chunkFiles.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = () // chunks are immutable (content-addressed)

  override val sizeInBytes: Long = chunkFiles.map(_._2.getLen).sum

  override def partitionSchema: StructType = StructType(Nil)

  /** Bounds from conjunct predicates on the LEADING key column compared
    * to literals (both operand orders). Anything else contributes no
    * bound. Null literals match no rows but are left to the row filter
    * (pruning must never reason about null semantics). */
  private def extractBounds(filters: Seq[Expression])
      : Seq[(Option[RangeBounds.Bnd], Option[RangeBounds.Bnd])] = {
    def enc(v: Any, inclusive: Boolean): Option[RangeBounds.Bnd] =
      Option(v).flatMap { raw =>
        try Some((RangeBounds.boundBytes(m.schema, m.keyCols,
          Bound(Seq(toExternal(raw)), inclusive)), inclusive))
        catch { case scala.util.control.NonFatal(_) => None }
      }
    def isLead(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == leadKey
      case _ => false
    }
    filters.flatMap {
      case EqualTo(a, Literal(v, _)) if isLead(a) =>
        enc(v, inclusive = true).map(b => (Some(b), Some(b))).toSeq
      case EqualTo(Literal(v, _), a) if isLead(a) =>
        enc(v, inclusive = true).map(b => (Some(b), Some(b))).toSeq
      case GreaterThanOrEqual(a, Literal(v, _)) if isLead(a) =>
        Seq((enc(v, inclusive = true), None))
      case GreaterThan(a, Literal(v, _)) if isLead(a) =>
        Seq((enc(v, inclusive = false), None))
      case LessThanOrEqual(a, Literal(v, _)) if isLead(a) =>
        Seq((None, enc(v, inclusive = true)))
      case LessThan(a, Literal(v, _)) if isLead(a) =>
        Seq((None, enc(v, inclusive = false)))
      // literal-first forms flip the comparison direction
      case GreaterThanOrEqual(Literal(v, _), a) if isLead(a) =>
        Seq((None, enc(v, inclusive = true)))
      case GreaterThan(Literal(v, _), a) if isLead(a) =>
        Seq((None, enc(v, inclusive = false)))
      case LessThanOrEqual(Literal(v, _), a) if isLead(a) =>
        Seq((enc(v, inclusive = true), None))
      case LessThan(Literal(v, _), a) if isLead(a) =>
        Seq((enc(v, inclusive = false), None))
      case _ => Nil
    }
  }
}
