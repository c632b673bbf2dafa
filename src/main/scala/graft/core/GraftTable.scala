package graft.core

import scala.reflect.runtime.universe.TypeTag
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Typed facade over the canonical table layer — the `Table k v` view
  * (/root/reference/messdb-schema/src/MessDB/Table.hs:38-60) for callers
  * who want case-class rows with compile-time field checks. `T` is the
  * full row type; `keyCols` names the key fields. The untyped
  * DataFrame algebra underneath is unchanged (encoders only wrap the
  * boundary). */
final class GraftTable[T <: Product : TypeTag](val ops: Ops,
    val keyCols: Seq[String]) {

  private implicit def enc: Encoder[T] = Encoders.product[T]
  private def spark: SparkSession = ops.spark

  def fromDataset(ds: Dataset[T], fold: FoldSpec = FoldSpec.FoldLast): TableRef =
    ops.fromDataFrame(ds.toDF(), keyCols, fold)

  def scan(ref: TableRef): Dataset[T] = ops.scan(ref).as[T]

  def scanOrdered(ref: TableRef): Dataset[T] = ops.scanOrdered(ref).as[T]

  def merge(refs: Seq[TableRef], fold: FoldSpec = FoldSpec.FoldLast): TableRef =
    ops.merge(refs, fold)

  def upsert(base: TableRef, delta: Dataset[T]): TableRef =
    ops.upsert(base, fromDataset(delta))

  def lookup(ref: TableRef, key: Seq[Any]): Option[T] =
    ops.lookup(ref, key).as[T].collect().headOption

  def range(ref: TableRef, lower: Option[Bound], upper: Option[Bound]): TableRef =
    ops.rangeFilter(ref, lower, upper)
}
