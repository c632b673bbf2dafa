package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst aggregate for the mergeable bin-count histogram
  * sketch behind `HIST_QUANTILE` materialized views: accumulates
  * interleaved `[k1,v1,k2,v2,…]` long-array contributions into a
  * long→long count map and emits the key-sorted interleaved array.
  *
  * Why a TypedImperativeAggregate and not the collect_list + HOF-lambda
  * formulation it replaces: collect_list BUFFERS every row's
  * contribution per group — O(rows) aggregation state, the opposite of
  * a sketch — and the merge lambda runs one interpreted step (plus a
  * map allocation) per element. This aggregate is O(distinct bins)
  * state with O(1) per-row updates, and Spark's partial aggregation
  * gives it map-side combine for free, exactly like a built-in.
  *
  * Bit-exact contract (the combinable-fold requirement): integer count
  * sums are associative/commutative and the output is key-sorted, so
  * any update/merge order yields identical bytes — the content-address
  * convergence the O(delta) refresh path needs. Output is identical,
  * byte for byte, to the HOF formulation it replaces (pinned by the
  * HIST_QUANTILE spec's incremental == from-scratch hash assertion).
  *
  * Input rows: an interleaved array (empty array = the null
  * contribution); a NULL array contributes nothing; an odd trailing
  * element is rejected at type level by construction (contributions are
  * built by the SqlViews lowering). */
case class HistSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hist_sketch requires array<bigint> input, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "hist_sketch"

  override def createAggregationBuffer(): scala.collection.mutable.LongMap[Long] =
    scala.collection.mutable.LongMap.empty[Long]

  override def update(buf: scala.collection.mutable.LongMap[Long],
      input: InternalRow): scala.collection.mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      var i = 0
      while (i + 1 < n) {
        val k = a.getLong(i)
        buf.put(k, buf.getOrElse(k, 0L) + a.getLong(i + 1))
        i += 2
      }
    }
    buf
  }

  override def merge(b1: scala.collection.mutable.LongMap[Long],
      b2: scala.collection.mutable.LongMap[Long])
      : scala.collection.mutable.LongMap[Long] = {
    b2.foreachEntry { (k, v) => b1.put(k, b1.getOrElse(k, 0L) + v) }
    b1
  }

  override def eval(buf: scala.collection.mutable.LongMap[Long]): Any = {
    // zero-count bins are DROPPED: with non-negative contributions a
    // present bin's count is a sum of 1s (≥ 1), so this is a no-op on
    // every historical input — it exists for the RETRACTION path, where
    // a negated contribution ([bin, -1]) can cancel a bin exactly and
    // the canonical from-scratch sketch has no such bin at all
    val keys = buf.keys.filter(k => buf(k) != 0L).toArray
    java.util.Arrays.sort(keys)
    val out = new Array[Long](keys.length * 2)
    var i = 0
    while (i < keys.length) {
      out(2 * i) = keys(i)
      out(2 * i + 1) = buf(keys(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: scala.collection.mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry { (k, v) => bb.putLong(k); bb.putLong(v); () }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }
}

object HistSketchAgg {
  /** Column-level entry point for the SqlViews fold lowering. */
  def apply(c: Column): Column =
    GraftBridge.column(
      new HistSketchAgg(GraftBridge.expression(c)).toAggregateExpression())
}
