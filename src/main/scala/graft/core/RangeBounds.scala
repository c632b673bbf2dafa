package graft.core

import org.apache.spark.sql.types.StructType

/** Key-prefix range arithmetic over the order-preserving key encoding —
  * THE chunk in/out/intersects decision (the keyPrefixRangeRelation
  * analogue, /root/reference/messdb-base/src/MessDB/Trie/Path.hs:117-145),
  * shared by rangeFilter/deleteRange (Ops.computeRange) and the pruned
  * scan ([[GraftFileIndex]]) so the two paths can never diverge.
  *
  * A bound is (encoded-prefix-bytes, inclusive). Tuple-prefix semantics:
  * a key EXTENDING the prefix compares equal to it — an inclusive bound
  * admits it, an exclusive bound rejects it.
  */
object RangeBounds {

  type Bnd = (Array[Byte], Boolean)

  def startsWith(full: Array[Byte], prefix: Array[Byte]): Boolean =
    full.length >= prefix.length && {
      var i = 0
      while (i < prefix.length) { if (full(i) != prefix(i)) return false; i += 1 }
      true
    }

  /** key-bytes admitted by the lower bound (None = -inf). */
  def passesLow(kb: Array[Byte], loB: Option[Bnd]): Boolean =
    loB.forall { case (b, inc) =>
      val c = Hashing.compareBytes(kb, b)
      if (inc) c >= 0 || startsWith(kb, b)
      else c > 0 && !startsWith(kb, b)
    }

  /** key-bytes admitted by the upper bound (None = +inf). */
  def passesHigh(kb: Array[Byte], hiB: Option[Bnd]): Boolean =
    hiB.forall { case (b, inc) =>
      val c = Hashing.compareBytes(kb, b)
      if (inc) c <= 0 || startsWith(kb, b)
      else c < 0 && !startsWith(kb, b)
    }

  /** Chunk entirely inside the range (pass through untouched). */
  def chunkContained(c: ChunkMeta, loB: Option[Bnd], hiB: Option[Bnd]): Boolean =
    passesLow(c.minKey, loB) && passesHigh(c.minKey, hiB) &&
      passesLow(c.maxKey, loB) && passesHigh(c.maxKey, hiB)

  /** Chunk MAY contain keys in the range (must be read); the complement
    * is provably disjoint and is skipped without reading. */
  def chunkIntersects(c: ChunkMeta, loB: Option[Bnd], hiB: Option[Bnd]): Boolean =
    passesHigh(c.minKey, hiB) && passesLow(c.maxKey, loB)

  /** Encode a typed bound prefix with the table's key codec. */
  def boundBytes(schema: StructType, keyCols: Seq[String], b: Bound): Array[Byte] = {
    val buf = new KeyCodec.ByteBuf(32)
    b.prefix.zipWithIndex.foreach { case (v, i) =>
      val dt = schema(keyCols(i)).dataType
      KeyCodec.fieldEncoder(dt)(buf, v)
    }
    buf.toBytes
  }
}
