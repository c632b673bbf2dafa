package graft.core

/** Streaming merge-region planner — the O(working-set) replacement for
  * the materialized region decomposition (SCALE.md "streaming region
  * planner"): a single k-way sorted sweep over the inputs' chunk-meta
  * streams discovers boundaries, region membership, and spanning chunks
  * in key order, holding only the OPEN chunks (those overlapping the
  * current sweep position — at most a handful per source for canonical
  * disjoint-within-table inputs) plus whatever the caller chooses to
  * record. Planning a 100 TB / multi-million-chunk merge therefore
  * needs driver memory proportional to the DELTA (dirty regions +
  * spanning chunks), never to the table: clean single-participant
  * regions stream through the callback and can be emitted or dropped
  * without retention.
  *
  * Region semantics are identical to the materialized planner (the
  * keyPrefixRangeRelation analogue, see Ops.computeMerge): boundary keys
  * are the intrinsic-boundary chunk minKeys
  * ([[Canonical.isBoundaryKey]]); a key equal to a boundary belongs to
  * the region STARTING at it ([[Canonical.boundaryIndex]] counts <=);
  * a chunk participates in every region its [min, max] range overlaps.
  */
object MergePlanner {

  /** Re-iterable source of one input's chunk metas in minKey order
    * (a table's chunk list, a ChunkIndex sidecar reader, or a synthetic
    * generator — the planner never materializes it). */
  type ChunkSource = () => Iterator[ChunkMeta]

  /** One participant of a region: `spansBefore`/`spansBeyond` mark a
    * chunk that also participates in an earlier/later region (union =
    * the spanning chunks that need per-region piece splitting). */
  final case class Part(src: Int, chunk: ChunkMeta,
      spansBefore: Boolean, spansBeyond: Boolean) {
    def spanning: Boolean = spansBefore || spansBeyond
  }

  /** A nonempty region [loHex, hiHex) of the merged keyspace, bounds as
    * key hex with "-inf"/"+inf" sentinels (the same strings the piece
    * memo keys use). `parts` is in arrival order; callers needing the
    * canonical participant order sort by (src, minKeyHex). */
  final case class Region(loHex: String, hiHex: String, parts: List[Part])

  /** Sweep every source in global minKey order, invoking `onRegion` for
    * each NONEMPTY region in key order. Total work is
    * O(n log s) for n chunks over s sources; peak retained state is the
    * open set only. */
  def sweep(sources: Seq[ChunkSource], target: Long)(onRegion: Region => Unit): Unit = {
    final class Src(val idx: Int, val it: Iterator[ChunkMeta]) {
      var head: ChunkMeta = _
      var headMin: Array[Byte] = _
      def advance(): Unit =
        if (it.hasNext) { head = it.next(); headMin = head.minKey }
        else { head = null; headMin = null }
      advance()
    }
    // min-heap on (head.minKey, src index) — src index keeps the pull
    // order deterministic when inputs share a minKey
    val ord: Ordering[Src] = new Ordering[Src] {
      def compare(a: Src, b: Src): Int = {
        val c = Hashing.compareBytes(b.headMin, a.headMin) // reversed: max-heap -> min
        if (c != 0) c else b.idx - a.idx
      }
    }
    val pq = scala.collection.mutable.PriorityQueue.empty[Src](ord)
    sources.zipWithIndex.foreach { case (s, i) =>
      val src = new Src(i, s())
      if (src.head != null) pq.enqueue(src)
    }

    // open chunks: (src, chunk, decoded maxKey, startedBeforeThisRegion)
    var open = List.empty[(Int, ChunkMeta, Array[Byte], Boolean)]
    var loHex = "-inf"

    def close(hiHex: String, hiKey: Array[Byte]): Unit = {
      if (open.nonEmpty) {
        val parts = open.map { case (s, c, mx, before) =>
          Part(s, c, spansBefore = before,
            spansBeyond = hiKey != null && Hashing.compareBytes(mx, hiKey) >= 0)
        }
        onRegion(Region(loHex, hiHex, parts))
        open =
          if (hiKey == null) Nil
          else open.collect {
            case (s, c, mx, _) if Hashing.compareBytes(mx, hiKey) >= 0 =>
              (s, c, mx, true)
          }
      }
      loHex = hiHex
    }

    while (pq.nonEmpty) {
      val s = pq.dequeue()
      val c = s.head
      val mk = s.headMin
      // a boundary-key arrival ends the region before it (arrivals are
      // ordered, so an unequal boundary hex is always > loHex)
      if (c.minKeyHex != loHex && Canonical.isBoundaryKey(mk, target))
        close(c.minKeyHex, mk)
      open ::= ((s.idx, c, c.maxKey, false))
      s.advance()
      if (s.head != null) pq.enqueue(s)
    }
    close("+inf", null)
  }
}
