package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The streaming region planner must (a) decompose EXACTLY like the
  * materialized reference algorithm (same regions, same participants,
  * same spanning flags — these feed the piece/region memo keys, so any
  * drift silently breaks hash stability), and (b) plan tens of millions
  * of chunk metas with driver memory bounded by the DELTA, not the
  * table (SCALE.md "streaming region planner"). */
class MergePlannerSpec extends AnyFunSuite {

  private val Target = 4L

  private def keyBytes(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
    b
  }

  private def chunk(min: Array[Byte], max: Array[Byte], rows: Long,
      tag: String): ChunkMeta =
    ChunkMeta(tag, Hashing.hex(min), Hashing.hex(max), rows)

  /** The pre-round-5 materialized planner, kept here as the oracle:
    * boundary array + binary-search region assignment. */
  private def referencePlan(sources: Seq[Seq[ChunkMeta]], target: Long)
      : Seq[(String, String, Set[(Int, String, Boolean)])] = {
    val chunks = sources.zipWithIndex.flatMap { case (cs, i) => cs.map(c => (i, c)) }
    val boundaries: Array[Array[Byte]] = chunks
      .map(_._2.minKey)
      .filter(Canonical.isBoundaryKey(_, target))
      .sortWith(Hashing.compareBytes(_, _) < 0)
      .foldLeft(Vector.empty[Array[Byte]]) { (acc, k) =>
        if (acc.nonEmpty && Hashing.compareBytes(acc.last, k) == 0) acc
        else acc :+ k
      }.toArray
    val hexes = boundaries.map(Hashing.hex)
    def regionOf(kb: Array[Byte]): Int = Canonical.boundaryIndex(boundaries, kb)
    def lo(r: Int) = if (r == 0) "-inf" else hexes(r - 1)
    def hi(r: Int) = if (r == boundaries.length) "+inf" else hexes(r)
    val n = boundaries.length + 1
    val parts = Array.fill(n)(List.empty[(Int, String, Boolean)])
    chunks.foreach { case (s, c) =>
      val rl = regionOf(c.minKey); val rh = regionOf(c.maxKey)
      var r = rl
      while (r <= rh) { parts(r) ::= ((s, c.hash, rl != rh)); r += 1 }
    }
    (0 until n).filter(parts(_).nonEmpty)
      .map(r => (lo(r), hi(r), parts(r).toSet))
  }

  test("sweep equals the materialized planner on random multi-source layouts") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 80) {
      val nSrc = 1 + rnd.nextInt(4)
      val sources: Seq[Seq[ChunkMeta]] = (0 until nSrc).map { s =>
        val keys = Seq.fill(1 + rnd.nextInt(60))(rnd.nextLong() >>> 16)
          .distinct.sorted
        val out = Vector.newBuilder[ChunkMeta]
        var i = 0
        var n = 0
        while (i < keys.length) {
          val len = 1 + rnd.nextInt(7)
          val run = keys.slice(i, math.min(i + len, keys.length))
          out += chunk(keyBytes(run.head), keyBytes(run.last),
            run.length.toLong, s"c$s-$n")
          i += len; n += 1
        }
        out.result()
      }
      val got = Vector.newBuilder[(String, String, Set[(Int, String, Boolean)])]
      MergePlanner.sweep(sources.map(cs => () => cs.iterator), Target) { r =>
        got += ((r.loHex, r.hiHex,
          r.parts.map(p => (p.src, p.chunk.hash, p.spanning)).toSet))
      }
      assert(got.result() == referencePlan(sources, Target),
        s"trial $trial diverged from the reference planner")
    }
  }

  test("50M synthetic chunk metas plan with O(delta) retained state") {
    // base table: one single-key chunk per intrinsic boundary key — the
    // canonical steady state. The source is a pure ITERATOR: nothing is
    // ever materialized, so completing under the test heap (-Xmx8g,
    // while 50M retained ChunkMetas would need ~15 GB) is itself the
    // bounded-memory proof.
    val N = 50000000
    def boundaryLongs: Iterator[Long] = Iterator.iterate(0L)(_ + 1L)
      .filter(v => Canonical.isBoundaryKey(keyBytes(v), Target))
    def baseIter: Iterator[ChunkMeta] = boundaryLongs.take(N).zipWithIndex
      .map { case (v, i) =>
        val h = Hashing.hex(keyBytes(v))
        ChunkMeta(s"b$i", h, h, 1L)
      }
    // delta: three chunks, each spanning ~11 regions somewhere in the
    // keyspace — the realistic small-upsert shape
    val marks = boundaryLongs.take(4000011).zipWithIndex.collect {
      case (v, i) if Set(1000, 1010, 500000, 500010, 4000000, 4000010)(i) => v
    }.toArray
    val delta = Seq(
      chunk(keyBytes(marks(0)), keyBytes(marks(1)), 10, "d0"),
      chunk(keyBytes(marks(2)), keyBytes(marks(3)), 10, "d1"),
      chunk(keyBytes(marks(4)), keyBytes(marks(5)), 10, "d2"))

    var total = 0L
    var recorded = 0L
    var spanningParts = 0L
    MergePlanner.sweep(
      Seq(() => baseIter, () => delta.iterator), Target) { r =>
      total += 1
      if (r.parts.lengthCompare(1) > 0 || r.parts.exists(_.spanning)) {
        recorded += 1
        spanningParts += r.parts.count(_.spanning)
      }
    }
    assert(total == N, s"expected $N regions, swept $total")
    // each delta chunk dirties exactly its 11 spanned regions
    assert(recorded == 33, s"retained region count not O(delta): $recorded")
    assert(spanningParts == 33, s"spanning participation wrong: $spanningParts")
  }
}
