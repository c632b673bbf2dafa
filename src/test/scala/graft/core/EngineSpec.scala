package graft.core

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import scala.util.Random

/** Model-based tests of the canonical table + memoized op algebra, ported
  * from the reference's trie model tests
  * (/root/reference/messdb-base/test/MessDB/Test/TrieSpec.hs): a
  * scala Map is the oracle for merge/transform/range; plus the
  * determinism property (same rows, any input order/partitioning ⇒ same
  * table hash) and the memo/incrementality contracts. */
class EngineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", StringType, nullable = false),
    StructField("v", LongType, nullable = false)))

  private def df(rows: Seq[(String, Long)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 4), schema)

  private def newOps(target: Long = 8): Ops = {
    val dir = graft.core.FsUtil.tempStoreDir("graft-test-")
    new Ops(spark, new FsStore(dir), target)
  }

  private def contents(ops: Ops, ref: TableRef): Map[String, Long] =
    ops.scan(ref).collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Random keys over a small alphabet (heavy prefix collisions), like
    * TrieSpec's 3/26-letter generators. */
  private def randRows(rnd: Random, n: Int, alpha: Int = 3): Seq[(String, Long)] =
    (0 until n).map { _ =>
      val len = rnd.nextInt(6)
      val k = (0 until len).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString
      k -> rnd.nextLong(1000)
    }

  test("random operation sequences match the Map model and replay to identical hashes") {
    // generative capstone: a random program of upserts / sum-merges /
    // range filters, executed against the engine AND an in-memory Map
    // model (the TrieSpec discipline, lifted from single ops to whole
    // programs); then the same program replayed in a FRESH store must
    // reproduce the exact same table hash at every step.
    def runProgram(ops: Ops, seed: Int): (Vector[String], Map[String, Long]) = {
      val rnd = new Random(seed)
      var model = randRows(rnd, 300, 4).distinctBy(_._1).toMap
      var ref = ops.fromDataFrame(df(model.toSeq), Seq("k"))
      val hashes = Vector.newBuilder[String]
      (1 to 12).foreach { _ =>
        rnd.nextInt(7) match {
          case 0 => // upsert a small delta (last wins)
            val delta = randRows(rnd, rnd.nextInt(20) + 1, 4).distinctBy(_._1)
            ref = ops.upsert(ref, ops.fromDataFrame(df(delta), Seq("k")))
            model = model ++ delta.toMap
          case 1 => // sum-merge a delta
            val delta = randRows(rnd, rnd.nextInt(20) + 1, 4).distinctBy(_._1)
            ref = ops.merge(Seq(ref, ops.fromDataFrame(df(delta), Seq("k"))),
              FoldSpec.FoldSum)
            model = delta.foldLeft(model) { case (m, (k, v)) =>
              m + (k -> (m.getOrElse(k, 0L) + v))
            }
          case 2 => // keep a key range
            val lo = ('a' + rnd.nextInt(3)).toChar.toString
            ref = ops.rangeFilter(ref, Some(Bound(Seq(lo), inclusive = true)), None)
            model = model.filter(_._1 >= lo)
          case 3 => // re-keying sum aggregate (the mini + piece-merge path)
            val t = ColTransform("rekey_prefix2_sum_v1", Seq("k"),
              Seq(org.apache.spark.sql.functions.substring(
                org.apache.spark.sql.functions.col("k"), 1, 2).as("k"),
                org.apache.spark.sql.functions.col("v")))
            ref = ops.transform(ref, t, FoldSpec.FoldSum)
            model = model.toSeq.groupBy(_._1.take(2))
              .map { case (g, kvs) => g -> kvs.map(_._2).sum }
          case 4 => // delete a key range (complement-range merge path)
            val lo = ('a' + rnd.nextInt(3)).toChar.toString
            val hi = lo + "m"
            ref = ops.deleteRange(ref,
              Some(Bound(Seq(lo), inclusive = true)),
              Some(Bound(Seq(hi), inclusive = false)))
            model = model.filterNot { case (k, _) => k >= lo && k < hi }
          case 5 => // point patch (zero-job driver path when possible)
            val ups = randRows(rnd, rnd.nextInt(6), 4).distinctBy(_._1)
            val delKeys = rnd.shuffle(model.keys.toList).take(rnd.nextInt(4))
              .filterNot(ups.map(_._1).contains)
            ref = ops.patchTable(ref, ups.map(u => Row(u._1, u._2)),
              delKeys.map(Seq(_)))
            model = (model -- delKeys) ++ ups.toMap
          case 6 => // filtered per-chunk delete (the canonical-repair path)
            val cut = rnd.nextLong(1000)
            val t = ColTransform(s"cap_filter_${cut}_v1", Seq("k"),
              Seq(org.apache.spark.sql.functions.col("k"),
                org.apache.spark.sql.functions.col("v")),
              preservesKeys = true,
              filter = Some(org.apache.spark.sql.functions.col("v") =!=
                org.apache.spark.sql.functions.lit(cut)))
            ref = ops.transform(ref, t, FoldSpec.FoldLast)
            model = model.filterNot(_._2 == cut)
        }
        hashes += ref.hash
      }
      val got = contents(ops, ref)
      assert(got == model, s"engine diverged from model (seed $seed)")
      // the content-address capstone: the FINAL state must hash-equal a
      // from-scratch build of the same rows — the decomposition must be
      // a pure function of the key set under ANY update history
      // (the round-6 canonical-form repair is what makes this hold for
      // filtered deletes of chunk-starting keys)
      assert(ref.hash == ops.fromDataFrame(df(model.toSeq), Seq("k")).hash,
        s"history-dependent decomposition (seed $seed)")
      (hashes.result(), model)
    }
    Seq(13, 77).foreach { seed =>
      val (h1, _) = runProgram(newOps(target = 16), seed)
      val (h2, _) = runProgram(newOps(target = 16), seed) // fresh store
      assert(h1 == h2, s"replay produced different hash chain (seed $seed)")
    }
  }

  test("determinism: same rows under shuffled order and different partitioning => same hash") {
    val ops = newOps()
    val rnd = new Random(7)
    val rows = randRows(rnd, 200, 26).distinctBy(_._1)
    val r1 = ops.fromDataFrame(df(rows), Seq("k"))
    val r2 = ops.fromDataFrame(
      spark.createDataFrame(
        spark.sparkContext.parallelize(rnd.shuffle(rows).map(r => Row(r._1, r._2)), 7),
        schema), Seq("k"))
    assert(r1.hash == r2.hash)
  }

  test("canonical form is independent of the shuffle-partition count (split sampling)") {
    // materialize samples range splits sized to spark.sql.shuffle
    // .partitions; the chunk decomposition must depend ONLY on the key
    // set, never on how many splits were sampled
    val ops = newOps()
    val rows = (0 until 3000).map(i => f"key$i%05d" -> i.toLong)
    val conf = spark.conf.get("spark.sql.shuffle.partitions")
    val r1 = ops.fromDataFrame(df(rows), Seq("k"))
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val ops2 = new Ops(spark, new FsStore(
        graft.core.FsUtil.tempStoreDir("graft-splits-")), ops.chunkTargetRows)
      val r2 = ops2.fromDataFrame(df(rows), Seq("k"))
      assert(r1.hash == r2.hash)
      assert(ops.meta(r1).chunks.map(_.hash) == ops2.meta(r2).chunks.map(_.hash))
    } finally spark.conf.set("spark.sql.shuffle.partitions", conf)
  }

  test("fromDataFrame folds duplicate keys last-wins; contents match model") {
    val ops = newOps()
    val rows = Seq("a" -> 1L, "b" -> 2L, "a" -> 3L, "c" -> 4L, "b" -> 5L)
    val ref = ops.fromDataFrame(df(rows), Seq("k"))
    // model: last occurrence wins
    val model = rows.foldLeft(Map.empty[String, Long])(_ + _)
    assert(contents(ops, ref) == model)
  }

  test("merge vs Map model, last-wins and sum folds, random sets") {
    val ops = newOps()
    val rnd = new Random(42)
    (1 to 5).foreach { _ =>
      val a = randRows(rnd, rnd.nextInt(120), 3).distinctBy(_._1)
      val b = randRows(rnd, rnd.nextInt(120), 3).distinctBy(_._1)
      val ra = ops.fromDataFrame(df(a), Seq("k"))
      val rb = ops.fromDataFrame(df(b), Seq("k"))
      val last = ops.merge(Seq(ra, rb), FoldSpec.FoldLast)
      assert(contents(ops, last) == (a.toMap ++ b.toMap), "last-wins")
      val sum = ops.merge(Seq(ra, rb), FoldSpec.FoldSum)
      val model = (a ++ b).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(contents(ops, sum) == model, "sum fold")
    }
  }

  test("merge idempotence: t merged with itself N times == t (TrieSpec.hs:31-38)") {
    val ops = newOps()
    val rows = randRows(new Random(1), 150, 3).distinctBy(_._1)
    val t = ops.fromDataFrame(df(rows), Seq("k"))
    val merged = ops.merge(Seq.fill(5)(t), FoldSpec.FoldLast)
    assert(merged.hash == t.hash, "canonical form: merge with self is identity")
  }

  test("merge planning is metadata-only: 5M disjoint chunks plan and pass through without reading data") {
    // 100 TB posture: merge planning must stay O(#chunks log #chunks)
    // DRIVER metadata work with zero data IO when regions don't overlap,
    // and multi-million-chunk metas must round-trip through the
    // parquet-backed chunk index (inline JSON would be a ~GB tree
    // parse). Build two interleaved 2.5M-chunk tables (synthetic metas,
    // no chunk files on disk) whose regions are all single-source and
    // merge them — 5M chunks total through planning and the index.
    val ops = newOps(target = 2) // boundary density 1/2 keeps synthesis cheap
    val n = 2500000
    def keyBytes(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(v).array()
    def boundaryAt(base: Long): Array[Byte] = {
      var v = base
      while (!Canonical.isBoundaryKey(keyBytes(v), 2)) v += 1
      keyBytes(v)
    }
    val t0 = System.nanoTime()
    val schemaJson = Canonical.normalizeSchema(schema, Seq("k")).json
    def mkMeta(offset: Int): String = {
      val chunks = (0 until n).map { i =>
        val min = boundaryAt((i.toLong * 2 + offset) * 1000)
        ChunkMeta(f"deadbeef$offset%02d$i%08x", Hashing.hex(min),
          Hashing.hex(min :+ 0x01.toByte), 2)
      }
      ops.store.saveTableMeta(TableMeta(schemaJson, Seq("k"), 2, chunks))
    }
    val (ha, hb) = (mkMeta(0), mkMeta(1))
    val merged = ops.merge(Seq(TableRef(ha), TableRef(hb)), FoldSpec.FoldLast)
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    val outMeta = ops.store.loadTableMeta(merged.hash)
    assert(outMeta.chunks.length == 2 * n, "pure passthrough union")
    // spliced in key order — every adjacent pair (O(n), no sorting)
    assert(outMeta.chunks.sliding(2).forall {
      case Seq(x, y) => x.minKeyHex < y.minKeyHex
      case _ => true
    }, "chunks spliced in key order")
    assert(ops.store.stats.snapshot("chunkSaves") == 0, "no data written")
    // generous bound: the suite runs many specs in parallel on a shared
    // box; the hard assertions are chunkSaves==0 (zero data IO) and the
    // 5M-entry index round-trip itself
    assert(elapsedSec < 600.0, f"planning took $elapsedSec%.1fs — not metadata-bound")
  }

  test("sum fold over int values keeps the declared int type (no silent widening)") {
    val ops = newOps()
    val intSchema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("v", IntegerType, nullable = false)))
    def intDf(rows: Seq[(String, Int)]): DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), intSchema)
    val a = ops.fromDataFrame(intDf(Seq("a" -> 1, "b" -> 2)), Seq("k"))
    val b = ops.fromDataFrame(intDf(Seq("a" -> 10, "c" -> 3)), Seq("k"))
    val merged = ops.merge(Seq(a, b), FoldSpec.FoldSum)
    // sum(int) widens to long inside the fold; the canonical table must
    // still read back as int with correct values
    assert(ops.meta(merged).schema("v").dataType == IntegerType)
    val got = ops.scan(merged).collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 11, "b" -> 2, "c" -> 3))
    assert(ops.verifyTable(merged).isEmpty, "chunk hashes consistent after cast-back")
  }

  test("lookup with a key PREFIX finds rows in chunks whose minKey extends the prefix") {
    val ops = newOps(target = 4)
    val twoKey = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val rows = for (a <- 1L to 5L; b <- 1L to 10L) yield Row(a, b, a * 100 + b)
    val ref = ops.fromDataFrame(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), twoKey),
      Seq("a", "b"))
    (1L to 5L).foreach { a =>
      val got = ops.lookup(ref, Seq(a)).collect().map(_.getLong(2)).sorted
      assert(got.toSeq == (1L to 10L).map(a * 100 + _),
        s"prefix lookup a=$a must return all 10 rows")
    }
    assert(ops.lookup(ref, Seq(3L, 7L)).collect().map(_.getLong(2)).toSeq == Seq(307L))
  }

  test("rangeFilter/transform keep the INPUT table's chunk granularity across Ops instances") {
    val ops = newOps(target = 8)
    val rows = (0 until 500).map(i => f"k$i%04d" -> i.toLong)
    val ref = ops.fromDataFrame(df(rows), Seq("k"))
    // a differently-configured Ops over the same store
    val ops2 = new Ops(spark, ops.store, chunkTargetRows = 64)
    val filtered = ops2.rangeFilter(ref,
      Some(Bound(Seq("k0100"), inclusive = true)),
      Some(Bound(Seq("k0399"), inclusive = true)))
    assert(ops2.meta(filtered).chunkTargetRows == 8,
      "result keeps the table's granularity, not the instance's")
    assert(ops2.scan(filtered).count() == 300)
    // and the result still merges with tables of the original granularity
    val delta = ops.fromDataFrame(df(Seq("k0100" -> 9999L)), Seq("k"))
    val merged = ops.merge(Seq(filtered, delta), FoldSpec.FoldLast)
    assert(contents(ops, merged)("k0100") == 9999L)
    // ... including when the merge is issued from the differently-
    // configured instance (granularity agreement is between the TABLES)
    val merged2 = ops2.merge(Seq(filtered, delta), FoldSpec.FoldLast)
    assert(merged2.hash == merged.hash,
      "same inputs => same result hash from any Ops instance")
  }

  test("op hashes are injective in their parts (no concatenation collisions)") {
    assert(Hashing.opHash(Seq("ab", "x")) != Hashing.opHash(Seq("a", "bx")))
    assert(Hashing.opHash(Seq("a", "", "b")) != Hashing.opHash(Seq("a", "b", "")))
    assert(Hashing.opHash(Seq("a")) != Hashing.opHash(Seq("a", "")))
  }

  test("self-merge with a non-idempotent fold takes the general path and doubles") {
    val ops = newOps()
    val rows = Seq("a" -> 1L, "b" -> 2L, "c" -> 3L)
    val t = ops.fromDataFrame(df(rows), Seq("k"))
    val doubled = ops.merge(Seq(t, t), FoldSpec.FoldSum)
    assert(contents(ops, doubled) == Map("a" -> 2L, "b" -> 4L, "c" -> 6L),
      "merge(Seq(t,t), FoldSum) must double, consistent with merge(Seq(t,t,b))")
    // and idempotent folds still hit the identity fast path
    assert(ops.merge(Seq(t, t), FoldSpec.FoldMin).hash == t.hash)
    assert(ops.merge(Seq(t, t), FoldSpec.FoldMax).hash == t.hash)
  }

  test("diff between versions reads only non-shared chunks and reports exact changes") {
    val ops = newOps(target = 16)
    val base = (0 until 2000).map(i => f"key$i%05d" -> i.toLong)
    val ra = ops.fromDataFrame(df(base), Seq("k"))
    // v2: one changed value, one new key, one key 'removed' via rangeFilter
    val delta = ops.fromDataFrame(
      df(Seq("key00500" -> 999999L, "keyzz" -> 1L)), Seq("k"))
    val rb0 = ops.merge(Seq(ra, delta), FoldSpec.FoldLast)
    val rb = ops.rangeFilter(rb0, Some(Bound(Seq("key00001"), inclusive = true)), None)
    val changes = ops.diff(ra, rb).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(changes == Map(
      "key00500" -> "changed", "keyzz" -> "added", "key00000" -> "removed"))
    // structural sharing: the diff plan touches only non-shared chunks
    val sharedA = ops.meta(ra).chunks.map(_.hash).toSet
      .intersect(ops.meta(rb).chunks.map(_.hash).toSet)
    assert(sharedA.size > ops.meta(ra).chunks.length / 2,
      "most chunks are shared between versions and skipped")
    // self-diff is empty
    assert(ops.diff(ra, ra).count() == 0)
  }

  test("gc keeps shared chunks, sweeps exclusive history and dangling memos") {
    val ops = newOps(target = 16)
    val catalog = new Catalog(ops.store)
    val base = (0 until 2000).map(i => f"key$i%05d" -> 1L)
    val rbase = ops.fromDataFrame(df(base), Seq("k"))
    catalog.put("t", rbase)
    val rootOld = ops.store.currentRootHash.get
    // small delta: most chunks shared between versions
    val delta = ops.fromDataFrame(df(Seq("key00100" -> 9L)), Seq("k"))
    val merged = ops.merge(Seq(rbase, delta), FoldSpec.FoldLast)
    catalog.put("t", merged)
    val oldChunks = ops.meta(rbase).chunks.map(_.hash).toSet
    val newChunks = ops.meta(merged).chunks.map(_.hash).toSet
    assert((oldChunks & newChunks).nonEmpty, "versions share chunks")
    assert((oldChunks -- newChunks).nonEmpty, "old version has exclusive chunks")

    // keep all roots: both catalog versions stay fully intact; only the
    // anonymous working tables (the delta, merge sub-results) are swept
    val all = Gc.run(ops.store, catalog.log())
    assert(all.deletedRoots == 0)
    assert(all.deletedMemos > 0,
      "memos pointing at swept working tables dropped with them")
    assert(ops.store.hasTable(rbase.hash) && ops.store.hasTable(merged.hash))
    assert(ops.verifyTable(rbase).isEmpty, "old version intact under its root")

    // keep only the current root: the old version's exclusive chunks go
    val gc = Gc.run(ops.store, Seq.empty)
    assert(!ops.store.hasTable(rbase.hash), "unreferenced old version swept")
    assert(gc.deletedChunks == (oldChunks -- newChunks).size)
    // surviving table is fully intact
    assert(ops.verifyTable(merged).isEmpty)
    assert(contents(ops, merged) == (base.toMap + ("key00100" -> 9L)))
    // swept merge memo recomputes correctly from scratch... but the input
    // table was swept too; re-ingesting yields the identical hash chain
    val rbase2 = ops.fromDataFrame(df(base), Seq("k"))
    assert(rbase2.hash == rbase.hash, "content addressing restores identity")
    // history is shallow after GC, not broken: log/checkout still work
    assert(catalog.log() == Seq(ops.store.currentRootHash.get),
      "log stops at the GC'd ancestor instead of crashing")
    catalog.checkout(ops.store.currentRootHash.get)
    assert(catalog.get("t").map(_.hash).contains(merged.hash))
  }

  test("gc --keep-last N retention: old roots collected, shared chunks survive") {
    val ops = newOps(target = 16)
    val catalog = new Catalog(ops.store)
    // five versions, each a 1-key delta: heavy structural sharing
    val base = (0 until 2000).map(i => f"key$i%05d" -> 0L)
    var cur = ops.fromDataFrame(df(base), Seq("k"))
    catalog.put("t", cur)
    for (v <- 1 to 4) {
      val delta = ops.fromDataFrame(df(Seq(f"key${v * 100}%05d" -> v.toLong)), Seq("k"))
      cur = ops.merge(Seq(cur, delta), FoldSpec.FoldLast)
      catalog.put("t", cur)
    }
    assert(catalog.log().length == 5)
    // the CLI's --keep-last N lowers to keepRoots = log(N)
    val s = Gc.run(ops.store, catalog.log(2))
    assert(s.deletedRoots == 3, s"expected 3 old roots collected: $s")
    assert(catalog.log().length == 2, "history shallow at the retention depth")
    // both retained versions fully usable (shared chunks survived)
    val prev = catalog.rootAt(catalog.log()(1))("t").tableHash
    assert(ops.verifyTable(TableRef(prev)).isEmpty)
    assert(ops.verifyTable(cur).isEmpty)
    assert(contents(ops, cur)(f"key${400}%05d") == 4L)
  }

  test("putAll commits several tables in ONE atomic root") {
    val ops = newOps(target = 16)
    val catalog = new Catalog(ops.store)
    catalog.put("a", ops.fromDataFrame(df(Seq("x" -> 1L)), Seq("k")))
    val historyBefore = catalog.log().length
    val ra = ops.fromDataFrame(df(Seq("x" -> 2L)), Seq("k"))
    val rb = ops.fromDataFrame(df(Seq("y" -> 3L)), Seq("k"))
    val root = catalog.putAll(Map("a" -> ra, "b" -> rb))
    // exactly one new version holds BOTH updates (no half-committed root
    // exists anywhere in the chain)
    assert(catalog.log().length == historyBefore + 1)
    assert(catalog.get("a").contains(ra) && catalog.get("b").contains(rb))
    val prev = catalog.parentOf(root).get
    assert(catalog.rootAt(prev).get("a").map(_.tableHash) != Some(ra.hash))
    assert(!catalog.rootAt(prev).contains("b"))
  }

  test("concurrent catalog statements serialize: no lost updates") {
    val ops = newOps()
    val catalog = new Catalog(ops.store)
    val t = ops.fromDataFrame(df(Seq("a" -> 1L)), Seq("k"))
    val threads = (0 until 8).map { i =>
      new Thread(() => { catalog.put(s"table_$i", t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(catalog.root.keySet == (0 until 8).map(i => s"table_$i").toSet,
      "every writer's table must survive the concurrent root updates")
  }

  test("merge is memoized: second identical merge does zero work") {
    val ops = newOps()
    val rnd = new Random(9)
    val ra = ops.fromDataFrame(df(randRows(rnd, 100).distinctBy(_._1)), Seq("k"))
    val rb = ops.fromDataFrame(df(randRows(rnd, 100).distinctBy(_._1)), Seq("k"))
    val m1 = ops.merge(Seq(ra, rb), FoldSpec.FoldLast)
    ops.store.stats.reset()
    val m2 = ops.merge(Seq(ra, rb), FoldSpec.FoldLast)
    assert(m1.hash == m2.hash)
    assert(ops.store.stats.snapshot("memoHits") == 1)
    assert(ops.store.stats.snapshot("chunkSaves") == 0, "no recompute on memo hit")
  }

  test("incremental merge: small delta reuses almost all chunks (Trie.hs:346-348)") {
    val ops = newOps(target = 16)
    val rnd = new Random(5)
    val base = (0 until 2000).map(i => f"key$i%05d" -> rnd.nextLong(100))
    val rbase = ops.fromDataFrame(df(base), Seq("k"))
    val nBase = ops.meta(rbase).chunks.length
    assert(nBase > 20, s"want many chunks, got $nBase")
    // delta: 5 updated keys
    val delta = Seq("key00100" -> 999L, "key00101" -> 999L, "key01900" -> 999L,
      "keyzzz" -> 1L, "key01500" -> 999L)
    val rdelta = ops.fromDataFrame(df(delta), Seq("k"))
    ops.store.stats.reset()
    val merged = ops.upsert(rbase, rdelta)
    val saved = ops.store.stats.snapshot("chunkSaves")
    val mMeta = ops.meta(merged)
    assert(contents(ops, merged) == (base.toMap ++ delta.toMap))
    assert(saved < nBase / 2,
      s"incremental merge should rewrite few chunks: rewrote $saved of $nBase")
    // most result chunks are shared with the base table (same hashes)
    val baseHashes = ops.meta(rbase).chunks.map(_.hash).toSet
    val shared = mMeta.chunks.count(c => baseHashes.contains(c.hash))
    assert(shared > mMeta.chunks.length / 2,
      s"expected majority chunk reuse: $shared/${mMeta.chunks.length}")
  }

  test("region-level merge memo: a later merge sharing ranges reuses them (Trie.hs:302-312)") {
    val ops = newOps(target = 16)
    val rnd = new Random(23)
    val a = (0 until 1500).map(i => f"k$i%04d" -> rnd.nextLong(100))
    val b = (100 until 200).map(i => f"k$i%04d" -> 777L) // overlaps a
    val c = (0 until 100).map(i => f"m$i%04d" -> 1L) // disjoint keyspace
    val ra = ops.fromDataFrame(df(a), Seq("k"))
    val rb = ops.fromDataFrame(df(b), Seq("k"))
    val rc = ops.fromDataFrame(df(c), Seq("k"))
    val first = ops.merge(Seq(ra, rb), FoldSpec.FoldLast)
    ops.store.stats.reset()
    // different whole-op (3 inputs), but the (a,b) overlap ranges are the
    // same sub-merges → range memo hits; only the a/c junction recomputes
    val second = ops.merge(Seq(ra, rb, rc), FoldSpec.FoldLast)
    val snap = ops.store.stats.snapshot
    assert(snap("memoHits") >= 1, s"expected range-level memo hits: $snap")
    val firstSaves = ops.meta(first).chunks.length
    assert(snap("chunkSaves") < firstSaves,
      s"second merge should reuse shared range results: $snap")
    // content correct
    assert(contents(ops, second) == (a.toMap ++ b.toMap ++ c.toMap))
  }

  test("incremental merge result hash == from-scratch hash (canonical form)") {
    val ops = newOps(target = 16)
    val rnd = new Random(11)
    val base = (0 until 800).map(i => f"k$i%04d" -> rnd.nextLong(100))
    val delta = Seq("k0100" -> 7777L, "knew1" -> 1L)
    val rbase = ops.fromDataFrame(df(base), Seq("k"))
    val rdelta = ops.fromDataFrame(df(delta), Seq("k"))
    val incremental = ops.upsert(rbase, rdelta)
    val scratch = ops.fromDataFrame(df((base.toMap ++ delta.toMap).toSeq), Seq("k"))
    assert(incremental.hash == scratch.hash,
      "history-independence: incremental and from-scratch builds agree")
  }

  test("range filter vs model with inclusive/exclusive/infinite ends") {
    val ops = newOps(target = 8)
    val rnd = new Random(3)
    val rows = randRows(rnd, 300, 3).distinctBy(_._1)
    val ref = ops.fromDataFrame(df(rows), Seq("k"))
    val model = rows.toMap
    val cases = Seq(
      (Some(Bound(Seq("a"), true)), Some(Bound(Seq("b"), false))),
      (Some(Bound(Seq("aa"), false)), None),
      (None, Some(Bound(Seq("c"), true))),
      (None, None),
      (Some(Bound(Seq("b"), true)), Some(Bound(Seq("b"), true))))
    cases.foreach { case (lo, hi) =>
      val got = contents(ops, ops.rangeFilter(ref, lo, hi))
      // single-column key: the bound covers the full key tuple, so the
      // semantics are plain comparisons (tuple-prefix equality == string
      // equality here; code-point order == byte order for a–z keys)
      val want = model.filter { case (k, _) =>
        lo.forall(b => if (b.inclusive) k >= b.prefix.head.toString
          else k > b.prefix.head.toString) &&
        hi.forall(b => if (b.inclusive) k <= b.prefix.head.toString
          else k < b.prefix.head.toString)
      }
      assert(got == want, s"range $lo .. $hi")
    }
  }

  test("deleteRange drops exactly the range, reuses chunks, hash-equals from-scratch") {
    val ops = newOps(target = 16)
    val rnd = new Random(41)
    val rows = (0 until 1500).map(i => f"k$i%04d" -> rnd.nextLong(100))
    val ref = ops.fromDataFrame(df(rows), Seq("k"))
    val total = ops.meta(ref).chunks.length
    assert(total > 15)
    ops.store.stats.reset()
    val out = ops.deleteRange(ref,
      Some(Bound(Seq("k0400"), inclusive = true)),
      Some(Bound(Seq("k0599"), inclusive = true)))
    val want = rows.toMap.view.filterKeys(k => k < "k0400" || k > "k0599").toMap
    assert(contents(ops, out) == want)
    // retention-delete cost: at most the two cut-point chunks rewrite
    assert(ops.store.stats.snapshot("chunkSaves") <= 4,
      s"delete should be edge-only: ${ops.store.stats.snapshot}")
    val kept = ops.meta(ref).chunks.map(_.hash).toSet
    val reused = ops.meta(out).chunks.count(c => kept(c.hash))
    assert(reused >= ops.meta(out).chunks.length - 4, "majority chunk reuse")
    // canonical identity vs from-scratch build of the remaining rows
    val scratch = ops.fromDataFrame(df(want.toSeq), Seq("k"))
    assert(out.hash == scratch.hash)
    // unbounded delete = empty table, same shape
    val empty = ops.deleteRange(ref, None, None)
    assert(ops.meta(empty).chunks.isEmpty && ops.rowCount(empty) == 0)
    // single-key delete (degenerate range)
    val one = ops.deleteRange(ref,
      Some(Bound(Seq("k0104"), inclusive = true)),
      Some(Bound(Seq("k0104"), inclusive = true)))
    assert(contents(ops, one) == rows.toMap - "k0104")
  }

  test("range filter passes interior chunks through without rewriting") {
    val ops = newOps(target = 16)
    val base = (0 until 2000).map(i => f"key$i%05d" -> i.toLong)
    val ref = ops.fromDataFrame(df(base), Seq("k"))
    ops.store.stats.reset()
    val filtered = ops.rangeFilter(ref,
      Some(Bound(Seq("key00100"), true)), Some(Bound(Seq("key01900"), false)))
    val saved = ops.store.stats.snapshot("chunkSaves")
    val total = ops.meta(ref).chunks.length
    assert(saved <= 4, s"interior chunks must be reused: rewrote $saved of $total")
    assert(contents(ops, filtered) ==
      base.filter(r => r._1 >= "key00100" && r._1 < "key01900").toMap)
  }

  test("transform: re-key + fold matches model (TrieSpec.hs:40-45)") {
    import org.apache.spark.sql.functions._
    val ops = newOps()
    val rows = randRows(new Random(8), 200, 3).distinctBy(_._1)
    val ref = ops.fromDataFrame(df(rows), Seq("k"))
    // transform: key -> reverse(key), value kept; collisions folded by sum
    val t = ColTransform("reverse_key_v1", Seq("k"),
      Seq(reverse(col("k")).as("k"), col("v").as("v")))
    val out = ops.transform(ref, t, FoldSpec.FoldSum)
    val model = rows.toMap.toSeq.map { case (k, v) => k.reverse -> v }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(contents(ops, out) == model)
    // memoized on second call
    ops.store.stats.reset()
    val out2 = ops.transform(ref, t, FoldSpec.FoldSum)
    assert(out2.hash == out.hash && ops.store.stats.snapshot("chunkSaves") == 0)
  }

  test("catalog: put/get, versioned roots, old root remains valid (Repo.hs)") {
    val ops = newOps()
    val cat = new Catalog(ops.store)
    assert(cat.root.isEmpty)
    val t1 = ops.fromDataFrame(df(Seq("a" -> 1L)), Seq("k"))
    val root1 = cat.put("t", t1)
    assert(cat.get("t").contains(t1))
    val t2 = ops.fromDataFrame(df(Seq("a" -> 2L)), Seq("k"))
    val root2 = cat.put("t", t2)
    assert(cat.get("t").contains(t2))
    // old root is still readable (git-like snapshot)
    assert(cat.rootAt(root1)("t").tableHash == t1.hash)
    assert(root1 != root2)
    // history chain: newest first, parent links intact
    assert(cat.log() == Seq(root2, root1))
    assert(cat.parentOf(root2).contains(root1))
    assert(cat.parentOf(root1).isEmpty)
    // checkout an old version, then the new one again
    cat.checkout(root1)
    assert(cat.get("t").contains(t1))
    cat.checkout(root2)
    assert(cat.get("t").contains(t2))
  }

  test("store contract: chunk save idempotent, memo compute-once (testlib port)") {
    val dir = graft.core.FsUtil.tempStoreDir("graft-store-")
    val store = new FsStore(dir)
    var computes = 0
    val h1 = store.memoized("op1") { computes += 1; "result1" }
    val h2 = store.memoized("op1") { computes += 1; "result-different" }
    assert(h1 == "result1" && h2 == "result1" && computes == 1,
      "memo must compute once and return cached value thereafter")
    // idempotent chunk save: second save of same hash discards the file
    val f1 = Files.createTempFile("c", ".parquet"); Files.writeString(f1, "AAA")
    val f2 = Files.createTempFile("c", ".parquet"); Files.writeString(f2, "BBB")
    store.saveChunk("deadbeef", f1)
    store.saveChunk("deadbeef", f2)
    assert(Files.readString(java.nio.file.Paths.get(store.chunkPath("deadbeef"))) == "AAA")
    assert(store.stats.snapshot("chunkSkips") == 1)
  }

  test("lookup: point query reads only the containing chunk") {
    val ops = newOps(target = 16)
    val base = (0 until 1000).map(i => f"key$i%04d" -> i.toLong)
    val ref = ops.fromDataFrame(df(base), Seq("k"))
    val hit = ops.lookup(ref, Seq("key0500")).collect()
    assert(hit.length == 1 && hit(0).getLong(1) == 500L)
    assert(ops.lookup(ref, Seq("nosuch")).collect().isEmpty)
  }

  test("empty and singleton tables (O5/O6)") {
    val ops = newOps()
    val e = ops.emptyTable(schema, Seq("k"))
    assert(ops.scan(e).count() == 0)
    val s1 = ops.fromDataFrame(df(Seq("x" -> 9L)), Seq("k"))
    assert(contents(ops, s1) == Map("x" -> 9L))
    // merging empty with t yields t's content and hash
    val t = ops.fromDataFrame(df(Seq("a" -> 1L, "b" -> 2L)), Seq("k"))
    val m = ops.merge(Seq(e, t), FoldSpec.FoldLast)
    assert(m.hash == t.hash)
  }
}
