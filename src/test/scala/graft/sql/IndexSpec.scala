package graft.sql

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core._

/** Secondary indexes (SqlIndex): a key-only re-keyed view, probed by
  * equality on its leading columns, fetching base rows through
  * chunk-pruned multi-point lookups — and maintained incrementally by
  * the memoized rekey (freshness decided by the op hash, not metadata).
  */
class IndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Small chunks so pruning is observable: 2000 rows / 64-row chunks
    * ≈ 32 chunks per table. */
  private def newSession(): (SqlSession, Ops, Catalog) = {
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-idx-"))
    val ops = new Ops(spark, store, 64)
    val cat = new Catalog(store)
    (new SqlSession(spark, ops, cat), ops, cat)
  }

  private def seed(sess: SqlSession): Unit = {
    sess.execute("CREATE TABLE t (id bigint PRIMARY KEY, grp bigint NOT NULL, v text NOT NULL)")
    import spark.implicits._
    (0L until 2000L).map(i => (i, i % 97, s"v$i")).toDF("id", "grp", "v")
      .createOrReplaceTempView("idx_seed")
    sess.execute("INSERT INTO t SELECT * FROM idx_seed")
  }

  test("CREATE INDEX + SELECT equality: same rows as a full scan") {
    val (sess, _, _) = newSession()
    seed(sess)
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    val Left(df) = sess.execute(
      "SELECT id, v FROM t WHERE grp = 13 ORDER BY id"): @unchecked
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = (0L until 2000L).filter(_ % 97 == 13).map(i => (i, s"v$i"))
    assert(got == want)
  }

  test("probe economics: opens only the chunks the matches live in") {
    val (sess, ops, cat) = newSession()
    seed(sess)
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    val entry = cat.root("t")
    val m = ops.meta(TableRef(entry.tableHash))
    assert(m.chunks.length > 20, s"need many chunks, got ${m.chunks.length}")
    // ~21 matches for grp=13 spread over 2000 rows: the pk probes hit a
    // strict subset of chunks (each chunk holds 64 consecutive ids, and
    // matches are 97 apart, so roughly every other chunk is skipped)
    val pks = (0L until 2000L).filter(_ % 97 == 13).map(Seq(_))
    val hit = ops.chunksForKeys(m, pks)
    assert(hit.length < m.chunks.length,
      s"probe must prune: ${hit.length} vs ${m.chunks.length}")
    // and the index's own probe is a chunk-pruned point read too
    val idxRef = cat.get("t_grp").get
    val im = ops.meta(idxRef)
    val ihit = ops.chunksForKeys(im, Seq(Seq(13L)))
    assert(ihit.length < im.chunks.length || im.chunks.length <= 2,
      s"index probe must prune: ${ihit.length} vs ${im.chunks.length}")
  }

  test("index stays correct after DML: refresh-by-memo at probe time") {
    val (sess, _, _) = newSession()
    seed(sess)
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    // rows inserted AFTER the index was built must still be found
    sess.execute("INSERT INTO t VALUES (5001, 13, 'late'), (5002, 14, 'other')")
    sess.execute("DELETE FROM t WHERE id = 13")  // was grp 13
    val Left(df) = sess.execute(
      "SELECT id, v FROM t WHERE grp = 13 ORDER BY id"): @unchecked
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = (0L until 2000L).filter(i => i % 97 == 13 && i != 13L)
      .map(i => (i, s"v$i")) :+ ((5001L, "late"))
    assert(got == want)
  }

  test("incremental maintenance: an unchanged source refreshes with zero chunk recomputes") {
    val (sess, ops, cat) = newSession()
    seed(sess)
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    val v1 = cat.get("t_grp").get
    // no DML: the probe-time refresh is a whole-op memo hit — the index
    // table hash cannot move
    sess.execute("SELECT id FROM t WHERE grp = 5")
    assert(cat.get("t_grp").contains(v1))
    // small delta: refresh advances the index but reuses every mini for
    // untouched source chunks (per-chunk memo) — verify the new version
    // differs and still matches a from-scratch rebuild
    sess.execute("INSERT INTO t VALUES (9001, 5, 'x')")
    sess.execute("SELECT id FROM t WHERE grp = 5")
    val v2 = cat.get("t_grp").get
    assert(v2 != v1)
    import org.apache.spark.sql.functions.col
    val ids = ops.scan(v2).where(col("grp") === 5).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.contains(9001L) &&
      ids.filter(_ < 2000).sameElements((0L until 2000L).filter(_ % 97 == 5)))
  }

  test("O(delta) maintenance: a 1-row DML refreshes a many-chunk index with bounded chunk writes and no full-index shuffle") {
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-idx3-"))
    val ops = new Ops(spark, store, 16)
    val cat = new Catalog(store)
    val sess = new SqlSession(spark, ops, cat)
    sess.execute("CREATE TABLE t (id bigint PRIMARY KEY, grp bigint NOT NULL)")
    import spark.implicits._
    (0L until 8000L).map(i => (i, i % 97)).toDF("id", "grp")
      .createOrReplaceTempView("idx_seed3")
    sess.execute("INSERT INTO t SELECT * FROM idx_seed3")
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    val idxChunks = ops.meta(cat.get("t_grp").get).chunks.length
    assert(idxChunks > 300, s"need a many-chunk index, got $idxChunks")
    // 1-row DML, then the probe-time refresh: the patch path must write
    // O(delta) chunks — mini for the touched source chunk + the touched
    // index runs — NOT re-merge/rewrite the whole index
    sess.execute("INSERT INTO t VALUES (9001, 13)")
    store.stats.reset()
    val Left(df) = sess.execute(
      "SELECT id FROM t WHERE grp = 13 ORDER BY id"): @unchecked
    val saves = store.stats.snapshot("chunkSaves")
    assert(saves <= 12,
      s"index refresh after a point DML wrote $saves chunks of $idxChunks — not O(delta)")
    assert(df.collect().map(_.getLong(0)).toSeq ==
      ((0L until 8000L).filter(_ % 97 == 13) :+ 9001L))
    // and the patched index hash-equals a from-scratch rebuild
    val patchedHash = cat.get("t_grp").get.hash
    val store2 = new FsStore(graft.core.FsUtil.tempStoreDir("graft-idx3b-"))
    val ops2 = new Ops(spark, store2, 16)
    val cat2 = new Catalog(store2)
    val sess2 = new SqlSession(spark, ops2, cat2)
    sess2.execute("CREATE TABLE t (id bigint PRIMARY KEY, grp bigint NOT NULL)")
    sess2.execute("INSERT INTO t SELECT * FROM idx_seed3")
    sess2.execute("INSERT INTO t VALUES (9001, 13)")
    sess2.execute("CREATE INDEX t_grp ON t (grp)")
    sess2.execute("SELECT id FROM t WHERE grp = 13")
    assert(cat2.get("t_grp").get.hash == patchedHash,
      "patched index diverged from the from-scratch rebuild")
  }

  test("scattered small DML: refresh splices by source-row diff instead of rebuilding the index") {
    // a non-leading-key DML whose matches scatter one-row-per-chunk
    // changes MANY source chunk hashes while leaving almost every row
    // identical — the chunk-level wide-delta guard alone would read
    // this as "the whole table changed" and rebuild the index; the
    // source-row diff route must keep refresh writes O(row delta)
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-idx4-"))
    val ops = new Ops(spark, store, 64)
    val cat = new Catalog(store)
    val sess = new SqlSession(spark, ops, cat)
    sess.execute("CREATE TABLE t (id bigint PRIMARY KEY, grp bigint NOT NULL)")
    import spark.implicits._
    (0L until 4000L).map(i => (i, i % 61)).toDF("id", "grp")
      .createOrReplaceTempView("idx_seed4")
    sess.execute("INSERT INTO t SELECT * FROM idx_seed4")
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    val idxChunks = ops.meta(cat.get("t_grp").get).chunks.length
    assert(idxChunks > 30, s"need a many-chunk index, got $idxChunks")
    // grp=7 rows sit 61 apart — one per source chunk (64-row chunks):
    // every chunk is touched, the row delta is ~66 rows
    sess.execute("DELETE FROM t WHERE grp = 7 AND id % 2 = 1")
    store.stats.reset()
    val Left(df) = sess.execute(
      "SELECT id FROM t WHERE grp = 7 ORDER BY id"): @unchecked
    val saves = store.stats.snapshot("chunkSaves")
    // the deleted index keys share the grp=7 prefix, so the splice
    // touches a handful of contiguous index runs — a rebuild would
    // rewrite all of them (and the old behavior did exactly that)
    assert(saves <= 12,
      s"scattered-DML index refresh wrote $saves chunks of $idxChunks — rebuilt, not spliced")
    assert(df.collect().map(_.getLong(0)).toSeq ==
      (0L until 4000L).filter(i => i % 61 == 7 && i % 2 == 0))
    // and the spliced index hash-equals a from-scratch build over the
    // same final source
    val patchedHash = cat.get("t_grp").get.hash
    val store2 = new FsStore(graft.core.FsUtil.tempStoreDir("graft-idx4b-"))
    val ops2 = new Ops(spark, store2, 64)
    val cat2 = new Catalog(store2)
    val sess2 = new SqlSession(spark, ops2, cat2)
    sess2.execute("CREATE TABLE t (id bigint PRIMARY KEY, grp bigint NOT NULL)")
    sess2.execute("INSERT INTO t SELECT * FROM idx_seed4")
    sess2.execute("DELETE FROM t WHERE grp = 7 AND id % 2 = 1")
    sess2.execute("CREATE INDEX t_grp ON t (grp)")
    sess2.execute("SELECT id FROM t WHERE grp = 7")
    assert(cat2.get("t_grp").get.hash == patchedHash,
      "source-row-diff spliced index diverged from the from-scratch build")
  }

  test("scattered APPEND: a narrow index folds the delta into the previous version instead of rescanning the source") {
    // appended rows whose index keys scatter across more than half the
    // index chunks decline the run splice; for a narrow index over a
    // wider source the refresh must then MERGE the delta into the
    // previous index (collision-free under the uniqueKeys contract)
    // rather than rebuild — the rebuild rescans the whole source, the
    // 100 TB cliff this route exists for
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-idx5-"))
    val ops = new Ops(spark, store, 64)
    val cat = new Catalog(store)
    val sess = new SqlSession(spark, ops, cat)
    // a wide padding column makes the SOURCE bytes dominate the index's
    sess.execute("CREATE TABLE t (id bigint PRIMARY KEY, grp bigint NOT NULL, pad text NOT NULL)")
    import spark.implicits._
    (0L until 4000L).map(i => (i, i * 7919 % 4000, "p" * 120))
      .toDF("id", "grp", "pad").createOrReplaceTempView("idx_seed5")
    sess.execute("INSERT INTO t SELECT * FROM idx_seed5")
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    // append 300 NEW ids whose grp keys scatter over the whole space
    (4000L until 4300L).map(i => (i, i * 6101 % 4000, "p" * 120))
      .toDF("id", "grp", "pad").createOrReplaceTempView("idx_delta5")
    sess.execute("INSERT INTO t SELECT * FROM idx_delta5")
    val foldIns0 = Ops.rekeyAppendFoldIns.get()
    // the fold-in's source diff is admitted by the process-global
    // measured-throughput governor, which concurrent suites or steal
    // can poison into denying (VERDICT r13 #1) — pin it fast for the
    // refresh this assert observes
    Ops.driverRouteNprOverride = Some(1L)
    val Left(df) =
      (try sess.execute("SELECT id FROM t WHERE grp = 13 ORDER BY id")
       finally Ops.driverRouteNprOverride = None): @unchecked
    assert(Ops.rekeyAppendFoldIns.get() > foldIns0,
      "scattered narrow-index append refresh did not take the fold-in")
    val want = ((0L until 4000L).filter(i => i * 7919 % 4000 == 13) ++
      (4000L until 4300L).filter(i => i * 6101 % 4000 == 13)).sorted
    assert(df.collect().map(_.getLong(0)).toSeq == want)
    // and the folded index hash-equals a from-scratch build
    val patchedHash = cat.get("t_grp").get.hash
    val store2 = new FsStore(graft.core.FsUtil.tempStoreDir("graft-idx5b-"))
    val ops2 = new Ops(spark, store2, 64)
    val cat2 = new Catalog(store2)
    val sess2 = new SqlSession(spark, ops2, cat2)
    sess2.execute("CREATE TABLE t (id bigint PRIMARY KEY, grp bigint NOT NULL, pad text NOT NULL)")
    sess2.execute("INSERT INTO t SELECT * FROM idx_seed5")
    sess2.execute("INSERT INTO t SELECT * FROM idx_delta5")
    sess2.execute("CREATE INDEX t_grp ON t (grp)")
    sess2.execute("SELECT id FROM t WHERE grp = 13")
    assert(cat2.get("t_grp").get.hash == patchedHash,
      "fold-in index diverged from the from-scratch build")
  }

  test("range predicates probe the index: BETWEEN and one-sided") {
    val (sess, _, _) = newSession()
    seed(sess)
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    val Left(a) = sess.execute(
      "SELECT id FROM t WHERE grp BETWEEN 90 AND 93 ORDER BY id"): @unchecked
    assert(a.collect().map(_.getLong(0)).toSeq ==
      (0L until 2000L).filter(i => i % 97 >= 90 && i % 97 <= 93))
    val Left(b) = sess.execute(
      "SELECT count(*) AS n FROM t WHERE grp >= 95"): @unchecked
    assert(b.collect().head.getLong(0) ==
      (0L until 2000L).count(_ % 97 >= 95))
    // equality prefix + range on the second index column
    sess.execute("CREATE INDEX t_gv ON t (grp, v)")
    val Left(c) = sess.execute(
      "SELECT id FROM t WHERE grp = 13 AND v < 'v2' ORDER BY id"): @unchecked
    assert(c.collect().map(_.getLong(0)).toSeq ==
      (0L until 2000L).filter(i => i % 97 == 13 && s"v$i" < "v2"))
  }

  test("IN-list probes union per-value index reads in one scan") {
    val (sess, _, _) = newSession()
    seed(sess)
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    val Left(df) = sess.execute(
      "SELECT id, grp FROM t WHERE grp IN (13, 40, 95) ORDER BY id"): @unchecked
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L until 2000L).filter(i => Set(13L, 40L, 95L)(i % 97))
      .map(i => (i, i % 97))
    assert(got == want)
    // IN on a leading column + equality residual still correct
    val Left(df2) = sess.execute(
      "SELECT id FROM t WHERE grp IN (13, 40) AND v = 'v110' ORDER BY id"): @unchecked
    assert(df2.collect().map(_.getLong(0)).toSeq == Seq(110L))
    // string IN-lists parse too
    sess.execute("CREATE INDEX t_v ON t (v)")
    val Left(df3) = sess.execute(
      "SELECT id FROM t WHERE v IN ('v7', 'v42') ORDER BY id"): @unchecked
    assert(df3.collect().map(_.getLong(0)).toSeq == Seq(7L, 42L))
  }

  test("multi-index choice: the longest satisfied prefix wins") {
    val (sess, _, _) = newSession()
    seed(sess)
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    sess.execute("CREATE INDEX t_gv ON t (grp, v)")
    // both indexes apply; (grp, v) satisfies a 2-column prefix and must
    // serve the probe — observable only as a correct result here, the
    // ranking itself is pinned by the fanout/prefix sort
    val Left(df) = sess.execute(
      "SELECT id FROM t WHERE grp = 13 AND v = 'v110'"): @unchecked
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(110L))
    // IN + second-column equality across two candidate indexes
    val Left(df2) = sess.execute(
      "SELECT id FROM t WHERE grp IN (13, 14) AND v = 'v111' ORDER BY id"): @unchecked
    assert(df2.collect().map(_.getLong(0)).toSeq == Seq(111L))
  }

  test("multi-index choice counts IN-bound positions; combinatorial fanout is capped out") {
    val (sess, _, _) = newSession()
    seed(sess)
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    sess.execute("CREATE INDEX t_gv ON t (grp, v)")
    def served(index: String): Boolean =
      spark.catalog.tableExists(s"t__ix_$index")
    def reset(): Unit =
      Seq("t__ix_t_grp", "t__ix_t_gv").foreach(v =>
        if (spark.catalog.tableExists(v)) spark.catalog.dropTempView(v))

    // IN-lists on BOTH positions: (grp, v) satisfies a 2-position
    // prefix (both IN-bound, fanout 2×2=4) and must beat the 1-position
    // (grp) index — the non-trivial choice the ranking exists for
    reset()
    val Left(df) = sess.execute(
      "SELECT id FROM t WHERE grp IN (13, 14) AND v IN ('v110', 'v111') " +
        "ORDER BY id"): @unchecked
    val got = df.collect().map(_.getLong(0)).toSeq
    assert(got == Seq(110L, 111L))
    assert(served("t_gv") && !served("t_grp"),
      "the 2-position IN-bound prefix must serve the probe")

    // combinatorial candidate product: above MaxProbeFanout the
    // 2-position index is out of the running — the walk falls back to
    // the 1-position index (fanout 80), never the combinatorial bet
    reset()
    val manyG = (0 until 80).map(_.toString).mkString(", ")
    val manyV = (0 until 80).map(i => s"'v$i'").mkString(", ")
    val Left(df2) = sess.execute(
      s"SELECT id FROM t WHERE grp IN ($manyG) AND v IN ($manyV) " +
        "ORDER BY id"): @unchecked
    val want2 = (0L until 2000L)
      .filter(i => i % 97 < 80 && i < 80).sorted
    assert(df2.collect().map(_.getLong(0)).toSeq == want2)
    assert(!served("t_gv"),
      s"fanout 6400 > ${GraftSql.MaxProbeFanout} must skip the 2-position probe")
  }

  test("multi-column index serves a two-column equality prefix") {
    val (sess, _, _) = newSession()
    seed(sess)
    sess.execute("CREATE INDEX t_gv ON t (grp, v)")
    val Left(df) = sess.execute(
      "SELECT id FROM t WHERE grp = 13 AND v = 'v110' ORDER BY id"): @unchecked
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(110L))
  }

  test("DROP INDEX removes the definition and its table; SELECT falls back to scan") {
    val (sess, _, cat) = newSession()
    seed(sess)
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    assert(cat.viewDefs.contains("t_grp") && cat.root.contains("t_grp"))
    sess.execute("DROP INDEX t_grp")
    assert(!cat.viewDefs.contains("t_grp") && !cat.root.contains("t_grp"))
    val Left(df) = sess.execute(
      "SELECT count(*) AS n FROM t WHERE grp = 13"): @unchecked
    assert(df.collect().head.getLong(0) == 21L)
  }

  test("index definition survives sessions and REFRESH ALL maintains it") {
    val dir = graft.core.FsUtil.tempStoreDir("graft-idx2-")
    val (ops1, cat1) = (new Ops(spark, new FsStore(dir), 64), new Catalog(new FsStore(dir)))
    val sess1 = new SqlSession(spark, ops1, cat1)
    sess1.execute("CREATE TABLE t (id bigint PRIMARY KEY, grp bigint NOT NULL)")
    sess1.execute("INSERT INTO t VALUES (1, 7), (2, 8), (3, 7)")
    sess1.execute("CREATE INDEX t_grp ON t (grp)")
    // a NEW session over the same store: defs rebuild from the root
    val store2 = new FsStore(dir)
    val (ops2, cat2) = (new Ops(spark, store2, 64), new Catalog(store2))
    val sess2 = new SqlSession(spark, ops2, cat2)
    sess2.execute("INSERT INTO t VALUES (4, 7)")
    sess2.execute("REFRESH ALL")
    import org.apache.spark.sql.functions.col
    val ids = ops2.scan(cat2.get("t_grp").get).where(col("grp") === 7)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 3L, 4L)))
    val Left(df) = sess2.execute("SELECT id FROM t WHERE grp = 7 ORDER BY id"): @unchecked
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))
  }

  test("SHOW INDEXES and SHOW MATERIALIZED VIEWS list the right definitions") {
    val (sess, _, _) = newSession()
    seed(sess)
    sess.execute("CREATE INDEX t_grp ON t (grp)")
    sess.execute("CREATE MATERIALIZED VIEW mv AS SELECT id, grp FROM t")
    val Left(ix) = sess.execute("SHOW INDEXES"): @unchecked
    val ixRows = ix.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(ixRows.toSeq == Seq(("t_grp", "t", "grp")))
    assert(ix.collect().head.getLong(3) == 2000L)
    val Left(mv) = sess.execute("SHOW MATERIALIZED VIEWS"): @unchecked
    val mvRows = mv.collect().map(r => (r.getString(0), r.getString(1)))
    assert(mvRows.toSeq == Seq(("mv", "SELECT id, grp FROM t")))
  }
}
