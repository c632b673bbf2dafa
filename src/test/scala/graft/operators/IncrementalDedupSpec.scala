package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core._

/** The shingle inverted index as a graft table (IncrementalDedup): a
  * generator re-key view with uniqueKeys, maintained O(delta) by the
  * patch path as the corpus grows. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Synthetic corpus: doc i = tokens w(i%7), w(i%7+1), ..., length
    * 6 + i%5 — heavy shingle overlap between docs with close ids, so
    * near-dup pairs exist. */
  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val toks = (0 until (6 + i % 5)).map(k => s"w${(i % 7) + k}")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def newEngine(target: Long = 64) = {
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-incd-"))
    val ops = new Ops(spark, store, target)
    val cat = new Catalog(store)
    (store, ops, cat, new Views(ops, cat))
  }

  private def indexRows(ops: Ops, cat: Catalog): Set[(String, Long)] =
    ops.scan(TableRef(cat.root("shingle_idx").tableHash))
      .select("s", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  /** Expected postings computed directly on the driver. */
  private def expected(docs: Seq[(Long, String)]): Set[(String, Long)] =
    docs.flatMap { case (id, text) =>
      val ts = text.split(" ")
      if (ts.length < 3) Nil
      else (0 to ts.length - 3).map(i =>
        (s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}", id)).distinct
    }.toSet

  test("index rows match the direct shingle computation") {
    val (_, ops, cat, views) = newEngine()
    val docs = corpus(300)
    cat.put("docs", ops.fromDataFrame(docs, Seq("doc_id")))
    IncrementalDedup.declareIndex(views, "shingle_idx", "docs")
    views.refresh("shingle_idx")
    val want = expected(docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
    assert(indexRows(ops, cat) == want)
  }

  test("shingle expression edge lengths: 1-5 tokens, repeats, empties") {
    import spark.implicits._
    // the zip_with slice construction has its edges at tiny token
    // counts (exactly-3 = one shingle; under-3 = filtered) and at
    // repeated tokens (array_distinct); empty-string tokens from a
    // double space must shingle literally, same as the split semantics
    val docs = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"),
      (5L, "a b c d e"), (6L, "x x x x"), (7L, "a  b c"))
      .toDF("doc_id", "text")
    val (_, ops, cat, views) = newEngine()
    cat.put("docs", ops.fromDataFrame(docs, Seq("doc_id")))
    IncrementalDedup.declareIndex(views, "shingle_idx", "docs")
    views.refresh("shingle_idx")
    val want = expected(Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"),
      (5L, "a b c d e"), (6L, "x x x x"), (7L, "a  b c")))
    assert(indexRows(ops, cat) == want)
  }

  test("ingest batch refreshes O(delta): bounded chunk writes, no full rewrite") {
    val (store, ops, cat, views) = newEngine()
    val docs = corpus(2000)
    cat.put("docs", ops.fromDataFrame(
      docs.where(col("doc_id") < 1900), Seq("doc_id")))
    IncrementalDedup.declareIndex(views, "shingle_idx", "docs")
    views.refresh("shingle_idx")
    val idxChunksBefore =
      ops.meta(TableRef(cat.root("shingle_idx").tableHash)).chunks.length
    assert(idxChunksBefore > 20, s"need many index chunks: $idxChunksBefore")

    // the new batch: 100 docs (one tail region of the 30+-chunk docs table)
    cat.put("docs", ops.upsert(
      TableRef(cat.root("docs").tableHash),
      ops.fromDataFrame(docs.where(col("doc_id") >= 1900), Seq("doc_id"))))
    store.stats.reset()
    views.refresh("shingle_idx")
    val saves = store.stats.chunkSaves.get
    assert(saves > 0, "refresh after ingest must write something")
    assert(saves < idxChunksBefore / 2,
      s"refresh must patch, not rebuild: $saves chunk writes vs " +
        s"$idxChunksBefore index chunks")

    // idle refresh: whole-op memo hit, zero writes, no new root
    store.stats.reset()
    val v1 = cat.root("shingle_idx").tableHash
    views.refresh("shingle_idx")
    assert(store.stats.chunkSaves.get == 0)
    assert(cat.root("shingle_idx").tableHash == v1)
  }

  test("phrase probe prunes index chunk files on the leading key") {
    val (_, ops, cat, views) = newEngine()
    val docs = corpus(1500)
    cat.put("docs", ops.fromDataFrame(docs, Seq("doc_id")))
    IncrementalDedup.declareIndex(views, "shingle_idx", "docs")
    views.refresh("shingle_idx")
    val ref = TableRef(cat.root("shingle_idx").tableHash)
    val m = ops.meta(ref)
    assert(m.chunks.length > 10, s"need many chunks: ${m.chunks.length}")
    // one phrase: the index is keyed by (s, doc_id), so the equality on
    // s prunes to the chunk files whose key range can contain it
    val phrase = "w0 w1 w2"
    val probed = ops.scan(ref).where(col("s") === phrase)
    val scanned = probed.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles
    }.sum
    assert(scanned > 0 && scanned < m.chunks.length,
      s"probe must prune: $scanned of ${m.chunks.length} files")
    // and the pruned read returns exactly the matching postings
    val got = probed.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = expected(docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      .collect { case (s, id) if s == phrase => id }
    assert(got == want)
  }

  test("incremental build hash-equals a from-scratch build") {
    val docs = corpus(800)
    val (_, ops1, cat1, views1) = newEngine()
    cat1.put("docs", ops1.fromDataFrame(
      docs.where(col("doc_id") % 4 =!= 0), Seq("doc_id")))
    IncrementalDedup.declareIndex(views1, "shingle_idx", "docs")
    views1.refresh("shingle_idx")
    cat1.put("docs", ops1.upsert(
      TableRef(cat1.root("docs").tableHash),
      ops1.fromDataFrame(docs.where(col("doc_id") % 4 === 0), Seq("doc_id"))))
    views1.refresh("shingle_idx")

    val (_, ops2, cat2, views2) = newEngine()
    cat2.put("docs", ops2.fromDataFrame(docs, Seq("doc_id")))
    IncrementalDedup.declareIndex(views2, "shingle_idx", "docs")
    views2.refresh("shingle_idx")

    assert(cat1.root("shingle_idx").tableHash ==
      cat2.root("shingle_idx").tableHash)
  }
}
