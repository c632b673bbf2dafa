package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core._

/** Ranked retrieval (tf inverted index as a generator+FoldSum view) and
  * largest-remainder corpus mixing (two-pass threshold selection). */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Synthetic corpus with REPEATED tokens so tf > 1 exercises the
    * fold: doc i repeats token w(i%5) (2 + i%3) times then walks
    * w(i%5)..w(i%5+3). */
  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val rep = Seq.fill(2 + i % 3)(s"w${i % 5}")
      val walk = (0 until 4).map(k => s"w${(i % 5) + k}")
      (i.toLong, (rep ++ walk).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def newEngine(target: Long = 64) = {
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-search-"))
    val ops = new Ops(spark, store, target)
    val cat = new Catalog(store)
    (store, ops, cat, new Views(ops, cat))
  }

  /** Expected tf rows computed on the driver. */
  private def expectedTf(docs: Seq[(Long, String)]): Set[(String, Long, Long)] =
    docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).groupBy(identity).map {
        case (t, occ) => (t, id, occ.length.toLong)
      }
    }.toSet

  test("tf index folds occurrence collisions into term frequencies") {
    val (_, ops, cat, views) = newEngine()
    val docs = corpus(200)
    cat.put("docs", ops.fromDataFrame(docs, Seq("doc_id")))
    Search.declareTfIndex(views, "tf_idx", "docs")
    views.refresh("tf_idx")
    val got = ops.scan(TableRef(cat.root("tf_idx").tableHash))
      .select("token", "doc_id", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expectedTf(
      docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq))
  }

  test("tf index refresh is O(delta) and hash-equals from-scratch") {
    val (store, ops, cat, views) = newEngine(target = 32)
    val docs = corpus(1500)
    cat.put("docs", ops.fromDataFrame(docs, Seq("doc_id")))
    Search.declareTfIndex(views, "tf_idx", "docs")
    views.refresh("tf_idx")

    // append two docs (the crawl tail): refresh must touch a bounded
    // number of chunks, not rebuild the index
    import spark.implicits._
    val delta = Seq((1500L, "w0 w0 w1 w2"), (1501L, "w3 w3 w3 w4"))
      .toDF("doc_id", "text")
    cat.put("docs", ops.upsert(TableRef(cat.root("docs").tableHash),
      ops.fromDataFrame(delta, Seq("doc_id"))))
    store.stats.reset()
    views.refresh("tf_idx")
    val saves = store.stats.snapshot("chunkSaves")
    val idxChunks = ops.meta(TableRef(cat.root("tf_idx").tableHash)).chunks.length
    assert(saves < idxChunks / 2,
      s"2-doc delta refresh wrote $saves of $idxChunks index chunks")

    // incremental result == from-scratch build in a fresh store
    val (_, ops2, cat2, views2) = newEngine(target = 32)
    cat2.put("docs", ops2.fromDataFrame(
      docs.unionByName(delta), Seq("doc_id")))
    Search.declareTfIndex(views2, "tf_idx", "docs")
    views2.refresh("tf_idx")
    assert(cat.root("tf_idx").tableHash == cat2.root("tf_idx").tableHash)
  }

  test("ranked-search probe prunes tf-index chunk files on the token key") {
    val (_, ops, cat, views) = newEngine(target = 24)
    val docs = corpus(1200)
    cat.put("docs", ops.fromDataFrame(docs, Seq("doc_id")))
    Search.declareTfIndex(views, "tf_idx", "docs")
    views.refresh("tf_idx")
    val ref = TableRef(cat.root("tf_idx").tableHash)
    val m = ops.meta(ref)
    assert(m.chunks.length > 10, s"need many chunks: ${m.chunks.length}")
    // the index is keyed by (token, doc_id): a term IN-probe prunes to
    // the chunk files whose key range can contain those tokens — the
    // serving read path of textRankedSearch
    val probed = ops.scan(ref).where(col("token").isin("w1", "w3"))
    val scanned = probed.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.totalNumberOfFiles
    }.sum
    assert(scanned > 0 && scanned < m.chunks.length,
      s"probe must prune: $scanned of ${m.chunks.length} files")
    val got = probed.groupBy(col("token")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val want = expectedTf(
      docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      .filter(t => t._1 == "w1" || t._1 == "w3")
      .groupBy(_._1).map { case (t, rows) => (t, rows.size.toLong) }
    assert(got == want)
  }

  test("pipeline_mix: quotas are largest-remainder exact and selection " +
      "equals the naive per-source rank") {
    import spark.implicits._
    val got = Search.pipelineMix(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))

    // naive: global per-source rank by (md5, doc_id) up to the same
    // largest-remainder quota, computed independently on the driver
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"source",
        md5($"doc_id".cast("string")).as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bySrc = docs.groupBy(_._2)
    val total = docs.length.toLong
    val budget = total / 2
    def w(src: String) = 1L + src.drop(3).toLong % 4
    val srcs = bySrc.keys.toSeq.sorted
    val quota = Search.largestRemainder(srcs.map(s => (s, w(s))), budget)
    val want = srcs.flatMap { s =>
      bySrc(s).sortBy(d => (d._3, d._1)).take(quota(s).toInt)
        .map(d => (d._1, s))
    }.sortBy(_._1)
    assert(got.toSeq == want)
    assert(got.length == budget)
  }

  test("largest-remainder apportionment: exact sum, floor+bump, " +
      "deterministic tie-break") {
    // 10 seats over weights 3/3/1 (W=7): floors 4/4/1 with remainders
    // 2/2/3 — c's largest remainder takes the single leftover seat
    val q = Search.largestRemainder(Seq(("b", 3L), ("a", 3L), ("c", 1L)), 10L)
    assert(q == Map("a" -> 4L, "b" -> 4L, "c" -> 2L))
    assert(q.values.sum == 10L)
    // equal remainders: name ascending breaks the tie (a gets the seat)
    val t = Search.largestRemainder(Seq(("c", 1L), ("b", 1L), ("a", 1L)), 10L)
    assert(t == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // degenerate: zero budget
    assert(Search.largestRemainder(Seq(("a", 1L), ("b", 1L)), 0L)
      .values.forall(_ == 0L))
  }

  test("ranked search scores match a direct tf-idf computation") {
    val got = Search.textRankedSearch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toLong
    val tf = docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (t, occ) => (t, id, occ.length.toLong) }
    }
    val df = tf.groupBy(_._1).map { case (t, rows) => (t, rows.length.toLong) }
    val terms = df.toSeq.sortBy { case (t, d) => (-d, t) }
      .slice(10, 13).map { case (t, d) => (t, 1000000L * n / d) }.toMap
    val want = tf.filter(r => terms.contains(r._1))
      .groupBy(_._2).map { case (id, rows) =>
        (id, rows.map(r => r._3 * terms(r._1)).sum)
      }.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10)
    assert(got.toSeq == want)
  }
}
