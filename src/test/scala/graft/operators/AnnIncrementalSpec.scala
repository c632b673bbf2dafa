package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core._

/** Incremental IVF index maintenance (Vectors.declareIvfIndex): the
  * frozen-centroid assignment as a uniqueKeys re-key view, refreshed
  * O(delta) by the patch path as vector batches arrive. */
class AnnIncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic synthetic vectors: dim 8, values derived from the id
    * — clusters around 4 anchor points so assignments are non-trivial. */
  private def vecs(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val anchor = i % 4
      val q = (0 until 8).map(d =>
        (anchor * 1000 + d * 37 + (i % 11)).toLong)
      (i.toLong, q, q.map(x => x * x).sum)
    }.toDF("vec_id", "q", "nq")
  }

  private def cents(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Seq[Long], Long)] =
    df.where(col("vec_id") % 10 === 5).orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq, r.getLong(2))).toSeq

  private def newEngine() = {
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-annincr-"))
    val ops = new Ops(spark, store, 64)
    val cat = new Catalog(store)
    (store, ops, cat, new Views(ops, cat))
  }

  /** Expected assignment computed on the driver: argmin d², ties to the
    * lower centroid id. */
  private def expectedCells(rows: Seq[(Long, Seq[Long], Long)],
      cs: Seq[(Long, Seq[Long], Long)]): Map[Long, Long] =
    rows.map { case (id, q, nq) =>
      val best = cs.map { case (cid, cq, cn) =>
        val dot = q.zip(cq).map { case (a, b) => a * b }.sum
        (nq + cn - 2 * dot, cid)
      }.minBy(identity)
      id -> best._2
    }.toMap

  test("assignments match the driver argmin; ingest refresh is O(delta)") {
    val (store, ops, cat, views) = newEngine()
    val all = vecs(3000)
    // append-pattern ingest: the id tail arrives as the second batch
    val init = all.where(col("vec_id") < 2700)
    cat.put("vecs", ops.fromDataFrame(init, Seq("vec_id")))
    val cs = cents(init)
    Vectors.declareIvfIndex(views, "ivf_idx", "vecs", cs)
    views.refresh("ivf_idx")

    val idxChunks =
      ops.meta(TableRef(cat.root("ivf_idx").tableHash)).chunks.length
    assert(idxChunks > 10, s"need many index chunks: $idxChunks")

    // correctness of the frozen-centroid assignment
    val got = ops.scan(TableRef(cat.root("ivf_idx").tableHash))
      .select("cell", "vec_id").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    val rows = init.collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1).toSeq, r.getLong(2))).toSeq
    assert(got == expectedCells(rows, cs))

    // the batch arrives at the id tail: bounded chunk writes — the
    // delta minis + the patched runs, never a full index rewrite
    cat.put("vecs", ops.upsert(
      TableRef(cat.root("vecs").tableHash),
      ops.fromDataFrame(all.where(col("vec_id") >= 2700), Seq("vec_id"))))
    store.stats.reset()
    views.refresh("ivf_idx")
    val saves = store.stats.chunkSaves.get
    assert(saves > 0 && saves < idxChunks,
      s"refresh must patch, not rebuild: $saves writes vs $idxChunks chunks")

    // incremental result == from-scratch build over the full corpus
    val (_, ops2, cat2, views2) = newEngine()
    cat2.put("vecs", ops2.fromDataFrame(all, Seq("vec_id")))
    Vectors.declareIvfIndex(views2, "ivf_idx", "vecs", cs)
    views2.refresh("ivf_idx")
    assert(cat.root("ivf_idx").tableHash == cat2.root("ivf_idx").tableHash)
  }
}
