package graft.core

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Git-push-style replication: content addressing makes a push
  * incremental (only missing objects move) and cross-backend (the trait
  * is the protocol); structural sharing makes a delta push move only
  * the delta's chunks. */
class ReplicateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", StringType, nullable = false),
    StructField("v", LongType, nullable = false)))

  private def df(rows: Seq[(String, Long)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 4), schema)

  private def fsStore() = new FsStore(graft.core.FsUtil.tempStoreDir("graft-rep-"))

  test("push to an empty store moves everything once; re-push moves nothing") {
    val src = fsStore()
    val ops = new Ops(spark, src, 16)
    val cat = new Catalog(src)
    val rows = (0 until 1000).map(i => f"key$i%04d" -> i.toLong)
    cat.put("t", ops.fromDataFrame(df(rows), Seq("k")))
    val root = src.currentRootHash.get

    val dst = fsStore()
    val s1 = Replicate.push(src, dst, root)
    assert(s1.copiedChunks > 0 && s1.copiedTables == 1 && s1.copiedRoots == 1)

    // the destination is a fully usable store: same content, same hash
    val dops = new Ops(spark, dst, 16)
    val dcat = new Catalog(dst)
    assert(dcat.get("t").map(_.hash) == cat.get("t").map(_.hash))
    assert(dops.scan(dcat.get("t").get).count() == 1000)
    assert(dops.verifyTable(dcat.get("t").get).isEmpty,
      "replicated table fails integrity verification")
    // source store unharmed (saveChunks consumes only the temp copies)
    assert(ops.verifyTable(cat.get("t").get).isEmpty)

    // idempotent: nothing left to move
    val s2 = Replicate.push(src, dst, root)
    assert(s2.copiedChunks == 0 && s2.copiedTables == 0 && s2.copiedRoots == 0)
    assert(s2.skippedChunks == s1.copiedChunks)

    // memo cache stays local
    assert(dst.listMemos.isEmpty)
  }

  test("delta push moves only the delta's chunks (structural sharing)") {
    val src = fsStore()
    val ops = new Ops(spark, src, 16)
    val cat = new Catalog(src)
    val rows = (0 until 2000).map(i => f"key$i%05d" -> i.toLong)
    cat.put("t", ops.fromDataFrame(df(rows), Seq("k")))
    val dst = fsStore()
    val s1 = Replicate.push(src, dst, src.currentRootHash.get)

    cat.put("t", ops.upsert(cat.get("t").get,
      ops.fromDataFrame(df(Seq("key00500" -> 9L)), Seq("k"))))
    val s2 = Replicate.push(src, dst, src.currentRootHash.get)
    assert(s2.copiedChunks > 0 && s2.copiedChunks <= 4,
      s"1-key delta pushed ${s2.copiedChunks} chunks (of ${s1.copiedChunks})")
    assert(s2.skippedChunks > s1.copiedChunks / 2, "shared chunks re-copied")
    val dops = new Ops(spark, dst, 16)
    val dcat = new Catalog(dst)
    assert(dcat.get("t").map(_.hash) == cat.get("t").map(_.hash))
  }

  test("cross-backend push (fs -> pack) and non-fast-forward refusal") {
    val src = fsStore()
    val ops = new Ops(spark, src, 16)
    val cat = new Catalog(src)
    cat.put("t", ops.fromDataFrame(df(Seq("a" -> 1L, "b" -> 2L)), Seq("k")))

    val dst = new PackStore(graft.core.FsUtil.tempStoreDir("graft-rep-pack-"))
    Replicate.push(src, dst, src.currentRootHash.get)
    val dops = new Ops(spark, dst, 16)
    val dcat = new Catalog(dst)
    assert(dops.scanOrdered(dcat.get("t").get).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 1L), ("b", 2L)))

    // a diverged destination refuses the pointer move and keeps its head
    val dops2 = new Ops(spark, dst, 16)
    val dcat2 = new Catalog(dst)
    dcat2.put("other", dops2.fromDataFrame(df(Seq("z" -> 9L)), Seq("k")))
    val divergedHead = dst.currentRootHash
    cat.put("t", ops.upsert(cat.get("t").get,
      ops.fromDataFrame(df(Seq("c" -> 3L)), Seq("k"))))
    assertThrows[IllegalArgumentException](
      Replicate.push(src, dst, src.currentRootHash.get))
    assert(dst.currentRootHash == divergedHead,
      "refused push moved the destination pointer")
    // the refused push already replicated the objects; an explicit
    // no-pointer push is then a no-op and still leaves the head alone
    val s = Replicate.push(src, dst, src.currentRootHash.get,
      advancePointer = false)
    assert(s.copiedRoots == 0 && s.copiedChunks == 0)
    assert(dst.currentRootHash == divergedHead)
    assert(dst.hasRoot(src.currentRootHash.get),
      "pushed root objects must exist at the destination")
  }

  test("SQL materialized-view definitions travel with replication and refresh at the destination") {
    val src = fsStore()
    val ops = new Ops(spark, src, 16)
    val cat = new Catalog(src)
    def run(sql: String) = graft.sql.GraftSql.execute(spark, ops, cat, sql)
    run("CREATE TABLE f (k bigint PRIMARY KEY, v bigint NOT NULL)")
    run("INSERT INTO f SELECT id AS k, id AS v FROM range(0, 500)")
    run("CREATE MATERIALIZED VIEW totals AS " +
      "SELECT k % 10 AS g, SUM(v) AS total FROM f GROUP BY g")

    val dst = fsStore()
    Replicate.push(src, dst, src.currentRootHash.get)

    // the pushed root carries the view DEFINITION, not just the tables
    val dops = new Ops(spark, dst, 16)
    val dcat = new Catalog(dst)
    assert(dcat.viewDefs.keySet == Set("totals"),
      "view definitions must replicate inside the root")
    assert(dcat.get("totals").map(_.hash) == cat.get("totals").map(_.hash))
    // mutate at the destination, refresh from the replicated SQL alone
    graft.sql.GraftSql.execute(spark, dops, dcat,
      "INSERT INTO f VALUES (500, 500)")
    graft.sql.GraftSql.execute(spark, dops, dcat, "REFRESH ALL")
    val got = dops.scanOrdered(dcat.get("totals").get).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(0L) == (0L until 501L).filter(_ % 10 == 0).sum,
      s"destination refresh wrong: $got")
  }

  test("advancePointer = false into an EMPTY store leaves it pointerless (ADVICE r4)") {
    val src = fsStore()
    val ops = new Ops(spark, src, 16)
    val cat = new Catalog(src)
    cat.put("t", ops.fromDataFrame(df(Seq("a" -> 1L, "b" -> 2L)), Seq("k")))
    val root = src.currentRootHash.get

    val dst = fsStore()
    val s = Replicate.push(src, dst, root, advancePointer = false)
    assert(s.copiedRoots == 1 && s.copiedTables == 1)
    assert(dst.currentRootHash.isEmpty,
      "saveRoot's pointer side effect must be undone on a fresh store " +
        "when advancePointer = false")
    // objects are all there: a later pointer-advancing push is a pure
    // fast-forward that copies nothing
    val s2 = Replicate.push(src, dst, root)
    assert(s2.copiedRoots == 0 && s2.copiedChunks == 0)
    assert(dst.currentRootHash.contains(root))
  }
}
