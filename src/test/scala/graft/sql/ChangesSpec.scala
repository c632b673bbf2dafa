package graft.sql

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core._

/** Change feed (`Ops.changes` + `SELECT ... FROM CHANGES(t, v1[, v2])`):
  * the Delta-CDF read side, and its composition with StreamCdc into
  * incremental replication. */
class ChangesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fresh(chunkTarget: Int = 8) = {
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-chg-"))
    val ops = new Ops(spark, store, chunkTarget)
    (store, ops, new Catalog(store))
  }

  test("changes reports insert/delete/update with both images; shared chunks unread") {
    import spark.implicits._
    val (_, ops, cat) = fresh()
    def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)
    spark.range(0, 200).select($"id".as("k"), ($"id" * 3).as("v"))
      .createOrReplaceTempView("chg_src")
    val Right(v1) = run(
      "CREATE TABLE t PRIMARY KEY (k) AS SELECT * FROM chg_src"): @unchecked

    run("UPDATE t SET v = v + 1 WHERE k >= 50 AND k < 53")
    run("DELETE FROM t WHERE k >= 100 AND k < 102")
    run("INSERT INTO t SELECT k + 1000, k FROM t WHERE k < 2")

    val Left(ch) = run(
      s"SELECT k, v, _change_type FROM CHANGES(t, '$v1') ORDER BY k, _change_type"): @unchecked
    val rows = ch.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expected =
      (50L until 53L).flatMap(k => Seq((k, k * 3, "update_preimage"),
        (k, k * 3 + 1, "update_postimage"))) ++
        (100L until 102L).map(k => (k, k * 3, "delete")) ++
        (0L until 2L).map(k => (k + 1000, k, "insert"))
    assert(rows.toSet == expected.toSet)
    assert(rows.length == expected.length, "no unchanged row leaks into the feed")

    // two-argument form: v1 -> v1 is an empty feed
    val Left(none) = run(
      s"SELECT * FROM CHANGES(t, '$v1', '$v1')"): @unchecked
    assert(none.count() == 0)
  }

  test("single-row insert into a multi-chunk table feeds exactly one row") {
    import spark.implicits._
    val (_, ops, cat) = fresh()
    def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)
    spark.range(0, 500).select($"id".as("k"), $"id".as("v"))
      .createOrReplaceTempView("chg_one_src")
    val Right(v1) = run(
      "CREATE TABLE one PRIMARY KEY (k) AS SELECT * FROM chg_one_src"): @unchecked
    run("INSERT INTO one SELECT 250000, 7 FROM range(1)")
    val Left(ch) = run(
      s"SELECT k, v, _change_type FROM CHANGES(one, '$v1')"): @unchecked
    assert(ch.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((250000L, 7L, "insert")),
      "rows relocated only by boundary shifts must not appear")
  }

  test("change feed + CDC apply = incremental replication (hash-equal replica)") {
    import spark.implicits._
    val (_, ops, cat) = fresh()
    def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)
    spark.range(0, 300).select($"id".as("k"), ($"id" % 17).as("v"))
      .createOrReplaceTempView("chg_rep_src")
    val Right(v1) = run(
      "CREATE TABLE src PRIMARY KEY (k) AS SELECT * FROM chg_rep_src"): @unchecked
    // replica starts at v1
    run(s"CREATE TABLE dst PRIMARY KEY (k) AS SELECT * FROM src VERSION AS OF '$v1'")

    run("UPDATE src SET v = v + 100 WHERE k >= 20 AND k < 40")
    run("DELETE FROM src WHERE k >= 200 AND k < 230")
    run("INSERT INTO src SELECT k + 5000, 1 FROM src WHERE k < 5")

    // feed v1 -> current, folded to CDC ops (postimage only), applied to dst
    val feed = ops.changes(
      TableRef(cat.rootAt(v1).apply("src").tableHash),
      TableRef(cat.root("src").tableHash))
      .where(col("_change_type") =!= "update_preimage")
      .select(
        when(col("_change_type") === "delete", "D").otherwise("U").as("op"),
        lit(1L).as("seq"), col("k"), col("v"))
    graft.streaming.StreamCdc.applyBatch(spark, ops, cat, feed, "dst",
      "op", "seq", graft.core.FsUtil.tempStoreDir("graft-chg-ckpt-"), 1L)

    assert(cat.root("dst").tableHash == cat.root("src").tableHash,
      "replica must converge to the source version byte-for-byte")
  }

  test("CLONE TABLE is zero-copy; clones diverge by DML and feed their delta") {
    import spark.implicits._
    val (store, ops, cat) = fresh()
    def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)
    spark.range(0, 100).select($"id".as("k"), $"id".as("v"))
      .createOrReplaceTempView("chg_cl_src")
    val Right(v1) = run(
      "CREATE TABLE orig PRIMARY KEY (k) AS SELECT * FROM chg_cl_src"): @unchecked
    run("UPDATE orig SET v = v + 1 WHERE k >= 0 AND k < 1")

    store.stats.reset()
    run("CLONE TABLE orig AS copy")
    run(s"CLONE TABLE orig AS copy_v1 VERSION AS OF '$v1'")
    assert(store.stats.snapshot("chunkSaves") == 0, "clone must write no chunks")
    assert(cat.root("copy").tableHash == cat.root("orig").tableHash)
    assert(cat.root("copy_v1").tableHash ==
      cat.rootAt(v1).apply("orig").tableHash)

    // clones are independent: DML on the clone leaves the source alone,
    // and the delta between them is exactly the clone's own edits
    val origBefore = cat.root("orig").tableHash
    run("UPDATE copy SET v = v + 10 WHERE k >= 90 AND k < 93")
    assert(cat.root("orig").tableHash == origBefore)
    val feed = ops.changes(TableRef(cat.root("orig").tableHash),
      TableRef(cat.root("copy").tableHash))
    assert(feed.where(col("_change_type") === "update_postimage")
      .select("k").as[Long].collect().sorted.toSeq == Seq(90L, 91L, 92L))

    val ex = intercept[GraftSql.SqlException] { run("CLONE TABLE orig AS copy") }
    assert(ex.getMessage.contains("already exists"))
  }

  test("changes plans only the non-shared chunk files") {
    import spark.implicits._
    val (store, ops, cat) = fresh()
    def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)
    spark.range(0, 400).select($"id".as("k"), $"id".as("v"))
      .createOrReplaceTempView("chg_files_src")
    val Right(v1) = run(
      "CREATE TABLE f PRIMARY KEY (k) AS SELECT * FROM chg_files_src"): @unchecked
    run("UPDATE f SET v = v + 1 WHERE k >= 100 AND k < 103")

    val oldRef = TableRef(cat.rootAt(v1).apply("f").tableHash)
    val newRef = TableRef(cat.root("f").tableHash)
    val shared = ops.meta(oldRef).chunks.map(_.hash).toSet
      .intersect(ops.meta(newRef).chunks.map(_.hash).toSet)
    assert(shared.nonEmpty, "a 3-key update must leave most chunks shared")
    val planned = ops.changes(oldRef, newRef).inputFiles.toSet
    val sharedPaths = shared.map(h => "file:" + store.chunkPath(h))
    assert(planned.intersect(sharedPaths).isEmpty,
      "chunks shared by both versions must never be scanned")
    assert(planned.nonEmpty)
  }

  test("VACUUM keeps chunks reachable through a clone") {
    import spark.implicits._
    val (_, ops, cat) = fresh()
    def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)
    spark.range(0, 100).select($"id".as("k"), $"id".as("v"))
      .createOrReplaceTempView("chg_gc_src")
    run("CREATE TABLE keeper PRIMARY KEY (k) AS SELECT * FROM chg_gc_src")
    run("CLONE TABLE keeper AS keeper2")
    run("UPDATE keeper2 SET v = v + 1 WHERE k >= 0 AND k < 1")
    run("VACUUM KEEP 1")
    // both tables fully readable after GC: shared chunks survive because
    // the clone's catalog entry is a root reference like any other
    assert(ops.scanOrdered(cat.get("keeper").get).count() == 100)
    assert(ops.scanOrdered(cat.get("keeper2").get).count() == 100)
  }
}
