package graft.core

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Ordered-limit chunk pruning (LimitPrune): ORDER BY <key prefix>
  * LIMIT n over a graft scan reads only the head/tail chunks that can
  * contain the top n rows; anything the chunk order cannot prove is
  * left untouched. */
class LimitPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def newOps(target: Long = 32): Ops = {
    val dir = graft.core.FsUtil.tempStoreDir("graft-limitprune-")
    new Ops(spark, new FsStore(dir), target)
  }

  private def scannedChunks(q: org.apache.spark.sql.DataFrame): Option[Int] = {
    var n: Option[Int] = None
    q.queryExecution.optimizedPlan.foreach {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location match {
              case g: GraftFileIndex => n = Some(g.tableMeta.chunks.length)
              case _ =>
            }
          case _ =>
        }
      case _ =>
    }
    n
  }

  test("asc/desc head and tail read only edge chunks; rows exact") {
    val ops = newOps()
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 1500L).map(k => Row(k, k * 7)), 8), schema)
    val ref = ops.fromDataFrame(df, Seq("k"))
    val total = ops.meta(ref).chunks.length
    assert(total >= 20, s"fixture should span many chunks, got $total")
    val scan = ops.scan(ref)

    val head = scan.orderBy(col("k")).limit(10)
    assert(scannedChunks(head).exists(_ <= 3),
      s"head limit should prune to edge chunks, got ${scannedChunks(head)} of $total")
    assert(head.collect().map(_.getLong(0)).toSeq == (0L until 10L))

    val tail = scan.orderBy(col("k").desc).limit(7)
    assert(scannedChunks(tail).exists(_ <= 3))
    assert(tail.collect().map(_.getLong(0)).toSeq ==
      (1499L to 1493L by -1L))

    // projection above the sort keeps the pruning
    val proj = scan.select(col("k")).orderBy(col("k")).limit(5)
    assert(scannedChunks(proj).exists(_ <= 3))
    assert(proj.collect().map(_.getLong(0)).toSeq == (0L until 5L))
  }

  test("key-prefix order on a composite key prunes and stays a valid top-n") {
    val ops = newOps()
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false),
      StructField("v", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 1200L).map(i => Row(i / 10, i % 10, i)), 6), schema)
    val ref = ops.fromDataFrame(df, Seq("a", "b"))
    val total = ops.meta(ref).chunks.length
    val scan = ops.scan(ref)

    val q = scan.orderBy(col("a")).limit(25)
    assert(scannedChunks(q).exists(c => c < total && c <= 4))
    val got = q.collect().map(_.getLong(0)).toSeq
    // a valid top-25 under ORDER BY a: every returned a-value must be
    // ≤ the 25th smallest a-value overall (ties may break either way)
    assert(got.length == 25 && got.forall(_ <= 2L), s"got $got")

    // full-key order: fully deterministic rows
    val q2 = scan.orderBy(col("a"), col("b")).limit(12)
    assert(scannedChunks(q2).exists(_ <= 4))
    assert(q2.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (0L until 12L).map(i => (i / 10, i % 10)))
  }

  test("non-provable orders and shapes are left untouched, and stay correct") {
    val ops = newOps()
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("k2", LongType, nullable = false),
      StructField("v", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 800L).map(i => Row(i, 800L - i, i % 23)), 4), schema)
    val ref = ops.fromDataFrame(df, Seq("k", "k2"))
    val total = ops.meta(ref).chunks.length
    val scan = ops.scan(ref)

    // order by a VALUE column: no chunk-order claim
    val byV = scan.orderBy(col("v")).limit(5)
    assert(scannedChunks(byV).forall(_ == total))
    assert(byV.collect().map(_.getLong(2)).forall(_ == 0L))
    // order by a NON-LEADING key column
    assert(scannedChunks(scan.orderBy(col("k2")).limit(5)).forall(_ == total))
    // mixed directions
    assert(scannedChunks(
      scan.orderBy(col("k"), col("k2").desc).limit(5)).forall(_ == total))
    // a filter between limit and scan blocks the row-count arithmetic
    val filtered = scan.where(col("v") > 5).orderBy(col("k")).limit(5)
    assert(scannedChunks(filtered).forall(_ == total))
    assert(filtered.collect().map(_.getLong(0)).toSeq ==
      (0L until 800L).filter(_ % 23 > 5).take(5))
    // limit covering the whole table: nothing to prune
    assert(scannedChunks(scan.orderBy(col("k")).limit(100000))
      .forall(_ == total))
  }

  test("SQL head query over a catalog table prunes end-to-end") {
    val ops = newOps()
    val cat = new Catalog(ops.store)
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 900L).map(k => Row(k, k * 2)), 4), schema)
      .createOrReplaceTempView("lp_src")
    graft.sql.GraftSql.execute(spark, ops, cat,
      "CREATE TABLE lp_t PRIMARY KEY (k) AS SELECT * FROM lp_src")
    val total = ops.meta(TableRef(cat.root("lp_t").tableHash)).chunks.length
    val Left(out) = graft.sql.GraftSql.execute(spark, ops, cat,
      "SELECT k, v FROM lp_t ORDER BY k LIMIT 6"): @unchecked
    assert(scannedChunks(out).exists(c => c < total))
    assert(out.collect().map(_.getLong(0)).toSeq == (0L until 6L))
  }
}
