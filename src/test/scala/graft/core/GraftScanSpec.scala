package graft.core

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The chunk-pruned scan (GraftFileIndex): predicates on the leading key
  * skip provably-disjoint chunk FILES at planning time, results stay
  * identical to the unpruned scan, and the custom index is actually in
  * the executed plan (not silently replaced by a stock listing). */
class GraftScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  private def newOps(target: Long = 64): Ops = {
    val dir = Files.createTempDirectory("graft-scan-").toString
    new Ops(spark, new FsStore(dir), target)
  }

  private def fixture(): (Ops, TableRef) = {
    val ops = newOps()
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((0L until 1000L).map(k => Row(k, k * 7)), 8),
      schema)
    (ops, ops.fromDataFrame(df, Seq("k")))
  }

  private def filesFor(ops: Ops, ref: TableRef, filters: Expression*): Int = {
    val m = ops.meta(ref)
    val idx = new GraftFileIndex(spark, ops.store, m)
    idx.listFiles(Nil, filters).map(_.files.length).sum
  }

  private val kAttr = AttributeReference("k", LongType, nullable = false)()

  test("leading-key predicates prune chunk files; results match the row filter") {
    val (ops, ref) = fixture()
    val total = ops.meta(ref).chunks.length
    assert(total >= 8, s"fixture should span many chunks, got $total")

    // range: only the overlapping chunks are listed
    val ranged = filesFor(ops, ref,
      GreaterThanOrEqual(kAttr, Literal(100L)), LessThan(kAttr, Literal(160L)))
    assert(ranged >= 1 && ranged < total / 2,
      s"range listed $ranged of $total files")

    // equality: at most a couple of chunks (boundary keys aside)
    val point = filesFor(ops, ref, EqualTo(kAttr, Literal(500L)))
    assert(point >= 1 && point <= 2, s"point lookup listed $point files")

    // literal-first comparison flips direction, still prunes
    val flipped = filesFor(ops, ref, GreaterThan(Literal(900L), kAttr))
    assert(flipped < total, s"flipped comparison did not prune: $flipped")

    // unrecognized predicates prune nothing (conservative)
    assert(filesFor(ops, ref, IsNotNull(kAttr)) == total)
    assert(filesFor(ops, ref) == total)

    // and the pruned scan returns exactly the row-filtered content
    val got = ops.scan(ref).where(col("k") >= 100L && col("k") < 160L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (100L until 160L).map(k => k -> k * 7).toMap)
  }

  test("empty and out-of-range predicates list zero files, return zero rows") {
    val (ops, ref) = fixture()
    assert(filesFor(ops, ref, GreaterThan(kAttr, Literal(5000L))) == 0)
    assert(ops.scan(ref).where(col("k") > 5000L).count() == 0)
  }

  test("the executed plan scans through GraftFileIndex with metadata statistics") {
    val (ops, ref) = fixture()
    val df = ops.scan(ref).where(col("k") === 500L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftFileIndex"),
      s"scan does not use the chunk index:\n$plan")
    // statistics come from chunk metadata (no listing pass)
    val m = ops.meta(ref)
    val idx = new GraftFileIndex(spark, ops.store, m)
    assert(idx.sizeInBytes > 0)
    assert(idx.inputFiles.length == m.chunks.length)
  }

  test("SQL over catalog tables gets the pruned scan end-to-end") {
    val ops = newOps()
    val cat = new Catalog(ops.store)
    graft.sql.GraftSql.execute(spark, ops, cat,
      "CREATE TABLE kv (k bigint PRIMARY KEY, v bigint NOT NULL)")
    graft.sql.GraftSql.execute(spark, ops, cat,
      "INSERT INTO kv SELECT id AS k, id * 3 AS v FROM range(0, 1000)")
    val res = graft.sql.GraftSql.execute(spark, ops, cat,
      "SELECT k, v FROM kv WHERE k >= 250 AND k < 260 ORDER BY k")
    val df = res.swap.getOrElse(fail("expected a query result"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == (250L until 260L).map(k => (k, k * 3)))
    assert(df.queryExecution.executedPlan.toString.contains("GraftFileIndex"))
  }
}
