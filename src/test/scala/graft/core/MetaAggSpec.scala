package graft.core

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Metadata-only aggregates (MetaAgg): unfiltered global COUNT/MIN/MAX
  * over a graft scan collapse to a LocalRelation — zero Spark jobs,
  * zero chunk files opened — with values identical to the full scan;
  * anything the metadata cannot answer exactly is left untouched. */
class MetaAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def newOps(target: Long = 64): Ops = {
    val dir = graft.core.FsUtil.tempStoreDir("graft-metaagg-")
    new Ops(spark, new FsStore(dir), target)
  }

  private def countJobs[T](body: => T): (T, Int) = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // listener events are async — settle before reading the counter
      Thread.sleep(200)
      (r, jobs.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("count/min/max over all scalar types match the scan, with zero jobs") {
    val ops = newOps()
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("i", IntegerType),
      StructField("d", DoubleType),
      StructField("s", StringType),
      StructField("ts", TimestampType),
      StructField("dec", DecimalType(12, 2))))
    val base = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val rows = (0L until 500L).map { k =>
      Row(k, if (k % 7 == 0) null else (k % 97).toInt, (k % 31) * 1.5,
        s"v${k % 50}", new java.sql.Timestamp(base.getTime + k * 1000),
        new java.math.BigDecimal(k).movePointLeft(2).setScale(2))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val ref = ops.fromDataFrame(df, Seq("k"))

    val q = ops.scan(ref).agg(
      count(lit(1)).as("n"), count(col("i")).as("n_i"),
      min(col("i")).as("min_i"), max(col("i")).as("max_i"),
      min(col("d")).as("min_d"), max(col("d")).as("max_d"),
      min(col("s")).as("min_s"), max(col("s")).as("max_s"),
      min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
      min(col("dec")).as("min_dec"), max(col("dec")).as("max_dec"),
      min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    assert(q.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"expected metadata collapse, got:\n${q.queryExecution.optimizedPlan}")
    val (got, jobs) = countJobs(q.collect()(0))
    assert(jobs == 0, s"metadata aggregate ran $jobs jobs")

    // ground truth from the raw frame (no graft machinery)
    val want = df.agg(
      count(lit(1)), count(col("i")), min(col("i")), max(col("i")),
      min(col("d")), max(col("d")), min(col("s")), max(col("s")),
      min(col("ts")), max(col("ts")), min(col("dec")), max(col("dec")),
      min(col("k")), max(col("k"))).collect()(0)
    assert(got.toSeq == want.toSeq, s"\n got $got\nwant $want")
  }

  test("avg over integral columns collapses to metadata; decimal/fp avg bails") {
    val ops = newOps()
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("i", IntegerType),
      StructField("v", LongType),
      StructField("z", LongType), // all NULL
      StructField("d", DoubleType),
      StructField("dec", DecimalType(12, 2))))
    val rows = (0L until 400L).map { k =>
      Row(k, if (k % 5 == 0) null else (k % 89).toInt, k * 3, null,
        k * 0.25, new java.math.BigDecimal(k).movePointLeft(1).setScale(2))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val ref = ops.fromDataFrame(df, Seq("k"))

    val q = ops.scan(ref).agg(avg(col("i")).as("ai"), avg(col("v")).as("av"),
      avg(col("z")).as("az"))
    assert(q.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"expected metadata collapse, got:\n${q.queryExecution.optimizedPlan}")
    val (got, jobs) = countJobs(q.collect()(0))
    assert(jobs == 0, s"metadata avg ran $jobs jobs")
    val want = df.agg(avg(col("i")), avg(col("v")), avg(col("z"))).collect()(0)
    assert(got.toSeq == want.toSeq, s"\n got $got\nwant $want")

    // fp and decimal averages must NOT collapse (fp sums unrecorded;
    // decimal division semantics belong to the scan) — and must still
    // be CORRECT through the real scan
    for (c <- Seq("d", "dec")) {
      val qb = ops.scan(ref).agg(avg(col(c)).as("a"))
      assert(!qb.queryExecution.optimizedPlan
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
        s"avg($c) must not collapse")
      assert(qb.collect()(0).toSeq ==
        df.agg(avg(col(c))).collect()(0).toSeq)
    }
  }

  test("all-null column aggregates to NULL; count excludes nulls") {
    val ops = newOps()
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", IntegerType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 200L).map(k => Row(k, null)), 2), schema)
    val ref = ops.fromDataFrame(df, Seq("k"))
    val q = ops.scan(ref).agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
      count(col("v")).as("n"))
    assert(q.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val r = q.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getLong(2) == 0L)
  }

  test("filters, grouping, distinct, and untracked columns leave the plan alone") {
    val ops = newOps()
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("k2", LongType, nullable = false),
      StructField("v", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 300L).map(k => Row(k, k * 2, k % 13)), 3), schema)
    val ref = ops.fromDataFrame(df, Seq("k", "k2"))
    def localized(q: org.apache.spark.sql.DataFrame): Boolean =
      q.queryExecution.optimizedPlan
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
    val scan = ops.scan(ref)

    assert(!localized(scan.where(col("k") > 10).agg(count(lit(1)))),
      "a filtered aggregate must not collapse")
    assert(!localized(scan.groupBy(col("v")).agg(count(lit(1)))),
      "a grouped aggregate must not collapse")
    assert(!localized(scan.agg(countDistinct(col("v")))),
      "a DISTINCT aggregate must not collapse")
    assert(!localized(scan.agg(min(col("k2")))),
      "a non-leading key column is untracked")
    assert(localized(scan.agg(sum(col("v")))),
      "integral SUM is derivable from the exact chunk sums")
    assert(scan.agg(sum(col("v"))).collect()(0).getLong(0) ==
      (0L until 300L).map(_ % 13).sum)
    // and the untouched plans still produce correct answers
    assert(scan.where(col("k") > 10).count() == 289L)
    assert(scan.agg(min(col("k2"))).collect()(0).getLong(0) == 0L)
  }

  test("oversized string stats drop per chunk and the rule bails, staying correct") {
    val ops = newOps()
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("s", StringType)))
    val big = "x" * 200 // > MaxStatBytes: stats drop for the chunk
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 100L).map(k => Row(k, if (k == 50) big else s"a$k")), 2),
      schema)
    val ref = ops.fromDataFrame(df, Seq("k"))
    val q = ops.scan(ref).agg(max(col("s")).as("mx"))
    assert(!q.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      "dropped stats must not collapse")
    assert(q.collect()(0).getString(0) == big)
  }

  test("exact metadata sums: integral (with nulls and negatives) and decimal") {
    val ops = newOps()
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType),
      StructField("i", IntegerType),
      StructField("dec", DecimalType(10, 2)),
      StructField("d", DoubleType)))
    val rows = (0L until 600L).map { k =>
      Row(k, if (k % 11 == 0) null else k * 31 - 9000,
        if (k % 5 == 0) null else (k % 7 - 3).toInt,
        new java.math.BigDecimal(k * 13 - 4000).movePointLeft(2).setScale(2),
        k * 0.25)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val ref = ops.fromDataFrame(df, Seq("k"))
    val scan = ops.scan(ref)

    val q = scan.agg(sum(col("v")).as("sv"), sum(col("i")).as("si"),
      sum(col("dec")).as("sdec"))
    assert(q.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"sum did not collapse:\n${q.queryExecution.optimizedPlan}")
    val (got, jobs) = countJobs(q.collect()(0))
    assert(jobs == 0, s"metadata sum ran $jobs jobs")
    val want = df.agg(sum(col("v")), sum(col("i")), sum(col("dec")))
      .collect()(0)
    assert(got.toSeq == want.toSeq, s"\n got $got\nwant $want")

    // fp sums are order-dependent — never answered from metadata
    assert(!scan.agg(sum(col("d")))
      .queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    // all-null sum is NULL
    val allNull = ops.fromDataFrame(
      spark.createDataFrame(spark.sparkContext.parallelize(
        (0L until 100L).map(k => Row(k, null, null, null, 1.0)), 2), schema),
      Seq("k"))
    val r0 = ops.scan(allNull).agg(sum(col("v"))).collect()(0)
    assert(r0.isNullAt(0))
  }

  test("sums survive DML through the patch path (driver writer records them)") {
    val ops = newOps(32)
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 400L).map(k => Row(k, k * 3)), 4), schema)
    val ref = ops.fromDataFrame(df, Seq("k"))
    // point-patch a few rows (driver splice writes new chunks)
    val patched = ops.patchTable(ref,
      Seq(Row(1000L, 7L), Row(1001L, 8L)), Seq(Seq[Any](0L)))
    val q = ops.scan(patched).agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
    assert(q.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      "patched chunks must carry sums too")
    val r = q.collect()(0)
    assert(r.getLong(0) == (0L until 400L).map(_ * 3).sum - 0L + 15L)
    assert(r.getLong(1) == 401L)
  }

  test("empty table: count 0, min/max NULL") {
    val ops = newOps()
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType)))
    val ref = ops.fromDataFrame(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema),
      Seq("k"))
    // an empty table scans as an empty local frame (no graft relation
    // to collapse) — the rule must stay out of the way and values stay
    // correct through Spark's own aggregate
    val q = ops.scan(ref).agg(count(lit(1)).as("n"),
      min(col("k")).as("mn"), max(col("v")).as("mx"))
    val r = q.collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("range count: interior chunks counted from metadata, only edges scanned") {
    val ops = newOps(32)
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 2000L).map(k => Row(k, k % 17)), 8), schema)
    val ref = ops.fromDataFrame(df, Seq("k"))
    val total = ops.meta(ref).chunks.length
    assert(total >= 20, s"fixture should span many chunks, got $total")
    val scan = ops.scan(ref)

    def edgeFiles(q: org.apache.spark.sql.DataFrame): Option[Int] = {
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

    // wide inclusive range: interior counted, few edge chunks scanned
    val q1 = scan.where(col("k") >= 100L && col("k") <= 1800L)
      .agg(count(lit(1)).as("n"))
    val e1 = edgeFiles(q1)
    assert(e1.exists(_ <= 4), s"range count should scan only edges, got $e1 of $total")
    assert(q1.collect()(0).getLong(0) == 1701L)

    // exclusive + open-ended + literal-first + equality forms
    assert(scan.where(col("k") > 99L && col("k") < 1800L)
      .agg(count(lit(1))).collect()(0).getLong(0) == 1700L)
    assert(scan.where(col("k") >= 1500L)
      .agg(count(lit(1))).collect()(0).getLong(0) == 500L)
    assert(scan.where(lit(100L) <= col("k"))
      .agg(count(lit(1))).collect()(0).getLong(0) == 1900L)
    assert(scan.where(col("k") === 777L)
      .agg(count(col("k"))).collect()(0).getLong(0) == 1L)

    // a residual non-key conjunct must NOT take the metadata shortcut —
    // and must stay correct
    val q2 = scan.where(col("k") >= 100L && col("v") === 3L)
      .agg(count(lit(1)).as("n"))
    assert(edgeFiles(q2).forall(_ == total),
      "a non-key conjunct must scan the full pruned range")
    assert(q2.collect()(0).getLong(0) ==
      (100L until 2000L).count(_ % 17 == 3))
    // a count of a VALUE column needs null knowledge — not rewritten
    val q3 = scan.where(col("k") >= 100L).agg(count(col("v")))
    assert(edgeFiles(q3).forall(_ == total))
    assert(q3.collect()(0).getLong(0) == 1900L)
  }

  test("SQL over a catalog table collapses too (the engine read path)") {
    val ops = newOps()
    val cat = new Catalog(ops.store)
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 400L).map(k => Row(k, k * 3)), 4), schema)
    df.createOrReplaceTempView("ma_src")
    graft.sql.GraftSql.execute(spark, ops, cat,
      "CREATE TABLE ma_t PRIMARY KEY (k) AS SELECT * FROM ma_src")
    val Left(out) = graft.sql.GraftSql.execute(spark, ops, cat,
      "SELECT count(*) AS n, min(v) AS mn, max(v) AS mx, " +
        "min(k) AS mnk, max(k) AS mxk FROM ma_t"): @unchecked
    assert(out.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val r = out.collect()(0)
    assert(r.getLong(0) == 400L && r.getLong(1) == 0L &&
      r.getLong(2) == 1197L && r.getLong(3) == 0L && r.getLong(4) == 399L)
  }
}
