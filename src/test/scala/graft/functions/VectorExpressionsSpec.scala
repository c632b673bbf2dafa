package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dot_long matches a reference loop, interpreted and codegen paths") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextLong(20000) - 10000),
      Seq.fill(64)(rnd.nextLong(20000) - 10000)))
    val df = rows.toDF("a", "b")
    val got = df.select(VectorExpressions.dot_long($"a", $"b")).collect()
      .map(_.getLong(0))
    val want = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => x * y }.sum
    }
    assert(got.toSeq == want)
  }

  test("dot_long survives whole-stage codegen inside an aggregation plan") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(2L, 0L, 0L), Seq(1L, 1L, 1L))).toDF("a", "b")
    val agg = df.agg(sum(VectorExpressions.dot_long($"a", $"b")))
    assert(agg.collect()(0).getLong(0) == 32L + 2L)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }

  test("dot_long registered for SQL") {
    VectorExpressions.register(spark)
    val r = spark.sql("SELECT dot_long(array(1L,2L), array(3L,4L)) AS d")
      .collect()(0).getLong(0)
    assert(r == 11L)
  }

  test("null inputs propagate null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val r = df.select(VectorExpressions.dot_long($"a", $"b")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("null element yields null result, interpreted and codegen") {
    import spark.implicits._
    val df = Seq(
      (Seq(Some(1L), None, Some(3L)), Seq(Some(4L), Some(5L), Some(6L))),
      (Seq(Some(1L), Some(2L), Some(3L)), Seq(Some(4L), Some(5L), Some(6L)))
    ).toDF("a", "b")
    val rows = df.select(VectorExpressions.dot_long($"a", $"b")).collect()
    assert(rows(0).isNullAt(0), "malformed embedding surfaces as null, not garbage")
    assert(rows(1).getLong(0) == 4L + 10L + 18L)
  }

  test("length mismatch is a hard error") {
    import spark.implicits._
    val df = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorExpressions.dot_long($"a", $"b")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null)
      && causes(e).exists(c => Option(c.getMessage).exists(_.contains("length mismatch"))))
  }

  test("type mismatch rejected at analysis") {
    import spark.implicits._
    val df = Seq((Seq("x"), Seq(1L))).toDF("a", "b")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.dot_long($"a", $"b")).collect()
    }
  }
}
