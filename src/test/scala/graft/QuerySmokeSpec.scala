package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the library's spark-submit entry point — every test session
      // loads graft's native functions the way a user cluster would
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class QuerySmokeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("every registered query runs and (except filters that may miss) returns rows") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).count()
    }
    // join_anti (parts never ordered) is legitimately empty at sf0.001
    // where every part appears in lineitem; it has rows at sf0.01+.
    val mayBeEmpty = Set("join_anti")
    val empty = counts.filter(_._2 == 0).filterNot(c => mayBeEmpty(c._1))
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q1 pricing summary has the 6 returnflag/linestatus groups") {
    val rows = queries.Relational.q1PricingSummary(spark, sf).collect()
    assert(rows.length == 6)
    val qty = rows.map(_.getAs[Long]("sum_qty")).sum
    assert(qty > 0)
  }

  test("merge upsert: delta wins on its keys, base elsewhere") {
    val rows = queries.Relational.mergeUpsert(spark, sf).collect()
    assert(rows.nonEmpty)
    // keys divisible by 10 got +10000 cents vs base value
    val m = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ord = Tables(spark, sf, "orders")
      .selectExpr("o_orderkey", "CAST(ROUND(o_totalprice*100) AS LONG) v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ord.foreach { case (k, v) =>
      if (k % 10 == 0) assert(m(k) == v + 10000L, s"key $k")
      else assert(m(k) == v, s"key $k")
    }
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
