package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx_percentile lands within the exact interquartile neighborhood") {
    val approx = Sketches.aggApproxQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Sketches.aggQuantiles(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(r.fieldIndex("p90_price")))).toMap
    exact.foreach { case (k, (mq, p90)) =>
      val (amq, ap90) = approx(k)
      // accuracy=1000 => rank error <= 1/1000; generous value-space bound
      assert(math.abs(amq - mq) / math.max(mq, 1.0) < 0.05, s"$k median: $amq vs $mq")
      assert(math.abs(ap90 - p90) / p90 < 0.05, s"$k p90: $ap90 vs $p90")
    }
  }

  test("approx_count_distinct within its 2% rsd bound of exact counts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val approx = Sketches.aggApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = graft.Tables(spark, sf, "lineitem")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("p"), countDistinct($"l_orderkey").as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (p, o)) =>
      val (ap, ao) = approx(k)
      assert(math.abs(ap - p).toDouble / p < 0.1, s"$k parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.1, s"$k orders: $ao vs $o")
    }
  }
}
