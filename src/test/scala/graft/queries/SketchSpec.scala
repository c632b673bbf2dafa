package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Accuracy pins for BOTH sketch families: the registered deterministic
  * sketches (KMV distinct, fixed-bin quantiles — oracle-backed in
  * CORRECTNESS) and the engine-specific constant-memory alternatives
  * (HLL, t-digest — not oracle-able, pinned here only). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx_percentile (t-digest) lands within the exact interquartile neighborhood") {
    val approx = Sketches.aggApproxQuantilesTdigest(spark, sf).collect()
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

  test("fixed-bin quantiles (registered, deterministic) land within one bin of exact") {
    val approx = Sketches.aggApproxQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Sketches.aggQuantiles(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(r.fieldIndex("p90_price")))).toMap
    exact.foreach { case (k, (mq, p90)) =>
      val (amq, ap90) = approx(k)
      // quantity: 1-unit bins on integer quantities => exact discrete
      // median (within the cont-vs-disc half-step). price: the bin edge
      // differs from the INTERPOLATED exact p90 by the local gap between
      // order statistics, not the bin width — pin relative error
      assert(math.abs(amq - mq) <= 1.0, s"$k median: $amq vs $mq")
      assert(math.abs(ap90 - p90) / p90 < 0.005, s"$k p90: $ap90 vs $p90")
    }
  }

  test("approx_count_distinct (HLL) within its rsd bound of exact counts") {
    val approx = Sketches.aggApproxDistinctHll(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exactCounts.foreach { case (k, (p, o)) =>
      val (ap, ao) = approx(k)
      assert(math.abs(ap - p).toDouble / p < 0.1, s"$k parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.1, s"$k orders: $ao vs $o")
    }
  }

  test("KMV distinct (registered, deterministic) within its rsd bound of exact counts") {
    val approx = Sketches.aggApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exactCounts.foreach { case (k, (p, o)) =>
      val (ap, ao) = approx(k)
      // k=256 => rsd ~6.3%; partkeys (~200 < k) are EXACT by construction
      assert(ap == p, s"$k parts below k must be exact: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.1, s"$k orders: $ao vs $o")
    }
  }

  test("theta-sketch intersection: exact below k, within rsd on a partial overlap") {
    import spark.implicits._
    // exact branch: tiny sets (union < k) => both numbers exact
    val a1 = (0L until 100L).toDF("v")
    val b1 = (60L until 160L).toDF("v")
    val r1 = Sketches.sketchIntersectFrom(spark, a1, b1).collect()(0)
    assert(r1.getLong(0) == 160L, s"exact union: ${r1.getLong(0)}")
    assert(r1.getLong(1) == 40L, s"exact intersection: ${r1.getLong(1)}")
    // set DIFFERENCES from the same membership flags, exact below k
    assert(r1.getLong(2) == 60L, s"exact A-only: ${r1.getLong(2)}")
    assert(r1.getLong(3) == 60L, s"exact B-only: ${r1.getLong(3)}")
    // estimate branch: 20k ∪ 20k with a 10k overlap (union 30k >> k)
    val a2 = (0L until 20000L).toDF("v")
    val b2 = (10000L until 30000L).toDF("v")
    val r2 = Sketches.sketchIntersectFrom(spark, a2, b2).collect()(0)
    assert(math.abs(r2.getLong(0) - 30000L) < 3000L,
      s"union estimate off: ${r2.getLong(0)}")
    // intersection rsd compounds (Jaccard + union): allow ~25%
    assert(math.abs(r2.getLong(1) - 10000L) < 2500L,
      s"intersection estimate off: ${r2.getLong(1)}")
    // difference estimates under the same compound-rsd budget, and the
    // algebra must close: union = common + only_a + only_b within
    // integer-division slack (each term floors once)
    assert(math.abs(r2.getLong(2) - 10000L) < 2500L,
      s"A-only estimate off: ${r2.getLong(2)}")
    assert(math.abs(r2.getLong(3) - 10000L) < 2500L,
      s"B-only estimate off: ${r2.getLong(3)}")
    val parts = r2.getLong(1) + r2.getLong(2) + r2.getLong(3)
    assert(math.abs(parts - r2.getLong(0)) <= 3L,
      s"sketch set algebra does not close: $parts vs ${r2.getLong(0)}")
    // no unbounded window in the plan (same contract as the KMV pin)
    val p = Sketches.sketchIntersectFrom(spark, a2, b2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("unboundedfollowing"), s"unbounded window:\n$p")
  }

  private lazy val exactCounts: Map[String, (Long, Long)] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.Tables(spark, sf, "lineitem")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("p"), countDistinct($"l_orderkey").as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }
}
