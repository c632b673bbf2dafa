package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Chain-graph hardening for connected components (the round-9 verdict's
  * pathological fixture): a 10k-node PATH is the worst case for label
  * propagation — the minimum label travels one hop per round, so plain
  * propagation needs ~n rounds and would hit the 50-round cap (silently
  * under-converging). Path halving (lbl := lbl(lbl)) bounds it at
  * O(log n); this pins the bound as a NUMBER, not a code comment. */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("10k-node path converges in O(log n) rounds, exactly labeled") {
    import spark.implicits._
    val n = 10000
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("i", "j")
    val (out, rounds) = Components.connectedComponentsCounted(
      spark, edges, "i", "j", "node_id", "csize")
    // log2(10000) ≈ 13.3; halving interleaved with propagation stays
    // within 2x of it. 20 <<< the 50-round cap and <<< the 9999 rounds
    // plain propagation would need.
    assert(rounds <= 20, s"path halving degraded: $rounds rounds")
    val rows = out.collect()
    assert(rows.length == n)
    assert(rows.forall(r => r.getLong(1) == 0L), "all labels must be min id 0")
    assert(rows.forall(r => r.getLong(2) == n.toLong))
  }

  test("two chains + singleton: separate labels, exact sizes, few rounds") {
    import spark.implicits._
    // chain 0..499, chain 1000..1499, and a 2-node component (the
    // smallest a pair graph can carry — true singletons never appear
    // in an edge list)
    val e1 = (0 until 499).map(i => (i.toLong, i.toLong + 1))
    val e2 = (1000 until 1499).map(i => (i.toLong, i.toLong + 1))
    val e3 = Seq((5000L, 5001L))
    val edges = (e1 ++ e2 ++ e3).toDF("i", "j")
    val (out, rounds) = Components.connectedComponentsCounted(
      spark, edges, "i", "j", "node_id", "csize")
    assert(rounds <= 16, s"rounds: $rounds")
    val byCluster = out.collect().groupBy(_.getLong(1))
    assert(byCluster.keySet == Set(0L, 1000L, 5000L))
    assert(byCluster(0L).length == 500 && byCluster(0L).forall(_.getLong(2) == 500L))
    assert(byCluster(1000L).length == 500)
    assert(byCluster(5000L).length == 2)
  }

  test("retained storage is bounded across rounds: superseded round blocks are freed eagerly") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val n = 10000
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("i", "j")
    val (out, rounds) = Components.connectedComponentsCounted(
      spark, edges, "i", "j", "node_id", "csize")
    assert(out.count() == n.toLong)
    assert(rounds >= 10, s"need a many-round run for this pin: $rounds")
    // ~14 rounds each minting a checkpoint: without eager freeing the
    // persistent-RDD map grows by one entry per round until GC; with it,
    // only the FINAL label generation survives (edges and every
    // superseded round are unpersisted before return)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 2,
      s"round blocks leaked to the ContextCleaner: ${leaked.size} retained")
  }

  test("mid-loop failure resumes from the durable anchor; labels and sizes unchanged") {
    import spark.implicits._
    val k = "spark.graft.cc.durableEvery"
    val saved = spark.conf.getOption(k)
    spark.conf.set(k, "2") // anchor every 2 rounds
    try {
      val edges = (0 until 499).map(i => (i.toLong, i.toLong + 1))
        .toDF("i", "j")
      Components.injectRoundFailure = Some(3) // after the round-2 anchor
      val (out, _) = Components.connectedComponentsCounted(
        spark, edges, "i", "j", "node_id", "csize")
      val rows = out.collect()
      assert(Components.lastRecoveries == 1, "recovery path did not run")
      assert(rows.length == 500)
      assert(rows.forall(r => r.getLong(1) == 0L && r.getLong(2) == 500L),
        "post-recovery labels diverged")
    } finally {
      Components.injectRoundFailure = None
      saved match {
        case Some(v) => spark.conf.set(k, v)
        case None => spark.conf.unset(k)
      }
    }
  }

  test("failure before any durable anchor propagates (no silent retry-from-nothing)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("i", "j")
    Components.injectRoundFailure = Some(0)
    try {
      intercept[org.apache.spark.SparkException] {
        Components.connectedComponentsCounted(
          spark, edges, "i", "j", "node_id", "csize")
      }
    } finally Components.injectRoundFailure = None
  }
}
