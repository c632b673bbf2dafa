package graft.core

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sql.GraftSql

/** The driver-route governor (VERDICT r9 #2): the single-threaded
  * zero-job/fused driver routes must degrade GRACEFULLY when the
  * measured driver throughput says they would blow the latency budget —
  * route choice flips to the distributed path, results stay
  * hash-identical. The forced-slow seam stands in for a starved driver
  * (the round-9 driver-harness divergence this guards against). */
class DriverRouteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A DML flow that exercises every governor-gated route: range UPDATE
    * (per-chunk transform / delta patch), range DELETE (splice), point
    * DML (driver patch), INSERT…SELECT (delta patch). */
  private def runFlow(): String = {
    val store = new FsStore(
      graft.core.FsUtil.tempStoreDir("graft-route-gov-"))
    val ops = new Ops(spark, store, 64)
    val cat = new Catalog(store)
    def run(sql: String) = GraftSql.execute(spark, ops, cat, sql)
    run("CREATE TABLE t (k bigint PRIMARY KEY, g bigint NOT NULL, v bigint)")
    run("INSERT INTO t SELECT id AS k, id % 7 AS g, id * 3 AS v FROM range(0, 4000)")
    run("UPDATE t SET v = v + 1 WHERE k >= 500 AND k < 2500")
    run("DELETE FROM t WHERE k >= 1000 AND k < 1400")
    run("UPDATE t SET v = v * 2 WHERE k IN (3, 77, 3999)")
    run("INSERT INTO t SELECT k + 10000, g, v FROM t WHERE k % 16 = 0")
    run("DELETE FROM t WHERE g = 5 AND v % 3 = 0")
    cat.root("t").tableHash
  }

  test("a measured-slow driver flips to the distributed path, hashes unchanged") {
    Ops.resetDriverRouteModel() // suite-order independence
    val fast = runFlow() // cold/normal governor: driver routes admitted
    val denials0 = Ops.driverRouteDenials.get()
    // 10 ms/row: any patch beyond ~150 rows projects over the 1.5 s
    // budget — every bulk driver route must fall back
    Ops.driverRouteNprOverride = Some(10L * 1000L * 1000L)
    val slow =
      try runFlow()
      finally Ops.driverRouteNprOverride = None
    assert(slow == fast,
      "governor-denied driver routes changed the result hash")
    assert(Ops.driverRouteDenials.get() > denials0,
      "the forced-slow governor never denied a driver route")
  }

  test("readRangeDriver row set equals the rangeFilter scan on composite keys and prefix bounds") {
    import spark.implicits._
    val store = new FsStore(
      graft.core.FsUtil.tempStoreDir("graft-range-drv-"))
    val ops = new Ops(spark, store, 64)
    // composite (a, b) key; values span several chunks at target 64
    val df = (0L until 500L).map(i => (i % 20, i / 20, i * 3))
      .toDF("a", "b", "v")
    val ref = ops.fromDataFrame(df, Seq("a", "b"))
    val cases: Seq[(Option[Bound], Option[Bound])] = Seq(
      (None, None),
      (Some(Bound(Seq(5L), inclusive = true)), None),
      (None, Some(Bound(Seq(12L), inclusive = false))),
      (Some(Bound(Seq(3L), inclusive = false)),
        Some(Bound(Seq(9L), inclusive = true))),
      // full tuple bounds, mixed inclusivity
      (Some(Bound(Seq(4L, 10L), inclusive = true)),
        Some(Bound(Seq(4L, 20L), inclusive = false))),
      // prefix lower + tuple upper
      (Some(Bound(Seq(7L), inclusive = true)),
        Some(Bound(Seq(8L, 3L), inclusive = true))),
      // empty range
      (Some(Bound(Seq(19L, 99L), inclusive = false)), None))
    cases.foreach { case (lo, hi) =>
      val scan = ops.scan(ops.rangeFilter(ref, lo, hi))
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val drv = ops.readRangeDriver(ref, lo, hi)
        .getOrElse(fail(s"driver range read declined for ($lo, $hi)"))
        .map(_.toSeq).sortBy(_.toString)
      assert(drv == scan, s"row sets differ for bounds ($lo, $hi)")
    }
  }

  test("one cold fixed-cost-dominated sample does not pin the governor slow") {
    Ops.driverRouteNprOverride = None
    Ops.resetDriverRouteModel()
    try {
      // the JVM-cold shape: a 4k-row driver read that paid codec init +
      // class loading — 220 ms reads as 55 µs/row, which would project
      // every metadata-sized route over the 1.5 s budget
      Ops.recordDriverRoute(4000L, 220L * 1000L * 1000L)
      // warm-up window: routes keep flowing (and keep training) instead
      // of being denied on one data point
      assert(Ops.driverRouteAdmit(40000L),
        "warm-up admission denied on a single cold sample")
      // three warm large samples wash the poison out of the ratio; the
      // model is then consulted (past the warm-up window) and must admit
      (1 to 3).foreach(_ =>
        Ops.recordDriverRoute(70000L, 40L * 1000L * 1000L))
      assert(Ops.driverRouteNprNanos < 5000L,
        s"ratio-of-EWMAs still poisoned: ${Ops.driverRouteNprNanos} ns/row")
      assert(Ops.driverRouteAdmit(100000L),
        "post-warm-up admission still denied after recovery")
      // a genuinely slow SUSTAINED regime still locks the governor in
      (1 to 8).foreach(_ =>
        Ops.recordDriverRoute(100000L, 3000L * 1000L * 1000L))
      assert(!Ops.driverRouteAdmit(100000L),
        "sustained measured slowness must deny past the warm-up window")
    } finally { Ops.driverRouteNprOverride = None; Ops.resetDriverRouteModel() }
  }

  test("byte-admitted collect: interpreted and codegen modes hash-identically") {
    // the width-scaled interpreted-vs-codegen crossover (round 14) picks
    // a PLAN EXECUTION MODE, never a result: the same bulk flow
    // materialized entirely interpreted (threshold = MaxValue) and
    // entirely codegen (threshold = 0) must produce the same table hash
    val saved = Canonical.InterpretedCollectMaxBytes
    try {
      Canonical.InterpretedCollectMaxBytes = Long.MaxValue
      val interp = runFlow()
      Canonical.InterpretedCollectMaxBytes = 0L
      val codegen = runFlow()
      assert(interp === codegen,
        "interpreted vs codegen byte-admitted collects diverged")
    } finally Canonical.InterpretedCollectMaxBytes = saved
  }

  test("admission math: cold model admits; measured cost gates by projected time") {
    Ops.driverRouteNprOverride = None
    Ops.resetDriverRouteModel()
    try {
      // cold: no measurement => admit anything under the static caps
      assert(Ops.driverRouteAdmit(Ops.DriverPatchHardRowCap))
      // fast measured cost: 1 µs/row => 100k rows project 0.1 s, admit
      Ops.driverRouteNprOverride = Some(1000L)
      assert(Ops.driverRouteAdmit(100000L))
      // slow measured cost: 1 ms/row => 100k rows project 100 s, deny;
      // a genuinely tiny patch stays admitted (point DML keeps its
      // zero-job latency even on a loaded machine)
      Ops.driverRouteNprOverride = Some(1000L * 1000L)
      assert(!Ops.driverRouteAdmit(100000L))
      assert(Ops.driverRouteAdmit(64L))
    } finally Ops.driverRouteNprOverride = None
  }
}
