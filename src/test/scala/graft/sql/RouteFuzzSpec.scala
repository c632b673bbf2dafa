package graft.sql

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.core._

/** Seeded-random DML programs replayed under every internal route
  * configuration — the generative extension of the fixed route-matrix
  * capstone in SqlAndSourcesSpec. Round 9 added three new route forks
  * (INSERT…SELECT / range-UPDATE delta patches, the zero-job local
  * per-chunk transform), and a route divergence shows up as a hash or
  * row mismatch here long before a driver query would catch it. The
  * generator is DETERMINISTIC (fixed seed), so a failure reproduces. */
class RouteFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def newOps(): (Ops, Catalog) = {
    val store = new FsStore(graft.core.FsUtil.tempStoreDir("graft-fuzz-"))
    (new Ops(spark, store, 64), new Catalog(store))
  }

  /** ~40 statements over t(k PK, g NOT NULL, v nullable): point and
    * range and non-key DML, self-referencing inserts with collisions,
    * IN-lists, NULL values through every route — now interleaved with
    * MATERIALIZED VIEW refreshes over an invertible aggregate, so the
    * inter-refresh delta shape (append-only / mixed / delete-heavy)
    * randomly drives the fold-in, RETRACTION, mini, and rebuild
    * refresh routes (round 12). */
  private def program(seed: Long): Seq[String] = {
    val rng = new scala.util.Random(seed)
    def k() = rng.nextInt(3000)
    val out = Seq.newBuilder[String]
    out += "INSERT INTO t SELECT id AS k, id % 11 AS g, CASE WHEN id % 7 = 0 THEN NULL ELSE id * 2 END AS v FROM range(0, 1200)"
    // SUM(k): key-column contribution (non-null by keyCols — admits
    // retraction); COUNT(*): the liveness column; COUNT(v): a
    // CASE-lowered invertible member over the NULLABLE column
    out += "CREATE MATERIALIZED VIEW mv AS SELECT g, SUM(k) AS sk, COUNT(*) AS n, COUNT(v) AS nv FROM t GROUP BY g"
    // a FILTERED sibling: the retraction's contribution projection must
    // apply the rowFilter before diffing (a deleted row the filter
    // drops retracts nothing)
    out += "CREATE MATERIALIZED VIEW mvw AS SELECT g, SUM(k) AS sk, COUNT(*) AS n FROM t WHERE v IS NOT NULL AND k % 3 != 1 GROUP BY g"
    (1 to 36).foreach { _ =>
      out += (rng.nextInt(10) match {
        case 0 =>
          val rows = (0 to rng.nextInt(2)).map(_ =>
            s"(${k()}, ${rng.nextInt(11)}, ${rng.nextInt(100)})")
          s"INSERT INTO t VALUES ${rows.mkString(", ")}"
        case 1 =>
          val (m, r, off) = (2 + rng.nextInt(30), rng.nextInt(2), 3000 + rng.nextInt(5000))
          s"INSERT INTO t SELECT k + $off, g, v FROM t WHERE k % $m = $r"
        case 2 =>
          val a = k(); val b = a + 1 + rng.nextInt(400)
          s"UPDATE t SET v = coalesce(v, 0) + ${rng.nextInt(9)} WHERE k >= $a AND k < $b"
        case 3 =>
          s"UPDATE t SET v = ${rng.nextInt(50)} WHERE k = ${k()}"
        case 4 =>
          val ks = (0 to rng.nextInt(4)).map(_ => k()).distinct
          s"UPDATE t SET v = v * 2 WHERE k IN (${ks.mkString(", ")})"
        case 5 =>
          s"UPDATE t SET v = coalesce(v, -1) WHERE g = ${rng.nextInt(11)} AND v IS NULL"
        case 6 =>
          val a = k(); val b = a + 1 + rng.nextInt(200)
          s"DELETE FROM t WHERE k >= $a AND k < $b"
        case 7 =>
          if (rng.nextBoolean()) s"DELETE FROM t WHERE k = ${k()}"
          else s"DELETE FROM t WHERE g = ${rng.nextInt(11)} AND v % 5 = ${rng.nextInt(5)}"
        case _ =>
          "REFRESH ALL"
      })
    }
    out += "REFRESH ALL"
    out.result()
  }

  private def runProgram(stmts: Seq[String])
      : (String, Seq[(Long, Long, Any)], String) = {
    val (ops, cat) = newOps()
    GraftSql.execute(spark, ops, cat,
      "CREATE TABLE t (k bigint PRIMARY KEY, g bigint NOT NULL, v bigint)")
    stmts.foreach(GraftSql.execute(spark, ops, cat, _))
    val rows = ops.scan(TableRef(cat.root("t").tableHash)).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
      .sortBy(_._1).toSeq
    (cat.root("t").tableHash, rows,
      cat.root("mv").tableHash + ":" + cat.root("mvw").tableHash)
  }

  test("seeded DML programs hash-converge across every route config") {
    Seq(11L, 23L).foreach { seed =>
      val stmts = program(seed)
      // (pointDmlViaPatch, driverPatchEnabled, driverMaterializeEnabled,
      //  governor-forced-slow, byte-budget-1): the governor config keeps
      // every route flag ON but forces the measured-throughput governor
      // to deny bulk driver routes — the degraded-driver mix of paths
      // (round-10 governor) must hash-converge like any other config;
      // the byte-budget-1 config declines every byte-admitted driver
      // diff so refreshes exercise the DISTRIBUTED fold-in and the
      // DISTRIBUTED retraction (round-13 mergeRetract) across the whole
      // seeded program
      val configs = Seq(
        (true, true, true, false, false), (true, false, true, false, false),
        (false, true, true, false, false), (true, true, false, false, false),
        (true, true, true, true, false), (true, true, true, false, true))
      val results = configs.map {
        case (viaPatch, driverPatch, driverMat, slow, bytes1) =>
        GraftSql.pointDmlViaPatch = viaPatch
        Ops.driverPatchEnabled = driverPatch
        Canonical.driverMaterializeEnabled = driverMat
        Ops.driverRouteNprOverride =
          if (slow) Some(10L * 1000L * 1000L) else None
        val savedBytes = Ops.DriverPatchMaxBytes
        if (bytes1) Ops.DriverPatchMaxBytes = 1L
        val dist0 = Ops.rekeyRetractDistFoldIns.get()
        val scaled0 = Ops.rekeyRetractScaledNets.get()
        try {
          val r = runProgram(stmts)
          if (bytes1) {
            assert(Ops.rekeyRetractDistFoldIns.get() > dist0,
              s"seed $seed: byte-budget-1 config never took the " +
                "distributed retraction")
            // reconcile (VERDICT r13 #5): the fuzz views fold SUM/COUNT/
            // HIST — all LINEAR — so every distributed retraction here
            // must fold its net SCALED, never via row expansion
            assert(Ops.rekeyRetractScaledNets.get() - scaled0 ==
              Ops.rekeyRetractDistFoldIns.get() - dist0,
              s"seed $seed: a linear-fold retraction fell off the " +
                "scaled-net path")
          }
          r
        }
        finally {
          GraftSql.pointDmlViaPatch = true
          Ops.driverPatchEnabled = true
          Canonical.driverMaterializeEnabled = true
          Ops.driverRouteNprOverride = None
          Ops.DriverPatchMaxBytes = savedBytes
        }
      }
      assert(results.map(_._2).distinct.length == 1,
        s"seed $seed: routes disagree on rows")
      assert(results.map(_._1).distinct.length == 1,
        s"seed $seed: routes disagree on hash: ${results.map(_._1.take(12))}")
      assert(results.map(_._3).distinct.length == 1,
        s"seed $seed: refresh routes disagree on the VIEW hash: ${
          results.map(_._3.take(12))}")
      // and the canonical rebuild of the final rows
      val (ops2, cat2) = newOps()
      import spark.implicits._
      results.head._2.map { case (a, b, c) =>
        (a, b, Option(c).map(_.asInstanceOf[Long])) }
        .toDF("k", "g", "v").createOrReplaceTempView("fuzz_final")
      GraftSql.execute(spark, ops2, cat2,
        "CREATE TABLE t PRIMARY KEY (k) AS SELECT * FROM fuzz_final")
      assert(cat2.root("t").tableHash == results.head._1,
        s"seed $seed: final state is not canonical")
      // the refreshed view must equal the from-scratch aggregate of the
      // final table — every fold-in/retraction along the way was exact
      GraftSql.execute(spark, ops2, cat2,
        "CREATE MATERIALIZED VIEW mv AS SELECT g, SUM(k) AS sk, " +
          "COUNT(*) AS n, COUNT(v) AS nv FROM t GROUP BY g")
      GraftSql.execute(spark, ops2, cat2,
        "CREATE MATERIALIZED VIEW mvw AS SELECT g, SUM(k) AS sk, " +
          "COUNT(*) AS n FROM t WHERE v IS NOT NULL AND k % 3 != 1 GROUP BY g")
      assert(cat2.root("mv").tableHash + ":" + cat2.root("mvw").tableHash
          == results.head._3,
        s"seed $seed: incrementally-refreshed views are not canonical")
    }
  }
}
