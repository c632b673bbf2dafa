package graft.core

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

final case class KV(k: String, v: Long)
final case class KS(k: String, s: String)

class TypedAndFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def newOps(): Ops =
    new Ops(spark, new FsStore(
      graft.core.FsUtil.tempStoreDir("graft-typed-")), 16)

  test("typed facade: round trip, upsert, lookup, range") {
    import spark.implicits._
    val ops = newOps()
    val t = new GraftTable[KV](ops, Seq("k"))
    val ref = t.fromDataset(Seq(KV("a", 1), KV("b", 2), KV("c", 3)).toDS())
    assert(t.scanOrdered(ref).collect().toSeq ==
      Seq(KV("a", 1), KV("b", 2), KV("c", 3)))
    val ref2 = t.upsert(ref, Seq(KV("b", 20), KV("d", 4)).toDS())
    assert(t.lookup(ref2, Seq("b")).contains(KV("b", 20)))
    assert(t.lookup(ref2, Seq("zz")).isEmpty)
    val ranged = t.range(ref2, Some(Bound(Seq("b"), true)), Some(Bound(Seq("c"), true)))
    assert(t.scanOrdered(ranged).collect().toSeq == Seq(KV("b", 20), KV("c", 3)))
  }

  test("pairwise fold applies left-to-right in source order (Trie.hs:396-401)") {
    import spark.implicits._
    val ops = newOps()
    val t = new GraftTable[KS](ops, Seq("k"))
    val inputs = Seq(
      t.fromDataset(Seq(KS("x", "t0"), KS("y", "only")).toDS()),
      t.fromDataset(Seq(KS("x", "t1")).toDS()),
      t.fromDataset(Seq(KS("x", "t2"), KS("z", "zz")).toDS()))
    val merged = ops.merge(inputs, FoldSpec.FoldConcat)
    val got = t.scanOrdered(merged).collect().map(r => r.k -> r.s).toMap
    // non-commutative: order must be input order, left to right
    assert(got == Map("x" -> "t0|t1|t2", "y" -> "only", "z" -> "zz"))
  }

  test("bulk-load fold follows list order regardless of slice count (tableFromRows parity)") {
    import spark.implicits._
    val ops = newOps()
    val t = new GraftTable[KS](ops, Seq("k"))
    val rows = Seq.tabulate(50)(i => KS(s"k${i % 7}", s"a$i"))
    // monotonically_increasing_id is (partition << 33 | offset): for a
    // directly-parallelized local Seq it reconstructs list order exactly,
    // for ANY slice count — the tableFromRows input-order guarantee
    // (Table.hs:125-140). (A mid-plan repartition would scramble it; the
    // contract covers source order as scanned.)
    def build(slices: Int): TableRef = t.fromDataset(
      spark.createDataset(spark.sparkContext.parallelize(rows, slices)),
      FoldSpec.FoldConcat)
    val a = build(4)
    val b = build(9)
    assert(a.hash == b.hash, "fold order must not depend on slice count")
    val got = t.scanOrdered(a).collect().map(r => r.k -> r.s).toMap
    val want = rows.groupBy(_.k).view.mapValues(_.map(_.s).mkString("|")).toMap
    assert(got == want, "left-to-right in list order")
  }
}
