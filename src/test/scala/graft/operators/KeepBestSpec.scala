package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the cluster-representative selection contract of
  * [[Dedup.keepBestFrom]] (dedup_keep_best): exactly one kept doc per
  * cluster (longest; ties to the SMALLEST doc_id — the struct-max must
  * not inherit max_by's tie nondeterminism), singletons pass through as
  * their own cluster, and the keep-list partitions the corpus. */
class KeepBestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one 3-doc cluster with an n_chars TIE between docs 10 and 20 (20 is
  // longest-equal but higher id → 10 wins), one 2-doc cluster, two
  // singletons (40 in no pair; 50 in no pair)
  private def clusters = Seq(
    (10L, 10L, 3L), (20L, 10L, 3L), (30L, 10L, 3L),
    (41L, 41L, 2L), (42L, 41L, 2L))
    .toDF("doc_id", "cluster_id", "n_docs")
  private def docs = Seq(
    (10L, 200L), (20L, 200L), (30L, 150L),
    (41L, 90L), (42L, 120L),
    (40L, 77L), (50L, 88L))
    .toDF("doc_id", "n_chars")

  test("one representative per cluster; longest wins, ties to min id") {
    val out = Dedup.keepBestFrom(spark, clusters, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (10L, 10L, 3L, 200L),   // tie at 200 chars → min doc_id 10
      (40L, 40L, 1L, 77L),    // singleton passes through
      (42L, 41L, 2L, 120L),   // longest of the 2-doc cluster
      (50L, 50L, 1L, 88L)))
  }

  test("keep-list covers every cluster and singleton exactly once") {
    val out = Dedup.keepBestFrom(spark, clusters, docs)
    assert(out.select("cluster_id").distinct().count() == out.count())
    val expectedClusters = clusters.select($"cluster_id").distinct().count() +
      docs.join(clusters.select($"doc_id"), Seq("doc_id"), "left_anti").count()
    assert(out.count() == expectedClusters)
  }

  test("kept representative is always a member of its cluster") {
    val out = Dedup.keepBestFrom(spark, clusters, docs)
      .where($"n_docs" > 1).select($"keep_id", $"cluster_id")
    val membership = clusters
      .select($"doc_id".as("keep_id"), $"cluster_id")
    assert(out.join(membership, Seq("keep_id", "cluster_id"), "left_anti")
      .count() == 0)
  }
}
