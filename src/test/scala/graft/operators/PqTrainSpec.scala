package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** PQ codebook training assignment (Vectors.pqAssignment): the round-9
  * rewrite from a per-row ScalaUDF argmin to the struct-min expression
  * kernel the IVF path uses. Pins (a) exact agreement with a driver-side
  * argmin under the strict-< / lower-code tie rule, and (b) a UDF-free,
  * whole-stage-codegen plan — the property that makes training scale to
  * iterations × corpus rows. */
class PqTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // deterministic 16-dim vectors (PqM=8 → sub=2), including exact
  // duplicates of codebook entries so the tie rule is exercised
  private def vecs(n: Int): Seq[(Long, Seq[Long])] =
    (0 until n).map { i =>
      val q = (0 until 16).map(d => ((i * 7 + d * 3) % 11 - 5).toLong)
      (i.toLong + 10, q)
    }

  private def books(k: Int): Array[Array[Array[Long]]] =
    Array.tabulate(Vectors.PqM)(m =>
      Array.tabulate(k)(c =>
        Array.tabulate(2)(d => ((m + c * 5 + d * 2) % 9 - 4).toLong)))

  test("expression assignment equals the driver argmin (ties to lower code)") {
    import spark.implicits._
    val v = vecs(60).toDF("vec_id", "q")
    val bs = books(6)
    // duplicate code 3 as code 4 in every subspace: any vector nearest
    // to that centroid has a genuine tie, which must resolve DOWN
    bs.foreach(mb => mb(4) = mb(3).clone())
    val subs = Vectors.subFrame(v, 16)
    val got = Vectors.pqAssignment(subs, bs)
      .select($"vec_id", $"m", $"code").collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    val want = vecs(60).flatMap { case (id, q) =>
      (0 until Vectors.PqM).map { m =>
        val sq = q.slice(m * 2, m * 2 + 2)
        var best = 0; var bestD = Long.MaxValue
        bs(m).zipWithIndex.foreach { case (cq, c) =>
          var d = 0L
          cq.indices.foreach(i => { val t = sq(i) - cq(i); d += t * t })
          if (d < bestD) { bestD = d; best = c }
        }
        ((id, m), best)
      }
    }.toMap
    assert(got == want)
    // the tie actually happened: some vector picked code 3 while code 4
    // is byte-identical (proves the strict-< rule was exercised)
    assert(got.values.exists(_ == 3))
    assert(!got.values.exists(_ == 4))
  }

  test("assignment plan is UDF-free; the scan/norm stage codegens") {
    import spark.implicits._
    val v = vecs(40).toDF("vec_id", "q")
    val frame = Vectors.pqAssignment(Vectors.subFrame(v, 16), books(4))
    val physical = frame.queryExecution.executedPlan.toString
    // the former implementation put a ScalaUDF here — per-row boxing of
    // every subvector, iterations × corpus rows
    assert(!physical.contains("ScalaUDF"), s"UDF in training plan:\n$physical")
    assert(!physical.contains("BatchEvalPython"))
    // higher-order functions (the argmin fold) evaluate their lambdas
    // interpreted over internal rows by design — but the subvector/norm
    // projection beneath must keep its whole-stage-codegen stage (the
    // `*(n)` marker), which the UDF version also broke out of
    assert(physical.contains("*(1)"),
      s"subvector stage fell out of codegen:\n$physical")
  }
}
