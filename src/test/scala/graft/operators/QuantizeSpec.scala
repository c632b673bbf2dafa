package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** sim_quantize_int8 (Vectors.quantizeInt8From): int8 scalar
  * quantization contract on a hand fixture — code range [0, 255],
  * extremes map to the ends, a CONSTANT dimension (span 0 → guard 1)
  * codes to 0 with zero error, and the error bound per dimension is the
  * quantization step (span/255, floored arithmetic). */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("extremes, constant dimension, error bound") {
    import spark.implicits._
    // dim 0: values 0..1000 (span 1000); dim 1: constant 7; dim 2:
    // negative range -500..+500
    val rows = Seq(
      (1L, Seq(0L, 7L, -500L)),
      (2L, Seq(250L, 7L, -100L)),
      (3L, Seq(1000L, 7L, 500L)))
    val out = Vectors.quantizeInt8From(spark, rows.toDF("vec_id", "q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact error replay: c = floor((x-lo)*255/span), r = lo + floor(c*span/255)
    def err(x: Long, lo: Long, hi: Long): Long = {
      val span = math.max(hi - lo, 1L)
      val c = (x - lo) * 255 / span
      math.abs(x - (lo + c * span / 255))
    }
    val want = rows.map { case (id, q) =>
      id -> (err(q(0), 0, 1000) + err(q(1), 7, 7) + err(q(2), -500, 500))
    }.toMap
    assert(out == want)
    // the constant dimension contributes nothing, and every per-dim
    // error is under one quantization step
    assert(err(7, 7, 7) == 0L)
    rows.foreach { case (_, q) =>
      assert(err(q(0), 0, 1000) <= 1000 / 255 + 1)
      assert(err(q(2), -500, 500) <= 1000 / 255 + 1)
    }
  }

  test("codes: extremes hit 0 and 255; md5 matches a driver replay") {
    import spark.implicits._
    val rows = Seq((1L, Seq(0L, -3L)), (2L, Seq(100L, 9L)))
    val out = Vectors.quantizeInt8From(spark, rows.toDF("vec_id", "q"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    def codes(q: Seq[Long], lo: Seq[Long], hi: Seq[Long]): String =
      q.indices.map { i =>
        val span = math.max(hi(i) - lo(i), 1L)
        (q(i) - lo(i)) * 255 / span
      }.mkString(",")
    def md5(s: String): String = graft.core.Hashing.hex(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")))
    val lo = Seq(0L, -3L); val hi = Seq(100L, 9L)
    assert(out(1L) == md5(codes(Seq(0L, -3L), lo, hi)))
    assert(out(2L) == md5(codes(Seq(100L, 9L), lo, hi)))
    assert(codes(Seq(0L, -3L), lo, hi) == "0,0")
    assert(codes(Seq(100L, 9L), lo, hi) == "255,255")
  }
}
