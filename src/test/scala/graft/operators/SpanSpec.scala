package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** dedup_spans (Dedup.spansFrom): exact duplicated-substring scrubbing
  * as SpanK-gram coverage. Contract pins on a hand fixture:
  * first-occurrence doc keeps its text; a later doc loses exactly the
  * tokens covered by cross-doc duplicate grams; within-doc repeats are
  * not duplicates; short docs (< SpanK tokens) pass through. */
class SpanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val K = Dedup.SpanK

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Dedup.spansFrom(spark, rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  private def md5(s: String): String =
    graft.core.Hashing.hex(java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8")))

  test("later doc loses exactly the shared span; first keeps everything") {
    val shared = (1 to K).map(i => s"w$i").mkString(" ") // exactly one gram
    val a = s"$shared tailA1 tailA2"
    val b = s"headB1 headB2 $shared tailB"
    val out = run(Seq(1L -> a, 2L -> b))
    // doc 1 is the first occurrence: untouched
    assert(out(1L) == ((K + 2L, 0L, md5(a))))
    // doc 2: the K shared tokens scrubbed, head/tail survive
    assert(out(2L) == ((K + 3L, K.toLong, md5("headB1 headB2 tailB"))))
  }

  test("within-doc repetition is not a duplicate; short docs pass through") {
    val gram = (1 to K).map(i => s"r$i").mkString(" ")
    val selfRep = s"$gram $gram" // the gram twice in ONE doc
    val short = "a b c"          // < K tokens: no grams at all
    val out = run(Seq(5L -> selfRep, 6L -> short))
    assert(out(5L) == ((2L * K, 0L, md5(selfRep))))
    assert(out(6L) == ((3L, 0L, md5(short))))
  }

  test("overlapping duplicate grams merge their coverage") {
    // doc 4 contains K+1 tokens of doc 3's text => two overlapping
    // duplicate grams covering K+1 positions, removed as one span
    val base = (1 to K + 4).map(i => s"t$i").mkString(" ")
    val sub = (1 to K + 1).map(i => s"t$i").mkString(" ")
    val d4 = s"x1 x2 $sub"
    val out = run(Seq(3L -> base, 4L -> d4))
    assert(out(3L)._2 == 0L)
    assert(out(4L) == ((K + 3L, K + 1L, md5("x1 x2"))))
  }
}
