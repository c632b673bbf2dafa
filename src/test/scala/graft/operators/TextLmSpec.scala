package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the bigram-LM fluency contract of [[Text.lmScoreFrom]]
  * (text_lm_score): min-count pruning, the OOV floor, exact integer
  * division, token-count edges, and the rank cap's deterministic
  * (count DESC, bigram ASC) cut. */
class TextLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus bigram counts: "a b" x3 (in model), "b a"/"b x"/"q r" x1
  // (below min-count -> floored to 1)
  private def docs = Seq(
    (1L, "a b a b"), // bigrams: a b, b a, a b
    (2L, "a b x"),   // bigrams: a b, b x
    (3L, "z"),       // single token: excluded from output
    (4L, "q r"))     // one all-OOV bigram
    .toDF("doc_id", "text")

  test("floor, exact division, and short-doc exclusion") {
    val out = Text.lmScoreFrom(spark, docs, 65536).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 7L, 233L),  // 3+1+3 over 3 bigrams -> 700 div 3
      (2L, 2L, 4L, 200L),  // 3+1 over 2
      (4L, 1L, 1L, 100L))) // OOV floor: never zero, never null
  }

  test("rank cap cuts deterministically: count desc, then bigram asc") {
    // two bigrams reach min-count 3: "a b" x3 and "a a" x3; cap=1 must
    // keep "a a" (equal counts -> lexicographic), flooring "a b" to 1
    val tied = Seq(
      (1L, "a b a b"), (2L, "a b"),
      (3L, "a a a a")) // bigrams: a a, a a, a a
      .toDF("doc_id", "text")
    val out = Text.lmScoreFrom(spark, tied, 1).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out(3L) == 300L) // "a a" kept in the capped model
    assert(out(1L) == 100L) // "a b" fell past the cap -> floored
  }
}
