package graft

import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point: sessions configured with
  * graft.GraftExtensions (as TestSpark is — the spark-submit shape) can
  * call the native functions from pure SQL, permanently registered. */
class GraftExtensionsSpec extends AnyFunSuite {
  test("dot_long is SQL-visible through the extensions mechanism") {
    val s = TestSpark.spark
    val v = s.sql(
      "SELECT dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(v == 32L)
    // and in a derived session (newSession shares the function registry
    // state cloned at creation — the extension travels)
    val v2 = s.newSession().sql(
      "SELECT dot_long(array(2L), array(21L)) AS d").head().getLong(0)
    assert(v2 == 42L)
  }
}
