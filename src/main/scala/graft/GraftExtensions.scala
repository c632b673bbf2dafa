package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.DotProductLong

/** Spark-idiomatic library entry point: register graft's native
  * expressions through the extensions mechanism, so any session —
  * including spark-submit / Thrift / connect sessions the library
  * never constructs — picks them up with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Injection here makes the functions PERMANENT in the session's
  * registry (catalog-visible, usable from pure SQL), vs the per-session
  * temp registration `VectorExpressions.register` offers for
  * programmatic use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotProductLong].getCanonicalName, "dot_long"),
      exprs => DotProductLong(exprs(0), exprs(1))))
    ()
  }
}
