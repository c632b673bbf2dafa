package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the hot kernel of vector similarity:
  * the integer dot product of two ArrayType(LongType) columns.
  *
  * Why an Expression and not a UDF: `doGenCode` keeps the loop inside
  * whole-stage codegen — operand arrays stay as Catalyst `ArrayData`
  * (primitive access, no per-row boxing/conversion to Scala Seq), and
  * the expression behaves like a built-in (null-intolerant, foldable
  * inputs fold). The scalar-UDF alternative materializes both 64-element
  * arrays into boxed Seqs per row.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_long requires array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = LongType

  private def elemsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  })

  // a null ELEMENT makes the result null (malformed embedding is surfaced,
  // not silently read as garbage); a length mismatch is a hard error
  override def nullable: Boolean = super.nullable || elemsNullable

  private def lengthError(nx: Int, ny: Int): Nothing =
    throw new IllegalArgumentException(
      s"dot_long: array length mismatch ($nx vs $ny)")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) lengthError(n, y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // the element null check is emitted only when the static element
      // type admits nulls, keeping the common non-null loop branch-free
      val nullCheck = if (elemsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_long: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProductLong = copy(newLeft, newRight)
}

object VectorExpressions {
  /** Column API for the native dot product. */
  def dot_long(a: Column, b: Column): Column =
    GraftBridge.column(DotProductLong(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** SQL registration: SELECT dot_long(a, b). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_long", exprs => DotProductLong(exprs(0), exprs(1)), "built-in")
    ()
  }
}
