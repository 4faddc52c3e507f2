package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native dot product over two float32 vectors, accumulated in double.
  *
  * SURVEY.md §4 watchlist item: the brute-force cosine k-NN pair loop is the
  * one hot path where a Scala UDF measurably hurts (boxing + array
  * conversion per pair). This expression participates in whole-stage
  * codegen: the generated loop reads the UnsafeArrayData floats in place —
  * no allocation per row. Math is a sequential left fold, bit-identical to
  * the UDF it replaces and to DuckDB's list_inner_product over DOUBLE[].
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs are produced by graft code and are always array<float>; no
  // user-facing type coercion surface needed.
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  private val fnName = "graft_dot_f"

  /** Registers the expression in the session's function registry (idempotent)
    * and returns a Column-level handle. */
  def dotF(spark: SparkSession)(a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => DotProductF(exprs(0), exprs(1)), "built-in")
    org.apache.spark.sql.functions.call_function(fnName, a, b)
  }
}
