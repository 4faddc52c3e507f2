package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
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

/** [[DotProductF]] generalized over the element type (r18, trained
  * codebooks): the TRAINED centroid arrays are `array<double>` (exact-long
  * quantized sums cast to double — bit-identical cross-engine) while the
  * corpus embeddings stay `array<float>`, so the hot scoring loop needs a
  * dot whose per-side accessor follows each child's element type. Same
  * sequential left fold (each float widened exactly before the multiply),
  * so a float side is arithmetically identical to DotProductF and a double
  * side to DuckDB's list_inner_product over DOUBLE[]. Codegen reads both
  * UnsafeArrayData sides in place — no per-row allocation, no cast node
  * materializing a widened copy of the corpus column. */
case class DotProductAny(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def read(arr: String, fl: Boolean) =
        if (fl) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${read(a, isFloat(left))} * ${read(b, isFloat(right))};
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
  private val fnNameAny = "graft_dot_a"

  /** Registers the expression in the session's function registry (idempotent)
    * and returns a Column-level handle. */
  def dotF(spark: SparkSession)(a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => DotProductF(exprs(0), exprs(1)), "built-in")
    org.apache.spark.sql.functions.call_function(fnName, a, b)
  }

  /** [[DotProductAny]] handle — the mixed float/double dot the trained
    * codebook machinery scores with. */
  def dotA(spark: SparkSession)(a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnNameAny, exprs => DotProductAny(exprs(0), exprs(1)), "built-in")
    org.apache.spark.sql.functions.call_function(fnNameAny, a, b)
  }
}
