package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * Spark ships no normalization function, and a Scala UDF would break the
  * whole-stage-codegen span every text key relies on (SURVEY §4 "functions,
  * not UDFs" rule), so this is the prescribed custom-Expression escape
  * hatch: `java.text.Normalizer` invoked straight from generated code —
  * no boxing, no codegen fence. NFC is the composition form (decomposed
  * e + U+0301 → é), the one DuckDB's `nfc_normalize` implements, which is
  * what makes the key oracle-comparable; Normalizer is the JDK's ICU-free
  * implementation of exactly that UAX#15 form.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalize {
  private val fnName = "graft_nfc"

  /** Registers the expression (idempotent) and returns a Column handle. */
  def nfc(spark: SparkSession)(c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => NfcNormalize(exprs(0)), "built-in")
    org.apache.spark.sql.functions.call_function(fnName, c)
  }
}
