package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native shingle/span builders (r18 optimization round, guide
  * §1.2 step 2): the 3-word shingle HOF (`transform(sequence(0, size-3),
  * i -> concat_ws(' ', words[i], words[i+1], words[i+2]))`) and the
  * 8-token md5 span HOF (`transform(sequence(1, greatest(size-7, 1)),
  * i -> md5(concat_ws(' ', slice(toks, i, 8))))`) are interpreted lambdas:
  * per shingle/span they build an index box, a sliced array copy and a
  * fresh UTF8String concat. These expressions produce identical arrays in
  * one tight JVM loop each — shared by every shingle consumer
  * (fingerprint/repetition/contamination, the MinHash/Jaccard chains, the
  * streaming near-dedup) and both span-dedup chains. Callers gate on
  * size >= 3 (shingles) exactly as before; the natives are additionally
  * total (empty array below the gate, where the HOF would ANSI-throw on a
  * negative index).
  */
object TextFeatureImpl extends Serializable {

  /** words → 3-word shingles joined by ' ' — identical to the transform
    * HOF for size >= 3; empty below (callers filter there anyway). */
  def shingles3(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 2)
    // UTF8String.concatWs over the stored slices: no intermediate String
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < n - 2) {
      out(i) = UTF8String.concatWs(sep,
        a.getUTF8String(i), a.getUTF8String(i + 1), a.getUTF8String(i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }

  private val hexDigits = "0123456789abcdef".getBytes("US-ASCII")

  /** toks → md5 hex of every 8-token stride-1 span: span i (1-based) =
    * toks[i..i+7] joined by ' ' (the tail clamps at the array end), i in
    * 1..max(size-7, 1) — identical strings hashed as the slice/concat_ws
    * HOF it replaces. */
  def spanMd5s(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val nSpans = math.max(n - 7, 1)
    val out = new Array[Any](nSpans)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(256)
    var i = 0
    while (i < nSpans) {
      sb.setLength(0)
      val end = math.min(i + 8, n)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(a.getUTF8String(j).toString)
        j += 1
      }
      md.reset()
      val dig = md.digest(sb.toString.getBytes("UTF-8"))
      val hex = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = hexDigits((dig(k) >> 4) & 0xF)
        hex(2 * k + 1) = hexDigits(dig(k) & 0xF)
        k += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class Shingles3(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    TextFeatureImpl.shingles3(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("txtImpl", TextFeatureImpl,
        TextFeatureImpl.getClass.getName)
      s"${ev.value} = $impl.shingles3($a);"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SpanMd5s(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(a: Any): Any =
    TextFeatureImpl.spanMd5s(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("txtImpl", TextFeatureImpl,
        TextFeatureImpl.getClass.getName)
      s"${ev.value} = $impl.spanMd5s($a);"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFeatureExpressions {
  def shingles3(s: SparkSession)(words: Column): Column = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles3", exprs => Shingles3(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_shingles3", words)
  }
  def spanMd5s(s: SparkSession)(toks: Column): Column = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_span_md5s", exprs => SpanMd5s(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_span_md5s", toks)
  }
}
