package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** JPEG METADATA parse for the multimodal family (round-12): the header
  * side of the one mainstream format still missing from the real-decode
  * ladder (BMP uncompressed, PNG deflate, WAV PCM). Full JPEG pixel
  * decode needs Huffman/DCT machinery out of scope for a fixture corpus,
  * so the SCAN DATA IS STUBBED (empty — the container carries no entropy
  * segment and says so loudly); what IS real, and what a 100-TB lake
  * scanner actually runs per blob, is the MARKER-SEGMENT WALK: SOI, then
  * variable-length segments each tagged 0xFF-marker + big-endian length
  * (length INCLUDES its own two bytes — the classic off-by-two), skipped
  * until SOF0 yields precision/height/width/components. The synthesized
  * container varies its COM segment length per document, so the SOF0
  * offset MOVES row to row — a fixed-offset cheat cannot pass the oracle.
  *
  *  - [[JpegSynth]] bytes → SOI + APP0(JFIF) + COM(variable) + DQT stub +
  *    SOF0 + EOI;
  *  - [[JpegMeta]]  container → struct(width, height, n_segments): the
  *    real walk. Fails LOUDLY on a bad SOI, a non-marker byte where a
  *    marker belongs, a truncated segment, or a missing SOF0.
  */
object JpegImpl extends Serializable {

  /** Fixture dims — distinct formulas again (a parser reading the wrong
    * field or endianness cannot pass by coincidence). Mirrored verbatim
    * in the mm_jpeg_meta oracle. */
  def widthOf(len: Int): Int = len % 18 + 11
  def heightOf(len: Int): Int = (len * 3) % 14 + 7
  def comLenOf(len: Int): Int = len % 23 // 0..22 payload bytes

  def synth(src0: Array[Byte]): Array[Byte] = {
    // Total on empty input (r13): an empty payload synthesizes the same
    // container as a single zero byte -- a real container its own decoder
    // accepts -- instead of throwing mid-scan. Graded mm keys filter empty
    // docs out before synthesis (empty text carries no media; the docs_ne
    // guard), so the sentinel never reaches an oracle; it exists so raw
    // expression use stays total under any regenerated corpus.
    val src = if (src0.length == 0) Array[Byte](0) else src0
    val len = src.length
    val w = widthOf(len)
    val h = heightOf(len)
    val comN = comLenOf(len)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, data: Array[Byte]): Unit = {
      marker(m)
      val l = data.length + 2 // length includes the length field itself
      out.write((l >> 8) & 0xFF); out.write(l & 0xFF)
      out.write(data)
    }
    marker(0xD8) // SOI
    seg(0xE0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 2, 0, 0, 0, 1, 0, 1, 0, 0)) // APP0, v1.2
    // COM with per-document length — shifts every later segment's offset
    seg(0xFE, Array.tabulate(comN)(i => src(i % len)))
    // DQT stub: one 8x8 table of ones (quantization is real JPEG furniture
    // even though no entropy data follows)
    seg(0xDB, Array.tabulate(65)(i => if (i == 0) 0.toByte else 1.toByte))
    seg(0xC0, Array[Byte](8, // SOF0: precision
      ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
      ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
      1, 1, 0x11, 0)) // one grayscale component
    marker(0xD9) // EOI; NO SOS/entropy segment — scan data declared absent
    out.toByteArray
  }

  val outType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_segments", IntegerType, nullable = false)))

  def meta(payload: Array[Byte]): InternalRow = {
    require(payload.length >= 4 &&
      (payload(0) & 0xFF) == 0xFF && (payload(1) & 0xFF) == 0xD8,
      "JpegMeta: not a JPEG (bad SOI)")
    var pos = 2
    var w = -1; var h = -1
    var segs = 0
    var done = false
    while (!done) {
      require(pos + 2 <= payload.length, "JpegMeta: truncated marker")
      require((payload(pos) & 0xFF) == 0xFF,
        f"JpegMeta: expected marker at $pos, got 0x${payload(pos) & 0xFF}%02X")
      val m = payload(pos + 1) & 0xFF
      if (m == 0xD9) done = true // EOI
      else {
        require(pos + 4 <= payload.length, "JpegMeta: truncated segment length")
        val l = ((payload(pos + 2) & 0xFF) << 8) | (payload(pos + 3) & 0xFF)
        require(l >= 2 && pos + 2 + l <= payload.length,
          s"JpegMeta: truncated segment 0x${m.toHexString} (len=$l)")
        segs += 1
        if (m == 0xC0) { // SOF0: precision(1) h(2) w(2) ...
          h = ((payload(pos + 5) & 0xFF) << 8) | (payload(pos + 6) & 0xFF)
          w = ((payload(pos + 7) & 0xFF) << 8) | (payload(pos + 8) & 0xFF)
        }
        pos += 2 + l
      }
    }
    require(w > 0 && h > 0, "JpegMeta: no SOF0 frame header found")
    InternalRow(w, h, segs)
  }
}

/** payload bytes → synthesized metadata-only JPEG container (codegen'd). */
case class JpegSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(a: Any): Any =
    JpegImpl.synth(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("jpegImpl", JpegImpl, JpegImpl.getClass.getName)
      s"${ev.value} = $impl.synth($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JPEG container → struct(width, height, n_segments) (codegen'd). */
case class JpegMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = JpegImpl.outType

  override protected def nullSafeEval(a: Any): Any =
    JpegImpl.meta(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("jpegImpl", JpegImpl, JpegImpl.getClass.getName)
      s"${ev.value} = $impl.meta($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegExpressions {
  def jpegSynth(spark: SparkSession)(payload: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jpeg_synth", exprs => JpegSynth(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_jpeg_synth", payload)
  }

  def jpegMeta(spark: SparkSession)(container: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jpeg_meta", exprs => JpegMeta(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_jpeg_meta", container)
  }
}
