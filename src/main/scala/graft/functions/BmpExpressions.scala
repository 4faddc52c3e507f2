package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** REAL image decode for the multimodal family (round-11): uncompressed
  * 24-bit BMP, the one mainstream raster container whose pixels are plain
  * byte slices — so a decoder is pure byte arithmetic (no codec library,
  * none exists in this environment) and the decoded pixels are exactly
  * oracle-able. Two native expressions (the graft_nfc / HashExpressions
  * pattern — one impl object serves both the interpreted and generated
  * paths, so they cannot drift, and PlanAuditSpec stays ScalaUDF-free):
  *
  *  - [[BmpSynth]]  bytes → BMP container (the FIXTURE side: deterministic
  *    grayscale pixels derived from the payload bytes, wrapped in a real
  *    BITMAPFILEHEADER + BITMAPINFOHEADER with bottom-up rows and 4-byte
  *    row padding — everything a real .bmp from disk has);
  *  - [[BmpDecode]] BMP container → struct(width, height, pixels): a REAL
  *    parser — it reads the header fields (little-endian), honors the
  *    pixel-data offset, bottom-up vs top-down row order (height sign),
  *    and row padding; it never sees the synthesis rule, so the oracle's
  *    independent recomputation of the pixels from the generator formula
  *    certifies the full encode→container→parse round trip byte-for-byte.
  *
  * Scale shape: both are per-row O(pixels) projections inside whole-stage
  * codegen; payload bytes never shuffle (downstream keys reduce to
  * signatures/sums before any exchange).
  */
object BmpImpl extends Serializable {

  /** Fixture dims: small enough that a 100k-doc corpus decodes in one
    * scan (≤ 31×20 px), large enough for 33-sample dHash strides (≥ 8×5 =
    * 40 px). Mirrored verbatim in every mm_* oracle that consumes them. */
  def widthOf(len: Int): Int = len % 24 + 8
  def heightOf(len: Int): Int = (len * 7) % 16 + 5

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >>> 8) & 0xFF).toByte
    b(off + 2) = ((v >>> 16) & 0xFF).toByte
    b(off + 3) = ((v >>> 24) & 0xFF).toByte
  }

  private def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def getShortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Deterministic fixture encoder: gray(x, y) = src[(y·w + x) mod len],
    * written as a genuine 24bpp bottom-up BMP (B=G=R=gray). */
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
    val rowSize = ((w * 3 + 3) / 4) * 4
    val imageSize = rowSize * h
    val fileSize = 54 + imageSize
    val out = new Array[Byte](fileSize)
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, fileSize)
    putIntLE(out, 10, 54) // pixel-data offset
    putIntLE(out, 14, 40) // BITMAPINFOHEADER size
    putIntLE(out, 18, w)
    putIntLE(out, 22, h) // positive → bottom-up storage
    out(26) = 1 // planes
    out(28) = 24 // bits per pixel
    putIntLE(out, 30, 0) // BI_RGB, uncompressed
    putIntLE(out, 34, imageSize)
    var y = 0
    while (y < h) { // y = top-down logical row; stored bottom-up
      val rowOff = 54 + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val g = src((y * w + x) % len)
        val p = rowOff + x * 3
        out(p) = g; out(p + 1) = g; out(p + 2) = g // B, G, R
        x += 1
      }
      y += 1
    }
    out
  }

  val outType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  /** Real 24bpp-BMP parser → (width, height, row-major top-down grayscale
    * pixels, gray = (B+G+R)/3 — exact for the equal-channel fixture and
    * the standard integer luma fallback otherwise). Fails LOUDLY on any
    * container this parser does not support — a silently-wrong decode
    * would poison every downstream signature invisibly. */
  def decode(payload: Array[Byte]): InternalRow = {
    require(payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M',
      "BmpDecode: not a BMP (bad magic or truncated header)")
    val pixelOff = getIntLE(payload, 10)
    val w = getIntLE(payload, 18)
    val hRaw = getIntLE(payload, 22)
    val bpp = getShortLE(payload, 28)
    val compression = getIntLE(payload, 30)
    require(bpp == 24 && compression == 0,
      s"BmpDecode: unsupported BMP (bpp=$bpp, compression=$compression)")
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      s"BmpDecode: implausible dims ${w}x$h")
    val rowSize = ((w * 3 + 3) / 4) * 4
    require(payload.length >= pixelOff + rowSize * h,
      "BmpDecode: pixel data truncated")
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val rowOff = pixelOff + srcRow * rowSize
      var x = 0
      while (x < w) {
        val p = rowOff + x * 3
        px(y * w + x) = ((payload(p) & 0xFF) + (payload(p + 1) & 0xFF) +
          (payload(p + 2) & 0xFF)) / 3
        x += 1
      }
      y += 1
    }
    InternalRow(w, h, new GenericArrayData(px))
  }
}

/** Single-pass 16-bin grayscale histogram over a decoded pixel array —
  * the per-bin filter() formulation scans the array 16×; this is one
  * tight loop (the reason it is a native expression, like the decode). */
object GrayHistImpl extends Serializable {
  val Bins = 16
  def compute(px: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val out = new Array[Long](Bins)
    val n = px.numElements()
    var i = 0
    while (i < n) { out(px.getInt(i) / 16) += 1; i += 1 }
    new GenericArrayData(out)
  }
}

/** pixels array<int> (gray 0..255) → array<long> of 16 bin counts. */
case class GrayHist16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any =
    GrayHistImpl.compute(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("grayHistImpl", GrayHistImpl,
        GrayHistImpl.getClass.getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $impl.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** payload bytes → synthesized BMP container (codegen'd). */
case class BmpSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(a: Any): Any =
    BmpImpl.synth(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("bmpImpl", BmpImpl, BmpImpl.getClass.getName)
      s"${ev.value} = $impl.synth($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BMP container → struct(width, height, pixels) (codegen'd). */
case class BmpDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BmpImpl.outType

  override protected def nullSafeEval(a: Any): Any =
    BmpImpl.decode(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("bmpImpl", BmpImpl, BmpImpl.getClass.getName)
      s"${ev.value} = $impl.decode($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BmpExpressions {
  def bmpSynth(spark: SparkSession)(payload: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bmp_synth", exprs => BmpSynth(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_bmp_synth", payload)
  }

  def bmpDecode(spark: SparkSession)(container: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bmp_decode", exprs => BmpDecode(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_bmp_decode", container)
  }

  def grayHist16(spark: SparkSession)(pixels: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gray_hist16", exprs => GrayHist16(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_gray_hist16", pixels)
  }
}
