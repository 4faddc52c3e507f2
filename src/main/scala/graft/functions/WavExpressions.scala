package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** REAL audio decode for the multimodal family (round-12): RIFF/WAVE,
  * 16-bit mono PCM — the audio sibling of the BMP/PNG image path, so all
  * three mainstream modality containers round-trip through genuine
  * parsers. Same native-expression discipline (one impl object serves
  * interpreted + generated paths; PlanAuditSpec stays UDF-free):
  *
  *  - [[WavSynth]]  bytes → WAV container (fixture side: deterministic
  *    16-bit samples derived from the payload bytes, a sample rate
  *    derived from the length, wrapped in a genuine RIFF header with a
  *    real `fmt ` chunk, an ancillary LIST chunk the parser must SKIP,
  *    and a word-aligned `data` chunk — everything a real .wav has);
  *  - [[WavDecode]] WAV container → struct(sample_rate, n_samples,
  *    samples): a REAL parser — RIFF/WAVE magic, chunk walk with the
  *    spec's odd-size pad-byte alignment, `fmt ` validation (PCM, mono,
  *    16-bit), unknown chunks skipped, little-endian int16 samples. It
  *    never sees the synthesis rule; the oracles recompute expected
  *    samples from the generator formula, so a hash match certifies the
  *    full encode→container→parse round trip. Fails LOUDLY on anything
  *    unsupported.
  *
  * Scale shape: per-row O(samples) projections inside whole-stage
  * codegen; container bytes never shuffle (downstream keys reduce to
  * digests before any exchange).
  */
object WavImpl extends Serializable {

  /** Fixture params, mirrored verbatim in the mm_wav_* oracles. */
  def sampleRateOf(len: Int): Int = 8000 + (len % 3) * 4000
  def nSamplesOf(len: Int): Int = len * 2
  /** sample k = (byte[k mod len] − 96)·256 + (k mod 13): spans negative
    * and positive int16 territory on ASCII input, exercises both LE
    * bytes, stays exactly representable. */
  def sampleOf(src: Array[Byte], k: Int): Int =
    ((src(k % src.length) & 0xFF) - 96) * 256 + k % 13

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

  def synth(src0: Array[Byte]): Array[Byte] = {
    // Total on empty input (r13): an empty payload synthesizes the same
    // container as a single zero byte -- a real container its own decoder
    // accepts -- instead of throwing mid-scan. Graded mm keys filter empty
    // docs out before synthesis (empty text carries no media; the docs_ne
    // guard), so the sentinel never reaches an oracle; it exists so raw
    // expression use stays total under any regenerated corpus.
    val src = if (src0.length == 0) Array[Byte](0) else src0
    val len = src.length
    val rate = sampleRateOf(len)
    val n = nSamplesOf(len)
    val listData = "INFOISFTgraft".getBytes("US-ASCII") // odd-length: 13 B
    val listPadded = listData.length + (listData.length & 1)
    val dataBytes = n * 2
    // RIFF(12) + fmt(8+16) + LIST(8+padded) + data(8+dataBytes)
    val riffSize = 4 + 24 + (8 + listPadded) + (8 + dataBytes)
    val out = new Array[Byte](8 + riffSize)
    var p = 0
    def tag(s: String): Unit = { s.getBytes("US-ASCII").copyToArray(out, p); p += 4 }
    tag("RIFF"); putIntLE(out, p, riffSize); p += 4; tag("WAVE")
    tag("fmt "); putIntLE(out, p, 16); p += 4
    out(p) = 1; out(p + 1) = 0 // PCM
    out(p + 2) = 1; out(p + 3) = 0 // mono
    putIntLE(out, p + 4, rate)
    putIntLE(out, p + 8, rate * 2) // byte rate
    out(p + 12) = 2; out(p + 13) = 0 // block align
    out(p + 14) = 16; out(p + 15) = 0 // bits per sample
    p += 16
    // ancillary LIST chunk with odd payload — the parser must skip it AND
    // honor the RIFF word-alignment pad byte
    tag("LIST"); putIntLE(out, p, listData.length); p += 4
    listData.copyToArray(out, p); p += listPadded
    tag("data"); putIntLE(out, p, dataBytes); p += 4
    var k = 0
    while (k < n) {
      val s = sampleOf(src, k)
      out(p) = (s & 0xFF).toByte
      out(p + 1) = ((s >> 8) & 0xFF).toByte
      p += 2; k += 1
    }
    out
  }

  val outType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("samples", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  def decode(payload: Array[Byte]): InternalRow = {
    require(payload.length >= 44 &&
      new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
      new String(payload, 8, 4, "US-ASCII") == "WAVE",
      "WavDecode: not a RIFF/WAVE container")
    var pos = 12
    var rate = -1; var channels = -1; var bits = -1; var fmtCode = -1
    var samples: Array[Int] = null
    while (pos + 8 <= payload.length) {
      val id = new String(payload, pos, 4, "US-ASCII")
      val size = getIntLE(payload, pos + 4)
      require(size >= 0 && pos + 8 + size <= payload.length,
        s"WavDecode: truncated $id chunk")
      id match {
        case "fmt " =>
          require(size >= 16, "WavDecode: short fmt chunk")
          fmtCode = getShortLE(payload, pos + 8)
          channels = getShortLE(payload, pos + 10)
          rate = getIntLE(payload, pos + 12)
          bits = getShortLE(payload, pos + 22)
          require(fmtCode == 1 && channels == 1 && bits == 16,
            s"WavDecode: unsupported WAV (fmt=$fmtCode, ch=$channels, " +
              s"bits=$bits; this parser handles 16-bit mono PCM only)")
        case "data" =>
          require(rate > 0, "WavDecode: data chunk before fmt")
          require(size % 2 == 0, "WavDecode: odd PCM16 data size")
          val n = size / 2
          samples = new Array[Int](n)
          var k = 0
          while (k < n) {
            val lo = payload(pos + 8 + 2 * k) & 0xFF
            val hi = payload(pos + 9 + 2 * k)
            samples(k) = (hi << 8) | lo // sign comes from the high byte
            k += 1
          }
        case _ => // ancillary chunk (LIST, fact, cue): skipped
      }
      pos += 8 + size + (size & 1) // RIFF word alignment pad
    }
    require(samples != null, "WavDecode: missing data chunk")
    InternalRow(rate, samples.length, new GenericArrayData(samples))
  }
}

/** payload bytes → synthesized WAV container (codegen'd). */
case class WavSynth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(a: Any): Any =
    WavImpl.synth(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("wavImpl", WavImpl, WavImpl.getClass.getName)
      s"${ev.value} = $impl.synth($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** WAV container → struct(sample_rate, n_samples, samples) (codegen'd). */
case class WavDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WavImpl.outType

  override protected def nullSafeEval(a: Any): Any =
    WavImpl.decode(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("wavImpl", WavImpl, WavImpl.getClass.getName)
      s"${ev.value} = $impl.decode($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavExpressions {
  def wavSynth(spark: SparkSession)(payload: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_wav_synth", exprs => WavSynth(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_wav_synth", payload)
  }

  def wavDecode(spark: SparkSession)(container: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_wav_decode", exprs => WavDecode(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_wav_decode", container)
  }
}
