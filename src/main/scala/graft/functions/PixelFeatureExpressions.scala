package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native feature folds over decoded pixel/sample int arrays
  * (optimization round 18, guide §1.2 step 2 / §4.1 "prefer codegen
  * expressions"): the mm_* digest keys previously folded their decoded
  * arrays through interpreted higher-order functions — `aggregate`/
  * `transform` lambdas evaluate per element with boxing, and the md5 digest
  * additionally materialized a per-element string array plus one giant
  * concat before hashing. The repo's own GrayHist16 precedent (r11:
  * per-bin filter() scans → one native pass, 5 s → sub-second at sf0.1)
  * sets the pattern; these expressions extend it to every hot mm fold:
  *
  *  - [[IntCsvMd5]]    array<int> → md5 of the comma-joined decimal string
  *                     (byte-identical to md5(concat_ws(",",
  *                     transform(a, CAST AS STRING)))) — one UTF-8 buffer,
  *                     no per-element UTF8String allocation;
  *  - [[IntSumLong]]   array<int> → Σ as BIGINT (aggregate(…, 0L, a+x));
  *  - [[WavFeats]]     samples → struct(sum_abs, peak, energy) in ONE pass
  *                     (was three separate interpreted folds);
  *  - [[FrameFeats]]   samples → array<struct(frame_n, energy, peak)> over
  *                     64-sample frames with the edge-clamped tail — built
  *                     BEFORE the frame explode, so the Generate carries a
  *                     frames-sized digest array instead of duplicating the
  *                     whole sample array per frame row (§2.3: project
  *                     before the row multiply);
  *  - [[TileSums]]     (pixels, width, height) → array<long> of 8×8
  *                     edge-clamped tile sums in row-major tile_id order —
  *                     same pre-explode discipline;
  *  - [[EdgeEnergy]]   (pixels, width) → struct(h_energy, v_energy), one
  *                     pass instead of two interpreted folds over
  *                     filter(sequence(…)) index arrays;
  *  - [[Downsample2x]] (pixels, width, w2, h2) → the 2× nearest-neighbor
  *                     grid as array<int> (out(x,y) = in(2x,2y)).
  *
  * Every expression follows the house discipline: one impl object serves
  * the interpreted and generated paths (PlanAuditSpec stays UDF-free), all
  * arithmetic is exact integer math identical to the HOF chains it
  * replaces, so every consumer key's DuckDB oracle hash is unchanged.
  */
object PixelFeatureImpl extends Serializable {

  /** md5 hex (lowercase) of the ints joined by ',' in decimal — the exact
    * bytes md5(concat_ws(",", transform(a, CAST AS STRING))) hashes. */
  def csvMd5(a: ArrayData): UTF8String = {
    val n = a.numElements()
    val sb = new java.lang.StringBuilder(n * 4)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      sb.append(a.getInt(i))
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes("UTF-8"))
    val hex = new Array[Byte](32)
    val digits = "0123456789abcdef".getBytes("US-ASCII")
    var j = 0
    while (j < 16) {
      hex(2 * j) = digits((md(j) >> 4) & 0xF)
      hex(2 * j + 1) = digits(md(j) & 0xF)
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  def sumLong(a: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += a.getInt(i); i += 1 }
    s
  }

  val wavFeatsType: StructType = StructType(Seq(
    StructField("sum_abs", LongType, nullable = false),
    StructField("peak", LongType, nullable = false),
    StructField("energy", LongType, nullable = false)))

  def wavFeats(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var sumAbs = 0L
    var peak = 0L
    var energy = 0L
    var i = 0
    while (i < n) {
      val x = a.getInt(i).toLong
      val ax = math.abs(x)
      sumAbs += ax
      if (ax > peak) peak = ax
      energy += x * x
      i += 1
    }
    InternalRow(sumAbs, peak, energy)
  }

  val frameFeatsType: ArrayType = ArrayType(StructType(Seq(
    StructField("frame_n", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("peak", LongType, nullable = false))), containsNull = false)

  /** 64-sample frames, edge-clamped tail: frame f covers samples
    * [64f, 64f + min(64, n − 64f)); energy = Σ x², peak = max |x| (0 on
    * an impossible empty frame, matching aggregate's 0L seed). */
  def frameFeats(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val nf = (n + 63) / 64
    val out = new Array[Any](nf)
    var f = 0
    while (f < nf) {
      val start = f * 64
      val fn = math.min(64, n - start)
      var energy = 0L
      var peak = 0L
      var i = start
      val end = start + fn
      while (i < end) {
        val x = a.getInt(i).toLong
        val ax = math.abs(x)
        if (ax > peak) peak = ax
        energy += x * x
        i += 1
      }
      out(f) = InternalRow(fn.toLong, energy, peak)
      f += 1
    }
    new GenericArrayData(out)
  }

  /** 8×8 edge-clamped tile sums in row-major tile_id order: tile t at
    * (off_x, off_y) = ((t % tiles_x)·8, (t / tiles_x)·8) sums pixels
    * [off_y, off_y+tile_h) × [off_x, off_x+tile_w). */
  def tileSums(px: ArrayData, width: Int, height: Int): ArrayData = {
    val tilesX = (width + 7) / 8
    val tilesY = (height + 7) / 8
    val out = new Array[Long](tilesX * tilesY)
    var t = 0
    while (t < out.length) {
      val offX = (t % tilesX) * 8
      val offY = (t / tilesX) * 8
      val tw = math.min(8, width - offX)
      val th = math.min(8, height - offY)
      var s = 0L
      var y = 0
      while (y < th) {
        val rowBase = (offY + y) * width + offX
        var x = 0
        while (x < tw) { s += px.getInt(rowBase + x); x += 1 }
        y += 1
      }
      out(t) = s
      t += 1
    }
    new GenericArrayData(out)
  }

  val edgeEnergyType: StructType = StructType(Seq(
    StructField("h_energy", LongType, nullable = false),
    StructField("v_energy", LongType, nullable = false)))

  /** h = Σ |p[k+1] − p[k]| over within-row neighbors ((k+1) % width ≠ 0),
    * v = Σ |p[k+width] − p[k]| — 0-based, matching the element_at(+1)
    * folds it replaces. */
  def edgeEnergy(px: ArrayData, width: Int): InternalRow = {
    val n = px.numElements()
    var h = 0L
    var v = 0L
    var k = 0
    val hEnd = n - 1
    while (k < hEnd) {
      if ((k + 1) % width != 0)
        h += math.abs(px.getInt(k + 1) - px.getInt(k)).toLong
      k += 1
    }
    k = 0
    val vEnd = n - width
    while (k < vEnd) {
      v += math.abs(px.getInt(k + width) - px.getInt(k)).toLong
      k += 1
    }
    InternalRow(h, v)
  }

  /** out(x, y) = in(2x, 2y) over the w2×h2 ceil-half grid — identical to
    * transform(sequence(0, w2·h2 − 1), k -> element_at(pixels,
    * (k div w2)·2·width + (k % w2)·2 + 1)). */
  // w2/h2 arrive as BIGINT (`div` yields LongType); grids are int-sized
  def downsample2x(px: ArrayData, width: Int, w2l: Long, h2l: Long): ArrayData = {
    val w2 = w2l.toInt
    val h2 = h2l.toInt
    val out = new Array[Int](w2 * h2)
    var k = 0
    while (k < out.length) {
      out(k) = px.getInt((k / w2) * 2 * width + (k % w2) * 2)
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class IntCsvMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(a: Any): Any =
    PixelFeatureImpl.csvMd5(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("pxImpl", PixelFeatureImpl,
        PixelFeatureImpl.getClass.getName)
      s"${ev.value} = $impl.csvMd5($a);"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class IntSumLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any): Any =
    PixelFeatureImpl.sumLong(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("pxImpl", PixelFeatureImpl,
        PixelFeatureImpl.getClass.getName)
      s"${ev.value} = $impl.sumLong($a);"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WavFeats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PixelFeatureImpl.wavFeatsType
  override protected def nullSafeEval(a: Any): Any =
    PixelFeatureImpl.wavFeats(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("pxImpl", PixelFeatureImpl,
        PixelFeatureImpl.getClass.getName)
      s"${ev.value} = $impl.wavFeats($a);"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class FrameFeats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PixelFeatureImpl.frameFeatsType
  override protected def nullSafeEval(a: Any): Any =
    PixelFeatureImpl.frameFeats(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("pxImpl", PixelFeatureImpl,
        PixelFeatureImpl.getClass.getName)
      s"${ev.value} = $impl.frameFeats($a);"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class TileSums(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(px: Any, w: Any, h: Any): Any =
    PixelFeatureImpl.tileSums(px.asInstanceOf[ArrayData],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, w, h) => {
      val impl = ctx.addReferenceObj("pxImpl", PixelFeatureImpl,
        PixelFeatureImpl.getClass.getName)
      s"${ev.value} = $impl.tileSums($px, $w, $h);"
    })
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

case class EdgeEnergy(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = PixelFeatureImpl.edgeEnergyType
  override protected def nullSafeEval(px: Any, w: Any): Any =
    PixelFeatureImpl.edgeEnergy(px.asInstanceOf[ArrayData], w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, w) => {
      val impl = ctx.addReferenceObj("pxImpl", PixelFeatureImpl,
        PixelFeatureImpl.getClass.getName)
      s"${ev.value} = $impl.edgeEnergy($px, $w);"
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class Downsample2x(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(px: Any, w: Any, x2: Any, y2: Any): Any =
    PixelFeatureImpl.downsample2x(px.asInstanceOf[ArrayData],
      w.asInstanceOf[Int], x2.asInstanceOf[Long], y2.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, w, x2, y2) => {
      val impl = ctx.addReferenceObj("pxImpl", PixelFeatureImpl,
        PixelFeatureImpl.getClass.getName)
      s"${ev.value} = $impl.downsample2x($px, $w, $x2, $y2);"
    })
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object PixelFeatureExpressions {
  private def reg(spark: SparkSession, name: String,
      build: Seq[Expression] => Expression, cols: Seq[Column]): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, build, "built-in")
    org.apache.spark.sql.functions.call_function(name, cols: _*)
  }
  def intCsvMd5(s: SparkSession)(a: Column): Column =
    reg(s, "graft_int_csv_md5", e => IntCsvMd5(e.head), Seq(a))
  def intSumLong(s: SparkSession)(a: Column): Column =
    reg(s, "graft_int_sum_long", e => IntSumLong(e.head), Seq(a))
  def wavFeats(s: SparkSession)(a: Column): Column =
    reg(s, "graft_wav_feats", e => WavFeats(e.head), Seq(a))
  def frameFeats(s: SparkSession)(a: Column): Column =
    reg(s, "graft_frame_feats", e => FrameFeats(e.head), Seq(a))
  def tileSums(s: SparkSession)(px: Column, w: Column, h: Column): Column =
    reg(s, "graft_tile_sums", e => TileSums(e(0), e(1), e(2)), Seq(px, w, h))
  def edgeEnergy(s: SparkSession)(px: Column, w: Column): Column =
    reg(s, "graft_edge_energy", e => EdgeEnergy(e(0), e(1)), Seq(px, w))
  def downsample2x(s: SparkSession)(px: Column, w: Column,
      w2: Column, h2: Column): Column =
    reg(s, "graft_downsample2x", e => Downsample2x(e(0), e(1), e(2), e(3)),
      Seq(px, w, w2, h2))
}
