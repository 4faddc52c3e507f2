package graft

import org.apache.spark.sql.functions._
import graft.functions.PixelFeatureExpressions

/** r18 optimization round: the mm_* digest keys swapped their interpreted
  * HOF folds for the single-pass native expressions in
  * PixelFeatureExpressions. These pins replay each native fold against the
  * EXACT HOF formulation it replaced, on randomized arrays shaped like the
  * decoders' outputs (int pixel/sample values spanning negative 16-bit
  * territory for the wav folds), so any arithmetic drift — md5 byte
  * layout, abs/overflow semantics, tile/frame clamping, resize strides —
  * fails here rather than at the oracle. */
class PixelFeatureSpec extends SparkSpec {

  private def arraysDf(rows: Int, maxLen: Int, lo: Int, hi: Int,
      seed: Long, withDims: Boolean = false) = {
    val rnd = new scala.util.Random(seed)
    val data = (0 until rows).map { i =>
      // dims shaped like the BMP fixture: width 8..31, height 5..20
      val w = 8 + rnd.nextInt(24)
      val h = 5 + rnd.nextInt(16)
      val n = if (withDims) w * h else 1 + rnd.nextInt(maxLen)
      (i.toLong, Seq.fill(n)(lo + rnd.nextInt(hi - lo + 1)), w, h)
    }
    spark.createDataFrame(data).toDF("id", "arr", "w", "h")
  }

  test("IntCsvMd5 / IntSumLong match the HOF md5(concat_ws)/aggregate folds") {
    val df = arraysDf(200, 400, 0, 255, seed = 1L)
      .withColumn("md5_hof",
        md5(concat_ws(",", transform(col("arr"), c => c.cast("string")))))
      .withColumn("md5_nat", PixelFeatureExpressions.intCsvMd5(spark)(col("arr")))
      .withColumn("sum_hof", expr("aggregate(arr, 0L, (a, x) -> a + x)"))
      .withColumn("sum_nat", PixelFeatureExpressions.intSumLong(spark)(col("arr")))
    assert(df.filter(col("md5_hof") =!= col("md5_nat") ||
      col("sum_hof") =!= col("sum_nat")).count() === 0)
  }

  test("WavFeats matches the three aggregate folds on signed samples") {
    val df = arraysDf(200, 600, -32768, 32767, seed = 2L)
      .withColumn("wf", PixelFeatureExpressions.wavFeats(spark)(col("arr")))
      .withColumn("sum_abs_hof", expr("aggregate(arr, 0L, (a, x) -> a + abs(x))"))
      .withColumn("peak_hof",
        expr("aggregate(arr, 0L, (a, x) -> greatest(a, cast(abs(x) as bigint)))"))
      .withColumn("energy_hof",
        expr("aggregate(arr, 0L, (a, x) -> a + cast(x as bigint) * x)"))
    assert(df.filter(col("wf.sum_abs") =!= col("sum_abs_hof") ||
      col("wf.peak") =!= col("peak_hof") ||
      col("wf.energy") =!= col("energy_hof")).count() === 0)
  }

  test("FrameFeats matches the explode+slice+aggregate frame folds") {
    val base = arraysDf(120, 500, -32768, 32767, seed = 3L)
      .withColumn("n", size(col("arr")))
    val hof = base
      .withColumn("frame_idx",
        explode(sequence(lit(0), expr("(n + 63) div 64") - 1)))
      .withColumn("frame_n", least(lit(64), col("n") - col("frame_idx") * 64))
      .withColumn("w", expr("slice(arr, frame_idx * 64 + 1, frame_n)"))
      .select(col("id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_n").cast("long").as("frame_n"),
        expr("aggregate(w, 0L, (a, x) -> a + cast(x as bigint) * x)").as("energy"),
        expr("aggregate(w, 0L, (a, x) -> greatest(a, cast(abs(x) as bigint)))").as("peak"))
    val nat = base
      .select(col("id"),
        PixelFeatureExpressions.frameFeats(spark)(col("arr")).as("ff"))
      .select(col("id"), posexplode(col("ff")).as(Seq("frame_idx", "f")))
      .select(col("id"), col("frame_idx").cast("long").as("frame_idx"),
        col("f.frame_n").as("frame_n"), col("f.energy").as("energy"),
        col("f.peak").as("peak"))
    assert(hof.exceptAll(nat).count() === 0 && nat.exceptAll(hof).count() === 0)
  }

  test("TileSums matches the per-tile aggregate over the index sequence") {
    val base = arraysDf(120, 0, 0, 255, seed = 4L, withDims = true)
    val hof = base
      .withColumn("tiles_x", expr("(w + 7) div 8"))
      .withColumn("tiles_y", expr("(h + 7) div 8"))
      .withColumn("tile_id",
        explode(sequence(lit(0), col("tiles_x") * col("tiles_y") - 1)))
      .withColumn("off_x", pmod(col("tile_id"), col("tiles_x")) * 8)
      .withColumn("off_y", expr("(tile_id div tiles_x) * 8"))
      .withColumn("tile_w", least(lit(8), col("w") - col("off_x")))
      .withColumn("tile_h", least(lit(8), col("h") - col("off_y")))
      .select(col("id"), col("tile_id").cast("long").as("tile_id"),
        expr("aggregate(sequence(0, tile_w * tile_h - 1), 0L, (a, j) -> " +
          "a + element_at(arr, cast((off_y + j div tile_w) * w " +
          "+ off_x + j % tile_w + 1 as int)))").as("tile_sum"))
    val nat = base
      .select(col("id"), PixelFeatureExpressions.tileSums(spark)(
        col("arr"), col("w"), col("h")).as("tsums"))
      .select(col("id"), posexplode(col("tsums")).as(Seq("tile_id", "tile_sum")))
      .select(col("id"), col("tile_id").cast("long").as("tile_id"), col("tile_sum"))
    assert(hof.exceptAll(nat).count() === 0 && nat.exceptAll(hof).count() === 0)
  }

  test("EdgeEnergy matches the filtered-sequence gradient folds") {
    val df = arraysDf(120, 0, 0, 255, seed = 5L, withDims = true)
      .withColumn("ee", PixelFeatureExpressions.edgeEnergy(spark)(
        col("arr"), col("w")))
      .withColumn("h_hof", expr(
        "aggregate(filter(sequence(0, size(arr) - 2), " +
          "k -> (k + 1) % w != 0), 0L, (a, k) -> " +
          "a + abs(element_at(arr, k + 2) - element_at(arr, k + 1)))"))
      .withColumn("v_hof", expr(
        "aggregate(sequence(0, size(arr) - w - 1), 0L, (a, k) -> " +
          "a + abs(element_at(arr, k + w + 1) - element_at(arr, k + 1)))"))
    assert(df.filter(col("ee.h_energy") =!= col("h_hof") ||
      col("ee.v_energy") =!= col("v_hof")).count() === 0)
  }

  test("Downsample2x matches the transform-over-strides sampler") {
    val df = arraysDf(120, 0, 0, 255, seed = 6L, withDims = true)
      .withColumn("w2", expr("(w + 1) div 2"))
      .withColumn("h2", expr("(h + 1) div 2"))
      .withColumn("r_hof", expr(
        "transform(sequence(0, w2 * h2 - 1), k -> " +
          "element_at(arr, cast((k div w2) * 2 * w + (k % w2) * 2 + 1 as int)))"))
      .withColumn("r_nat", PixelFeatureExpressions.downsample2x(spark)(
        col("arr"), col("w"), col("w2"), col("h2")))
    assert(df.filter(col("r_hof") =!= col("r_nat")).count() === 0)
  }
}
