package graft

import graft.functions.{BmpExpressions, BmpImpl}
import org.apache.spark.sql.functions._

/** Pins the round-11 real-decode contract: BmpDecode is a genuine 24bpp
  * BMP parser (header fields, pixel offset, bottom-up vs top-down rows,
  * row padding), not an inverse of the fixture generator. */
class BmpSpec extends SparkSpec {

  private def expectedPixels(src: Array[Byte]): Array[Int] = {
    val w = BmpImpl.widthOf(src.length)
    val h = BmpImpl.heightOf(src.length)
    Array.tabulate(w * h)(k => src(k % src.length) & 0xFF)
  }

  test("synth→decode round-trips every padding class (w mod 4 = 0..3)") {
    // widthOf(len) = len%24+8: lens 44..47 hit widths 28,29,30,31 — all
    // four row-padding remainders ((3w)%4 = 0,3,2,1).
    for (len <- 44 to 47) {
      val src = Array.tabulate(len)(i => (32 + (i * 37) % 95).toByte)
      val row = BmpImpl.decode(BmpImpl.synth(src))
      assert(row.getInt(0) == BmpImpl.widthOf(len))
      assert(row.getInt(1) == BmpImpl.heightOf(len))
      assert(row.getArray(2).toIntArray().sameElements(expectedPixels(src)),
        s"pixel mismatch at len=$len (w=${BmpImpl.widthOf(len)})")
    }
  }

  test("decoder honors the header, not the generator: handcrafted top-down BMP") {
    // 2x2 top-down (negative height), pixel offset 54, w=2 → rowSize 8
    // (2 pad bytes). Gray rows: top (10, 20), bottom (30, 40).
    val b = new Array[Byte](54 + 16)
    b(0) = 'B'; b(1) = 'M'
    def putLE(off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    putLE(2, b.length); putLE(10, 54); putLE(14, 40)
    putLE(18, 2); putLE(22, -2) // negative height = top-down storage
    b(26) = 1; b(28) = 24; putLE(30, 0)
    for ((g, i) <- Seq(10, 20).zipWithIndex) {
      b(54 + i * 3) = g.toByte; b(54 + i * 3 + 1) = g.toByte; b(54 + i * 3 + 2) = g.toByte
    }
    for ((g, i) <- Seq(30, 40).zipWithIndex) {
      b(54 + 8 + i * 3) = g.toByte; b(54 + 8 + i * 3 + 1) = g.toByte; b(54 + 8 + i * 3 + 2) = g.toByte
    }
    val row = BmpImpl.decode(b)
    assert(row.getInt(0) == 2 && row.getInt(1) == 2)
    assert(row.getArray(2).toIntArray().sameElements(Array(10, 20, 30, 40)))
  }

  test("decoder decodes mixed-channel pixels by integer luma") {
    val src = Array.tabulate(50)(i => (40 + i).toByte)
    val bmp = BmpImpl.synth(src)
    // overwrite first stored pixel (bottom-left) with B=10,G=20,R=31 → 61/3 = 20
    bmp(54) = 10; bmp(55) = 20; bmp(56) = 31
    val row = BmpImpl.decode(bmp)
    val w = row.getInt(0); val h = row.getInt(1)
    assert(row.getArray(2).toIntArray()((h - 1) * w) == 20)
  }

  test("decoder fails loudly on bad magic / unsupported bpp") {
    val good = BmpImpl.synth("hello world, forty-four bytes of ascii text!"
      .getBytes("UTF-8"))
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](BmpImpl.decode(badMagic))
    val bad8bpp = good.clone(); bad8bpp(28) = 8
    intercept[IllegalArgumentException](BmpImpl.decode(bad8bpp))
  }

  test("GrayHist16 single pass == brute-force per-bin count") {
    val src = Array.tabulate(123)(i => (32 + (i * 53) % 95).toByte)
    val px = expectedPixels(src)
    val hist = graft.functions.GrayHistImpl
      .compute(new org.apache.spark.sql.catalyst.util.GenericArrayData(px))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    assert(hist.sum == px.length)
    (0 until 16).foreach { k =>
      assert(hist(k) == px.count(_ / 16 == k), s"bin $k")
    }
  }

  test("empty payloads: synths are total, every mm key survives an empty doc") {
    import spark.implicits._
    // Sentinel contract: empty input synthesizes the 1-byte-payload
    // container and its own decoder accepts it.
    assert(BmpImpl.decode(BmpImpl.synth(Array.empty[Byte])).getInt(0) ==
      BmpImpl.widthOf(1))
    assert(graft.functions.PngImpl.decode(
      graft.functions.PngImpl.synth(Array.empty[Byte])) != null)
    assert(graft.functions.WavImpl.decode(
      graft.functions.WavImpl.synth(Array.empty[Byte])) != null)
    assert(graft.functions.JpegImpl.meta(
      graft.functions.JpegImpl.synth(Array.empty[Byte])) != null)
    // Key-level contract (the r12 verdict's regen scenario): a corpus
    // containing an empty doc runs through EVERY mm key without error,
    // and the empty doc simply carries no media rows.
    val dir = java.nio.file.Files.createTempDirectory("mmempty").toString
    Seq((1L, "the quick brown fox jumps over the dog", "en", "web", 38L),
      (2L, "", "en", "web", 0L),
      (3L, "pack my box with five dozen jugs", "en", "web", 32L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for ((k, fn) <- SparkEntry.queries if k.startsWith("mm_")) {
      val out = fn(spark, dir)
      val cols = out.columns.toSet
      if (cols.contains("doc_id"))
        assert(out.filter(col("doc_id") === 2L).count() == 0,
          s"$k emitted rows for the empty doc")
      else out.count() // aggregate-shaped keys: executing IS the assertion
    }
  }

  test("codegen and interpreted paths agree through the Column API") {
    val df = spark.range(5).selectExpr(
      "cast(concat('payload-', repeat(cast(id as string), cast(40 + id as int))) as binary) as p")
    val dec = BmpExpressions.bmpDecode(spark)(
      BmpExpressions.bmpSynth(spark)(col("p")))
    val rows = df.select(col("p"), dec.as("img")).collect()
    rows.foreach { r =>
      val src = r.getAs[Array[Byte]]("p")
      val img = r.getStruct(1)
      assert(img.getInt(0) == BmpImpl.widthOf(src.length))
      assert(img.getSeq[Int](2).toArray.sameElements(expectedPixels(src)))
    }
  }
}
