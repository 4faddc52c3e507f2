package graft

import graft.functions.JpegImpl

/** Pins the round-12 JPEG header contract: JpegMeta is a genuine marker
  * walk (variable-length segments, length-includes-itself arithmetic,
  * moving SOF0 offset), not an inverse of the fixture generator. */
class JpegSpec extends SparkSpec {

  private def fixture(len: Int): Array[Byte] =
    Array.tabulate(len)(i => (32 + (i * 37) % 95).toByte)

  test("synth→meta round-trips; COM length moves SOF0 row to row") {
    val offs = Seq(5, 6, 7, 50, 997).map { len =>
      val jpg = JpegImpl.synth(fixture(len))
      val row = JpegImpl.meta(jpg)
      assert(row.getInt(0) == JpegImpl.widthOf(len))
      assert(row.getInt(1) == JpegImpl.heightOf(len))
      assert(row.getInt(2) == 4, "APP0 + COM + DQT + SOF0")
      // locate SOF0 independently
      val idx = jpg.indices.find(i =>
        (jpg(i) & 0xFF) == 0xFF && i + 1 < jpg.length &&
          (jpg(i + 1) & 0xFF) == 0xC0).get
      idx
    }
    assert(offs.distinct.size > 1,
      "the COM segment must shift SOF0's offset across lengths")
  }

  test("meta honors the walk: handcrafted JPEG with extra APPn segments") {
    // SOI + APP1(13B payload) + APP13(3B) + SOF0(257x99) + EOI — different
    // segment inventory than the synth; a generator-inverse would miscount.
    val out = new java.io.ByteArrayOutputStream()
    def m(x: Int): Unit = { out.write(0xFF); out.write(x) }
    def seg(x: Int, data: Array[Byte]): Unit = {
      m(x); val l = data.length + 2
      out.write(l >> 8); out.write(l & 0xFF); out.write(data)
    }
    m(0xD8)
    seg(0xE1, Array.fill[Byte](13)(7))
    seg(0xED, Array.fill[Byte](3)(1))
    seg(0xC0, Array[Byte](8, 0, 99, 1, 1, 1, 1, 0x11, 0)) // h=99 w=257
    m(0xD9)
    val row = JpegImpl.meta(out.toByteArray)
    assert(row.getInt(0) == 257 && row.getInt(1) == 99 && row.getInt(2) == 3)
  }

  test("corrupt containers fail loudly") {
    val jpg = JpegImpl.synth(fixture(64))
    val noSoi = jpg.clone(); noSoi(1) = 0x00
    assertThrows[IllegalArgumentException](JpegImpl.meta(noSoi))
    // break a segment length so the walk lands off a marker
    val badLen = jpg.clone(); badLen(4) = 0; badLen(5) = 9
    assertThrows[IllegalArgumentException](JpegImpl.meta(badLen))
    // truncate before EOI
    assertThrows[IllegalArgumentException](
      JpegImpl.meta(jpg.take(jpg.length - 2)))
    // no SOF0: SOI + APP0 + EOI only
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8)
    out.write(0xFF); out.write(0xE0); out.write(0); out.write(4)
    out.write(0); out.write(0)
    out.write(0xFF); out.write(0xD9)
    assertThrows[IllegalArgumentException](JpegImpl.meta(out.toByteArray))
  }
}
