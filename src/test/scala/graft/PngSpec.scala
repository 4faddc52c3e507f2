package graft

import graft.functions.PngImpl

/** Pins the round-12 compressed-decode contract: PngDecode is a genuine
  * gray8 PNG parser — signature + chunk CRC verification, multi-IDAT
  * concatenation, a real zlib inflate, and all five scanline defilters —
  * not an inverse of the fixture generator.
  */
class PngSpec extends SparkSpec {

  private def expectedPixels(src: Array[Byte]): Array[Int] = {
    val w = PngImpl.widthOf(src.length)
    val h = PngImpl.heightOf(src.length)
    Array.tabulate(w * h)(k => src(k % src.length) & 0xFF)
  }

  private def fixture(len: Int): Array[Byte] =
    Array.tabulate(len)(i => (32 + (i * 37) % 95).toByte)

  test("synth→decode round-trips across lengths (all five filters in play)") {
    // heightOf ≥ 6 > 5 ⇒ every image carries filter types 0..4; a broken
    // defilter (esp. Paeth/Average carry) corrupts pixels, not metadata.
    for (len <- Seq(1, 7, 44, 45, 46, 47, 200, 1023)) {
      val src = fixture(len)
      val row = PngImpl.decode(PngImpl.synth(src))
      assert(row.getInt(0) == PngImpl.widthOf(len))
      assert(row.getInt(1) == PngImpl.heightOf(len))
      assert(row.getArray(2).toIntArray().sameElements(expectedPixels(src)),
        s"pixel mismatch at len=$len")
    }
  }

  test("the container is real: signature, CRC-verified chunks, multi-IDAT") {
    // xorshift-ish bytes resist deflate, so the zlib stream exceeds the
    // 96-byte IDAT split and the multi-IDAT path actually exercises
    var x = 0x2545F491L
    val noisy = Array.fill(4000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; (x & 0xFF).toByte
    }
    val png = PngImpl.synth(noisy)
    assert(png.take(8).sameElements(PngImpl.Signature))
    // walk chunks independently of the decoder
    var pos = 8
    var idats = 0
    val types = scala.collection.mutable.ArrayBuffer[String]()
    while (pos < png.length) {
      val dlen = ((png(pos) & 0xFF) << 24) | ((png(pos + 1) & 0xFF) << 16) |
        ((png(pos + 2) & 0xFF) << 8) | (png(pos + 3) & 0xFF)
      val typ = new String(png, pos + 4, 4, "US-ASCII")
      types += typ
      if (typ == "IDAT") idats += 1
      val crc = new java.util.zip.CRC32
      crc.update(png, pos + 4, 4 + dlen)
      val stored = ((png(pos + 8 + dlen) & 0xFF) << 24) |
        ((png(pos + 9 + dlen) & 0xFF) << 16) |
        ((png(pos + 10 + dlen) & 0xFF) << 8) | (png(pos + 11 + dlen) & 0xFF)
      assert(crc.getValue.toInt == stored, s"bad CRC on $typ")
      pos += 12 + dlen
    }
    assert(types.head == "IHDR" && types.last == "IEND")
    assert(idats >= 2, s"want multi-IDAT, got $idats") // parser must concat
  }

  test("decode fails LOUDLY on corruption (no silent wrong pixels)") {
    val png = PngImpl.synth(fixture(100))
    // flip one byte inside the first IDAT's data → CRC must catch it
    val idatData = 8 + 12 + 13 + 8 + 4 // sig + IHDR chunk + IDAT len/type
    val bad = png.clone()
    bad(idatData + 2) = (bad(idatData + 2) ^ 0x40).toByte
    assertThrows[IllegalArgumentException](PngImpl.decode(bad))
    // bad signature
    val nosig = png.clone(); nosig(0) = 'X'
    assertThrows[IllegalArgumentException](PngImpl.decode(nosig))
    // truncated container
    assertThrows[IllegalArgumentException](
      PngImpl.decode(png.take(png.length - 6)))
  }

  test("decoder honors the header: handcrafted PNG with uniform filter 2 (Up)") {
    // Build a 3x4 gray8 PNG by hand with ONLY filter type 2 — a decoder
    // that assumed the synth's y%5 filter cycle would misread it.
    val w = 3; val h = 4
    val raw = Array.tabulate(h * w)(k => (10 * (k + 1)) % 256)
    val filtered = new Array[Byte](h * (w + 1))
    for (y <- 0 until h) {
      filtered(y * (w + 1)) = 2
      for (x <- 0 until w) {
        val up = if (y > 0) raw((y - 1) * w + x) else 0
        filtered(y * (w + 1) + 1 + x) = ((raw(y * w + x) - up) & 0xFF).toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](256)
    while (!deflater.finished()) zOut.write(tmp, 0, deflater.deflate(tmp))
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngImpl.Signature)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be(v: Int) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      out.write(be(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt))
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = 0; ihdr(1) = 0; ihdr(2) = 0; ihdr(3) = w.toByte
    ihdr(4) = 0; ihdr(5) = 0; ihdr(6) = 0; ihdr(7) = h.toByte
    ihdr(8) = 8
    chunk("IHDR", ihdr)
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val row = PngImpl.decode(out.toByteArray)
    assert(row.getInt(0) == w && row.getInt(1) == h)
    assert(row.getArray(2).toIntArray().sameElements(raw))
  }

  test("unsupported color types are rejected, ancillary chunks skipped") {
    val png = PngImpl.synth(fixture(64))
    // set IHDR colorType (offset 8+8+9 = 25) to 2 (RGB) and re-CRC
    val bad = png.clone()
    bad(25) = 2
    val crc = new java.util.zip.CRC32
    crc.update(bad, 12, 17) // type + 13 data bytes
    val v = crc.getValue.toInt
    bad(29) = ((v >> 24) & 0xFF).toByte; bad(30) = ((v >> 16) & 0xFF).toByte
    bad(31) = ((v >> 8) & 0xFF).toByte; bad(32) = (v & 0xFF).toByte
    assertThrows[IllegalArgumentException](PngImpl.decode(bad))
  }
}
