package graft

import graft.functions.WavImpl

/** Pins the round-12 audio-decode contract: WavDecode is a genuine
  * RIFF/WAVE parser — magic, chunk walk with word-alignment pad bytes,
  * fmt validation, ancillary-chunk skip, signed LE int16 reassembly —
  * not an inverse of the fixture generator.
  */
class WavSpec extends SparkSpec {

  private def fixture(len: Int): Array[Byte] =
    Array.tabulate(len)(i => (32 + (i * 37) % 95).toByte)

  test("synth→decode round-trips, negative samples included") {
    for (len <- Seq(1, 13, 100, 997)) {
      val src = fixture(len)
      val row = WavImpl.decode(WavImpl.synth(src))
      assert(row.getInt(0) == WavImpl.sampleRateOf(len))
      assert(row.getInt(1) == WavImpl.nSamplesOf(len))
      val got = row.getArray(2).toIntArray()
      val want = Array.tabulate(WavImpl.nSamplesOf(len))(k => WavImpl.sampleOf(src, k))
      assert(got.sameElements(want), s"sample mismatch at len=$len")
      assert(want.exists(_ < 0) || len < 3,
        "fixture should exercise negative int16 territory")
    }
  }

  test("decoder honors the container, not the generator: handcrafted WAV") {
    // 3 samples at 22050 Hz: 1000, -2, -32768 — extremes of int16.
    val samples = Seq(1000, -2, -32768)
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    out.write("RIFF".getBytes); out.write(le32(4 + 24 + 8 + 6))
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); out.write(le32(16))
    out.write(le16(1)); out.write(le16(1)) // PCM, mono
    out.write(le32(22050)); out.write(le32(44100))
    out.write(le16(2)); out.write(le16(16))
    out.write("data".getBytes); out.write(le32(6))
    samples.foreach(s => out.write(le16(s & 0xFFFF)))
    val row = WavImpl.decode(out.toByteArray)
    assert(row.getInt(0) == 22050)
    assert(row.getArray(2).toIntArray().toSeq == samples,
      "sign extension of the high byte must survive the parse")
  }

  test("ancillary chunks are skipped with the RIFF pad byte honored") {
    // the synth emits an odd-length LIST chunk before data — a parser
    // that forgets the pad byte would misalign and die on a bogus tag
    val png = WavImpl.synth(fixture(50))
    val s = new String(png, "ISO-8859-1")
    assert(s.indexOf("LIST") > 0 && s.indexOf("data") > s.indexOf("LIST"))
    WavImpl.decode(png) // must not throw
  }

  test("unsupported and corrupt containers fail loudly") {
    val wav = WavImpl.synth(fixture(40))
    val bad = wav.clone(); bad(0) = 'X'
    assertThrows[IllegalArgumentException](WavImpl.decode(bad))
    // stereo: flip the channel count inside fmt (offset 12+8+2)
    val stereo = wav.clone(); stereo(22) = 2
    assertThrows[IllegalArgumentException](WavImpl.decode(stereo))
    // truncated data chunk
    assertThrows[IllegalArgumentException](
      WavImpl.decode(wav.take(wav.length - 3)))
  }
}
