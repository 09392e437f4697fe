package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Wav
import graft.io.Wav.Audio

/** The from-scratch RIFF/WAVE codec: PCM round-trips, 8-bit decode,
  * chunk skipping with odd-length padding, loud rejections, and an
  * externally-written fixture (Python stdlib `wave`) pinned against
  * independent expectations. */
class WavSpec extends AnyFunSuite {

  private def mkSamples(n: Int): Array[Short] = {
    val r = new scala.util.Random(7)
    Array.fill(n)((r.nextInt(65536) - 32768).toShort)
  }

  test("PCM-16 round-trips mono and multi-channel") {
    for (ch <- Seq(1, 2, 6)) {
      val a = Audio(44100, ch, mkSamples(ch * 37))
      val back = Wav.decode(Wav.encode(a))
      assert(back.sampleRate === 44100 && back.channels === ch)
      assert(back.samples.toSeq === a.samples.toSeq, s"channels=$ch")
    }
  }

  test("8-bit PCM decodes unsigned bytes into centered 16-bit space") {
    // hand-build an 8-bit mono file: samples 0, 128, 255
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String) = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int) = { out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff) }
    def le16(v: Int) = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    ascii("RIFF"); le32(36 + 3); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(1); le32(8000)
    le32(8000); le16(1); le16(8)
    ascii("data"); le32(3); out.write(0); out.write(128); out.write(255)
    out.write(0) // odd data chunk carries a pad byte
    val a = Wav.decode(out.toByteArray)
    assert(a.sampleRate === 8000 && a.channels === 1)
    assert(a.samples.toSeq === Seq[Short](-32768, 0, 32512))
  }

  test("ancillary chunks are skipped, including odd-length + pad") {
    val a = Audio(16000, 1, mkSamples(10))
    val ok = Wav.encode(a)
    // splice a 5-byte (odd) LIST chunk + pad between WAVE and fmt
    val out = new java.io.ByteArrayOutputStream()
    out.write(ok, 0, 12)
    out.write("LIST".getBytes("US-ASCII"))
    out.write(Array[Byte](5, 0, 0, 0)) // little-endian length 5
    out.write(Array[Byte](1, 2, 3, 4, 5, 0)) // data + pad byte
    out.write(ok, 12, ok.length - 12)
    assert(Wav.decode(out.toByteArray).samples.toSeq === a.samples.toSeq)
  }

  test("non-WAV bytes, truncation, float PCM and 24-bit are rejected") {
    intercept[IllegalArgumentException](Wav.decode("nope".getBytes))
    val ok = Wav.encode(Audio(8000, 1, mkSamples(20)))
    intercept[IllegalArgumentException](Wav.decode(ok.take(30)))
    val float = ok.clone(); float(20) = 3 // fmt tag -> IEEE float
    assert(intercept[IllegalArgumentException](Wav.decode(float))
      .getMessage.contains("format tag"))
    val deep = ok.clone(); deep(34) = 24 // bits per sample
    assert(intercept[IllegalArgumentException](Wav.decode(deep))
      .getMessage.contains("bit depth"))
  }

  test("decodes an EXTERNALLY-written stereo file (Python stdlib wave)") {
    val b64 =
      "UklGRuwAAABXQVZFZm10IBAAAAABAAIAQB8AAAB9AAAEABAAZGF0YcgAAADkJcDgCSYb4S4" +
      "mduFTJtHheCYs4p0mh+LCJuLi5yY94wwnmOMR2fPjNtlO5FvZqeSA2QTlpdlf5crZuuXv2R" +
      "XmFNpw5jnay+Ze2ibng9qB56ja3OfN2jfo8tqS6Bfb7eg820jpYduj6Ybb/umr21nq0Nu06" +
      "vXbD+sa3GrrP9zF62TcIOyJ3HvsrtzW7NPcMe343IztHd3n7ULdQu5n3Z3ujN347rHdU+/W" +
      "3a7v+90J8CDeZPBF3r/wat4a8Y/edfG03tDx2d4r8g=="
    val bytes = java.util.Base64.getDecoder.decode(b64)
    val a = Wav.decode(bytes)
    assert(a.sampleRate === 8000 && a.channels === 2)
    assert(a.samples.length === 100)
    assert(a.samples.map(_.toLong).sum === -578200L)
    assert(a.samples.head === 9700 && a.samples.last === -3541)
  }
}
