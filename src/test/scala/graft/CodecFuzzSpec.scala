package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Jpeg, Png, Wav}

/** Hostile-bytes robustness for the media codecs: random mutations of
  * valid files (and pure-random buffers) must either decode or throw a
  * catchable exception promptly — never hang, allocate absurdly, or
  * kill the JVM. This is the contract the tolerant `try_*_decode`
  * expressions (NonFatal → NULL) rest on: a 100 TB crawl WILL contain
  * adversarial payloads. */
class CodecFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1234)

  private def mutate(base: Array[Byte], nMut: Int): Array[Byte] = {
    val b = base.clone()
    for (_ <- 0 until nMut)
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
    b
  }

  private def runFuzz(name: String, base: Array[Byte],
      decode: Array[Byte] => Any, rounds: Int = 400): Unit = {
    var decoded = 0; var rejected = 0
    for (i <- 0 until rounds) {
      val mutated =
        if (i % 4 == 3) { // also truncations and pure noise
          if (i % 8 == 3) base.take(rnd.nextInt(base.length))
          else Array.fill(rnd.nextInt(200) + 1)(rnd.nextInt(256).toByte)
        } else mutate(base, 1 + rnd.nextInt(8))
      try { decode(mutated); decoded += 1 }
      catch { case scala.util.control.NonFatal(_) => rejected += 1 }
    }
    assert(decoded + rejected == rounds)
    // sanity: the corpus should produce SOME clean rejects (CRC/marker
    // checks firing), or the fuzz isn't biting
    assert(rejected > 0, s"$name: no mutation was ever rejected?")
  }

  test("PNG survives 400 hostile mutations") {
    val px = Array.tabulate(24 * 16 * 3)(i => (i * 7).toByte)
    runFuzz("png", Png.encode(Png.Image(24, 16, 3, px), 4), Png.decode)
  }

  test("JPEG survives 400 hostile mutations") {
    val img = new java.awt.image.BufferedImage(
      48, 32, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 32; x <- 0 until 48)
      img.setRGB(x, y, (x * 5) << 16 | (y * 7) << 8 | (x + y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    runFuzz("jpeg", baos.toByteArray, Jpeg.decode)
  }

  test("WAV survives 400 hostile mutations") {
    val samples = Array.tabulate(300)(i => ((i * 131) % 30000 - 15000).toShort)
    runFuzz("wav", Wav.encode(Wav.Audio(16000, 2, samples)), Wav.decode)
  }
}
