package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Gif

/** The from-scratch GIF codec: lossless multi-frame round-trips
  * through real LZW, externally-written fixtures cross-checked against
  * the JDK's independent decoder, and hostile-bytes robustness. */
class GifSpec extends AnyFunSuite {

  private val grayPalette: Array[Byte] =
    Array.tabulate(256 * 3)(i => (i / 3).toByte)

  test("animated multi-frame round-trip is lossless") {
    val w = 23; val h = 11
    val rnd = new scala.util.Random(5)
    val frames = Seq.tabulate(3) { f =>
      (Array.fill(w * h)(rnd.nextInt(256).toByte), 10 * (f + 1))
    }
    val bytes = Gif.encode(w, h, grayPalette, frames)
    val back = Gif.decode(bytes)
    assert(back.length === 3)
    back.zip(frames).zipWithIndex.foreach { case ((got, (px, delay)), i) =>
      assert(got.delayCs === delay, s"frame $i delay")
      assert(got.image.width === w && got.image.height === h &&
        got.image.channels === 3)
      // gray palette: every RGB channel equals the index byte
      for (p <- 0 until w * h; c <- 0 until 3)
        assert(got.image.pixels(p * 3 + c) === px(p),
          s"frame $i pixel $p channel $c")
    }
  }

  test("small palettes and 1x1 frames round-trip") {
    val pal4 = Array[Byte](0, 0, 0, 85, 85, 85, -86, -86, -86, -1, -1, -1)
    val bytes = Gif.encode(1, 1, pal4, Seq((Array[Byte](2), 0)))
    val f = Gif.decode(bytes)
    assert(f.length === 1)
    assert(f.head.image.pixels.toSeq === Seq[Byte](-86, -86, -86))
  }

  test("LZW compression beats the uncompressed floor on repetitive content") {
    // constant 64x64 image: real LZW collapses runs into dictionary
    // sequences; the old CLEAR-per-literal escape hatch paid ~9 bits
    // per pixel (4096 px -> ~4.6 KB of code stream)
    val w = 64; val h = 64
    val bytes = Gif.encode(w, h, grayPalette,
      Seq((Array.fill(w * h)(7.toByte), 0)))
    assert(bytes.length < w * h / 4,
      s"${bytes.length} bytes for ${w * h} constant pixels — not compressing")
    val back = Gif.decode(bytes)
    assert(back.head.image.pixels.forall(_ == 7.toByte))
  }

  test("random 128x128 frame round-trips through the dictionary-reset path") {
    // 16384 px of 256-color noise registers a new code nearly every
    // pixel, exhausting the 4096-code space several times — exercising
    // the encoder's CLEAR+reset branch and the decoder's matching one
    val w = 128; val h = 128
    val rnd = new scala.util.Random(11)
    val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
    val back = Gif.decode(Gif.encode(w, h, grayPalette, Seq((px, 0))))
    for (p <- 0 until w * h)
      assert(back.head.image.pixels(p * 3) === px(p), s"pixel $p")
  }

  test("the JDK's independent decoder reads our encoded LZW stream") {
    val w = 31; val h = 17
    val rnd = new scala.util.Random(9)
    val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Gif.encode(w, h, grayPalette, Seq((px, 0)))))
    assert(ref.getWidth === w && ref.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val expected = px(y * w + x) & 0xff
      val argb = ref.getRGB(x, y)
      assert(((argb >> 16) & 0xff) === expected &&
        ((argb >> 8) & 0xff) === expected && (argb & 0xff) === expected,
        s"pixel ($x,$y)")
    }
  }

  test("decodes EXTERNALLY-written GIFs matching the JDK decoder") {
    val files = Seq(
      "/usr/share/doc/libxslt1-dev/html/Libxslt-Logo-90x34.gif",
      "/usr/share/doc/libxslt1-dev/html/node.gif",
      "/usr/share/doc/libxslt1-dev/html/processing.gif")
      .map(new java.io.File(_)).filter(_.isFile)
    assume(files.nonEmpty, "no GIF fixtures present")
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val mine = Gif.decode(bytes).head.image
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(mine.width === ref.getWidth && mine.height === ref.getHeight,
        f.getName)
      for (y <- 0 until ref.getHeight; x <- 0 until ref.getWidth) {
        val argb = ref.getRGB(x, y)
        val o = (y * mine.width + x) * 3
        if ((argb >>> 24) != 0) { // opaque: exact RGB match
          assert((mine.pixels(o) & 0xff) === ((argb >> 16) & 0xff) &&
            (mine.pixels(o + 1) & 0xff) === ((argb >> 8) & 0xff) &&
            (mine.pixels(o + 2) & 0xff) === (argb & 0xff),
            s"${f.getName} pixel ($x,$y)")
        } else { // transparent: our canvas shows initial black
          assert(mine.pixels(o) === 0 && mine.pixels(o + 1) === 0 &&
            mine.pixels(o + 2) === 0, s"${f.getName} transparent ($x,$y)")
        }
      }
    }
  }

  test("disposal 2 restores background and disposal 3 restores previous") {
    // encode three full-canvas frames then PATCH each frame's
    // graphic-control disposal bits: the decoder must compose
    // accordingly. Frames: A=10s, B=20s, C=30s over a 2x1 canvas,
    // where B paints only... full-canvas frames make disposal visible
    // via a TRANSPARENT pixel in the next frame, so give C a
    // transparent index at position 0: with B disposed to background
    // (2), C shows background there; with disposal 3, C shows A's
    // pixel.
    val pal = grayPalette
    def build(disposalB: Int): Array[Byte] = {
      val base = Gif.encode(2, 1, pal, Seq(
        (Array[Byte](10, 11), 1),
        (Array[Byte](20, 21), 1),
        (Array[Byte](40, 41), 1)))
      // locate the GCEs: header 13 + GCT 768, then per frame:
      // GCE (8 bytes: 21 F9 04 flags delay2 tIdx 00) + descriptor...
      val out = base.clone()
      var pos = 13 + 768
      var frame = 0
      while (pos < out.length - 1 && frame < 3) {
        if ((out(pos) & 0xff) == 0x21 && (out(pos + 1) & 0xff) == 0xf9) {
          if (frame == 1) // frame B's disposal
            out(pos + 3) = ((disposalB & 7) << 2).toByte
          if (frame == 2) { // frame C: transparency on index 40
            out(pos + 3) = (out(pos + 3) | 1).toByte
            out(pos + 6) = 40
          }
          frame += 1
          pos += 8
        } else pos += 1
      }
      require(frame == 3, "did not find all GCEs")
      out
    }
    // disposal 2 on B: before C, the canvas resets to the background
    // color (GCT entry 0 = black); C's transparent pixel 0 shows it
    val d2 = Gif.decode(build(2))
    assert(d2.length === 3)
    assert(d2(1).image.pixels.toSeq.take(3) === Seq[Byte](20, 20, 20))
    assert(d2(2).image.pixels.toSeq === Seq[Byte](0, 0, 0, 41, 41, 41))
    // disposal 3 on B: before C, the canvas reverts to frame A;
    // C's transparent pixel 0 shows A's 10
    val d3 = Gif.decode(build(3))
    assert(d3(2).image.pixels.toSeq === Seq[Byte](10, 10, 10, 41, 41, 41))
    // disposal 0 (unpatched flags on B stay 0 with transparency only
    // patched on C): C's transparent pixel shows B's 20
    val d0 = Gif.decode(build(0))
    assert(d0(2).image.pixels.toSeq === Seq[Byte](20, 20, 20, 41, 41, 41))
  }

  test("survives 400 hostile mutations") {
    val rnd = new scala.util.Random(77)
    val base = Gif.encode(16, 16, grayPalette,
      Seq((Array.tabulate(256)(i => i.toByte), 5)))
    var rejected = 0
    for (i <- 0 until 400) {
      val b =
        if (i % 4 == 3) base.take(rnd.nextInt(base.length))
        else {
          val c = base.clone()
          for (_ <- 0 to rnd.nextInt(8))
            c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
          c
        }
      try Gif.decode(b)
      catch { case scala.util.control.NonFatal(_) => rejected += 1 }
    }
    assert(rejected > 0)
  }

  test("non-GIF bytes are rejected loudly") {
    intercept[IllegalArgumentException](Gif.decode("not a gif!!".getBytes))
    intercept[IllegalArgumentException](Gif.decode(Array[Byte](1, 2, 3)))
  }
}
