package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Jpeg

/** The from-scratch baseline JPEG decoder, cross-checked against the
  * JDK's ImageIO (an independent libjpeg-lineage implementation).
  * Exact pixel equality is NOT the contract — JPEG decoding is not
  * bit-exact standardized (integer-approximation IDCTs, triangle vs
  * box chroma upsampling) — so the assertions are dimensional
  * exactness plus tight numeric tolerances. */
class JpegSpec extends AnyFunSuite {

  private def imageIoPixels(bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    val gray = img.getColorModel.getNumComponents == 1
    if (gray) {
      val px = new Array[Int](w * h)
      val r = img.getRaster
      for (y <- 0 until h; x <- 0 until w) px(y * w + x) = r.getSample(x, y, 0)
      (w, h, 1, px)
    } else {
      val px = new Array[Int](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        px((y * w + x) * 3) = (rgb >> 16) & 0xff
        px((y * w + x) * 3 + 1) = (rgb >> 8) & 0xff
        px((y * w + x) * 3 + 2) = rgb & 0xff
      }
      (w, h, 3, px)
    }
  }

  private def diffStats(a: Array[Int], b: Array[Byte]): (Double, Int) = {
    require(a.length == b.length, s"${a.length} vs ${b.length}")
    var sum = 0L; var mx = 0
    var i = 0
    while (i < a.length) {
      val d = math.abs(a(i) - (b(i) & 0xff))
      sum += d; if (d > mx) mx = d
      i += 1
    }
    (sum.toDouble / a.length, mx)
  }

  test("grayscale baseline JPEG (ImageIO-written) decodes within IDCT tolerance") {
    // no chroma: the ONLY sanctioned divergence is the IDCT rounding
    val w = 97; val h = 61
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(11)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0,
        (x * 2 + y + rnd.nextInt(32)) % 256)
    val baos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val bytes = baos.toByteArray
    val mine = Jpeg.decode(bytes)
    val (rw, rh, rc, ref) = imageIoPixels(bytes)
    assert(mine.width === rw && mine.height === rh && mine.channels === rc)
    val (mean, mx) = diffStats(ref, mine.pixels)
    assert(mx <= 2, s"max |diff| $mx > 2 (mean $mean)")
  }

  test("color baseline JPEG (ImageIO-written) decodes within upsampling tolerance") {
    val w = 120; val h = 80
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      // smooth gradients: keeps chroma edges mild so triangle-vs-box
      // upsampling differences stay bounded
      val r = (x * 255) / w; val g = (y * 255) / h; val b = ((x + y) * 255) / (w + h)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val baos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val bytes = baos.toByteArray
    val mine = Jpeg.decode(bytes)
    val (rw, rh, rc, ref) = imageIoPixels(bytes)
    assert(mine.width === rw && mine.height === rh && mine.channels === rc)
    val (mean, mx) = diffStats(ref, mine.pixels)
    assert(mean <= 2.0, s"mean |diff| $mean > 2.0 (max $mx)")
    assert(mx <= 32, s"max |diff| $mx > 32")
  }

  test("decodes REAL camera JPEGs (Spark mllib kittens, 4:2:0) close to ImageIO") {
    val dir = new java.io.File(
      "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens")
    assume(dir.isDirectory, s"$dir not present")
    val files = dir.listFiles().filter(_.getName.endsWith(".jpg")).sortBy(_.getName)
    assert(files.nonEmpty)
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val mine = Jpeg.decode(bytes)
      val (rw, rh, rc, ref) = imageIoPixels(bytes)
      assert(mine.width === rw && mine.height === rh && mine.channels === rc,
        f.getName)
      val (mean, mx) = diffStats(ref, mine.pixels)
      // real photos have sharp chroma edges where triangle-vs-box
      // upsampling legitimately differs; the MEAN pins correctness
      assert(mean <= 3.0, s"${f.getName}: mean |diff| $mean > 3.0 (max $mx)")
    }
  }

  test("decodes PROGRESSIVE JPEGs (SOF2 multi-scan) close to ImageIO") {
    // real progressive fixtures: a grayscale photo (DC+AC band scans
    // with successive approximation) and two 4:4:4 color files
    val files = Seq(
      "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/multi-channel/grayscale.jpg",
      "/usr/share/doc/nodejs/thin-white-stripe.jpg",
      "/usr/share/doc/nodejs/full-white-stripe.jpg")
      .map(new java.io.File(_)).filter(_.isFile)
    assume(files.nonEmpty, "no progressive fixtures present")
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val mine = Jpeg.decode(bytes)
      val (rw, rh, rc, ref) = imageIoPixels(bytes)
      assert(mine.width === rw && mine.height === rh && mine.channels === rc,
        f.getName)
      val (mean, mx) = diffStats(ref, mine.pixels)
      assert(mean <= 3.0, s"${f.getName}: mean |diff| $mean > 3.0 (max $mx)")
    }
  }

  test("non-JPEG bytes and truncation are rejected loudly") {
    intercept[IllegalArgumentException](Jpeg.decode("definitely not".getBytes))
    val ok = { // truncation of a valid stream
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY)
      val baos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    intercept[IllegalArgumentException](Jpeg.decode(ok.take(ok.length / 3)))
  }
}
