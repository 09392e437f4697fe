package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off generator for the `mm_jpeg_decode` golden fixture
  * (`src/test/resources/fixtures/jpeg_expected.parquet`) — VERDICT r9
  * next #2a: the driver's DuckDB oracle reads this parquet, so the
  * per-round gate does a FULL-VALUE compare of the live decode against
  * values pinned here.
  *
  * The fixture rows are the `mm_jpeg_decode` query's own output (the
  * only bit-exact definition available: ITU-T T.81 leaves IDCT
  * rounding implementation-defined, so independent decoders disagree
  * at the LSB level by design). Correctness — not just stability — is
  * enforced at generation time: every decodable file is cross-checked
  * against the JDK's independent ImageIO decoder (dims + channels
  * exact, mean per-sample |diff| ≤ 3.0, the same criterion `JpegSpec`
  * applies on every test run), and the planted non-image must come
  * back undecoded. Regenerate only after a deliberate decoder change:
  *
  *   sbt "runMain graft.tools.GenJpegFixture"
  */
object GenJpegFixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // independent-decoder cross-check before anything is written
    val dirs = Seq(
      "/opt/spark/data/mllib/images/origin/kittens",
      "/opt/spark/data/mllib/images/origin/multi-channel")
    var checked = 0
    var undecodable = 0
    dirs.foreach { d =>
      new java.io.File(d).listFiles().sortBy(_.getName).foreach { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        // same mixed-format magic dispatch as the query's
        // tryDecodeImage (the multi-channel dir plants PNGs next to
        // the JPEGs)
        val mine =
          try Some {
            if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
                (bytes(1) & 0xff) == 0xd8) graft.io.Jpeg.decode(bytes)
            else graft.io.Png.decode(bytes)
          } catch { case scala.util.control.NonFatal(_) => None }
        val ref = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        (mine, Option(ref)) match {
          case (Some(m), Some(r)) =>
            require(m.width == r.getWidth && m.height == r.getHeight,
              s"${f.getName}: dims ${m.width}x${m.height} vs " +
                s"${r.getWidth}x${r.getHeight}")
            var sum = 0L; var n = 0L
            // grayscale goes through the raster: getRGB would apply
            // the JDK's gray→sRGB colorspace conversion and shift
            // every value (the JpegSpec.imageIoPixels convention)
            val raster = r.getRaster
            var y = 0
            while (y < m.height) {
              var x = 0
              while (x < m.width) {
                val refPx =
                  if (m.channels == 1) Array(raster.getSample(x, y, 0))
                  else {
                    val rgb = r.getRGB(x, y) // ARGB packed
                    m.channels match {
                      case 3 => Array((rgb >> 16) & 0xff,
                        (rgb >> 8) & 0xff, rgb & 0xff)
                      case 4 => Array((rgb >> 16) & 0xff,
                        (rgb >> 8) & 0xff, rgb & 0xff,
                        (rgb >>> 24) & 0xff) // ours is RGBA
                      case c => sys.error(s"${f.getName}: channels $c")
                    }
                  }
                var c = 0
                while (c < m.channels) {
                  val mv = m.pixels((y * m.width + x) * m.channels + c) & 0xff
                  sum += math.abs(mv - refPx(c)); n += 1
                  c += 1
                }
                x += 1
              }
              y += 1
            }
            val mean = sum.toDouble / n
            // lossless formats (PNG) must be exact; lossy (JPEG) gets
            // the IDCT tolerance JpegSpec applies
            val isPng = f.getName.toLowerCase.endsWith(".png")
            require(if (isPng) sum == 0L else mean <= 3.0,
              s"${f.getName}: mean |diff| $mean vs ImageIO (sum=$sum)")
            checked += 1
          case (None, None) => undecodable += 1 // planted non-image
          case (m, r) => sys.error(
            s"${f.getName}: decoders disagree on decodability " +
              s"(ours=${m.isDefined}, ImageIO=${r.isDefined})")
        }
      }
    }
    require(checked >= 4, s"only $checked files cross-checked")
    println(s"[gen-jpeg-fixture] ImageIO cross-check: $checked decoded " +
      s"files within tolerance, $undecodable undecodable")

    val out = "src/test/resources/fixtures/jpeg_expected.parquet"
    val tmp = java.nio.file.Files.createTempDirectory("jpeg_fixture")
    graft.queries.MultimodalQueries.qMmJpegDecode(spark, "")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    new java.io.File(out).getParentFile.mkdirs()
    java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(out),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"[gen-jpeg-fixture] wrote $out (${part.length()} bytes)")
    spark.stop()
  }
}
