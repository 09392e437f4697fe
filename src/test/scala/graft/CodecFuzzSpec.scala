package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Hdf5, Jpeg, NetCdf, Png, Sqlite, Wav, Zarr}

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

  // ---- container formats (path-based readers): a hostile file in a
  // mixed grid directory must reject catchably, never hang the scan
  // task, recurse to StackOverflowError, or OOM from a crafted
  // header-claimed size (allocation guards added in round 10)

  private def runFileFuzz(name: String, base: Array[Byte],
      decode: String => Any, rounds: Int = 300): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"fuzz_$name")
    val p = dir.resolve(s"f.$name")
    var decoded = 0; var rejected = 0
    for (i <- 0 until rounds) {
      val mutated =
        if (i % 4 == 3) {
          if (i % 8 == 3) base.take(rnd.nextInt(base.length))
          else Array.fill(rnd.nextInt(300) + 1)(rnd.nextInt(256).toByte)
        } else mutate(base, 1 + rnd.nextInt(8))
      java.nio.file.Files.write(p, mutated)
      try { decode(p.toString); decoded += 1 }
      catch { case scala.util.control.NonFatal(_) => rejected += 1 }
    }
    assert(decoded + rejected == rounds)
    assert(rejected > 0, s"$name: no mutation was ever rejected?")
  }

  private def ncBase(write: (String, Seq[NetCdf.Dim], Seq[NetCdf.Var]) => Unit): Array[Byte] = {
    val dir = java.nio.file.Files.createTempDirectory("fuzzbase")
    val p = dir.resolve("base").toString
    val dims = Seq(NetCdf.Dim("t", 3), NetCdf.Dim("y", 4), NetCdf.Dim("x", 5))
    val vars = Seq(
      NetCdf.Var("x", Seq(2), NetCdf.NcDouble, Seq("units" -> "m"),
        Array.tabulate(5)(_.toDouble)),
      NetCdf.Var("v", Seq(0, 1, 2), NetCdf.NcDouble, Nil,
        Array.tabulate(60)(i => i / 3.0)))
    write(p, dims, vars)
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
  }

  test("NetCDF-3 survives 300 hostile mutations") {
    runFileFuzz("nc", ncBase((p, d, v) => NetCdf.write(p, d, Nil, v)),
      p => NetCdf.read(p))
  }

  test("HDF5 survives 300 hostile mutations") {
    runFileFuzz("h5",
      ncBase((p, d, v) => Hdf5.write(p, d, Nil, v, chunkDeflate = true)),
      Hdf5.read)
  }

  test("HDF5 attribute claiming a crafted giant shape rejects, never allocates") {
    // regression for the intermittent full-suite abort: a mutated
    // attribute DATASPACE claimed a multi-GB element count and the
    // unguarded allocation died with a FATAL OutOfMemoryError on a
    // loaded JVM (catchable reject on an idle one — which is why the
    // fuzz only tripped it intermittently). The attribute value is
    // inline, so its element count is bounded by the message bytes.
    val dir = java.nio.file.Files.createTempDirectory("h5_giant_attr")
    val p = dir.resolve("g.h5").toString
    val dims = Seq(NetCdf.Dim("t", 5))
    Hdf5.write(p, dims, Nil, Seq(
      NetCdf.Var("t", Seq(0), NetCdf.NcDouble, Nil, Array.tabulate(5)(_ * 1.0)),
      NetCdf.Var("v", Seq(0), NetCdf.NcDouble, Nil, Array.tabulate(5)(_ * 2.0))))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // v's DIMENSION_LIST dataspace is dsSimple(Seq(1)): ver 1, rank 1,
    // flags 0, 5 reserved zeros, then dim = 1 as LE u64 — the only
    // 16-byte occurrence of that pattern with dim 1 in this file
    val pat = Array[Byte](1, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0)
    val hits = (0 to bytes.length - 16).filter(i =>
      pat.indices.forall(k => bytes(i + k) == pat(k)))
    assert(hits.size == 1, s"expected one dsSimple(1) site, got ${hits.size}")
    // claim 2^30 elements (x16-byte descriptors = a 16 GB allocation)
    val b = java.nio.ByteBuffer.wrap(bytes, hits.head + 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(1L << 30)
    java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes)
    val e = intercept[IllegalArgumentException](Hdf5.read(p))
    assert(e.getMessage.contains("claims"), e.getMessage)
  }

  test("HDF5 attribute shape whose product wraps Long rejects, not a tiny read") {
    // 2^33 x 2^31 = 2^64 wraps a plain Long product to 0 -> "1
    // element": the old bound then read the corrupted attribute as a
    // single element instead of rejecting. 2^33 x 2^33 = 2^66 likewise
    // wraps (to 0 too, but any wrap is hostile). Both must reject
    // loudly via the overflow-checked product.
    for (shape <- Seq(Seq(1L << 33, 1L << 31), Seq(1L << 33, 1L << 33))) {
      val e = intercept[IllegalArgumentException](
        Hdf5.checkedAttrElems("a", shape, avail = 64, elemSize = 8))
      assert(e.getMessage.contains("claims"), e.getMessage)
    }
    // negative dims (a high-bit u64 read as signed) do NOT overflow
    // multiplyExact — they must reject on sign, not collapse to a
    // 1-element read through `max 1L`
    for (shape <- Seq(Seq(Long.MinValue), Seq(-3L, 5L))) {
      val e = intercept[IllegalArgumentException](
        Hdf5.checkedAttrElems("a", shape, avail = 64, elemSize = 8))
      assert(e.getMessage.contains("negative"), e.getMessage)
    }
    // sane shapes still pass and multiply correctly
    assert(Hdf5.checkedAttrElems("a", Seq(2L, 3L), avail = 64, elemSize = 8) == 6)
  }

  test("HDF5 unknown-filter raise names the well-known filter (szip)") {
    // byte-surgery the deflate pipeline entry's id (1) into szip (4):
    // the raise must tell the user WHICH registered compressor their
    // file needs, not a bare number
    val dir = java.nio.file.Files.createTempDirectory("h5_szip")
    val p = dir.resolve("s.h5").toString
    Hdf5.write(p, Seq(NetCdf.Dim("t", 5)), Nil, Seq(
      NetCdf.Var("t", Seq(0), NetCdf.NcDouble, Nil, Array.tabulate(5)(_ * 1.0)),
      NetCdf.Var("v", Seq(0), NetCdf.NcDouble, Nil, Array.tabulate(5)(_ * 2.0))),
      chunkDeflate = true)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // the deflate entry in the v1 filter pipeline message: id=1,
    // namelen=0, flags=0, nvals=1, cd[0]=6 (the writer's level), pad
    val pat = Array[Byte](1, 0, 0, 0, 0, 0, 1, 0, 6, 0, 0, 0, 0, 0, 0, 0)
    val hits = (0 to bytes.length - 16).filter(i =>
      pat.indices.forall(k => bytes(i + k) == pat(k)))
    assert(hits.nonEmpty, "deflate pipeline entry not found")
    hits.foreach(i => bytes(i) = 4) // szip
    java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes)
    val e = intercept[IllegalArgumentException](Hdf5.read(p))
    assert(e.getMessage.contains("szip"), e.getMessage)
  }

  test("HDF5 with vlen-string attrs survives 300 hostile mutations") {
    // mutations hit the vlen descriptors and the GCOL string payloads:
    // the reader must reject or decode, never overrun the collection
    // or loop past a corrupted free-space object
    runFileFuzz("h5v",
      ncBase((p, d, v) => Hdf5.write(p, d, Seq("title" -> "fuzz"), v,
        vlenStringAttrs = true)),
      Hdf5.read)
  }

  test("SQLite survives 300 hostile mutations") {
    val dir = java.nio.file.Files.createTempDirectory("fuzzbase_db")
    val p = dir.resolve("base.db").toString
    // blob sizes include overflow-chained payloads (4 KB–20 KB) so the
    // mutations also hit chain pointers, chunk boundaries, and the
    // local/overflow split — the writer path added for >4 KB WKB
    val rows = (1L to 40L).map(i => i -> Seq[Sqlite.SqlValue](
      Sqlite.SqlInt(i), Sqlite.SqlText("row" + i),
      Sqlite.SqlBlob(Array.fill(
        if (i % 10 == 0) 20000 else if (i % 5 == 0) 5000 else 64
      )((i % 256).toByte))))
    Sqlite.write(p, Seq(Sqlite.TableDef("t", "CREATE TABLE t (a, b, c)", rows)))
    runFileFuzz("db",
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      path => Sqlite.readTable(path, "t"))
  }

  test("WARC survives 300 hostile mutations (raw stream)") {
    // build a small valid uncompressed WARC stream via the writer's
    // record layout, then mutate; the reader must reject or parse —
    // never loop on a backward cursor or alloc a crafted length
    val rec = (i: Int) =>
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/$i\r\n" +
        s"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: 11\r\n\r\n" +
        "hello world\r\n\r\n").getBytes("UTF-8")
    val base = (0 until 5).flatMap(i => rec(i).toSeq).toArray
    var decoded = 0; var rejected = 0
    for (i <- 0 until 300) {
      val mutated =
        if (i % 4 == 3) base.take(rnd.nextInt(base.length))
        else mutate(base, 1 + rnd.nextInt(8))
      try {
        graft.io.Warc.records(
          new java.io.ByteArrayInputStream(mutated), gzipped = false,
          label = "fuzz").foreach(_ => ())
        decoded += 1
      } catch { case scala.util.control.NonFatal(_) => rejected += 1 }
    }
    assert(decoded + rejected == 300)
    assert(rejected > 0, "warc: no mutation was ever rejected?")
  }

  test("Shapefile survives 300 hostile mutations (.shp and .dbf)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("fuzz_shp")
    val basePath = dir.resolve("layer").toString
    val df = spark.range(6).select(col("id"),
      graft.geom.st.makeBox(col("id").cast("double"), lit(0.0),
        col("id").cast("double") + lit(1.0), lit(1.0)).as("geom"))
    graft.io.Shapefile.write(df, "geom", basePath)
    val shp = java.nio.file.Paths.get(basePath + ".shp")
    val dbf = java.nio.file.Paths.get(basePath + ".dbf")
    val origShp = java.nio.file.Files.readAllBytes(shp)
    val origDbf = java.nio.file.Files.readAllBytes(dbf)
    var decoded = 0; var rejected = 0
    for (i <- 0 until 300) {
      val (victim, orig) = if (i % 2 == 0) (shp, origShp) else (dbf, origDbf)
      val mutated =
        if (i % 4 == 3) orig.take(rnd.nextInt(orig.length))
        else mutate(orig, 1 + rnd.nextInt(8))
      java.nio.file.Files.write(victim, mutated)
      try {
        graft.io.Shapefile.read(spark, basePath).collect()
        decoded += 1
      } catch { case scala.util.control.NonFatal(_) => rejected += 1 }
      finally java.nio.file.Files.write(victim, orig)
    }
    assert(decoded + rejected == 300)
    assert(rejected > 0, "shp: no mutation was ever rejected?")
  }

  test("Zarr chunk + metadata survive 300 hostile mutations") {
    // mutate BOTH the .zarray JSON (crafted shapes/dtypes) and the
    // compressed chunk files (stalls, truncations, bombs)
    val dir = java.nio.file.Files.createTempDirectory("fuzz_zarr")
    val p = dir.resolve("store").toString
    val dims = Seq(NetCdf.Dim("t", 3), NetCdf.Dim("y", 4), NetCdf.Dim("x", 5))
    val vars = Seq(NetCdf.Var("v", Seq(0, 1, 2), NetCdf.NcDouble, Nil,
      Array.tabulate(60)(i => i / 3.0)))
    Zarr.write(p, dims, Nil, vars, compress = true, chunk0 = 2)
    val store = java.nio.file.Paths.get(p)
    val targets = java.nio.file.Files.walk(store).iterator()
    val files = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    while (targets.hasNext) {
      val f = targets.next()
      if (java.nio.file.Files.isRegularFile(f)) files += f
    }
    var decoded = 0; var rejected = 0
    for (i <- 0 until 300) {
      val victim = files(rnd.nextInt(files.length))
      val orig = java.nio.file.Files.readAllBytes(victim)
      val mutated =
        if (orig.length == 0) Array.fill(8)(rnd.nextInt(256).toByte)
        else if (i % 4 == 3) orig.take(rnd.nextInt(orig.length))
        else mutate(orig, 1 + rnd.nextInt(6))
      java.nio.file.Files.write(victim, mutated)
      try { Zarr.read(p); decoded += 1 }
      catch { case scala.util.control.NonFatal(_) => rejected += 1 }
      finally java.nio.file.Files.write(victim, orig) // restore
    }
    assert(decoded + rejected == 300)
    assert(rejected > 0, "zarr: no mutation was ever rejected?")
  }

  test("Zarr v3 store survives 300 hostile mutations (zarr.json + zstd chunks)") {
    val dir = java.nio.file.Files.createTempDirectory("fuzz_zarr3")
    val p = dir.resolve("store").toString
    val dims = Seq(NetCdf.Dim("t", 3), NetCdf.Dim("y", 4), NetCdf.Dim("x", 5))
    val vars = Seq(NetCdf.Var("v", Seq(0, 1, 2), NetCdf.NcDouble, Nil,
      Array.tabulate(60)(i => i / 3.0)))
    Zarr.write3(p, dims, Nil, vars, chunk0 = 2)
    val store = java.nio.file.Paths.get(p)
    val targets = java.nio.file.Files.walk(store).iterator()
    val files = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    while (targets.hasNext) {
      val f = targets.next()
      if (java.nio.file.Files.isRegularFile(f)) files += f
    }
    var decoded = 0; var rejected = 0
    for (i <- 0 until 300) {
      val victim = files(rnd.nextInt(files.length))
      val orig = java.nio.file.Files.readAllBytes(victim)
      val mutated =
        if (orig.length == 0) Array.fill(8)(rnd.nextInt(256).toByte)
        else if (i % 4 == 3) orig.take(rnd.nextInt(orig.length))
        else mutate(orig, 1 + rnd.nextInt(6))
      java.nio.file.Files.write(victim, mutated)
      try { Zarr.read(p); decoded += 1 }
      catch { case scala.util.control.NonFatal(_) => rejected += 1 }
      finally java.nio.file.Files.write(victim, orig) // restore
    }
    assert(decoded + rejected == 300)
    assert(rejected > 0, "zarr v3: no mutation was ever rejected?")
  }
}
