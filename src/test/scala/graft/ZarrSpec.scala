package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{NetCdf, Zarr}

class ZarrSpec extends AnyFunSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("zarr_spec").resolve("g.zarr").toString

  test("3-D double roundtrip, chunked along time, zlib") {
    val (nt, ny, nx) = (7, 4, 5)
    val dims = Seq(NetCdf.Dim("time", nt), NetCdf.Dim("y", ny), NetCdf.Dim("x", nx))
    val data = Array.tabulate(nt * ny * nx)(i => i * 0.25)
    val vars = Seq(
      NetCdf.Var("time", Seq(0), NetCdf.NcDouble, Nil,
        Array.tabulate(nt)(_ * 3600.0)),
      NetCdf.Var("t2", Seq(0, 1, 2), NetCdf.NcDouble,
        Seq("units" -> "K"), data))
    val dir = tmp()
    // chunk0 = 3 -> chunks of 3/3/1 along time (edge chunk padded)
    Zarr.write(dir, dims, Seq("title" -> "zarr roundtrip"), vars, chunk0 = 3)
    assert(Zarr.isZarr(dir))
    val back = Zarr.read(dir)
    assert(back.dims === dims)
    assert(back.globalAttrs === Seq("title" -> "zarr roundtrip"))
    // consolidated metadata mirrors every store key (xarray's default
    // open_zarr path reads this single file)
    val zm = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir).resolve(".zmetadata")), "UTF-8")
    val zmNode = new com.fasterxml.jackson.databind.ObjectMapper().readTree(zm)
    assert(zmNode.get("zarr_consolidated_format").asInt() == 1)
    val md = zmNode.get("metadata")
    for (key <- Seq(".zgroup", ".zattrs", "t2/.zarray", "t2/.zattrs")) {
      val direct = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(dir).resolve(key)))
      assert(md.get(key) == direct, s"consolidated $key diverges")
    }
    val t2 = back.variable("t2")
    assert(t2.dimIds === Seq(0, 1, 2))
    assert(t2.attrs === Seq("units" -> "K"))
    assert(t2.data.asInstanceOf[Array[Double]].toSeq === data.toSeq)
    assert(back.variable("time").data.asInstanceOf[Array[Double]].toSeq ===
      (0 until nt).map(_ * 3600.0))
  }

  test("blosc(lz4)+shuffle store roundtrips — numcodecs' default framing") {
    val (nt, ny, nx) = (11, 3, 4)
    val dims = Seq(NetCdf.Dim("time", nt), NetCdf.Dim("y", ny), NetCdf.Dim("x", nx))
    val data = Array.tabulate(nt * ny * nx)(i => math.sin(i * 0.1) * 50)
    val vars = Seq(
      NetCdf.Var("time", Seq(0), NetCdf.NcDouble, Nil,
        Array.tabulate(nt)(_ * 3600.0)),
      NetCdf.Var("t2", Seq(0, 1, 2), NetCdf.NcFloat,
        Seq("units" -> "K"), data.map(_.toFloat)))
    val dir = tmp()
    Zarr.write(dir, dims, Nil, vars, chunk0 = 4, codec = "blosc")
    val za = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir).resolve("t2").resolve(".zarray")), "UTF-8")
    assert(za.contains("\"id\": \"blosc\"") && za.contains("\"cname\": \"lz4\""))
    val back = Zarr.read(dir)
    assert(back.variable("t2").data.asInstanceOf[Array[Float]].toSeq ===
      data.map(_.toFloat).toSeq)
    assert(back.variable("time").data.asInstanceOf[Array[Double]].toSeq ===
      (0 until nt).map(_ * 3600.0))
    // chunk-level path (the distributed scan's unit) decodes too
    val am = Zarr.meta(dir).array("t2")
    assert(am.codec == "blosc" && am.nChunks == Seq(3, 1, 1))
    val c0 = Zarr.readChunkDouble(dir, am, Seq(0, 0, 0))
    assert(c0.take(12).toSeq == data.take(12).map(_.toFloat.toDouble).toSeq)
  }

  test("non-default .zarray fill_value masks PRESENT-chunk sentinels (xarray encoding)") {
    // xarray moves _FillValue into the zarr encoding: .zattrs has no
    // _FillValue, .zarray carries fill_value = sentinel. Values equal
    // to the sentinel INSIDE present chunks must mask to NaN.
    import java.nio.file.{Files, Paths}
    val dims = Seq(NetCdf.Dim("t", 4))
    val vars = Seq(NetCdf.Var("v", Seq(0), NetCdf.NcDouble, Nil,
      Array(1.0, -999.0, 3.0, -999.0)))
    val dir = tmp()
    Zarr.write(dir, dims, Nil, vars, compress = false)
    val za = Paths.get(dir).resolve("v").resolve(".zarray")
    Files.write(za, new String(Files.readAllBytes(za), "UTF-8")
      .replace("\"fill_value\": 0", "\"fill_value\": -999.0").getBytes("UTF-8"))
    val d = Zarr.read(dir).variable("v").data.asInstanceOf[Array[Double]]
    assert(d(0) == 1.0 && d(1).isNaN && d(2) == 3.0 && d(3).isNaN)
    // raw view keeps the sentinel; the promoted attr is visible
    val rawV = Zarr.read(dir, maskAndScale = false).variable("v")
    assert(rawV.data.asInstanceOf[Array[Double]].toSeq ==
      Seq(1.0, -999.0, 3.0, -999.0))
    assert(rawV.numAttrs.toMap.get("_FillValue").contains(-999.0))
  }

  test("zarr v2 dimension_separator '/' reads nested chunk dirs, not silent fill") {
    import java.nio.file.{Files, Paths}
    val dims = Seq(NetCdf.Dim("t", 4), NetCdf.Dim("x", 2))
    val data = Array.tabulate(8)(_ + 1.0)
    val dir = tmp()
    Zarr.write(dir, dims, Nil,
      Seq(NetCdf.Var("v", Seq(0, 1), NetCdf.NcDouble, Nil, data)),
      chunk0 = 2, compress = false)
    // convert the store to nested layout by hand: 0.0 -> 0/0, 1.0 -> 1/0
    val vdir = Paths.get(dir).resolve("v")
    for (i <- 0 until 2) {
      Files.createDirectories(vdir.resolve(i.toString))
      Files.move(vdir.resolve(s"$i.0"), vdir.resolve(s"$i/0"))
    }
    val za = vdir.resolve(".zarray")
    Files.write(za, new String(Files.readAllBytes(za), "UTF-8")
      .replace("\"order\": \"C\"",
        "\"dimension_separator\": \"/\", \"order\": \"C\"").getBytes("UTF-8"))
    // a reader that ignored the separator would see every chunk as
    // MISSING and return all-fill — silent wrong data, the worst kind
    val v = Zarr.read(dir).variable("v").data.asInstanceOf[Array[Double]]
    assert(v.toSeq == data.toSeq)
    // unknown separators raise
    Files.write(za, new String(Files.readAllBytes(za), "UTF-8")
      .replace("\"dimension_separator\": \"/\"",
        "\"dimension_separator\": \"|\"").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](Zarr.meta(dir))
    assert(e.getMessage.contains("dimension_separator"))
  }

  test("zarr v3 store roundtrips (zarr.json, c/-keys, bytes+zstd — zarr-python 3's default)") {
    val (nt, ny, nx) = (7, 3, 4)
    val dims = Seq(NetCdf.Dim("time", nt), NetCdf.Dim("y", ny), NetCdf.Dim("x", nx))
    val data = Array.tabulate(nt * ny * nx)(i => i * 0.25 - 10)
    val vars = Seq(
      NetCdf.Var("time", Seq(0), NetCdf.NcDouble, Nil,
        Array.tabulate(nt)(_ * 3600.0)),
      NetCdf.Var("t2", Seq(0, 1, 2), NetCdf.NcDouble,
        Seq("units" -> "K"), data))
    val dir = tmp()
    Zarr.write3(dir, dims, Seq("title" -> "v3 roundtrip"), vars, chunk0 = 3)
    assert(Zarr.isZarr(dir))
    // chunk files live under the default c/-prefixed nested keys
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir).resolve("t2").resolve("c/0/0/0")))
    val back = Zarr.read(dir)
    assert(back.dims === dims)
    assert(back.globalAttrs === Seq("title" -> "v3 roundtrip"))
    val t2 = back.variable("t2")
    assert(t2.dimIds === Seq(0, 1, 2)) // dimension_names resolved
    assert(t2.attrs === Seq("units" -> "K"))
    assert(t2.data.asInstanceOf[Array[Double]].toSeq === data.toSeq)
    // per-chunk scan path decodes the zstd chain too
    val am = Zarr.meta(dir).array("t2")
    assert(am.codec == "zstd" && am.keyPrefixC && am.keySep == "/")
    assert(Zarr.readChunkDouble(dir, am, Seq(1, 0, 0)).take(12).toSeq ===
      data.slice(36, 48).toSeq)
  }

  test("zarr v3: every dtype, raw codec, missing chunk fill, CF packing") {
    import java.nio.file.{Files, Paths}
    val dims = Seq(NetCdf.Dim("n", 6))
    val vars = Seq(
      NetCdf.Var("d", Seq(0), NetCdf.NcDouble, Nil, Array.tabulate(6)(_ * 1.5)),
      NetCdf.Var("f", Seq(0), NetCdf.NcFloat, Nil, Array.tabulate(6)(_ * 0.5f)),
      NetCdf.Var("i", Seq(0), NetCdf.NcInt, Nil, Array.tabulate(6)(_ * 3)),
      NetCdf.Var("l", Seq(0), NetCdf.NcInt64, Nil,
        Array.tabulate(6)(_ * 1000000007L)),
      NetCdf.Var("s", Seq(0), NetCdf.NcShort, Nil, Array.tabulate(6)(_ - 3)),
      NetCdf.Var("b", Seq(0), NetCdf.NcByte, Nil,
        Array.tabulate(6)(i => (i - 2).toByte)))
    val dir = tmp()
    Zarr.write3(dir, dims, Nil, vars, codec = "raw")
    val back = Zarr.read(dir)
    assert(back.variable("d").data.asInstanceOf[Array[Double]].toSeq ===
      Seq(0.0, 1.5, 3.0, 4.5, 6.0, 7.5))
    assert(back.variable("l").data.asInstanceOf[Array[Long]].toSeq ===
      (0 until 6).map(_ * 1000000007L))
    assert(back.variable("s").data.asInstanceOf[Array[Int]].toSeq ===
      Seq(-3, -2, -1, 0, 1, 2))
    // missing chunk -> typed fill_value; non-default fill promotes to
    // the CF mask exactly as in v2
    val dir2 = tmp()
    Zarr.write3(dir2, Seq(NetCdf.Dim("t", 4)), Nil,
      Seq(NetCdf.Var("v", Seq(0), NetCdf.NcDouble, Nil,
        Array(1.0, 2.0, 3.0, 4.0))), chunk0 = 2)
    val vdir = Paths.get(dir2).resolve("v")
    Files.delete(vdir.resolve("c/1"))
    val zj = vdir.resolve("zarr.json")
    Files.write(zj, new String(Files.readAllBytes(zj), "UTF-8")
      .replace("\"fill_value\": 0", "\"fill_value\": -999.5").getBytes("UTF-8"))
    val v = Zarr.read(dir2).variable("v").data.asInstanceOf[Array[Double]]
    assert(v(0) == 1.0 && v(1) == 2.0 && v(2).isNaN && v(3).isNaN)
    val raw = Zarr.read(dir2, maskAndScale = false).variable("v")
      .data.asInstanceOf[Array[Double]]
    assert(raw.toSeq == Seq(1.0, 2.0, -999.5, -999.5))
    // CF packed ints decode through numeric attributes
    val dir3 = tmp()
    Zarr.write3(dir3, Seq(NetCdf.Dim("t", 2)), Nil,
      Seq(NetCdf.Var("p", Seq(0), NetCdf.NcInt, Nil, Array(100, -1),
        Seq("scale_factor" -> 0.01, "add_offset" -> 5.0,
          "_FillValue" -> -1.0))), codec = "raw")
    val p = Zarr.read(dir3).variable("p").data.asInstanceOf[Array[Double]]
    assert(p(0) == 6.0 && p(1).isNaN)
  }

  test("zarr v3: v2-style chunk keys and gzip chains read; exotic chains raise") {
    import java.nio.file.{Files, Paths}
    // hand-build a v3 array with chunk_key_encoding v2 + gzip codec —
    // neither produced by this writer, both legal zarr-python output
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir).resolve("zarr.json"),
      """{"zarr_format": 3, "node_type": "group"}""".getBytes("UTF-8"))
    val vdir = Paths.get(dir).resolve("g")
    Files.createDirectories(vdir)
    Files.write(vdir.resolve("zarr.json"),
      ("""{"zarr_format": 3, "node_type": "array", "shape": [4], """ +
        """"data_type": "float64", "chunk_grid": {"name": "regular", """ +
        """"configuration": {"chunk_shape": [4]}}, """ +
        """"chunk_key_encoding": {"name": "v2", "configuration": {"separator": "."}}, """ +
        """"fill_value": 0, "codecs": [{"name": "bytes", """ +
        """"configuration": {"endian": "little"}}, {"name": "gzip", """ +
        """"configuration": {"level": 5}}], """ +
        """"dimension_names": ["t"]}""").getBytes("UTF-8"))
    val rawBuf = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(9.0, 8.0, 7.0, 6.0).foreach(rawBuf.putDouble)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(rawBuf.array()); gz.close()
    Files.write(vdir.resolve("0"), bos.toByteArray) // v2-style key, no c/
    val g = Zarr.read(dir).variable("g")
    assert(g.data.asInstanceOf[Array[Double]].toSeq == Seq(9.0, 8.0, 7.0, 6.0))
    // sharding / transpose / unknown chains must raise, not misread
    val zj = vdir.resolve("zarr.json")
    val body = new String(Files.readAllBytes(zj), "UTF-8")
    Files.write(zj, body.replace("\"name\": \"gzip\"",
      "\"name\": \"sharding_indexed\"").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](Zarr.meta(dir))
    assert(e.getMessage.contains("codec chain"))
  }

  test("zarr v3 sharding_indexed roundtrips; scan unit is the inner chunk") {
    import java.nio.file.{Files, Paths}
    val (nt, ny, nx) = (21, 3, 4) // 21 rows: last shard reaches past the edge
    val dims = Seq(NetCdf.Dim("time", nt), NetCdf.Dim("y", ny), NetCdf.Dim("x", nx))
    val data = Array.tabulate(nt * ny * nx)(i => i * 0.125 - 7)
    val vars = Seq(
      NetCdf.Var("time", Seq(0), NetCdf.NcDouble, Nil,
        Array.tabulate(nt)(_ * 3600.0)),
      NetCdf.Var("t2", Seq(0, 1, 2), NetCdf.NcDouble,
        Seq("units" -> "K"), data))
    val dir = tmp()
    Zarr.write3(dir, dims, Nil, vars, chunk0 = 8, shardInner0 = 2)
    // 21 rows / 8-row shards = 3 shard FILES; the last one's fourth
    // inner-chunk slot (rows 22-23) is wholly past the edge
    val t2dir = Paths.get(dir).resolve("t2")
    assert(Files.exists(t2dir.resolve("c/2/0/0")))
    assert(!Files.exists(t2dir.resolve("c/3/0/0")))
    // the writer's MISSING-entry encoding, asserted at the byte level
    // (the spec's 2^64-1 pair): if a regression wrote 0/0 instead, a
    // sparse-aware reader would misread rather than fill
    val shard2 = Files.readAllBytes(t2dir.resolve("c/2/0/0"))
    val idxBuf = java.nio.ByteBuffer.wrap(shard2, shard2.length - (4 * 16 + 4),
      4 * 16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val entries = Array.fill(8)(idxBuf.getLong)
    assert(entries(6) == -1L && entries(7) == -1L,
      s"missing inner chunk not encoded as 2^64-1 pairs: ${entries.toSeq}")
    assert(entries(4) >= 0 && entries(5) > 0, "live slot 2 should be present")
    val back = Zarr.read(dir)
    assert(back.variable("t2").data.asInstanceOf[Array[Double]].toSeq
      === data.toSeq)
    // the scan's ArrayMeta plans at INNER-chunk granularity
    val am = Zarr.meta(dir).array("t2")
    assert(am.chunks == Seq(2, 3, 4) && am.shard.exists(_.shape == Seq(8, 3, 4)))
    assert(am.nChunks == Seq(11, 1, 1))
    // one inner chunk reads without touching its siblings' payloads
    assert(Zarr.readChunkDouble(dir, am, Seq(3, 0, 0)).toSeq
      === data.slice(6 * 12, 8 * 12).toSeq)
    // the edge inner chunk: live row then fill padding
    val edge = Zarr.readChunkDouble(dir, am, Seq(10, 0, 0))
    assert(edge.take(12).toSeq === data.slice(240, 252).toSeq)
    assert(edge.drop(12).forall(_ == 0.0))
  }

  test("zarr v3 sharding: index at start, bytes-only index, raw inner codec") {
    import java.nio.file.{Files, Paths}
    // hand-build the variant this engine's writer never emits:
    // index_location "start", no crc32c, raw inner chunks
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir).resolve("zarr.json"),
      """{"zarr_format": 3, "node_type": "group"}""".getBytes("UTF-8"))
    val vdir = Paths.get(dir).resolve("g")
    Files.createDirectories(vdir)
    Files.write(vdir.resolve("zarr.json"),
      ("""{"zarr_format": 3, "node_type": "array", "shape": [4], """ +
        """"data_type": "float64", "chunk_grid": {"name": "regular", """ +
        """"configuration": {"chunk_shape": [4]}}, """ +
        """"fill_value": 0, "codecs": [{"name": "sharding_indexed", """ +
        """"configuration": {"chunk_shape": [2], """ +
        """"codecs": [{"name": "bytes", "configuration": {"endian": "little"}}], """ +
        """"index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}], """ +
        """"index_location": "start"}}], """ +
        """"dimension_names": ["t"]}""").getBytes("UTF-8"))
    // shard file: 32-byte leading index (2 inner chunks), then payloads
    // inner chunk 0 = [1.0, 2.0] at offset 32; inner chunk 1 missing
    val f = java.nio.ByteBuffer.allocate(32 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    f.putLong(32L).putLong(16L).putLong(-1L).putLong(-1L)
    f.putDouble(1.0).putDouble(2.0)
    Files.createDirectories(vdir.resolve("c"))
    Files.write(vdir.resolve("c/0"), f.array())
    val g = Zarr.read(dir).variable("g").data.asInstanceOf[Array[Double]]
    assert(g.toSeq == Seq(1.0, 2.0, 0.0, 0.0))
    // hostile index entries reject loudly, never misallocate:
    // (a) offset+nbytes past the file
    val bad1 = f.array().clone()
    java.nio.ByteBuffer.wrap(bad1, 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(Long.MaxValue)
    Files.write(vdir.resolve("c/0"), bad1)
    Files.setLastModifiedTime(vdir.resolve("c/0"), // distinct memo key
      java.nio.file.attribute.FileTime.fromMillis(1700000001000L))
    val am = Zarr.meta(dir).array("g")
    val e1 = intercept[IllegalArgumentException](
      Zarr.readChunkDouble(dir, am, Seq(0)))
    assert(e1.getMessage.contains("outside"), e1.getMessage)
    // (b) negative-image offset (a hostile u64 reads as negative)
    val bad2 = f.array().clone()
    java.nio.ByteBuffer.wrap(bad2, 0, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(Long.MinValue)
    Files.write(vdir.resolve("c/0"), bad2)
    Files.setLastModifiedTime(vdir.resolve("c/0"),
      java.nio.file.attribute.FileTime.fromMillis(1700000002000L))
    val e2 = intercept[IllegalArgumentException](
      Zarr.readChunkDouble(dir, am, Seq(0)))
    assert(e2.getMessage.contains("outside"), e2.getMessage)
    // (c) a shard file smaller than its declared index
    Files.write(vdir.resolve("c/0"), Array[Byte](1, 2, 3))
    val e3 = intercept[IllegalArgumentException](
      Zarr.readChunkDouble(dir, am, Seq(0)))
    assert(e3.getMessage.contains("index"), e3.getMessage)
  }

  test("zarr v3 sharding: crc32c catches index corruption; fuzz never hangs") {
    import java.nio.file.{Files, Paths}
    val dims = Seq(NetCdf.Dim("t", 16))
    val vars = Seq(NetCdf.Var("v", Seq(0), NetCdf.NcDouble, Nil,
      Array.tabulate(16)(_ * 2.5)))
    val dir = tmp()
    Zarr.write3(dir, dims, Nil, vars, chunk0 = 16, shardInner0 = 4)
    val shardP = Paths.get(dir).resolve("v").resolve("c/0")
    val base = Files.readAllBytes(shardP)
    // flip one byte INSIDE the index region (trailing 4*16+4 bytes):
    // the crc32c must catch it before any offset is followed
    val corrupted = base.clone()
    corrupted(base.length - 12) = (corrupted(base.length - 12) ^ 0x41).toByte
    Files.write(shardP, corrupted)
    val am = Zarr.meta(dir).array("v")
    val e = intercept[IllegalArgumentException](
      Zarr.readChunkDouble(dir, am, Seq(0)))
    assert(e.getMessage.contains("crc32c"), e.getMessage)
    // 300 hostile mutations across the whole shard: decode or raise,
    // never hang, never a fatal allocation
    val rnd = new scala.util.Random(77)
    var decoded = 0; var rejected = 0
    for (trial <- 0 until 300) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Files.write(shardP, m)
      // distinct mtime per trial: the reader's index memo keys on
      // (path, size, mtime) and same-size rewrites must never alias
      Files.setLastModifiedTime(shardP,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + trial * 1000L))
      try {
        (0 until 4).foreach(i => Zarr.readChunkDouble(dir, am, Seq(i)))
        decoded += 1
      } catch { case scala.util.control.NonFatal(_) => rejected += 1 }
    }
    assert(decoded + rejected == 300)
    assert(rejected > 100, s"crc-gated index: only $rejected of 300 rejected?")
  }

  test("zarr v2 numcodecs filters decode: delta + shuffle; re-typed delta raises") {
    import java.nio.file.{Files, Paths}
    import java.nio.{ByteBuffer, ByteOrder}
    // encode [100, 101, 103, 100] as numcodecs would with
    // filters=[Delta('<i4'), Shuffle(4)]: delta -> [100, 1, 2, -3],
    // then byte-shuffle into 4 one-byte planes
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir).resolve(".zgroup"),
      """{"zarr_format": 2}""".getBytes("UTF-8"))
    val vdir = Paths.get(dir).resolve("v")
    Files.createDirectories(vdir)
    Files.write(vdir.resolve(".zarray"),
      ("""{"zarr_format": 2, "shape": [4], "chunks": [4], """ +
        """"dtype": "<i4", "compressor": null, "fill_value": 0, """ +
        """"order": "C", "filters": [{"id": "delta", "dtype": "<i4", """ +
        """"astype": "<i4"}, {"id": "shuffle", "elementsize": 4}]}""")
        .getBytes("UTF-8"))
    val deltaed = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    Seq(100, 1, 2, -3).foreach(deltaed.putInt)
    val shuffled = new Array[Byte](16)
    for (k <- 0 until 4; i <- 0 until 4)
      shuffled(k * 4 + i) = deltaed.array()(i * 4 + k)
    Files.write(vdir.resolve("0"), shuffled)
    val v = Zarr.read(dir).variable("v").data.asInstanceOf[Array[Int]]
    assert(v.toSeq == Seq(100, 101, 103, 100))
    // float64 delta (sums in its own width)
    val zaP = vdir.resolve(".zarray")
    Files.write(zaP,
      ("""{"zarr_format": 2, "shape": [3], "chunks": [3], """ +
        """"dtype": "<f8", "compressor": null, "fill_value": 0, """ +
        """"order": "C", "filters": [{"id": "delta", "dtype": "<f8"}]}""")
        .getBytes("UTF-8"))
    val fb = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    Seq(1.5, 0.25, -1.0).foreach(fb.putDouble) // decodes to 1.5, 1.75, 0.75
    Files.write(vdir.resolve("0"), fb.array())
    val f = Zarr.read(dir).variable("v").data.asInstanceOf[Array[Double]]
    assert(f.toSeq == Seq(1.5, 1.75, 0.75))
    // a delta that RE-TYPES (astype != dtype) would decode in the
    // wrong width: loud raise, not silent wrong data
    Files.write(zaP,
      ("""{"zarr_format": 2, "shape": [3], "chunks": [3], """ +
        """"dtype": "<f8", "compressor": null, "fill_value": 0, """ +
        """"order": "C", "filters": [{"id": "delta", "dtype": "<f8", """ +
        """"astype": "<f4"}]}""").getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException](Zarr.meta(dir))
    assert(e1.getMessage.contains("re-types"), e1.getMessage)
    // unknown filter ids raise with the id named
    Files.write(zaP,
      ("""{"zarr_format": 2, "shape": [3], "chunks": [3], """ +
        """"dtype": "<f8", "compressor": null, "fill_value": 0, """ +
        """"order": "C", "filters": [{"id": "fixedscaleoffset"}]}""")
        .getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](Zarr.meta(dir))
    assert(e2.getMessage.contains("fixedscaleoffset"), e2.getMessage)
  }

  test("big-endian stores decode: v2 '>f8' dtype and v3 bytes endian 'big'") {
    import java.nio.file.{Files, Paths}
    import java.nio.{ByteBuffer, ByteOrder}
    // v2: hand-built '>f8' array — a little-endian misread of these
    // bytes yields garbage magnitudes, so value equality pins the order
    val dir = tmp()
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir).resolve(".zgroup"),
      """{"zarr_format": 2}""".getBytes("UTF-8"))
    val vdir = Paths.get(dir).resolve("v")
    Files.createDirectories(vdir)
    Files.write(vdir.resolve(".zarray"),
      ("""{"zarr_format": 2, "shape": [3], "chunks": [3], """ +
        """"dtype": ">f8", "compressor": null, "fill_value": 0, """ +
        """"order": "C", "filters": null}""").getBytes("UTF-8"))
    val beBuf = ByteBuffer.allocate(24).order(ByteOrder.BIG_ENDIAN)
    Seq(1.5, -2.25, 1e100).foreach(beBuf.putDouble)
    Files.write(vdir.resolve("0"), beBuf.array())
    val v = Zarr.read(dir).variable("v").data.asInstanceOf[Array[Double]]
    assert(v.toSeq == Seq(1.5, -2.25, 1e100))
    // v3: bytes codec with endian "big", raw chain + int16 to pin the
    // short path too
    val dir3 = tmp()
    Files.createDirectories(Paths.get(dir3))
    Files.write(Paths.get(dir3).resolve("zarr.json"),
      """{"zarr_format": 3, "node_type": "group"}""".getBytes("UTF-8"))
    val gdir = Paths.get(dir3).resolve("g")
    Files.createDirectories(gdir)
    Files.write(gdir.resolve("zarr.json"),
      ("""{"zarr_format": 3, "node_type": "array", "shape": [2], """ +
        """"data_type": "int16", "chunk_grid": {"name": "regular", """ +
        """"configuration": {"chunk_shape": [2]}}, """ +
        """"fill_value": 0, "codecs": [{"name": "bytes", """ +
        """"configuration": {"endian": "big"}}], """ +
        """"dimension_names": ["t"]}""").getBytes("UTF-8"))
    val be3 = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
    be3.putShort(258).putShort(-2) // LE misread: 513 / -257
    Files.createDirectories(gdir.resolve("c"))
    Files.write(gdir.resolve("c/0"), be3.array())
    val g = Zarr.read(dir3).variable("g").data.asInstanceOf[Array[Int]]
    assert(g.toSeq == Seq(258, -2))
    // unknown byte-order spellings still raise
    val zj = gdir.resolve("zarr.json")
    Files.write(zj, new String(Files.readAllBytes(zj), "UTF-8")
      .replace("\"endian\": \"big\"", "\"endian\": \"pdp\"").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](Zarr.meta(dir3))
    assert(e.getMessage.contains("endian"), e.getMessage)
  }

  test("packed store mask-and-scales by default, raw on request (CF S6)") {
    // numeric .zattrs (scale_factor/add_offset/_FillValue) must parse
    // and drive the same CF decode the NetCDF containers apply — a
    // packed zarr store previously read RAW sentinel-laden ints
    val dims = Seq(NetCdf.Dim("t", 2), NetCdf.Dim("y", 1), NetCdf.Dim("x", 2))
    val raw = Array(100, 200, -1, 400) // -1 = fill sentinel
    val vars = Seq(NetCdf.Var("v", Seq(0, 1, 2), NetCdf.NcInt, Nil, raw,
      Seq("scale_factor" -> 0.01, "add_offset" -> 5.0, "_FillValue" -> -1.0)))
    val dir = tmp()
    Zarr.write(dir, dims, Nil, vars, compress = false)
    val v = Zarr.read(dir).variable("v")
    assert(v.ncType == NetCdf.NcDouble)
    val d = v.data.asInstanceOf[Array[Double]]
    assert(d(0) == 6.0 && d(1) == 7.0 && d(2).isNaN && d(3) == 9.0)
    val rawBack = Zarr.read(dir, maskAndScale = false).variable("v")
    assert(rawBack.data.asInstanceOf[Array[Int]].toSeq == raw.toSeq)
    assert(rawBack.numAttrs.toMap.get("scale_factor").contains(0.01))
  }

  test("missing chunks read as the store's declared fill_value, not zero") {
    // write a chunked store, delete one chunk file, and override the
    // declared fill — xarray writes "NaN" for float arrays, so a
    // zero-filling reader silently misreads real stores
    import java.nio.file.{Files, Paths}
    def store(fillJson: String): String = {
      val dims = Seq(NetCdf.Dim("t", 4))
      val vars = Seq(NetCdf.Var("v", Seq(0), NetCdf.NcDouble, Nil,
        Array(1.0, 2.0, 3.0, 4.0)))
      val dir = tmp()
      Zarr.write(dir, dims, Nil, vars, chunk0 = 2, compress = false)
      val vdir = Paths.get(dir).resolve("v")
      Files.delete(vdir.resolve("1")) // second chunk (values 3, 4)
      val za = vdir.resolve(".zarray")
      Files.write(za, new String(Files.readAllBytes(za), "UTF-8")
        .replace("\"fill_value\": 0", s""""fill_value": $fillJson""")
        .getBytes("UTF-8"))
      dir
    }
    val nanBack = Zarr.read(store("\"NaN\"")).variable("v")
      .data.asInstanceOf[Array[Double]]
    assert(nanBack(0) == 1.0 && nanBack(1) == 2.0)
    assert(nanBack(2).isNaN && nanBack(3).isNaN)
    // a numeric fill is PROMOTED to _FillValue (xarray keeps the
    // sentinel in encoding only), so the masked read surfaces NaN and
    // the raw view keeps the sentinel
    val numBack = Zarr.read(store("-999.5")).variable("v")
      .data.asInstanceOf[Array[Double]]
    assert(numBack(0) == 1.0 && numBack(1) == 2.0)
    assert(numBack(2).isNaN && numBack(3).isNaN)
    val numRaw = Zarr.read(store("-999.5"), maskAndScale = false).variable("v")
      .data.asInstanceOf[Array[Double]]
    assert(numRaw.toSeq == Seq(1.0, 2.0, -999.5, -999.5))
    val e = intercept[Exception] { Zarr.read(store("\"bogus\"")) }
    assert(e.getMessage.contains("fill_value"))
  }

  test("uncompressed store and every numeric dtype roundtrip") {
    val dims = Seq(NetCdf.Dim("n", 6))
    val vars = Seq(
      NetCdf.Var("d", Seq(0), NetCdf.NcDouble, Nil, Array.tabulate(6)(_ * 1.5)),
      NetCdf.Var("f", Seq(0), NetCdf.NcFloat, Nil, Array.tabulate(6)(_ * 0.5f)),
      NetCdf.Var("i", Seq(0), NetCdf.NcInt, Nil, Array.tabulate(6)(_ * 3)),
      NetCdf.Var("l", Seq(0), NetCdf.NcInt64, Nil,
        Array.tabulate(6)(_ * 1000000007L)),
      NetCdf.Var("s", Seq(0), NetCdf.NcShort, Nil, Array.tabulate(6)(_ - 3)),
      NetCdf.Var("b", Seq(0), NetCdf.NcByte, Nil,
        Array.tabulate(6)(i => (i - 2).toByte)))
    val dir = tmp()
    Zarr.write(dir, dims, Nil, vars, compress = false)
    val back = Zarr.read(dir)
    assert(back.variable("d").data.asInstanceOf[Array[Double]].toSeq ===
      Seq(0.0, 1.5, 3.0, 4.5, 6.0, 7.5))
    assert(back.variable("f").data.asInstanceOf[Array[Float]].toSeq ===
      Seq(0f, 0.5f, 1f, 1.5f, 2f, 2.5f))
    assert(back.variable("i").data.asInstanceOf[Array[Int]].toSeq ===
      Seq(0, 3, 6, 9, 12, 15))
    assert(back.variable("l").data.asInstanceOf[Array[Long]].toSeq ===
      (0 until 6).map(_ * 1000000007L))
    assert(back.variable("s").data.asInstanceOf[Array[Int]].toSeq ===
      Seq(-3, -2, -1, 0, 1, 2))
    assert(back.variable("b").data.asInstanceOf[Array[Byte]].toSeq ===
      Seq[Byte](-2, -1, 0, 1, 2, 3))
  }

  test("chunk-level read returns padded edge chunks; pruning never touches them") {
    val dims = Seq(NetCdf.Dim("t", 5), NetCdf.Dim("x", 3))
    val data = Array.tabulate(15)(_ + 100.0)
    val dir = tmp()
    Zarr.write(dir, dims, Nil,
      Seq(NetCdf.Var("v", Seq(0, 1), NetCdf.NcDouble, Nil, data)), chunk0 = 2)
    val am = Zarr.meta(dir).array("v")
    assert(am.shape === Seq(5, 3) && am.chunks === Seq(2, 3))
    assert(am.nChunks === Seq(3, 1))
    // chunk 1 covers t = 2,3
    val c1 = Zarr.readChunkDouble(dir, am, Seq(1, 0))
    assert(c1.toSeq === (6 until 12).map(_ + 100.0))
    // edge chunk 2 covers t = 4 + one padded row of fill zeros
    val c2 = Zarr.readChunkDouble(dir, am, Seq(2, 0))
    assert(c2.take(3).toSeq === (12 until 15).map(_ + 100.0))
    assert(c2.drop(3).toSeq === Seq(0.0, 0.0, 0.0))
  }

  test("missing chunk file reads as fill; unsupported layouts fail loudly") {
    val dims = Seq(NetCdf.Dim("t", 4))
    val dir = tmp()
    Zarr.write(dir, dims, Nil,
      Seq(NetCdf.Var("v", Seq(0), NetCdf.NcDouble, Nil,
        Array(1.0, 2.0, 3.0, 4.0))), chunk0 = 2)
    val vdir = java.nio.file.Paths.get(dir).resolve("v")
    java.nio.file.Files.delete(vdir.resolve("1")) // second chunk vanishes
    val am = Zarr.meta(dir).array("v")
    assert(Zarr.assembleDouble(dir, am).toSeq === Seq(1.0, 2.0, 0.0, 0.0))
    // F-order must be rejected, not silently transposed
    val za = new String(java.nio.file.Files.readAllBytes(vdir.resolve(".zarray")), "UTF-8")
    java.nio.file.Files.write(vdir.resolve(".zarray"),
      za.replace("\"order\": \"C\"", "\"order\": \"F\"").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](Zarr.meta(dir))
    assert(e.getMessage.contains("F-order"))
  }

  test("conflicting dimension sizes across arrays fail loudly") {
    val dir = tmp()
    Zarr.write(dir, Seq(NetCdf.Dim("n", 3)), Nil,
      Seq(NetCdf.Var("a", Seq(0), NetCdf.NcDouble, Nil, Array(1.0, 2.0, 3.0))))
    // hand-write a second array claiming n has size 4
    val bdir = java.nio.file.Paths.get(dir).resolve("b")
    java.nio.file.Files.createDirectories(bdir)
    java.nio.file.Files.write(bdir.resolve(".zarray"),
      ("""{"zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f8", """ +
        """"compressor": null, "fill_value": 0, "order": "C", "filters": null}""")
        .getBytes("UTF-8"))
    java.nio.file.Files.write(bdir.resolve(".zattrs"),
      """{"_ARRAY_DIMENSIONS": ["n"]}""".getBytes("UTF-8"))
    java.nio.file.Files.write(bdir.resolve("0"), new Array[Byte](32))
    val e = intercept[IllegalArgumentException](Zarr.read(dir))
    assert(e.getMessage.contains("conflicting"))
  }
}
