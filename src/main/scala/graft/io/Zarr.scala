package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{Deflater, Inflater}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Zarr v2 store codec, from scratch against the published spec
  * (zarr-specs v2: `.zgroup`/`.zattrs`/`.zarray` JSON metadata, C-order
  * chunk files named `i.j.k`, blosc/zlib/raw compression) with xarray's
  * `_ARRAY_DIMENSIONS` convention carrying dimension names — the OTHER
  * container an xarray user of the reference holds model output in,
  * alongside NetCDF ([[NetCdf]]) and NetCDF-4/HDF5 ([[Hdf5]]).
  *
  * Shares the [[NetCdf]] in-memory model (`Dim`/`Var`/`NcFile`), so
  * everything downstream — the long-form grid expansion, the roundtrip
  * gates — is container-agnostic.
  *
  * Scale shape: Zarr is chunked BY CONSTRUCTION, so the distributed
  * read path needs no header parsing beyond one JSON file per
  * variable: [[meta]] is the Parquet-footer analogue, and
  * [[readChunkDouble]] fetches + inflates exactly one chunk — one
  * executor task per chunk, pruned chunks never read. JSON parsing
  * uses Jackson (shipped with Spark); chunk compression is
  * `java.util.zip` (the "zlib" numcodec) or [[Blosc]] frames
  * (numcodecs' DEFAULT `blosc(cname="lz4", shuffle=1)` — what a
  * stock xarray `ds.to_zarr(path)` writes).
  */
object Zarr {

  import NetCdf.{Dim, NcFile, Var}

  private val mapper = new ObjectMapper()

  private def dtypeOf(ncType: Int): String = ncType match {
    case NetCdf.NcDouble => "<f8"
    case NetCdf.NcFloat => "<f4"
    case NetCdf.NcInt64 => "<i8"
    case NetCdf.NcInt => "<i4"
    case NetCdf.NcShort => "<i2"
    case NetCdf.NcByte | NetCdf.NcChar => "|i1"
    case other => throw new IllegalArgumentException(s"nc_type $other")
  }

  /** (nc type, big-endian?) for a v2 dtype string. '<' and '>' carry
    * the byte order (numpy's encoding — '>f8' stores exist wherever
    * old big-endian datasets were converted verbatim); '|' marks the
    * order-free single-byte types. */
  private def ncTypeOf(dtype: String): (Int, Boolean) = {
    val be = dtype.startsWith(">")
    val t = dtype match {
      case "<f8" | ">f8" => NetCdf.NcDouble
      case "<f4" | ">f4" => NetCdf.NcFloat
      case "<i8" | ">i8" => NetCdf.NcInt64
      case "<i4" | ">i4" => NetCdf.NcInt
      case "<i2" | ">i2" => NetCdf.NcShort
      case "|i1" | "|u1" => NetCdf.NcByte
      case other => throw new IllegalArgumentException(
        s"unsupported zarr dtype '$other' (numeric only)")
    }
    (t, be)
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def attrsJson(attrs: Seq[(String, String)]): String =
    attrs.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")

  // ------------------------------------------------------------ writer

  /** Write a Zarr v2 group. Each variable chunks along its FIRST axis
    * in runs of `chunk0` (0 = unchunked: one chunk spanning the
    * array) with full extent on the remaining axes — the time-slab
    * layout the distributed scan plans with. `codec` picks the chunk
    * compressor when `compress` is set: "zlib" (java.util.zip) or
    * "blosc" (lz4 + byte-shuffle frames via [[Blosc]] — what
    * numcodecs writes by default). */
  def write(dir: String, dims: Seq[Dim], globalAttrs: Seq[(String, String)],
      vars: Seq[Var], compress: Boolean = true, chunk0: Int = 0,
      codec: String = "zlib"): Unit = {
    require(codec == "zlib" || codec == "blosc",
      s"unsupported zarr write codec '$codec' (zlib or blosc)")
    val root = Paths.get(dir)
    Files.createDirectories(root)
    Files.write(root.resolve(".zgroup"),
      """{"zarr_format": 2}""".getBytes("UTF-8"))
    if (globalAttrs.nonEmpty)
      Files.write(root.resolve(".zattrs"),
        attrsJson(globalAttrs).getBytes("UTF-8"))
    vars.foreach { v =>
      val shape = v.dimIds.map(dims(_).size)
      require(shape.product == v.data.length,
        s"${v.name}: data length ${v.data.length} != shape ${shape.mkString("x")}")
      val c0 = if (chunk0 <= 0 || shape.isEmpty) shape.headOption.getOrElse(1)
        else math.min(chunk0, shape.head)
      val chunks = if (shape.isEmpty) Seq(1) else c0 +: shape.tail
      val shapeOut = if (shape.isEmpty) Seq(1) else shape
      val vdir = root.resolve(v.name)
      Files.createDirectories(vdir)
      val compressor =
        if (!compress) "null"
        else if (codec == "blosc")
          // numcodecs' default spelling: cname/clevel/shuffle all
          // explicit, blocksize 0 = codec-chosen (frames self-describe)
          """{"id": "blosc", "cname": "lz4", "clevel": 5, """ +
            """"shuffle": 1, "blocksize": 0}"""
        else """{"id": "zlib", "level": 1}"""
      val zarray =
        s"""{"zarr_format": 2, "shape": [${shapeOut.mkString(", ")}], """ +
          s""""chunks": [${chunks.mkString(", ")}], """ +
          s""""dtype": ${q(dtypeOf(v.ncType))}, """ +
          s""""compressor": $compressor, "fill_value": 0, """ +
          s""""order": "C", "filters": null}"""
      Files.write(vdir.resolve(".zarray"), zarray.getBytes("UTF-8"))
      val dimNames = v.dimIds.map(dims(_).name)
      val va = ("_ARRAY_DIMENSIONS" ->
        dimNames.map(q).mkString("[", ", ", "]")) +: (v.attrs.map {
        case (k, s) => (k, q(s))
      } ++ v.numAttrs.map { case (k, d) =>
        require(!d.isNaN && !d.isInfinite,
          s"${v.name}.$k: non-finite numeric attribute has no JSON spelling")
        (k, d.toString)
      })
      Files.write(vdir.resolve(".zattrs"),
        va.map { case (k, j) => s"${q(k)}: $j" }
          .mkString("{", ", ", "}").getBytes("UTF-8"))
      // emit chunk files: C-order, edge chunks padded with the fill
      val rowElems = shapeOut.tail.product.max(1)
      val elemSize = NetCdf.typeSize(v.ncType)
      val nChunks0 = (shapeOut.head + chunks.head - 1) / chunks.head
      for (ci <- 0 until nChunks0) {
        val buf = ByteBuffer.allocate(chunks.head * rowElems * elemSize)
          .order(ByteOrder.LITTLE_ENDIAN)
        val from = ci * chunks.head * rowElems
        val live = math.min(chunks.head, shapeOut.head - ci * chunks.head)
        encode(v.data, from, live * rowElems, v.ncType, buf)
        // pad rows of an edge chunk stay zero (the declared fill)
        val name = ("0" * (shapeOut.length - 1)).map(_ => ".0").mkString
        val payload =
          if (!compress) buf.array()
          else if (codec == "blosc")
            Blosc.compress(buf.array(), NetCdf.typeSize(v.ncType))
          else deflate(buf.array())
        Files.write(vdir.resolve(s"$ci$name"), payload)
      }
    }
    // consolidated metadata: xarray's open_zarr(consolidated=True)
    // DEFAULT reads every .z* key from this one file (and warns
    // loudly without it) — mirror the store's own metadata verbatim
    val entries = (Seq(".zgroup") ++
      (if (globalAttrs.nonEmpty) Seq(".zattrs") else Nil) ++
      vars.flatMap(v => Seq(s"${v.name}/.zarray", s"${v.name}/.zattrs")))
      .map { key =>
        s"${q(key)}: " + new String(Files.readAllBytes(root.resolve(key)), "UTF-8")
      }
    Files.write(root.resolve(".zmetadata"),
      (s"""{"zarr_consolidated_format": 1, "metadata": """ +
        entries.mkString("{", ", ", "}") + "}").getBytes("UTF-8"))
  }

  private def encode(data: Array[_], from: Int, n: Int, ncType: Int,
      buf: ByteBuffer): Unit = ncType match {
    case NetCdf.NcDouble =>
      val a = data.asInstanceOf[Array[Double]]
      var i = 0; while (i < n) { buf.putDouble(a(from + i)); i += 1 }
    case NetCdf.NcFloat =>
      val a = data.asInstanceOf[Array[Float]]
      var i = 0; while (i < n) { buf.putFloat(a(from + i)); i += 1 }
    case NetCdf.NcInt64 =>
      val a = data.asInstanceOf[Array[Long]]
      var i = 0; while (i < n) { buf.putLong(a(from + i)); i += 1 }
    case NetCdf.NcInt =>
      val a = data.asInstanceOf[Array[Int]]
      var i = 0; while (i < n) { buf.putInt(a(from + i)); i += 1 }
    case NetCdf.NcShort =>
      val a = data.asInstanceOf[Array[Int]]
      var i = 0; while (i < n) { buf.putShort(a(from + i).toShort); i += 1 }
    case NetCdf.NcByte | NetCdf.NcChar =>
      buf.put(data.asInstanceOf[Array[Byte]], from, n)
    case other => throw new IllegalArgumentException(s"nc_type $other")
  }

  /** Write a Zarr v3 group: `zarr.json` metadata, default chunk-key
    * encoding (`c/`-prefixed, `/`-separated keys), `dimension_names`,
    * and a bytes+zstd codec chain — the store shape zarr-python 3
    * (and therefore current xarray `to_zarr`) emits by default.
    * Chunking as [[write]]: runs of `chunk0` along the first axis.
    *
    * `shardInner0 > 0` writes `sharding_indexed` stores instead (the
    * layout zarr-python 3 emits for large arrays when shards are
    * configured): each stored file is one SHARD of `chunk0` rows
    * holding inner chunks of `shardInner0` rows, inner chunks encoded
    * with `codec`, located by a trailing little-endian (offset,
    * nbytes) index with a crc32c — zarr-python's default index
    * encoding. `chunk0` must be a whole multiple of `shardInner0`. */
  def write3(dir: String, dims: Seq[Dim], globalAttrs: Seq[(String, String)],
      vars: Seq[Var], codec: String = "zstd", chunk0: Int = 0,
      shardInner0: Int = 0): Unit = {
    require(codec == "zstd" || codec == "raw",
      s"unsupported zarr v3 write codec '$codec' (zstd or raw)")
    require(shardInner0 <= 0 || (chunk0 > 0 && chunk0 % shardInner0 == 0),
      s"shard of $chunk0 rows is not a whole multiple of $shardInner0-row inner chunks")
    val root = Paths.get(dir)
    Files.createDirectories(root)
    val gattrs = globalAttrs.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ", ", "}")
    Files.write(root.resolve("zarr.json"),
      (s"""{"zarr_format": 3, "node_type": "group", """ +
        s""""attributes": $gattrs}""").getBytes("UTF-8"))
    vars.foreach { v =>
      val shape = v.dimIds.map(dims(_).size)
      require(shape.product == v.data.length,
        s"${v.name}: data length ${v.data.length} != shape ${shape.mkString("x")}")
      // a sharded var keeps the full shard extent even past the array
      // edge (the spec allows a partial trailing chunk); plain chunks
      // clamp as before
      val sharded = shardInner0 > 0 && shape.nonEmpty
      val c0 = if (chunk0 <= 0 || shape.isEmpty) shape.headOption.getOrElse(1)
        else if (sharded) chunk0
        else math.min(chunk0, shape.head)
      val chunks = if (shape.isEmpty) Seq(1) else c0 +: shape.tail
      val shapeOut = if (shape.isEmpty) Seq(1) else shape
      val vdir = root.resolve(v.name)
      Files.createDirectories(vdir)
      val innerJson =
        if (codec == "zstd")
          """[{"name": "bytes", "configuration": {"endian": "little"}}, """ +
            """{"name": "zstd", "configuration": {"level": 3, "checksum": false}}]"""
        else """[{"name": "bytes", "configuration": {"endian": "little"}}]"""
      val codecsJson =
        if (!sharded) innerJson
        else {
          val innerShape = (shardInner0 +: shapeOut.tail).mkString(", ")
          s"""[{"name": "sharding_indexed", "configuration": {""" +
            s""""chunk_shape": [$innerShape], "codecs": $innerJson, """ +
            """"index_codecs": [{"name": "bytes", "configuration": """ +
            """{"endian": "little"}}, {"name": "crc32c"}], """ +
            """"index_location": "end"}}]"""
        }
      val dimNames = v.dimIds.map(dims(_).name)
      val va = (v.attrs.map { case (k, s) => (k, q(s)) } ++
        v.numAttrs.map { case (k, d) =>
          require(!d.isNaN && !d.isInfinite,
            s"${v.name}.$k: non-finite numeric attribute has no JSON spelling")
          (k, d.toString)
        }).map { case (k, j) => s"${q(k)}: $j" }.mkString("{", ", ", "}")
      val zj =
        s"""{"zarr_format": 3, "node_type": "array", """ +
          s""""shape": [${shapeOut.mkString(", ")}], """ +
          s""""data_type": ${q(v3DtypeOf(v.ncType))}, """ +
          s""""chunk_grid": {"name": "regular", "configuration": """ +
          s"""{"chunk_shape": [${chunks.mkString(", ")}]}}, """ +
          s""""chunk_key_encoding": {"name": "default", "configuration": """ +
          s"""{"separator": "/"}}, "fill_value": 0, "codecs": $codecsJson, """ +
          s""""dimension_names": [${dimNames.map(q).mkString(", ")}], """ +
          s""""attributes": $va}"""
      Files.write(vdir.resolve("zarr.json"), zj.getBytes("UTF-8"))
      val rowElems = shapeOut.tail.product.max(1)
      val elemSize = NetCdf.typeSize(v.ncType)
      val nChunks0 = (shapeOut.head + chunks.head - 1) / chunks.head
      def encodeRows(row0: Int, rows: Int): Array[Byte] = {
        val buf = ByteBuffer.allocate(rows * rowElems * elemSize)
          .order(ByteOrder.LITTLE_ENDIAN)
        val live = math.max(math.min(rows, shapeOut.head - row0), 0)
        encode(v.data, row0 * rowElems, live * rowElems, v.ncType, buf)
        if (codec == "zstd") com.github.luben.zstd.Zstd.compress(buf.array(), 3)
        else buf.array()
      }
      for (ci <- 0 until nChunks0) {
        val key = ("c" +: (ci.toString +: shapeOut.tail.map(_ => "0")))
          .mkString("/")
        val p = vdir.resolve(key)
        Files.createDirectories(p.getParent)
        if (!sharded) {
          Files.write(p, encodeRows(ci * chunks.head, chunks.head))
        } else {
          // one shard file: inner chunk payloads in C order, then the
          // (offset, nbytes) index and its crc32c at the end
          val nInner = chunks.head / shardInner0
          val parts = (0 until nInner).map { ii =>
            val row0 = ci * chunks.head + ii * shardInner0
            if (row0 >= shapeOut.head) null // wholly past the edge
            else encodeRows(row0, shardInner0)
          }
          val dataLen = parts.filter(_ != null).map(_.length.toLong).sum
          // a >2 GiB shard would truncate the Int cast below into a
          // negative allocation (ADVICE r15) — name the shard and its
          // size instead of surfacing a NegativeArraySizeException
          require(dataLen + nInner * 16L + 4L <= Int.MaxValue,
            s"${v.name}: shard $ci holds ${dataLen + nInner * 16L + 4L} " +
              "bytes — over the 2 GiB single-shard ceiling; use more " +
              "(smaller) shards via a smaller outer chunk shape")
          val out = ByteBuffer.allocate((dataLen + nInner * 16L + 4L).toInt)
            .order(ByteOrder.LITTLE_ENDIAN)
          val index = ByteBuffer.allocate(nInner * 16 + 4)
            .order(ByteOrder.LITTLE_ENDIAN)
          parts.foreach { part =>
            if (part == null) { index.putLong(-1L).putLong(-1L) }
            else {
              index.putLong(out.position().toLong).putLong(part.length.toLong)
              out.put(part)
            }
          }
          val crc = new java.util.zip.CRC32C()
          crc.update(index.array(), 0, nInner * 16)
          index.putInt(crc.getValue.toInt)
          out.put(index.array())
          Files.write(p, out.array())
        }
      }
    }
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(1)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  private def inflate(z: Array[Byte], outLen: Int): Array[Byte] = {
    val inf = new Inflater()
    try { // finally-end: a throwing decode must not leak native zlib state
      inf.setInput(z)
      val out = new Array[Byte](outLen)
      var off = 0
      while (!inf.finished() && off < outLen) {
        val n = inf.inflate(out, off, outLen - off)
        // zero progress = truncated or preset-dictionary stream: throw
        // (catchable) instead of spinning forever — the Png.inflate
        // hostile-bytes lesson (a hang in a scan task is uncatchable)
        if (n == 0) {
          require(!inf.needsDictionary, "zarr chunk requires a preset dictionary")
          require(!inf.needsInput, "truncated zarr chunk stream")
          throw new IllegalArgumentException("stalled zarr chunk stream")
        }
        off += n
      }
      require(off == outLen, s"zarr chunk inflated to $off of $outLen bytes")
      out
    } finally inf.end()
  }

  // ------------------------------------------------------------ reader

  /** Planning metadata for one variable: everything a distributed scan
    * needs to enumerate + prune chunks without touching chunk data.
    * `keySep`/`keyPrefixC` carry the chunk-key encoding: v2 stores name
    * chunks `i.j.k`; v3's default encoding prefixes `c` and separates
    * with `/` (nested directories) or `.`. */
  /** Zarr v3 `sharding_indexed` layout: the stored FILE is the outer
    * shard — `shape` here is the shard's extent (the array's
    * chunk_grid chunk_shape), a whole multiple of the inner chunk
    * shape carried in [[ArrayMeta.chunks]]. Each shard holds its inner
    * chunks' encoded bytes plus an index of (offset, nbytes) uint64-LE
    * pairs in C order over the shard's inner-chunk grid (2^64-1 pairs
    * mark missing inner chunks), stored at the file's end or start,
    * optionally followed by a crc32c of the index bytes. */
  final case class Shard(shape: Seq[Int], indexAtEnd: Boolean,
      indexCrc: Boolean)

  /** One zarr v2 `filters` entry this engine decodes: numcodecs'
    * byte `shuffle` (param = elementsize) and typed `delta`
    * (first value verbatim, then successive differences — decode is
    * the running sum IN THE ARRAY'S OWN TYPE, so integer wrap
    * round-trips exactly). Applied before the compressor on encode;
    * undone in reverse order after decompression on decode. */
  final case class V2Filter(id: String, param: Int)

  final case class ArrayMeta(name: String, dimNames: Seq[String],
      shape: Seq[Int], chunks: Seq[Int], ncType: Int, codec: String,
      attrs: Seq[(String, String)], fill: Double = 0.0,
      numAttrs: Seq[(String, Double)] = Nil,
      keySep: String = ".", keyPrefixC: Boolean = false,
      shard: Option[Shard] = None, bigEndian: Boolean = false,
      v2Filters: Seq[V2Filter] = Nil) {
    def nChunks: Seq[Int] =
      shape.zip(chunks).map { case (s, c) => (s + c - 1) / c }
    /** Store-relative chunk key for per-axis indices `idx`. */
    def chunkKey(idx: Seq[Int]): String =
      if (keyPrefixC) ("c" +: idx.map(_.toString)).mkString(keySep)
      else if (idx.isEmpty) "0"
      else idx.mkString(keySep)
  }

  final case class Meta(globalAttrs: Seq[(String, String)],
      arrays: Seq[ArrayMeta]) {
    def array(name: String): ArrayMeta = arrays.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no array $name"))
  }

  def isZarr(dir: String): Boolean =
    Files.isDirectory(Paths.get(dir)) &&
      (Files.exists(Paths.get(dir).resolve(".zgroup")) ||
        Files.exists(Paths.get(dir).resolve("zarr.json")))

  private def readAttrs(p: Path): Seq[(String, String)] =
    if (!Files.exists(p)) Nil
    else {
      val node = mapper.readTree(Files.readAllBytes(p))
      node.properties().asScala.toSeq.collect {
        case e if e.getValue.isTextual => e.getKey -> e.getValue.asText()
        case e if e.getValue.isNumber => e.getKey -> e.getValue.asText()
      }
    }

  /** xarray moves the missing-value sentinel into the store-level
    * fill_value (encoding) and drops _FillValue from the attributes —
    * promote a non-default fill so PRESENT-chunk sentinels mask to NaN
    * exactly as xarray's zarr backend does. 0 is the v2 spec default
    * (and this writer's); NaN/Inf already read as missing-shaped
    * doubles without promotion. Shared by the v2 and v3 parsers. */
  private def promoteFill(fv: Double,
      numAttrs: Seq[(String, Double)]): Seq[(String, Double)] =
    if (fv != 0.0 && !fv.isNaN && !fv.isInfinite &&
      !numAttrs.exists(a => a._1 == "_FillValue" || a._1 == "missing_value"))
      numAttrs :+ ("_FillValue" -> fv)
    else numAttrs

  def meta(dir: String): Meta = {
    val root = Paths.get(dir)
    if (Files.exists(root.resolve("zarr.json"))) return metaV3(root)
    require(Files.exists(root.resolve(".zgroup")), s"$dir: not a zarr group")
    val globals = readAttrs(root.resolve(".zattrs"))
    val arrays = Files.list(root).iterator().asScala
      .filter(p => Files.isDirectory(p) && Files.exists(p.resolve(".zarray")))
      .toSeq.sortBy(_.getFileName.toString)
      .map { vdir =>
        val za = mapper.readTree(Files.readAllBytes(vdir.resolve(".zarray")))
        require(za.get("zarr_format").asInt() == 2, "zarr v2 only")
        require(za.get("order").asText() == "C",
          "F-order zarr arrays not supported")
        val name0 = vdir.getFileName.toString
        val filtersNode = za.get("filters")
        val v2Filters: Seq[V2Filter] =
          if (filtersNode == null || filtersNode.isNull) Nil
          else {
            require(filtersNode.isArray, s"$name0: zarr filters must be a list")
            (0 until filtersNode.size()).map { i =>
              val f = filtersNode.get(i)
              val fid = Option(f.get("id")).filterNot(_.isNull)
                .map(_.asText()).getOrElse(throw new IllegalArgumentException(
                  s"$name0: zarr filter entry without an id"))
              fid match {
                case "shuffle" =>
                  val es = Option(f.get("elementsize")).filterNot(_.isNull)
                    .map(_.asInt()).getOrElse(throw new IllegalArgumentException(
                      s"$name0: shuffle filter without elementsize"))
                  require(es >= 1 && es <= 255,
                    s"$name0: shuffle elementsize $es")
                  V2Filter("shuffle", es)
                case "delta" =>
                  // numcodecs Delta can re-type via astype; decoding a
                  // re-typed stream in the wrong width is silent wrong
                  // data, so anything but dtype == astype == the
                  // array's own dtype raises
                  val dt = Option(f.get("dtype")).filterNot(_.isNull)
                    .map(_.asText())
                  val at = Option(f.get("astype")).filterNot(_.isNull)
                    .map(_.asText()).orElse(dt)
                  val arrDt = za.get("dtype").asText()
                  require(dt.forall(_ == arrDt) && at.forall(_ == arrDt),
                    s"$name0: delta filter re-types ($dt -> $at) away from " +
                      s"the array dtype $arrDt")
                  V2Filter("delta", 0)
                case o => throw new IllegalArgumentException(
                  s"$name0: unsupported zarr filter '$o' (shuffle or delta)")
              }
            }
          }
        val comp = za.get("compressor")
        val codec =
          if (comp == null || comp.isNull) ""
          else comp.get("id").asText() match {
            case "zlib" => "zlib"
            case "blosc" =>
              // frames self-describe cname/shuffle; [[Blosc]] raises on
              // the sub-codecs it can't decode (blosclz, bit-shuffle)
              "blosc"
            case other => throw new IllegalArgumentException(
              s"unsupported zarr compressor '$other' (zlib, blosc or null only)")
          }
        val shape = za.get("shape").elements().asScala.map(_.asInt()).toSeq
        val chunks = za.get("chunks").elements().asScala.map(_.asInt()).toSeq
        val name = vdir.getFileName.toString
        // v2's optional dimension_separator: "/" nests chunk dirs.
        // Defaulting to "." REGARDLESS would read every chunk of a
        // nested store as missing -> the whole array silently becomes
        // fill_value; anything but the two spec values raises.
        val sep = za.get("dimension_separator") match {
          case null => "."
          case n if n.isNull => "."
          case n if n.asText() == "." || n.asText() == "/" => n.asText()
          case n => throw new IllegalArgumentException(
            s"$name: unsupported zarr dimension_separator '${n.asText()}'")
        }
        val attrsNode =
          if (Files.exists(vdir.resolve(".zattrs")))
            mapper.readTree(Files.readAllBytes(vdir.resolve(".zattrs")))
          else mapper.createObjectNode()
        val dimNames = Option(attrsNode.get("_ARRAY_DIMENSIONS"))
          .map(_.elements().asScala.map(_.asText()).toSeq)
          .getOrElse(shape.indices.map(i => s"${name}_dim$i"))
        val attrs = attrsNode.properties().asScala.toSeq.collect {
          case e if e.getKey != "_ARRAY_DIMENSIONS" && e.getValue.isTextual =>
            e.getKey -> e.getValue.asText()
        }
        // numeric attributes feed the CF mask-and-scale decode (S6) —
        // dropping them would make a packed zarr store read RAW values
        val numAttrs = attrsNode.properties().asScala.toSeq.collect {
          case e if e.getKey != "_ARRAY_DIMENSIONS" && e.getValue.isNumber =>
            e.getKey -> e.getValue.doubleValue()
        }
        // fill_value: what a MISSING chunk reads as. Numbers and the
        // JSON-string spellings of the IEEE specials (what xarray
        // writes for float arrays: "NaN"/"Infinity"/"-Infinity")
        // decode; null (spec: undefined) stays 0. An unrecognized
        // spelling raises — silently zero-filling a store whose fill
        // is NaN would misread every absent chunk.
        val fv = za.get("fill_value") match {
          case null => 0.0
          case n if n.isNull => 0.0
          case n if n.isNumber => n.doubleValue()
          case n if n.isTextual => n.asText() match {
            case "NaN" => Double.NaN
            case "Infinity" => Double.PositiveInfinity
            case "-Infinity" => Double.NegativeInfinity
            case o => throw new IllegalArgumentException(
              s"$name: unsupported zarr fill_value '$o'")
          }
          case n => throw new IllegalArgumentException(
            s"$name: unsupported zarr fill_value $n")
        }
        val (v2t, v2be) = ncTypeOf(za.get("dtype").asText())
        ArrayMeta(name, dimNames, shape, chunks,
          v2t, codec, attrs, fv,
          promoteFill(fv, numAttrs), keySep = sep, bigEndian = v2be,
          v2Filters = v2Filters)
      }
    Meta(globals, arrays)
  }

  // ------------------------------------------------------------ v3

  private def v3NcTypeOf(dt: String): Int = dt match {
    case "float64" => NetCdf.NcDouble
    case "float32" => NetCdf.NcFloat
    case "int64" => NetCdf.NcInt64
    case "int32" => NetCdf.NcInt
    case "int16" => NetCdf.NcShort
    case "int8" | "uint8" => NetCdf.NcByte
    case other => throw new IllegalArgumentException(
      s"unsupported zarr v3 data_type '$other'")
  }

  private def v3DtypeOf(ncType: Int): String = ncType match {
    case NetCdf.NcDouble => "float64"
    case NetCdf.NcFloat => "float32"
    case NetCdf.NcInt64 => "int64"
    case NetCdf.NcInt => "int32"
    case NetCdf.NcShort => "int16"
    case NetCdf.NcByte | NetCdf.NcChar => "int8"
    case other => throw new IllegalArgumentException(s"nc_type $other")
  }

  private def v3Fill(name: String, n: JsonNode): Double = n match {
    case null => 0.0
    case x if x.isNull => 0.0
    case x if x.isNumber => x.doubleValue()
    case x if x.isTextual => x.asText() match {
      case "NaN" => Double.NaN
      case "Infinity" => Double.PositiveInfinity
      case "-Infinity" => Double.NegativeInfinity
      case o => throw new IllegalArgumentException(
        s"$name: unsupported zarr v3 fill_value '$o'")
    }
    case x => throw new IllegalArgumentException(
      s"$name: unsupported zarr v3 fill_value $x")
  }

  /** The codec chain this engine decodes: a little-endian `bytes`
    * array→bytes codec, optionally followed by ONE bytes→bytes
    * compressor (zstd — zarr-python 3's default — gzip, or blosc
    * frames), either byte order. Anything else (transpose, crc32c)
    * raises loudly rather than misreading; `sharding_indexed` is
    * handled one level up by [[parseV3Chain]], which feeds this
    * parser the INNER codec chain. Returns (compressor, big-endian?).
    */
  private def v3Codec(name: String, codecs: JsonNode): (String, Boolean) = {
    require(codecs != null && codecs.isArray && codecs.size() >= 1,
      s"$name: zarr v3 array without a codecs chain")
    val names = (0 until codecs.size()).map { i =>
      val n = codecs.get(i).get("name")
      require(n != null && !n.isNull, s"$name: zarr v3 codec entry without a name")
      n.asText()
    }
    require(names.head == "bytes",
      s"$name: unsupported zarr v3 codec chain ${names.mkString("[", ",", "]")} " +
        "(must start with 'bytes')")
    val bytesCfg = codecs.get(0).get("configuration")
    val endian = if (bytesCfg == null || bytesCfg.isNull) "little"
      else Option(bytesCfg.get("endian")).map(_.asText()).getOrElse("little")
    val be = endian match {
      case "little" => false
      case "big" => true
      case o => throw new IllegalArgumentException(
        s"$name: unsupported zarr v3 bytes endian '$o'")
    }
    val codec = names.tail match {
      case Seq() => ""
      case Seq("zstd") => "zstd"
      case Seq("gzip") => "gzip"
      case Seq("blosc") => "blosc"
      case rest => throw new IllegalArgumentException(
        s"$name: unsupported zarr v3 codec chain bytes->" +
          rest.mkString("->") + " (zstd, gzip, blosc or none)")
    }
    (codec, be)
  }

  /** Top-level zarr v3 codec chain: either a plain bytes[+compressor]
    * chain (delegated to [[v3Codec]]) or a single `sharding_indexed`
    * codec, whose configuration nests the inner chunk shape, the
    * inner chunk codec chain, and the shard-index encoding. Returns
    * (bytes->bytes codec, effective chunk shape for the scan,
    * shard layout) — under sharding the SCAN plans at inner-chunk
    * granularity, so pruning and the chunk-read unit stay as fine as
    * the data's real layout rather than the stored-file grid. */
  private def parseV3Chain(name: String, codecs: JsonNode,
      gridChunks: Seq[Int]): (String, Seq[Int], Option[Shard], Boolean) = {
    require(codecs != null && codecs.isArray && codecs.size() >= 1,
      s"$name: zarr v3 array without a codecs chain")
    val headName = codecs.get(0).get("name")
    require(headName != null && !headName.isNull,
      s"$name: zarr v3 codec entry without a name")
    if (headName.asText() != "sharding_indexed") {
      val (codec, be) = v3Codec(name, codecs)
      return (codec, gridChunks, None, be)
    }
    require(codecs.size() == 1,
      s"$name: codecs following sharding_indexed are not supported")
    val cfg = codecs.get(0).get("configuration")
    require(cfg != null && !cfg.isNull,
      s"$name: sharding_indexed without a configuration")
    val innerNode = cfg.get("chunk_shape")
    require(innerNode != null && innerNode.isArray,
      s"$name: sharding_indexed without a chunk_shape")
    val inner = innerNode.elements().asScala.map(_.asInt()).toSeq
    require(inner.length == gridChunks.length &&
      inner.zip(gridChunks).forall { case (i, s) => i > 0 && s % i == 0 },
      s"$name: shard shape ${gridChunks.mkString("x")} is not a whole " +
        s"multiple of inner chunk shape ${inner.mkString("x")}")
    val (innerCodec, innerBe) = v3Codec(name, cfg.get("codecs"))
    val ic = cfg.get("index_codecs")
    require(ic != null && ic.isArray && ic.size() >= 1,
      s"$name: sharding_indexed without index_codecs")
    val icNames = (0 until ic.size()).map { i =>
      val n = ic.get(i).get("name")
      require(n != null && !n.isNull, s"$name: index_codecs entry without a name")
      n.asText()
    }
    val crc = icNames match {
      case Seq("bytes") => false
      case Seq("bytes", "crc32c") => true // zarr-python's default
      case o => throw new IllegalArgumentException(
        s"$name: unsupported index_codecs ${o.mkString("[", ",", "]")} " +
          "(bytes or bytes+crc32c)")
    }
    val iCfg = Option(ic.get(0).get("configuration")).filterNot(_.isNull)
    val iEndian = iCfg.flatMap(c => Option(c.get("endian")))
      .map(_.asText()).getOrElse("little")
    require(iEndian == "little", s"$name: big-endian shard index")
    val atEnd = Option(cfg.get("index_location")).filterNot(_.isNull)
      .map(_.asText()).getOrElse("end") match {
      case "end" => true
      case "start" => false
      case o => throw new IllegalArgumentException(
        s"$name: unsupported index_location '$o'")
    }
    (innerCodec, inner, Some(Shard(gridChunks, atEnd, crc)), innerBe)
  }

  /** Zarr v3 group parse (`zarr.json` metadata, the format zarr-python
    * 3 — and therefore current xarray `to_zarr` — writes by default):
    * regular chunk grids, default or v2 chunk-key encodings,
    * `dimension_names`, typed fill_value, attributes. Produces the
    * same [[ArrayMeta]] the v2 parser does, so every downstream path —
    * whole-store read, per-chunk distributed scan, CF decode — is
    * version-agnostic. */
  private def metaV3(root: Path): Meta = {
    val rj = mapper.readTree(Files.readAllBytes(root.resolve("zarr.json")))
    require(rj.get("zarr_format").asInt() == 3, "zarr.json with zarr_format != 3")
    require(rj.get("node_type").asText() == "group",
      s"${root.getFileName}: root zarr.json is not a group")
    val globals = Option(rj.get("attributes")).filterNot(_.isNull)
      .map(a => a.properties().asScala.toSeq.collect {
        case e if e.getValue.isTextual => e.getKey -> e.getValue.asText()
        case e if e.getValue.isNumber => e.getKey -> e.getValue.asText()
      }).getOrElse(Nil)
    val arrays = Files.list(root).iterator().asScala
      .filter(p => Files.isDirectory(p) && Files.exists(p.resolve("zarr.json")))
      .toSeq.sortBy(_.getFileName.toString)
      .map { vdir =>
        val name = vdir.getFileName.toString
        val za = mapper.readTree(Files.readAllBytes(vdir.resolve("zarr.json")))
        require(za.get("zarr_format").asInt() == 3,
          s"$name: zarr_format != 3 inside a v3 store")
        require(za.get("node_type").asText() == "array",
          s"$name: nested groups not supported")
        val shape = za.get("shape").elements().asScala.map(_.asInt()).toSeq
        val grid = za.get("chunk_grid")
        require(grid.get("name").asText() == "regular",
          s"$name: non-regular chunk grid")
        val chunks = grid.get("configuration").get("chunk_shape")
          .elements().asScala.map(_.asInt()).toSeq
        val (sep, prefixC) = Option(za.get("chunk_key_encoding"))
          .filterNot(_.isNull) match {
          case None => ("/", true) // spec default: "default" encoding
          case Some(cke) =>
            val cfg = Option(cke.get("configuration")).filterNot(_.isNull)
            val s = cfg.flatMap(c => Option(c.get("separator")))
              .map(_.asText())
            cke.get("name").asText() match {
              case "default" => (s.getOrElse("/"), true)
              case "v2" => (s.getOrElse("."), false)
              case o => throw new IllegalArgumentException(
                s"$name: unsupported chunk_key_encoding '$o'")
            }
        }
        val (codec, chunksEff, shardOpt, bigEndian) =
          parseV3Chain(name, za.get("codecs"), chunks)
        val fv = v3Fill(name, za.get("fill_value"))
        val attrsNode = Option(za.get("attributes")).filterNot(_.isNull)
        val attrs = attrsNode.map(_.properties().asScala.toSeq.collect {
          case e if e.getValue.isTextual => e.getKey -> e.getValue.asText()
        }).getOrElse(Nil)
        val numAttrs = attrsNode.map(_.properties().asScala.toSeq.collect {
          case e if e.getValue.isNumber => e.getKey -> e.getValue.doubleValue()
        }).getOrElse(Nil)
        val dimNames = Option(za.get("dimension_names")).filterNot(_.isNull)
          .map(_.elements().asScala.map(_.asText()).toSeq)
          .getOrElse(shape.indices.map(i => s"${name}_dim$i"))
        ArrayMeta(name, dimNames, shape, chunksEff,
          v3NcTypeOf(za.get("data_type").asText()), codec, attrs, fv,
          promoteFill(fv, numAttrs), sep, prefixC, shardOpt, bigEndian)
      }
    Meta(globals, arrays)
  }

  /** Fetch + decode ONE chunk (by per-axis chunk index) as doubles in
    * chunk-local C order — the distributed scan's unit of IO. The
    * returned array spans the full chunk extent (edge chunks padded
    * with the fill), as the spec stores them. */
  def readChunkDouble(dir: String, am: ArrayMeta, idx: Seq[Int]): Array[Double] = {
    require(idx.length == am.shape.length, s"rank mismatch $idx vs ${am.shape}")
    val p = Paths.get(dir).resolve(am.name).resolve(am.chunkKey(idx))
    // overflow-checked: crafted .zarray chunk dims must reject, not
    // wrap to a negative/garbage allocation size
    // one chunk is the IO unit — cap it at 64M elements (512 MB of
    // doubles): a crafted .zarray otherwise demands a multi-GB
    // zero-fill for a MISSING chunk, an allocation no file bounds
    val elems = am.chunks.foldLeft(1L) { (a, d) =>
      require(d > 0, s"${am.name}: chunk dim $d")
      val prod = a * d
      require(prod / d == a && prod <= (1L << 26),
        s"${am.name}: chunk of ${am.chunks} elements exceeds the 2^26 cap")
      prod
    }.toInt
    val rawLen = elems * NetCdf.typeSize(am.ncType)
    // a MISSING chunk file reads as the store's declared fill_value
    // (zarr v2 spec) — xarray writes "NaN" fills for float data, so
    // zero-filling here would silently misread real stores
    val encoded: Array[Byte] = am.shard match {
      case None =>
        if (!Files.exists(p)) return Array.fill(elems)(am.fill)
        Files.readAllBytes(p)
      case Some(sh) =>
        readInnerChunk(dir, am, sh, idx) match {
          case null => return Array.fill(elems)(am.fill)
          case b => b
        }
    }
    var bytes = decodeBytes(s"${am.name}/${idx.mkString(".")}",
      am.codec, encoded, rawLen)
    // undo v2 filters in reverse encode order (encode ran
    // array -> delta -> shuffle -> compressor)
    am.v2Filters.reverse.foreach { f =>
      bytes = f.id match {
        case "shuffle" => unshuffleBytes(bytes, f.param)
        case _ => undeltaBytes(bytes, am.ncType, am.bigEndian)
      }
    }
    val buf = ByteBuffer.wrap(bytes).order(
      if (am.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](elems)
    var i = 0
    am.ncType match {
      case NetCdf.NcDouble => while (i < elems) { out(i) = buf.getDouble; i += 1 }
      case NetCdf.NcFloat => while (i < elems) { out(i) = buf.getFloat; i += 1 }
      case NetCdf.NcInt64 => while (i < elems) { out(i) = buf.getLong.toDouble; i += 1 }
      case NetCdf.NcInt => while (i < elems) { out(i) = buf.getInt.toDouble; i += 1 }
      case NetCdf.NcShort => while (i < elems) { out(i) = buf.getShort.toDouble; i += 1 }
      case _ => while (i < elems) { out(i) = buf.get().toDouble; i += 1 }
    }
    out
  }

  /** Decode one chunk's encoded bytes to exactly `rawLen` raw bytes
    * (shared by the plain per-file chunk path and the sharded inner
    * chunks, which carry the same bytes->bytes codec choices). */
  private def decodeBytes(label: String, codec: String, z: Array[Byte],
      rawLen: Int): Array[Byte] = {
    val bytes = codec match {
      case "zlib" => inflate(z, rawLen)
      case "blosc" => Blosc.decompress(z, rawLen)
      case "zstd" => // zarr-python 3's default compressor
        val out = new Array[Byte](rawLen)
        val n = com.github.luben.zstd.Zstd.decompressByteArray(
          out, 0, rawLen, z, 0, z.length)
        require(n == rawLen, s"$label: zstd chunk yielded $n of $rawLen bytes")
        out
      case "gzip" =>
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(z))
        try {
          val out = new Array[Byte](rawLen)
          var off = 0
          while (off < rawLen) {
            val n = in.read(out, off, rawLen - off)
            require(n > 0, s"$label: truncated gzip chunk at $off of $rawLen")
            off += n
          }
          require(in.read() == -1, s"$label: gzip chunk larger than $rawLen")
          out
        } finally in.close()
      case _ => z
    }
    require(bytes.length == rawLen,
      s"$label: ${bytes.length} bytes, want $rawLen")
    bytes
  }

  /** Shard-index memo: one shard's index is read once per (file, size,
    * mtime) and reused across the shard's inner chunks — an executor
    * task walking consecutive inner chunks of one shard would
    * otherwise re-read and re-checksum the same index per chunk. Keyed
    * by (path, size, mtime-ns) so a rewritten store is re-read;
    * bounded LRU so long-running executors don't accumulate. The key
    * also carries the filesystem's fileKey (inode identity, ADVICE
    * r15): the common atomic rename-replace rewrite produces a NEW
    * inode, so it misses the memo even when the replacement has the
    * same size and lands within one mtime tick of a coarse-timestamp
    * filesystem (1 s on ext3/old NFS). Assumption, stated: stores are
    * immutable while being scanned (the standard analytics contract —
    * Parquet footer caches make the same one). The residual hazard
    * narrows to an in-place same-inode same-size rewrite within one
    * mtime tick; detecting that would require re-reading the very
    * bytes the memo exists to skip. */
  private val shardIndexMemo =
    new java.util.LinkedHashMap[(String, Long, Long, String), Array[Long]](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long, String), Array[Long]])
          : Boolean = size() > 16
    }

  /** Read one shard's (offset, nbytes) index: `2 * nInner` longs in
    * C order over the shard's inner-chunk grid, verified against the
    * trailing crc32c when the store declares one. Every field is
    * untrusted: the index length is bounded before allocation and the
    * checksum gates corrupted tables before any offset is followed. */
  private def readShardIndex(p: Path, nInner: Int, sh: Shard,
      size: Long, label: String): Array[Long] = {
    // nanosecond mtime: a store rewritten in place within one
    // millisecond (test harnesses do) must not serve a stale index;
    // fileKey (inode) so a rename-replace always misses (null where
    // the filesystem offers none — then mtime+size carry the key)
    val attrs = Files.readAttributes(p,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    val key = (p.toAbsolutePath.toString, size,
      attrs.lastModifiedTime.to(java.util.concurrent.TimeUnit.NANOSECONDS),
      String.valueOf(attrs.fileKey()))
    shardIndexMemo.synchronized {
      val hit = shardIndexMemo.get(key)
      if (hit != null) return hit
    }
    val idxLen = nInner.toLong * 16 + (if (sh.indexCrc) 4L else 0L)
    require(idxLen <= size,
      s"$label: shard index of $idxLen bytes exceeds the $size-byte shard")
    val ch = java.nio.channels.FileChannel.open(p)
    val buf = try {
      val b = ByteBuffer.allocate(idxLen.toInt).order(ByteOrder.LITTLE_ENDIAN)
      val base = if (sh.indexAtEnd) size - idxLen else 0L
      while (b.hasRemaining) {
        val n = ch.read(b, base + b.position())
        require(n > 0, s"$label: truncated shard index")
      }
      b
    } finally ch.close()
    if (sh.indexCrc) {
      val crc = new java.util.zip.CRC32C()
      crc.update(buf.array(), 0, nInner * 16)
      val stored = buf.getInt(nInner * 16)
      require(crc.getValue.toInt == stored,
        s"$label: shard index crc32c mismatch")
    }
    val out = new Array[Long](nInner * 2)
    var i = 0
    while (i < out.length) { out(i) = buf.getLong(i * 8); i += 1 }
    // memoize only sanely-sized indexes: the per-read allocation is
    // capped elsewhere at 2^22 entries, but 16 RETAINED entries of
    // that size would pin ~1 GB — a hostile store must not turn the
    // memo into a leak. 2^17 entries (2 MB) covers any real shard.
    if (nInner <= (1 << 17))
      shardIndexMemo.synchronized { shardIndexMemo.put(key, out) }
    out
  }

  /** Locate + read ONE inner chunk's encoded bytes from its shard
    * file, or null when the inner chunk (or its whole shard) is
    * missing — the caller fills. Only the index and the inner chunk's
    * own byte range are read, never the whole shard: at scale a shard
    * is many inner chunks and a pruned scan must not pay for its
    * neighbours. */
  private def readInnerChunk(dir: String, am: ArrayMeta, sh: Shard,
      idx: Seq[Int]): Array[Byte] = {
    val label = s"${am.name}/${idx.mkString(".")}"
    // inner chunks per shard axis: metaV3 validated divisibility
    val ipc = sh.shape.zip(am.chunks).map { case (s, c) => s / c }
    val nInner = ipc.foldLeft(1L) { (a, n) =>
      val prod = a * n
      // 2^22 entries x 16 bytes = a 64 MB index: far above any real
      // shard, and a bound hostile metadata cannot push past
      require(n > 0 && prod / n == a && prod <= (1L << 22),
        s"$label: shard of ${ipc.mkString("x")} inner chunks exceeds the 2^22 cap")
      prod
    }.toInt
    val shardIdx = idx.zip(ipc).map { case (i, n) => i / n }
    val p = Paths.get(dir).resolve(am.name).resolve(am.chunkKey(shardIdx))
    if (!Files.exists(p)) return null
    val size = Files.size(p)
    val index = readShardIndex(p, nInner, sh, size, label)
    // C-order linear index of this inner chunk within its shard
    val li = idx.zip(ipc).foldLeft(0L) { case (acc, (i, n)) => acc * n + i % n }
      .toInt
    val off = index(2 * li)
    val len = index(2 * li + 1)
    if (off == -1L && len == -1L) return null // spec: missing inner chunk
    // untrusted u64s read as Longs: anything outside [0, size] — which
    // includes the negative image of large hostile values — rejects
    require(off >= 0 && len >= 0 && len <= size && off <= size - len,
      s"$label: inner chunk at $off+$len outside the $size-byte shard")
    val ch = java.nio.channels.FileChannel.open(p)
    try {
      val b = ByteBuffer.allocate(len.toInt)
      while (b.hasRemaining) {
        val n = ch.read(b, off + b.position())
        require(n > 0, s"$label: truncated inner chunk")
      }
      b.array()
    } finally ch.close()
  }

  /** Inverse of numcodecs' byte shuffle: input is `elemSize` planes
    * of one byte each, output interleaves them back to elements (the
    * trailing non-multiple bytes ride verbatim, as numcodecs does). */
  private def unshuffleBytes(src: Array[Byte], elemSize: Int): Array[Byte] = {
    if (elemSize <= 1) return src
    val out = new Array[Byte](src.length)
    val nel = src.length / elemSize
    var k = 0
    while (k < elemSize) {
      var i = 0
      while (i < nel) {
        out(i * elemSize + k) = src(k * nel + i)
        i += 1
      }
      k += 1
    }
    System.arraycopy(src, nel * elemSize, out, nel * elemSize,
      src.length - nel * elemSize)
    out
  }

  /** Inverse of numcodecs' delta: running sum in the ARRAY'S OWN TYPE
    * (integer wrap round-trips exactly; float delta sums in its own
    * width). In-place over the decoded chunk bytes. */
  private def undeltaBytes(bytes: Array[Byte], ncType: Int,
      bigEndian: Boolean): Array[Byte] = {
    val buf = ByteBuffer.wrap(bytes).order(
      if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    ncType match {
      case NetCdf.NcDouble =>
        var acc = 0.0; var i = 0
        while (i < bytes.length) {
          acc += buf.getDouble(i); buf.putDouble(i, acc); i += 8 }
      case NetCdf.NcFloat =>
        var acc = 0.0f; var i = 0
        while (i < bytes.length) {
          acc += buf.getFloat(i); buf.putFloat(i, acc); i += 4 }
      case NetCdf.NcInt64 =>
        var acc = 0L; var i = 0
        while (i < bytes.length) {
          acc += buf.getLong(i); buf.putLong(i, acc); i += 8 }
      case NetCdf.NcInt =>
        var acc = 0; var i = 0
        while (i < bytes.length) {
          acc += buf.getInt(i); buf.putInt(i, acc); i += 4 }
      case NetCdf.NcShort =>
        var acc: Short = 0; var i = 0
        while (i < bytes.length) {
          acc = (acc + buf.getShort(i)).toShort; buf.putShort(i, acc); i += 2 }
      case _ =>
        var acc: Byte = 0; var i = 0
        while (i < bytes.length) {
          acc = (acc + bytes(i)).toByte; bytes(i) = acc; i += 1 }
    }
    bytes
  }

  /** Whole-store read into the shared [[NetCdf.NcFile]] model (small
    * stores / coordinate variables; the scan path goes chunk-by-chunk
    * through [[readChunkDouble]]). Dims are the first-seen (name,
    * size) pairs across arrays, in declaration order. */
  def read(dir: String, maskAndScale: Boolean = true): NcFile = {
    val m = meta(dir)
    val dims = scala.collection.mutable.LinkedHashMap[String, Int]()
    m.arrays.foreach { am =>
      am.dimNames.zip(am.shape).foreach { case (n, s) =>
        dims.get(n) match {
          case Some(prev) => require(prev == s,
            s"dimension $n: conflicting sizes $prev vs $s")
          case None => dims(n) = s
        }
      }
    }
    val dimSeq = dims.toSeq.map { case (n, s) => Dim(n, s) }
    val vars = m.arrays.map { am =>
      val dimIds = am.dimNames.map(n => dimSeq.indexWhere(_.name == n))
      val flat = assembleDouble(dir, am)
      val data: Array[_] = am.ncType match {
        case NetCdf.NcDouble => flat
        case NetCdf.NcFloat => flat.map(_.toFloat)
        case NetCdf.NcInt64 => flat.map(_.toLong)
        case NetCdf.NcInt | NetCdf.NcShort => flat.map(_.toInt)
        case _ => flat.map(_.toByte)
      }
      val v = Var(am.name, dimIds, am.ncType, am.attrs, data, am.numAttrs)
      // same CF mask-and-scale default as NetCdf.read (S6) — a packed
      // zarr store decodes identically through every container
      if (maskAndScale) NetCdf.maskAndScaleVar(v) else v
    }
    NcFile(dimSeq, m.globalAttrs, vars)
  }

  /** Stitch all chunks of one array into a flat C-order Array[Double]. */
  def assembleDouble(dir: String, am: ArrayMeta): Array[Double] = {
    val out = new Array[Double](am.shape.product.max(1))
    val nc = am.nChunks
    val idxs = nc.foldLeft(Seq(Seq.empty[Int])) { (acc, n) =>
      acc.flatMap(prefix => (0 until n).map(prefix :+ _))
    }
    idxs.foreach { idx =>
      val chunk = readChunkDouble(dir, am, idx)
      copyChunk(chunk, out, am, idx)
    }
    out
  }

  /** Copy one full-extent chunk into the global array, clipping edge
    * padding. */
  private def copyChunk(chunk: Array[Double], out: Array[Double],
      am: ArrayMeta, idx: Seq[Int]): Unit = {
    val rank = am.shape.length
    if (rank == 0) { out(0) = chunk(0); return }
    // live extent of this chunk per axis
    val live = (0 until rank).map { d =>
      math.min(am.chunks(d), am.shape(d) - idx(d) * am.chunks(d))
    }
    // strides
    val gStride = new Array[Long](rank)
    val cStride = new Array[Long](rank)
    gStride(rank - 1) = 1; cStride(rank - 1) = 1
    for (d <- rank - 2 to 0 by -1) {
      gStride(d) = gStride(d + 1) * am.shape(d + 1)
      cStride(d) = cStride(d + 1) * am.chunks(d + 1)
    }
    // iterate the live lattice over all axes but the last; memcpy rows
    def rec(d: Int, gOff: Long, cOff: Long): Unit =
      if (d == rank - 1) {
        System.arraycopy(chunk, cOff.toInt, out, gOff.toInt, live(rank - 1))
      } else {
        var i = 0
        while (i < live(d)) {
          rec(d + 1, gOff + i * gStride(d), cOff + i * cStride(d))
          i += 1
        }
      }
    val gBase = (0 until rank).map(d => idx(d).toLong * am.chunks(d) * gStride(d)).sum
    rec(0, gBase, 0L)
  }
}
