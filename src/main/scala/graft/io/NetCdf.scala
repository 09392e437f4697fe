package graft.io

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

/** Minimal NetCDF-3 classic writer/reader — CDF-1, CDF-2 (64-bit
  * offsets) and CDF-5 (64-bit sizes + INT64), from the published
  * classic-format spec (the reference's native interchange:
  * `xr.open_dataset` wrf_voronoi.py:115, haduk_voronoi.py:33,
  * delphine/regrid.py:208,249; `to_netcdf` sink delphine/regrid.py:330
  * — SURVEY §2.1 S1/S4).
  *
  * Format deltas per the spec's grammar: CDF-2 widens only the variable
  * `begin` offset to 64 bits; CDF-5 widens every NON_NEG entity
  * (numrecs, list counts, name lengths, dim sizes, dimids, vsize) to 64
  * bits and adds the extended types (INT64 here). Tags and nc_type stay
  * 4 bytes; padding stays 4-byte alignment.
  *
  * Scope: fixed-size dimensions only (no record dimension — the
  * reference's grids are materialized model output, not appended
  * series), types CHAR/BYTE/SHORT/INT/FLOAT/DOUBLE (+INT64 in CDF-5),
  * dimension + variable + attribute headers. All values big-endian.
  */
object NetCdf {

  final case class Dim(name: String, size: Int)
  /** `data` length must be the product of the dim sizes; element type
    * must match `ncType` (Double for DOUBLE, Float for FLOAT, Int for
    * INT/SHORT/BYTE, Byte for CHAR, Long for INT64). */
  final case class Var(name: String, dimIds: Seq[Int], ncType: Int,
    attrs: Seq[(String, String)], data: Array[_],
    numAttrs: Seq[(String, Double)] = Nil)

  val NcByte = 1; val NcChar = 2; val NcShort = 3
  val NcInt = 4; val NcFloat = 5; val NcDouble = 6
  val NcInt64 = 10 // CDF-5 extended type

  private[io] def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble | NcInt64 => 8
    case other => throw new IllegalArgumentException(s"nc_type $other")
  }

  private def pad4(n: Long): Long = (n + 3) & ~3L

  // ------------------------------------------------------------ writer

  private final class W(version: Int) {
    val out = new ArrayBuffer[Byte](1 << 16)
    private val wide = version == 5 // NON_NEG width
    def u32(v: Int): Unit =
      out += (v >>> 24).toByte += (v >>> 16).toByte += (v >>> 8).toByte += v.toByte
    def u64(v: Long): Unit = { u32((v >>> 32).toInt); u32(v.toInt) }
    /** NON_NEG: 32-bit in CDF-1/2, 64-bit in CDF-5. */
    def size(v: Long): Unit = if (wide) u64(v) else u32(v.toInt)
    /** OFFSET: 32-bit in CDF-1, 64-bit in CDF-2/5. */
    def offsetWidth: Int = if (version == 1) 4 else 8
    def name(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      size(b.length)
      out ++= b
      (b.length until pad4(b.length).toInt).foreach(_ => out += 0)
    }
    def textAttr(k: String, v: String): Unit = {
      name(k)
      u32(NcChar)
      val b = v.getBytes("UTF-8")
      size(b.length)
      out ++= b
      (b.length until pad4(b.length).toInt).foreach(_ => out += 0)
    }
    /** One scalar numeric attribute, typed: `_FillValue` and
      * `missing_value` are written in the VARIABLE's own type (the CF
      * requirement — strict readers check the match), everything else
      * (scale_factor, add_offset...) as DOUBLE. */
    def numAttr(k: String, v: Double, varType: Int): Unit = {
      name(k)
      val t = if ((k == "_FillValue" || k == "missing_value") &&
        varType != NcChar) varType else NcDouble
      u32(t); size(1)
      val es = typeSize(t)
      val b = ByteBuffer.allocate(pad4(es).toInt)
      t match {
        case NcDouble => b.putDouble(v)
        case NcFloat => b.putFloat(v.toFloat)
        case NcInt => b.putInt(v.toInt)
        case NcInt64 => b.putLong(v.toLong)
        case NcShort => b.putShort(v.toShort)
        case NcByte => b.put(v.toByte)
      }
      out ++= b.array()
    }
    def attrList(attrs: Seq[(String, String)],
        numAttrs: Seq[(String, Double)] = Nil, varType: Int = NcChar): Unit =
      if (attrs.isEmpty && numAttrs.isEmpty) { u32(0); size(0) }
      else {
        u32(0x0C); size(attrs.size + numAttrs.size)
        attrs.foreach { case (k, v) => textAttr(k, v) }
        numAttrs.foreach { case (k, v) => numAttr(k, v, varType) }
      }
  }

  /** Write a classic NetCDF file; `version` ∈ {1 (CDF-1), 2 (CDF-2),
    * 5 (CDF-5)}. */
  def write(path: String, dims: Seq[Dim], globalAttrs: Seq[(String, String)],
      vars: Seq[Var], version: Int = 1): Unit = {
    require(Set(1, 2, 5)(version), s"CDF version $version")
    vars.foreach { v =>
      val n = v.dimIds.map(dims(_).size.toLong).product
      require(v.data.length == n, s"${v.name}: ${v.data.length} values for $n cells")
      require(v.ncType != NcInt64 || version == 5,
        s"${v.name}: INT64 requires CDF-5")
    }
    val w = new W(version)
    w.out += 'C'.toByte += 'D'.toByte += 'F'.toByte += version.toByte
    w.size(0) // numrecs (no record dimension)
    // dim_list
    if (dims.isEmpty) { w.u32(0); w.size(0) }
    else {
      w.u32(0x0A); w.size(dims.size)
      dims.foreach { d => w.name(d.name); w.size(d.size) }
    }
    w.attrList(globalAttrs)
    // var_list with begin offsets patched after layout
    val beginPos = new ArrayBuffer[Int]
    if (vars.isEmpty) { w.u32(0); w.size(0) }
    else {
      w.u32(0x0B); w.size(vars.size)
      vars.foreach { v =>
        w.name(v.name)
        w.size(v.dimIds.size)
        v.dimIds.foreach(d => w.size(d))
        w.attrList(v.attrs, v.numAttrs, v.ncType)
        w.u32(v.ncType)
        w.size(pad4(v.data.length.toLong * typeSize(v.ncType)))
        beginPos += w.out.length
        if (w.offsetWidth == 8) w.u64(0L) else w.u32(0) // begin, patched
      }
    }
    // data layout
    var offset = w.out.length.toLong
    val begins = vars.map { v =>
      val b = offset
      offset += pad4(v.data.length.toLong * typeSize(v.ncType))
      b
    }
    val bytes = new Array[Byte](offset.toInt)
    w.out.copyToArray(bytes)
    beginPos.zip(begins).foreach { case (pos, b) =>
      if (w.offsetWidth == 8) ByteBuffer.wrap(bytes, pos, 8).putLong(b)
      else ByteBuffer.wrap(bytes, pos, 4).putInt(b.toInt)
    }
    vars.zip(begins).foreach { case (v, b) =>
      val buf = ByteBuffer.wrap(bytes, b.toInt,
        pad4(v.data.length.toLong * typeSize(v.ncType)).toInt)
      v.ncType match {
        case NcDouble => v.data.asInstanceOf[Array[Double]].foreach(buf.putDouble)
        case NcFloat => v.data.asInstanceOf[Array[Float]].foreach(buf.putFloat)
        case NcInt => v.data.asInstanceOf[Array[Int]].foreach(buf.putInt)
        case NcInt64 => v.data.asInstanceOf[Array[Long]].foreach(buf.putLong)
        case NcShort => v.data.asInstanceOf[Array[Int]].foreach(x => buf.putShort(x.toShort))
        case NcByte | NcChar => buf.put(v.data.asInstanceOf[Array[Byte]])
      }
    }
    Files.write(Paths.get(path), bytes)
  }

  // ------------------------------------------------------------ reader

  final case class NcFile(dims: Seq[Dim], globalAttrs: Seq[(String, String)],
    vars: Seq[Var]) {
    def variable(name: String): Var = vars.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no variable $name"))
  }

  /** Header-only metadata of a classic-format variable: everything
    * needed to plan and execute RANGED data reads (the Parquet-footer
    * analogue for distributed .nc scans). */
  final case class VarMeta(name: String, dimIds: Seq[Int], ncType: Int,
    attrs: Seq[(String, String)], begin: Long, vsize: Long,
    numAttrs: Seq[(String, Double)] = Nil)
  final case class Meta(dims: Seq[Dim], globalAttrs: Seq[(String, String)],
    varsMeta: Seq[VarMeta]) {
    def varMeta(name: String): VarMeta = varsMeta.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no variable $name"))
  }

  /** Parse the classic header from a buffer positioned at byte 0. */
  private def parseMeta(buf: ByteBuffer): Meta = {
    require(buf.get() == 'C' && buf.get() == 'D' && buf.get() == 'F',
      "not a NetCDF file (neither CDF classic nor HDF5 signature)")
    val version = buf.get().toInt
    require(version == 1 || version == 2 || version == 5,
      s"unsupported CDF version $version")
    val wide = version == 5

    def size(): Long = if (wide) buf.getLong else buf.getInt.toLong
    def begin(): Long = if (version == 1) buf.getInt.toLong else buf.getLong

    val numrecs = size()
    require(numrecs == 0, "record dimension not supported")

    // Hostile-header discipline: every allocation sized from a header
    // field is bounded by the bytes actually present BEFORE allocating.
    // A crafted length (2^30 name, 2^62 count) must throw a catchable
    // IllegalArgumentException, not OOM the executor — an Error kills
    // the whole 100 TB scan task and NonFatal can't quarantine it.
    def bounded(n: Long, what: String): Int = {
      require(n >= 0 && n <= buf.remaining(),
        s"$what length $n exceeds the ${buf.remaining()} bytes present")
      n.toInt
    }
    def name(): String = {
      val n = bounded(size(), "name")
      val b = new Array[Byte](n)
      buf.get(b)
      buf.position(buf.position() + (pad4(n).toInt - n))
      new String(b, "UTF-8")
    }
    // Real files carry TYPED numeric attributes (_FillValue,
    // scale_factor, add_offset, valid_range...) alongside text ones —
    // rejecting them rejected every CF-packed file outright. Text
    // attrs and SCALAR numeric attrs are kept (the CF decode inputs);
    // multi-value numeric attrs (valid_range) parse past and drop.
    def attrList(): (Seq[(String, String)], Seq[(String, Double)]) = {
      val tag = buf.getInt; val n = size()
      require(tag == 0x0C || (tag == 0 && n == 0), s"attr tag $tag")
      val text = Seq.newBuilder[(String, String)]
      val nums = Seq.newBuilder[(String, Double)]
      (0L until n).foreach { _ =>
        val k = name()
        val t = buf.getInt
        val cntRaw = size()
        val es = typeSize(t) // throws on an unknown nc_type: reject
        // two-step bound: cntRaw alone first, so a crafted count near
        // Long.Max can't overflow the cntRaw*es product into passing
        require(cntRaw >= 0 && cntRaw <= buf.remaining() &&
          cntRaw * es <= buf.remaining(),
          s"attribute length $cntRaw exceeds the ${buf.remaining()} bytes present")
        val cnt = cntRaw.toInt
        val byteLen = cnt * es
        if (t == NcChar) {
          val b = new Array[Byte](byteLen)
          buf.get(b)
          text += (k -> new String(b, "UTF-8"))
        } else {
          if (cnt == 1) nums += (k -> (t match {
            case NcDouble => buf.getDouble
            case NcFloat => buf.getFloat.toDouble
            case NcInt => buf.getInt.toDouble
            case NcInt64 => buf.getLong.toDouble
            case NcShort => buf.getShort.toDouble
            case NcByte => buf.get().toDouble
          }))
          else buf.position(buf.position() + byteLen)
        }
        buf.position(buf.position() + (pad4(byteLen).toInt - byteLen))
      }
      (text.result(), nums.result())
    }

    val dimTag = buf.getInt; val nDims = size()
    require(dimTag == 0x0A || (dimTag == 0 && nDims == 0), s"dim tag $dimTag")
    val dims = (0L until nDims).map(_ => Dim(name(), size().toInt))
    val (gatts, _) = attrList()
    val varTag = buf.getInt; val nVars = size()
    require(varTag == 0x0B || (varTag == 0 && nVars == 0), s"var tag $varTag")
    val vars = (0L until nVars).map { _ =>
      val vn = name()
      // each dim id consumes ≥4 bytes: a crafted count would otherwise
      // materialize a multi-GB id vector before underflowing
      val ndRaw = size()
      require(ndRaw >= 0 && ndRaw <= buf.remaining() / 4,
        s"dim-id count $ndRaw exceeds the ${buf.remaining()} bytes present")
      val nd = ndRaw.toInt
      val dimIds = (0 until nd).map(_ => size().toInt)
      val (vatts, vnums) = attrList()
      val t = buf.getInt
      val vsize = size()
      val b0 = begin()
      VarMeta(vn, dimIds, t, vatts, b0, vsize, vnums)
    }
    Meta(dims.toSeq, gatts, vars.toSeq)
  }

  /** Metadata-only read of a classic file: parses a growing prefix
    * until the header fits — data bytes are never touched (the
    * Parquet-footer analogue; used by the distributed GridSource). */
  def readMeta(path: String): Meta = {
    val total = Files.size(Paths.get(path))
    var take = math.min(total, 1L << 16).toInt
    while (true) {
      val f = new java.io.RandomAccessFile(path, "r")
      val bytes = new Array[Byte](take)
      try { f.readFully(bytes) } finally f.close()
      try return parseMeta(ByteBuffer.wrap(bytes))
      catch {
        // IllegalArgumentException: the hostile-header bounds in
        // parseMeta fire against the PREFIX's remaining bytes — a
        // valid long header must grow and re-parse; only at
        // take == total is the bound (and any other reject) final
        case _: java.nio.BufferUnderflowException
            | _: IndexOutOfBoundsException
            | _: IllegalArgumentException if take < total =>
          take = math.min(total, take.toLong * 4).toInt
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def decodeNumeric(bytes: Array[Byte], ncType: Int, n: Int): Array[Double] = {
    val db = ByteBuffer.wrap(bytes)
    ncType match {
      case NcDouble => Array.fill(n)(db.getDouble)
      case NcFloat => Array.fill(n)(db.getFloat.toDouble)
      case NcInt => Array.fill(n)(db.getInt.toDouble)
      case NcInt64 => Array.fill(n)(db.getLong.toDouble)
      case NcShort => Array.fill(n)(db.getShort.toDouble)
      case NcByte => Array.fill(n)(db.get().toDouble)
      case other => throw new IllegalArgumentException(s"nc_type $other is not numeric")
    }
  }

  private def ranged(path: String, offset: Long, len: Int): Array[Byte] = {
    val f = new java.io.RandomAccessFile(path, "r")
    try { f.seek(offset); val b = new Array[Byte](len); f.readFully(b); b }
    finally f.close()
  }

  /** `dims` product checked against the bytes actually present from
    * `begin` — a crafted header claiming 2^30 elements must throw, not
    * allocate gigabytes (see the parseMeta hostile-header note). */
  private def checkedCount(dimSizes: Seq[Long], es: Int, begin: Long,
      avail: Long, what: String): Int = {
    require(dimSizes.forall(_ >= 0),
      s"$what: negative dimension sizes $dimSizes")
    // any zero dim → zero elements, valid regardless of the other
    // dims' magnitudes (dims like [900, 0] need 0 bytes; bounding each
    // dim or partial product would wrongly reject them) — but the
    // variable's begin offset must still be in range: a hostile header
    // can pair a zero-element shape with an out-of-file begin, and the
    // downstream reader trusts begin once the header passes
    if (dimSizes.contains(0L)) {
      require(begin >= 0 && begin <= avail,
        s"$what: begin $begin out of range")
      return 0
    }
    require(dimSizes.forall(d => d <= avail),
      s"$what: dimension sizes $dimSizes out of range")
    // Cap each partial product at what could possibly fit in the file:
    // checking only "the product fits in a Long" is not enough, because
    // n up to ~2e18 makes n * es wrap negative and n.toInt wrap to an
    // arbitrary small value (the exact OOM class this guard targets).
    require(begin >= 0 && begin <= avail, s"$what: begin $begin out of range")
    val maxN = math.min((Int.MaxValue / es).toLong, (avail - begin) / es)
    val n = dimSizes.foldLeft(1L) { (a, d) =>
      val p = a * d
      require(p / d == a && p >= 0 && p <= maxN,
        s"$what: element count exceeds $maxN elements presentable in $avail file bytes")
      p
    }
    require(n <= maxN,
      s"$what: $n elements x $es bytes at offset $begin exceeds $avail file bytes")
    n.toInt
  }

  /** Whole numeric variable as doubles, via one ranged read. */
  def readVarDouble(path: String, meta: Meta, vm: VarMeta): Array[Double] = {
    val es = typeSize(vm.ncType)
    val n = checkedCount(vm.dimIds.map(meta.dims(_).size.toLong), es,
      vm.begin, Files.size(Paths.get(path)), vm.name)
    decodeNumeric(ranged(path, vm.begin, n * es), vm.ncType, n)
  }

  /** One leading-dimension slab (e.g. one time step of a (t,y,x) var)
    * as doubles — reads ONLY that slab's byte range. */
  def readVarSlabDouble(path: String, meta: Meta, vm: VarMeta,
      slab: Int): Array[Double] = {
    require(vm.dimIds.nonEmpty, s"${vm.name}: scalar variable has no slabs")
    val es = typeSize(vm.ncType)
    val total = Files.size(Paths.get(path))
    val rest = checkedCount(vm.dimIds.tail.map(meta.dims(_).size.toLong),
      es, vm.begin, total, vm.name)
    val off = vm.begin + slab.toLong * rest * es
    require(off >= 0 && off + rest.toLong * es <= total,
      s"${vm.name}: slab $slab at offset $off exceeds $total file bytes")
    decodeNumeric(ranged(path, off, rest * es), vm.ncType, rest)
  }

  /** CF mask-and-scale decode — the same semantics the reference gets
    * from xarray's `open_dataset` defaults (`mask_and_scale=True`):
    * raw values equal to `_FillValue` (or `missing_value`) become NaN,
    * everything else becomes `raw * scale_factor + add_offset`, as
    * DOUBLE. Identity when none of the three attributes is present —
    * so unpacked files (everything this library writes by default)
    * read bit-identically with or without the decode. Raw-vs-fill
    * comparison happens BEFORE scaling, per CF. */
  /** Slab-level CF decode over already-double values — shared by the
    * whole-file reader and the distributed scan's per-slab path, so a
    * packed file reads identically through both. Returns the input
    * array unchanged (same reference) when no packing attr applies. */
  /** `unsignedBits` > 0 reinterprets sign-extended raw values as
    * unsigned of that width FIRST (the `_Unsigned = "true"` convention
    * classic NetCDF uses for unsigned data, applied before
    * scale/offset exactly as xarray does); the fill value, if negative
    * in signed space, is reinterpreted the same way so either spelling
    * of the sentinel matches. */
  private[graft] def maskAndScaleSlab(a: Array[Double],
      numAttrs: Seq[(String, Double)],
      unsignedBits: Int = 0): Array[Double] = {
    val num = numAttrs.toMap
    val scale = num.get("scale_factor")
    val offset = num.get("add_offset")
    val fill0 = num.get("_FillValue").orElse(num.get("missing_value"))
    if (scale.isEmpty && offset.isEmpty && fill0.isEmpty && unsignedBits == 0) a
    else {
      val wrap = if (unsignedBits > 0) math.pow(2.0, unsignedBits) else 0.0
      def toUnsigned(x: Double): Double =
        if (unsignedBits > 0 && x < 0) x + wrap else x
      val fill = fill0.map(toUnsigned)
      val s = scale.getOrElse(1.0)
      val o = offset.getOrElse(0.0)
      a.map { x0 =>
        val x = toUnsigned(x0)
        if (fill.exists(f => x == f || (f.isNaN && x.isNaN))) Double.NaN
        else x * s + o
      }
    }
  }

  /** Width for the `_Unsigned` reinterpretation: the declared-true
    * attr on a signed integer type, else 0 (no-op). */
  private[graft] def unsignedBitsOf(ncType: Int,
      attrs: Seq[(String, String)]): Int =
    if (attrs.exists { case (k, v) =>
      k == "_Unsigned" && v.trim.equalsIgnoreCase("true")
    }) ncType match {
      case NcByte => 8
      case NcShort => 16
      case NcInt => 32
      case _ => 0
    } else 0

  private[io] def maskAndScaleVar(v: Var): Var = {
    val num = v.numAttrs.toMap
    val uBits = unsignedBitsOf(v.ncType, v.attrs)
    if ((!num.contains("scale_factor") && !num.contains("add_offset") &&
      !num.contains("_FillValue") && !num.contains("missing_value") &&
      uBits == 0) || v.ncType == NcChar) return v
    val raw: Array[Double] = v.data match {
      case a: Array[Double] => a
      case a: Array[Float] => a.map(_.toDouble)
      case a: Array[Int] => a.map(_.toDouble)
      case a: Array[Long] => a.map(_.toDouble)
      case a: Array[Byte] => a.map(_.toDouble)
      case _ => return v
    }
    Var(v.name, v.dimIds, NcDouble, v.attrs,
      maskAndScaleSlab(raw, v.numAttrs, uBits), v.numAttrs)
  }

  /** Read either container: classic CDF-1/2/5 or NetCDF-4 (HDF5,
    * dispatched to [[Hdf5.read]] on the \x89HDF signature).
    * `maskAndScale` (default true, matching xarray/the reference)
    * applies the CF decode to every variable carrying packing/fill
    * attributes. */
  def read(path: String, maskAndScale: Boolean = true): NcFile = {
    val f = readRaw(path)
    if (maskAndScale) f.copy(vars = f.vars.map(maskAndScaleVar)) else f
  }

  private def readRaw(path: String): NcFile = {
    val bytes = Files.readAllBytes(Paths.get(path))
    if (Hdf5.isHdf5(bytes)) return Hdf5.read(path)
    val meta = parseMeta(ByteBuffer.wrap(bytes))
    val vars = meta.varsMeta.map { vm =>
      val n = checkedCount(vm.dimIds.map(meta.dims(_).size.toLong),
        typeSize(vm.ncType), vm.begin, bytes.length.toLong, vm.name)
      val db = ByteBuffer.wrap(bytes, vm.begin.toInt, vm.vsize.toInt)
      val data: Array[_] = vm.ncType match {
        case NcDouble => Array.fill(n)(db.getDouble)
        case NcFloat => Array.fill(n)(db.getFloat)
        case NcInt => Array.fill(n)(db.getInt)
        case NcInt64 => Array.fill(n)(db.getLong)
        case NcShort => Array.fill(n)(db.getShort.toInt)
        case NcByte | NcChar =>
          val b = new Array[Byte](n); db.get(b); b
        case other => throw new IllegalArgumentException(s"nc_type $other")
      }
      Var(vm.name, vm.dimIds, vm.ncType, vm.attrs, data, vm.numAttrs)
    }
    NcFile(meta.dims, meta.globalAttrs, vars)
  }
}
