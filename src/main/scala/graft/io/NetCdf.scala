package graft.io

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

/** Minimal NetCDF-3 classic (CDF-1) writer/reader, from the published
  * format spec (the reference's native interchange: `xr.open_dataset`
  * wrf_voronoi.py:115, haduk_voronoi.py:33, delphine/regrid.py:208,249;
  * `to_netcdf` sink delphine/regrid.py:330 — SURVEY §2.1 S1/S4).
  *
  * Scope: fixed-size dimensions only (no record dimension — the
  * reference's grids are materialized model output, not appended
  * series), types CHAR/BYTE/SHORT/INT/FLOAT/DOUBLE, dimension +
  * variable + attribute headers. All values big-endian per the spec.
  */
object NetCdf {

  final case class Dim(name: String, size: Int)
  /** `data` length must be the product of the dim sizes; element type
    * must match `ncType` (Double for DOUBLE, Float for FLOAT, Int for
    * INT/SHORT/BYTE, Byte for CHAR). */
  final case class Var(name: String, dimIds: Seq[Int], ncType: Int,
    attrs: Seq[(String, String)], data: Array[_])

  val NcByte = 1; val NcChar = 2; val NcShort = 3
  val NcInt = 4; val NcFloat = 5; val NcDouble = 6

  private def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case other => throw new IllegalArgumentException(s"nc_type $other")
  }

  private def pad4(n: Int): Int = (n + 3) & ~3

  // ------------------------------------------------------------ writer

  private def putName(out: ArrayBuffer[Byte], s: String): Unit = {
    val b = s.getBytes("UTF-8")
    putU32(out, b.length)
    out ++= b
    (b.length until pad4(b.length)).foreach(_ => out += 0)
  }

  private def putU32(out: ArrayBuffer[Byte], v: Int): Unit = {
    out += (v >>> 24).toByte += (v >>> 16).toByte += (v >>> 8).toByte += v.toByte
  }

  private def putTextAttr(out: ArrayBuffer[Byte], name: String, value: String): Unit = {
    putName(out, name)
    putU32(out, NcChar)
    val b = value.getBytes("UTF-8")
    putU32(out, b.length)
    out ++= b
    (b.length until pad4(b.length)).foreach(_ => out += 0)
  }

  def write(path: String, dims: Seq[Dim], globalAttrs: Seq[(String, String)],
      vars: Seq[Var]): Unit = {
    vars.foreach { v =>
      val n = v.dimIds.map(dims(_).size.toLong).product
      require(v.data.length == n, s"${v.name}: ${v.data.length} values for $n cells")
    }
    val out = new ArrayBuffer[Byte](1 << 16)
    out += 'C'.toByte += 'D'.toByte += 'F'.toByte += 1.toByte
    putU32(out, 0) // numrecs (no record dimension)
    // dim_list
    if (dims.isEmpty) { putU32(out, 0); putU32(out, 0) }
    else {
      putU32(out, 0x0A); putU32(out, dims.size)
      dims.foreach { d => putName(out, d.name); putU32(out, d.size) }
    }
    // gatt_list
    if (globalAttrs.isEmpty) { putU32(out, 0); putU32(out, 0) }
    else {
      putU32(out, 0x0C); putU32(out, globalAttrs.size)
      globalAttrs.foreach { case (k, v) => putTextAttr(out, k, v) }
    }
    // var_list with begin offsets patched after layout
    val beginPos = new ArrayBuffer[Int]
    if (vars.isEmpty) { putU32(out, 0); putU32(out, 0) }
    else {
      putU32(out, 0x0B); putU32(out, vars.size)
      vars.foreach { v =>
        putName(out, v.name)
        putU32(out, v.dimIds.size)
        v.dimIds.foreach(putU32(out, _))
        if (v.attrs.isEmpty) { putU32(out, 0); putU32(out, 0) }
        else {
          putU32(out, 0x0C); putU32(out, v.attrs.size)
          v.attrs.foreach { case (k, a) => putTextAttr(out, k, a) }
        }
        putU32(out, v.ncType)
        putU32(out, pad4(v.data.length * typeSize(v.ncType))) // vsize
        beginPos += out.length
        putU32(out, 0) // begin, patched below
      }
    }
    // data layout
    var offset = out.length
    val begins = vars.map { v =>
      val b = offset
      offset += pad4(v.data.length * typeSize(v.ncType))
      b
    }
    val bytes = new Array[Byte](offset)
    out.copyToArray(bytes)
    beginPos.zip(begins).foreach { case (pos, b) =>
      ByteBuffer.wrap(bytes, pos, 4).putInt(b)
    }
    vars.zip(begins).foreach { case (v, b) =>
      val buf = ByteBuffer.wrap(bytes, b, pad4(v.data.length * typeSize(v.ncType)))
      v.ncType match {
        case NcDouble => v.data.asInstanceOf[Array[Double]].foreach(buf.putDouble)
        case NcFloat => v.data.asInstanceOf[Array[Float]].foreach(buf.putFloat)
        case NcInt => v.data.asInstanceOf[Array[Int]].foreach(buf.putInt)
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

  def read(path: String): NcFile = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes)
    require(buf.get() == 'C' && buf.get() == 'D' && buf.get() == 'F',
      "not a NetCDF classic file")
    val version = buf.get()
    require(version == 1, s"only CDF-1 supported (got version $version)")
    val numrecs = buf.getInt
    require(numrecs == 0, "record dimension not supported")

    def name(): String = {
      val n = buf.getInt
      val b = new Array[Byte](n)
      buf.get(b)
      buf.position(buf.position() + (pad4(n) - n))
      new String(b, "UTF-8")
    }
    def attrList(): Seq[(String, String)] = {
      val tag = buf.getInt; val n = buf.getInt
      require(tag == 0x0C || (tag == 0 && n == 0), s"attr tag $tag")
      (0 until n).map { _ =>
        val k = name()
        val t = buf.getInt
        val cnt = buf.getInt
        require(t == NcChar, s"only text attributes supported (type $t)")
        val b = new Array[Byte](cnt)
        buf.get(b)
        buf.position(buf.position() + (pad4(cnt) - cnt))
        k -> new String(b, "UTF-8")
      }
    }

    val dimTag = buf.getInt; val nDims = buf.getInt
    require(dimTag == 0x0A || (dimTag == 0 && nDims == 0), s"dim tag $dimTag")
    val dims = (0 until nDims).map(_ => Dim(name(), buf.getInt))
    val gatts = attrList()
    val varTag = buf.getInt; val nVars = buf.getInt
    require(varTag == 0x0B || (varTag == 0 && nVars == 0), s"var tag $varTag")
    val vars = (0 until nVars).map { _ =>
      val vn = name()
      val nd = buf.getInt
      val dimIds = (0 until nd).map(_ => buf.getInt)
      val vatts = attrList()
      val t = buf.getInt
      val vsize = buf.getInt
      val begin = buf.getInt
      val n = dimIds.map(dims(_).size.toLong).product.toInt
      val db = ByteBuffer.wrap(bytes, begin, vsize)
      val data: Array[_] = t match {
        case NcDouble => Array.fill(n)(db.getDouble)
        case NcFloat => Array.fill(n)(db.getFloat)
        case NcInt => Array.fill(n)(db.getInt)
        case NcShort => Array.fill(n)(db.getShort.toInt)
        case NcByte | NcChar =>
          val b = new Array[Byte](n); db.get(b); b
        case other => throw new IllegalArgumentException(s"nc_type $other")
      }
      Var(vn, dimIds, t, vatts, data)
    }
    NcFile(dims, gatts, vars)
  }
}
