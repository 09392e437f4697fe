package graft.sources

import java.io.{DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.ByteBuffer

/** The `.ggrd` dense-grid container: a minimal deterministic grid
  * format (SURVEY §2.1 S1). Originally the stand-in for NetCDF input;
  * [[GridFile]] now also scans real NetCDF (classic via
  * `graft.io.NetCdf`, NetCDF-4/HDF5 via `graft.io.Hdf5`) through the
  * same DataSource V2 machinery — this format remains as the simplest
  * fixture and a fast uncompressed interchange.
  *
  * Layout (big-endian):
  *   int32 magic "GGRD" | int32 version=1 | int32 nt | int32 ny | int32 nx
  *   nt × int64  time axis (epoch micros)
  *   ny × float64 lat axis
  *   nx × float64 lon axis
  *   nt slabs of ny×nx float64 values (y-major)
  */
object GridBinary {

  val Magic = 0x47475244 // "GGRD"

  case class Header(nt: Int, ny: Int, nx: Int,
      times: Array[Long], lats: Array[Double], lons: Array[Double]) {
    def slabOffset(t: Int): Long =
      20L + 8L * nt + 8L * ny + 8L * nx + t.toLong * ny * nx * 8L
  }

  def write(path: String, times: Array[Long], lats: Array[Double],
      lons: Array[Double], value: (Int, Int, Int) => Double): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try {
      out.writeInt(Magic); out.writeInt(1)
      out.writeInt(times.length); out.writeInt(lats.length); out.writeInt(lons.length)
      times.foreach(out.writeLong)
      lats.foreach(out.writeDouble)
      lons.foreach(out.writeDouble)
      for (t <- times.indices; y <- lats.indices; x <- lons.indices)
        out.writeDouble(value(t, y, x))
    } finally out.close()
  }

  def readHeader(path: String): Header = {
    val f = new RandomAccessFile(path, "r")
    try {
      val head = new Array[Byte](20)
      f.readFully(head)
      val hb = ByteBuffer.wrap(head)
      require(hb.getInt == Magic, s"$path: not a GGRD file")
      require(hb.getInt == 1, s"$path: unsupported GGRD version")
      val nt = hb.getInt; val ny = hb.getInt; val nx = hb.getInt
      val axes = new Array[Byte](8 * (nt + ny + nx))
      f.readFully(axes)
      val ab = ByteBuffer.wrap(axes)
      Header(nt, ny, nx,
        Array.fill(nt)(ab.getLong),
        Array.fill(ny)(ab.getDouble),
        Array.fill(nx)(ab.getDouble))
    } finally f.close()
  }

  /** Read one time slab (ny×nx doubles, y-major). */
  def readSlab(path: String, header: Header, t: Int): Array[Double] = {
    val f = new RandomAccessFile(path, "r")
    try {
      f.seek(header.slabOffset(t))
      val bytes = new Array[Byte](header.ny * header.nx * 8)
      f.readFully(bytes)
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(header.ny * header.nx)(bb.getDouble)
    } finally f.close()
  }
}
