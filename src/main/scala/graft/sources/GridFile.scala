package graft.sources

import graft.io.{Hdf5, NetCdf}

/** Per-file access behind [[GridSource]]: a header (axes + slab count,
  * the Parquet-footer analogue read at planning time) and ranged
  * per-time-slab data reads (the unit of IO an InputPartition decodes).
  *
  * Formats: the `.ggrd` dense container, classic NetCDF (CDF-1/2/5),
  * and NetCDF-4 (HDF5; contiguous or chunked+compressed — a pruned
  * slab's chunks are never read or inflated). The NetCDF convention
  * expected is the reference's own grid shape (`wrf_voronoi.py:115`,
  * delphine/regrid.py:208): one rank-3 data variable over dims
  * (time, y, x), with optional 1-D coordinate variables named like
  * their dimension; a time coordinate holds epoch micros, missing
  * coordinates default to slab index / cell-center offsets.
  */
private[sources] trait GridFile {
  def header: GridBinary.Header
  def readSlab(t: Int): Array[Double]
}

private[sources] object GridFile {

  val Extensions: Seq[String] = Seq(".ggrd", ".nc", ".nc4", ".h5")

  def open(path: String): GridFile =
    if (path.endsWith(".ggrd")) new Ggrd(path)
    else {
      val f = new java.io.RandomAccessFile(path, "r")
      val head = new Array[Byte](8)
      try f.readFully(head) finally f.close()
      if (Hdf5.isHdf5(head)) new Nc4(path) else new NcClassic(path)
    }

  private final class Ggrd(path: String) extends GridFile {
    val header: GridBinary.Header = GridBinary.readHeader(path)
    def readSlab(t: Int): Array[Double] = GridBinary.readSlab(path, header, t)
  }

  private def axisOrDefault(coord: Option[Array[Double]], n: Int): Array[Double] =
    coord.getOrElse(Array.tabulate(n)(_ + 0.5))

  private def timesOrDefault(coord: Option[Array[Double]], n: Int): Array[Long] =
    coord.map(_.map(_.toLong)).getOrElse(Array.tabulate(n)(_.toLong))

  private final class NcClassic(path: String) extends GridFile {
    private val meta = NetCdf.readMeta(path)
    private val dataVm = meta.varsMeta.find(_.dimIds.length == 3)
      .getOrElse(throw new IllegalArgumentException(
        s"$path: no rank-3 (time, y, x) variable"))
    private val Seq(dt, dy, dx) = dataVm.dimIds
    private def coord(dimId: Int): Option[Array[Double]] =
      meta.varsMeta.find(v =>
          v.name == meta.dims(dimId).name && v.dimIds == Seq(dimId))
        .map(NetCdf.readVarDouble(path, meta, _))
    val header: GridBinary.Header = GridBinary.Header(
      meta.dims(dt).size, meta.dims(dy).size, meta.dims(dx).size,
      timesOrDefault(coord(dt), meta.dims(dt).size),
      axisOrDefault(coord(dy), meta.dims(dy).size),
      axisOrDefault(coord(dx), meta.dims(dx).size))
    def readSlab(t: Int): Array[Double] =
      NetCdf.readVarSlabDouble(path, meta, dataVm, t)
  }

  private final class Nc4(path: String) extends GridFile {
    private val meta = Hdf5.readMeta(path)
    private val dataVm = meta.varsMeta.find(_.dimIds.length == 3)
      .getOrElse(throw new IllegalArgumentException(
        s"$path: no rank-3 (time, y, x) variable"))
    private val Seq(dt, dy, dx) = dataVm.dimIds
    private def coord(dimId: Int): Option[Array[Double]] =
      meta.varsMeta.find(v =>
          v.name == meta.dims(dimId).name && v.dimIds == Seq(dimId))
        .map(Hdf5.readVarDouble(path, _))
    val header: GridBinary.Header = GridBinary.Header(
      meta.dims(dt).size, meta.dims(dy).size, meta.dims(dx).size,
      timesOrDefault(coord(dt), meta.dims(dt).size),
      axisOrDefault(coord(dy), meta.dims(dy).size),
      axisOrDefault(coord(dx), meta.dims(dx).size))
    def readSlab(t: Int): Array[Double] =
      Hdf5.readVarSlabDouble(path, dataVm, t)
  }
}
