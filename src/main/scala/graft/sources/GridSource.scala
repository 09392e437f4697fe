package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 scan over dense grids — `.ggrd` AND NetCDF (classic
  * CDF-1/2/5 or NetCDF-4/HDF5, via [[GridFile]]) — expanding to the
  * long-form row model (SURVEY §1.3): one row per (time, y, x) with
  * coordinate columns — the engine's `GridSource` (S1, the reference's
  * `xr.open_dataset` wrf_voronoi.py:115 as a distributed scan).
  *
  * Spark-native behaviors implemented, visible in `.explain`:
  *  - `SupportsPushDownRequiredColumns`: only requested columns are
  *    materialized (a value-only projection never decodes axes).
  *  - `SupportsPushDownFilters` on the dim keys: y/x range predicates
  *    skip rows at the decoder; time predicates PRUNE whole input
  *    partitions (one partition per (file, time-slab) — the unit of IO).
  *
  * `load(path)` accepts a single `.ggrd` file OR a directory of slab
  * files — a multi-file dataset parallelizes across files exactly like
  * the Parquet source (one InputPartition per (file, time-slab), headers
  * read driver-side like Parquet footers, pruned slabs never opened).
  *
  * Usage: `spark.read.format("graft.sources.GridSource").load(path)`.
  */
class GridSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GridTable(properties.get("path"))
}

object GridSource {
  val Schema: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private[sources] def tsMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case l: Long => l
  }
}

private class GridTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"ggrd:$path"
  override def schema(): StructType = GridSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(path)
}

private class GridScanBuilder(path: String) extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = GridSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept range/equality predicates on the dim keys (y, x, time);
    * everything else stays with Spark's post-scan Filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, _) => Set("y", "x", "time")(a)
      case GreaterThan(a, _) => Set("y", "x", "time")(a)
      case GreaterThanOrEqual(a, _) => Set("y", "x", "time")(a)
      case LessThan(a, _) => Set("y", "x", "time")(a)
      case LessThanOrEqual(a, _) => Set("y", "x", "time")(a)
      case _ => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new GridScan(path, required, pushed)
}

private class GridScan(path: String, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GridScan path=$path, ReadSchema=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters=[${pushed.mkString(", ")}]"

  private def micros(v: Any): Long = GridSource.tsMicros(v)

  /** The dataset's slab files: `path` itself, or every grid file
    * (.ggrd/.nc/.nc4/.h5) under it when it is a directory (sorted for
    * deterministic partition order). */
  private def files: Seq[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p)) {
      // a directory that IS a zarr group is one "file"; otherwise list
      // grid files and child zarr stores
      if (graft.io.Zarr.isZarr(path)) Seq(path)
      else {
        val fs = java.nio.file.Files.list(p).iterator().asScala
          .map(_.toString)
          .filter(f => GridFile.Extensions.exists(f.endsWith) ||
            graft.io.Zarr.isZarr(f)).toSeq.sorted
        require(fs.nonEmpty,
          s"no grid files (.ggrd/.nc/.nc4/.h5/zarr) under $path")
        fs
      }
    } else Seq(path)
  }

  /** One partition per (file, time slab), pruned by pushed time
    * predicates — headers are metadata-only reads (Parquet-footer
    * analogue); a pruned slab's data bytes are never opened. */
  override def planInputPartitions(): Array[InputPartition] = {
    val keep: (Long) => Boolean = m =>
      pushed.forall {
        case EqualTo("time", v) => m == micros(v)
        case GreaterThan("time", v) => m > micros(v)
        case GreaterThanOrEqual("time", v) => m >= micros(v)
        case LessThan("time", v) => m < micros(v)
        case LessThanOrEqual("time", v) => m <= micros(v)
        case _ => true
      }
    files.flatMap { f =>
      val header = GridFile.open(f).header
      (0 until header.nt).filter(t => keep(header.times(t)))
        .map(t => GridPartition(f, t): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GridReaderFactory(required, pushed)
}

private case class GridPartition(file: String, t: Int) extends InputPartition

private class GridReaderFactory(required: StructType,
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GridPartition]
    new GridPartitionReader(p.file, required, pushed, p.t)
  }
}

private class GridPartitionReader(path: String, required: StructType,
    pushed: Array[Filter], t: Int) extends PartitionReader[InternalRow] {

  private val gridFile = GridFile.open(path)
  private val header = gridFile.header
  private val needsValue = required.fieldNames.contains("value")
  private val slab: Array[Double] =
    if (needsValue) gridFile.readSlab(t) else null

  private def intBound(name: String, lower: Boolean): Int = {
    var b = if (lower) 0 else (if (name == "y") header.ny else header.nx) - 1
    pushed.foreach {
      case EqualTo(`name`, v: Integer) => b = v
      case GreaterThan(`name`, v: Integer) if lower => b = math.max(b, v + 1)
      case GreaterThanOrEqual(`name`, v: Integer) if lower => b = math.max(b, v)
      case LessThan(`name`, v: Integer) if !lower => b = math.min(b, v - 1)
      case LessThanOrEqual(`name`, v: Integer) if !lower => b = math.min(b, v)
      case _ => ()
    }
    b
  }

  private val y0 = intBound("y", lower = true)
  private val y1 = intBound("y", lower = false)
  private val x0 = intBound("x", lower = true)
  private val x1 = intBound("x", lower = false)
  private val width = x1 - x0 + 1
  private val total = if (width <= 0 || y1 < y0) 0 else (y1 - y0 + 1) * width
  private var i = -1

  override def next(): Boolean = { i += 1; i < total }

  override def get(): InternalRow = {
    val y = y0 + i / width
    val x = x0 + i % width
    InternalRow.fromSeq(required.fieldNames.toSeq.map {
      case "time" => header.times(t)
      case "y" => y
      case "x" => x
      case "lat" => header.lats(y)
      case "lon" => header.lons(x)
      case "value" => slab(y * header.nx + x)
    })
  }

  override def close(): Unit = ()
}
