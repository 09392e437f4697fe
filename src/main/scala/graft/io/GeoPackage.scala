package graft.io

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.types._

import org.locationtech.jts.geom.Geometry

import graft.geom.Wkb
import graft.io.Sqlite._

/** GeoPackage feature-layer sink + scan (SURVEY §2.1 S3) — the
  * reference's primary output format (`to_file(driver="GPKG")`-shaped,
  * wrf_voronoi.py:149,183, haduk_voronoi.py:79), built on the from-
  * scratch [[Sqlite]] container: gpkg_spatial_ref_sys, gpkg_contents,
  * gpkg_geometry_columns plus one feature table whose `geom` column
  * holds standard GeoPackage geometry blobs (GP header + envelope +
  * WKB).
  *
  * Constraint DDL that would imply SQLite auto-indexes (TEXT PRIMARY
  * KEY / UNIQUE) is declared without the constraint so the file needs
  * no index b-trees; data content matches the GPKG spec tables.
  *
  * Writer collects to the driver (reference outputs are ≤ 33,286
  * polygons); the documented scale path is per-partition parts, as with
  * [[Shapefile]].
  */
object GeoPackage {

  private val Wgs84Def =
    "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\",SPHEROID[\"WGS 84\",6378137,298.257223563]],PRIMEM[\"Greenwich\",0],UNIT[\"degree\",0.0174532925199433]]"

  /** GeoPackage geometry blob: "GP", version 0, flags (little-endian,
    * XY envelope), srs_id, envelope, WKB. */
  private[io] def gpkgBlob(wkb: Array[Byte], srid: Int): Array[Byte] =
    gpkgBlobWithEnv(wkb, Wkb.read(wkb).getEnvelopeInternal, srid)

  private def gpkgBlobWithEnv(wkb: Array[Byte],
      env: org.locationtech.jts.geom.Envelope, srid: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 32 + wkb.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('G'.toByte).put('P'.toByte)
    buf.put(0.toByte)          // version 1
    buf.put(0x03.toByte)       // flags: envelope=1 (XY), little-endian
    buf.putInt(srid)
    buf.putDouble(env.getMinX).putDouble(env.getMaxX)
    buf.putDouble(env.getMinY).putDouble(env.getMaxY)
    buf.put(wkb)
    buf.array()
  }

  private[io] def wkbFromBlob(blob: Array[Byte]): Array[Byte] = {
    require(blob.length > 8 && blob(0) == 'G'.toByte && blob(1) == 'P'.toByte,
      "not a GeoPackage geometry blob")
    val flags = blob(3)
    val envBytes = ((flags >> 1) & 0x7) match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case other => throw new IllegalArgumentException(s"envelope code $other")
    }
    java.util.Arrays.copyOfRange(blob, 8 + envBytes, blob.length)
  }

  /** Write `df` (one WKB geometry column + scalar attributes) as a
    * GeoPackage feature layer. A .gpkg is ONE SQLite container, so the
    * bytes necessarily assemble in one place — but the frame streams
    * through the driver one partition at a time (`toLocalIterator`),
    * each Spark row converted immediately to its compact page payload
    * (SqlValue + geometry blob) and dropped; peak driver memory is the
    * encoded file content, never the materialized DataFrame. */
  def write(df: DataFrame, geomCol: String, path: String, layer: String,
      srid: Int = 4326, geometryType: String = "GEOMETRY"): Unit = {
    import scala.jdk.CollectionConverters._
    val schema = df.schema
    val attrs = schema.fields.filter(_.name != geomCol)

    def sqlType(dt: DataType): String = dt match {
      case LongType | IntegerType => "INTEGER"
      case DoubleType | FloatType => "REAL"
      case StringType => "TEXT"
      case BinaryType => "BLOB"
      case t => throw new IllegalArgumentException(s"gpkg attribute type $t")
    }
    def toSql(r: Row, i: Int, dt: DataType): SqlValue =
      if (r.isNullAt(i)) SqlNull
      else dt match {
        case LongType => SqlInt(r.getLong(i))
        case IntegerType => SqlInt(r.getInt(i).toLong)
        case DoubleType => SqlReal(r.getDouble(i))
        case FloatType => SqlReal(r.getFloat(i).toDouble)
        case StringType => SqlText(r.getString(i))
        case BinaryType => SqlBlob(r.getAs[Array[Byte]](i))
        case t => throw new IllegalArgumentException(s"gpkg attribute type $t")
      }

    // single streaming pass: per row, one WKB parse feeds the geometry
    // blob (which embeds its envelope) AND the running layer extent
    val geomIdx = schema.fieldIndex(geomCol)
    val attrIdx = attrs.map(f => schema.fieldIndex(f.name))
    val featRows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[SqlValue])]
    var minX = Double.PositiveInfinity; var minY = Double.PositiveInfinity
    var maxX = Double.NegativeInfinity; var maxY = Double.NegativeInfinity
    var fid = 0L
    df.toLocalIterator().asScala.foreach { r =>
      val wkb = r.getAs[Array[Byte]](geomIdx)
      val env = Wkb.read(wkb).getEnvelopeInternal
      minX = math.min(minX, env.getMinX); minY = math.min(minY, env.getMinY)
      maxX = math.max(maxX, env.getMaxX); maxY = math.max(maxY, env.getMaxY)
      fid += 1
      featRows += (fid -> (Seq(SqlNull, // fid = rowid alias
        SqlBlob(gpkgBlobWithEnv(wkb, env, srid))) ++
        attrs.toSeq.zip(attrIdx).map { case (f, i) => toSql(r, i, f.dataType) }))
    }
    if (featRows.isEmpty) { minX = 0; minY = 0; maxX = 0; maxY = 0 }

    val srs = TableDef("gpkg_spatial_ref_sys",
      "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT)",
      Seq(
        -1L -> Seq(SqlText("Undefined cartesian SRS"), SqlNull, SqlText("NONE"),
          SqlInt(-1), SqlText("undefined"), SqlNull),
        0L -> Seq(SqlText("Undefined geographic SRS"), SqlNull, SqlText("NONE"),
          SqlInt(0), SqlText("undefined"), SqlNull),
        4326L -> Seq(SqlText("WGS 84 geodetic"), SqlNull, SqlText("EPSG"),
          SqlInt(4326), SqlText(Wgs84Def), SqlNull)))

    val contents = TableDef("gpkg_contents",
      "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL, data_type TEXT NOT NULL, identifier TEXT, description TEXT DEFAULT '', last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')), min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)",
      Seq(1L -> Seq(SqlText(layer), SqlText("features"), SqlText(layer),
        SqlText(""), SqlText("2026-01-01T00:00:00.000Z"),
        SqlReal(minX), SqlReal(minY), SqlReal(maxX), SqlReal(maxY),
        SqlInt(srid.toLong))))

    val geomCols = TableDef("gpkg_geometry_columns",
      "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL)",
      Seq(1L -> Seq(SqlText(layer), SqlText("geom"), SqlText(geometryType),
        SqlInt(srid.toLong), SqlInt(0), SqlInt(0))))

    val attrDdl = attrs.map(f => s"\"${f.name}\" ${sqlType(f.dataType)}").mkString(", ")
    val features = TableDef(layer,
      s"CREATE TABLE \"$layer\" (fid INTEGER PRIMARY KEY, geom BLOB" +
        (if (attrDdl.nonEmpty) s", $attrDdl" else "") + ")",
      featRows.toSeq)

    Sqlite.write(path, Seq(srs, contents, geomCols, features))
  }

  /** Read a feature layer back as (fid, geom WKB, attributes) — column
    * names and types from the layer's gpkg_geometry_columns entry plus
    * runtime value inspection. */
  def read(spark: SparkSession, path: String, layer: String,
      attrSchema: StructType): DataFrame = {
    val raw = Sqlite.readTable(path, layer)
    val rows = raw.map { case (rowid, vs) =>
      val wkb = vs(1) match {
        case SqlBlob(b) => wkbFromBlob(b)
        case v => throw new IllegalArgumentException(s"geom $v")
      }
      val attrVals = attrSchema.fields.zipWithIndex.map { case (f, i) =>
        (vs(2 + i), f.dataType) match {
          case (SqlNull, _) => null
          case (SqlInt(v), LongType) => v
          case (SqlInt(v), IntegerType) => v.toInt
          case (SqlReal(v), DoubleType) => v
          // stock sqlite3 stores integral REAL values as integer serial
          // types — widen back per the declared schema
          case (SqlInt(v), DoubleType) => v.toDouble
          case (SqlReal(v), FloatType) => v.toFloat
          case (SqlInt(v), FloatType) => v.toFloat
          case (SqlText(v), StringType) => v
          case (SqlBlob(v), BinaryType) => v
          case (v, t) => throw new IllegalArgumentException(s"attr $v as $t")
        }
      }
      Row.fromSeq(rowid +: wkb.asInstanceOf[Any] +: attrVals.toSeq)
    }
    val schema = StructType(
      StructField("fid", LongType, nullable = false) +:
        StructField("geom", BinaryType, nullable = false) +:
        attrSchema.fields.toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.size / 5000)),
      schema)
  }
}
