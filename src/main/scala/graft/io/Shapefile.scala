package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing, Polygon}

import graft.geom.Wkb

/** Minimal ESRI Shapefile reader/writer (SURVEY §2.1 S2/S3) — polygon
  * layers with numeric/character attributes, from the public shapefile
  * and dBASE III specs. The reference reads admin boundaries from .shp
  * (`wrf_voronoi.py:185-187`) and writes its Voronoi outputs as
  * shp/GPKG (`wrf_voronoi.py:149,183,190`); its shipped artifacts use N
  * fields len 18 dec 0 (ints) and len 24 dec 15 (doubles), mirrored
  * here.
  *
  * The single-file `write` STREAMS through `toLocalIterator` — one
  * partition's rows in driver memory at a time, never the frame: the
  * shp/shx record offsets accumulate incrementally and the three
  * headers (file length, bbox, record count) are back-patched after
  * the pass, so the driver is a constant-memory relay.
  * [[writeParts]]/[[readParts]] are the fully-parallel scale path —
  * every partition writes an independent, complete part layer (the
  * format has no cross-file state, so parts parallelize like Parquet
  * files) directly from its executor.
  */
object Shapefile {

  case class Field(name: String, ftype: Char, len: Int, dec: Int)

  private val Wgs84Prj =
    """GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""

  // ---------------------------------------------------------------- write

  private def fieldsFor(attrs: Seq[StructField]): Seq[Field] =
    attrs.map { f =>
      f.dataType match {
        case LongType | IntegerType => Field(f.name.take(11), 'N', 18, 0)
        case DoubleType | FloatType => Field(f.name.take(11), 'N', 24, 15)
        case StringType => Field(f.name.take(11), 'C', 50, 0)
        case t => throw new IllegalArgumentException(
          s"shapefile writer: unsupported attribute type $t for ${f.name}")
      }
    }

  /** Single-pass streaming layer writer — the core shared by [[write]]
    * (driver relay over `toLocalIterator`) and [[writeParts]] (one call
    * per partition iterator, on the executor). Writes placeholder
    * headers, streams records while accumulating offsets/extent/count,
    * then seeks back and patches the shp/shx/dbf headers — so memory is
    * O(1 record), never O(layer). Returns the record count. */
  private def writeLayer(rows: Iterator[Row], schema: StructType,
      geomCol: String, base: String): Long = {
    val attrs = schema.fields.filter(_.name != geomCol).toSeq
    val fields = fieldsFor(attrs)
    val names = attrs.map(_.name)
    val shp = new java.io.RandomAccessFile(base + ".shp", "rw")
    val shx = new java.io.RandomAccessFile(base + ".shx", "rw")
    val dbf = new java.io.RandomAccessFile(base + ".dbf", "rw")
    try {
      shp.setLength(0); shx.setLength(0); dbf.setLength(0)
      shp.write(new Array[Byte](100)) // headers patched after the pass
      shx.write(new Array[Byte](100))
      dbf.write(dbfHeader(fields, nRecords = 0))
      val env = new org.locationtech.jts.geom.Envelope()
      var n = 0
      var offWords = 50
      while (rows.hasNext) {
        val r = rows.next()
        val g = Wkb.read(r.getAs[Array[Byte]](geomCol))
        env.expandToInclude(g.getEnvelopeInternal)
        val c = polygonContent(g)
        val words = c.length / 2
        val hdr = ByteBuffer.allocate(16) // BIG_ENDIAN default
          .putInt(offWords).putInt(words) // shx record
          .putInt(n + 1).putInt(words)    // shp record header
          .array()
        shx.write(hdr, 0, 8)
        shp.write(hdr, 8, 8)
        shp.write(c)
        dbf.write(dbfRecord(r, names, fields, schema))
        offWords += 4 + words
        n += 1
      }
      dbf.write(Array(0x1a.toByte))
      val bounds =
        if (n == 0) (0.0, 0.0, 0.0, 0.0)
        else (env.getMinX, env.getMinY, env.getMaxX, env.getMaxY)
      shp.seek(0); shp.write(mainHeader(offWords, bounds))
      shx.seek(0); shx.write(mainHeader(50 + n * 4, bounds))
      dbf.seek(0); dbf.write(dbfHeader(fields, n))
      Files.write(Paths.get(base + ".prj"), Wgs84Prj.getBytes("US-ASCII"))
      n.toLong
    } finally { shp.close(); shx.close(); dbf.close() }
  }

  /** Write a DataFrame with one WKB geometry column (Polygon /
    * MultiPolygon rows) and scalar attribute columns as `base`.shp/
    * .shx/.dbf/.prj. Streams partition-by-partition through
    * `toLocalIterator` — the frame is never materialized on the driver;
    * use [[writeParts]] when even single-file output is too big. */
  def write(df: DataFrame, geomCol: String, base: String): Unit = {
    import scala.jdk.CollectionConverters._
    writeLayer(df.toLocalIterator().asScala, df.schema, geomCol, base)
    ()
  }

  /** Distributed sink: each partition writes its own complete
    * `part-NNNNN` shapefile layer under `dir`, directly from the
    * executor — the frame is never materialized on the driver. On a
    * cluster `dir` is shared storage (DFS/object-store mount); empty
    * partitions write nothing. */
  def writeParts(df: DataFrame, geomCol: String, dir: String): Unit = {
    val schema = df.schema
    Files.createDirectories(Paths.get(dir))
    df.rdd.mapPartitionsWithIndex { (p, it) =>
      val n = if (it.hasNext)
        writeLayer(it, schema, geomCol, f"$dir/part-$p%05d")
      else 0L
      Iterator.single(n)
    }.count() // one job; per-partition side effect is the write
    ()
  }

  /** Polygon record content (shape type 5), little-endian. */
  private def polygonContent(g: Geometry): Array[Byte] = {
    val polys: Seq[Polygon] = (0 until g.getNumGeometries)
      .map(g.getGeometryN(_).asInstanceOf[Polygon])
    val rings: Seq[Array[Coordinate]] = polys.flatMap { p =>
      p.getExteriorRing.getCoordinates +:
        (0 until p.getNumInteriorRing).map(p.getInteriorRingN(_).getCoordinates)
    }
    val nPoints = rings.map(_.length).sum
    val env = g.getEnvelopeInternal
    val buf = ByteBuffer.allocate(4 + 32 + 8 + rings.length * 4 + nPoints * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(5)
    buf.putDouble(env.getMinX).putDouble(env.getMinY)
    buf.putDouble(env.getMaxX).putDouble(env.getMaxY)
    buf.putInt(rings.length).putInt(nPoints)
    var off = 0
    rings.foreach { r => buf.putInt(off); off += r.length }
    rings.foreach(_.foreach(c => buf.putDouble(c.x).putDouble(c.y)))
    buf.array()
  }

  private def mainHeader(fileWords: Int, env: (Double, Double, Double, Double)): Array[Byte] = {
    val b = ByteBuffer.allocate(100)
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(9994); (0 until 5).foreach(_ => b.putInt(0))
    b.putInt(fileWords)
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(1000).putInt(5)
    b.putDouble(env._1).putDouble(env._2).putDouble(env._3).putDouble(env._4)
    (0 until 4).foreach(_ => b.putDouble(0.0))
    b.array()
  }

  private def dbfHeader(fields: Seq[Field], nRecords: Int): Array[Byte] = {
    val recordSize = 1 + fields.map(_.len).sum
    val headerSize = 32 + fields.length * 32 + 1
    val out = ByteBuffer.allocate(headerSize).order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x03.toByte).put(24.toByte).put(1.toByte).put(1.toByte)
    out.putInt(nRecords)
    out.putShort(headerSize.toShort).putShort(recordSize.toShort)
    out.put(new Array[Byte](20))
    fields.foreach { f =>
      val name = new Array[Byte](11)
      f.name.getBytes("US-ASCII").take(11).copyToArray(name)
      out.put(name).put(f.ftype.toByte).putInt(0)
      out.put(f.len.toByte).put(f.dec.toByte).put(new Array[Byte](14))
    }
    out.put(0x0d.toByte)
    out.array()
  }

  private def dbfRecord(r: Row, names: Seq[String], fields: Seq[Field],
      schema: StructType): Array[Byte] = {
    val recordSize = 1 + fields.map(_.len).sum
    val out = ByteBuffer.allocate(recordSize)
    out.put(' '.toByte) // not deleted
    names.zip(fields).foreach { case (n, f) =>
      val idx = schema.fieldIndex(n)
      val s = (f.ftype, schema(idx).dataType) match {
        case ('N', LongType) => r.getLong(idx).toString.reverse.padTo(f.len, ' ').reverse
        case ('N', IntegerType) => r.getInt(idx).toString.reverse.padTo(f.len, ' ').reverse
        case ('N', _) =>
          val fmt = s"%${f.len}.${f.dec}f".format(r.getDouble(idx))
          fmt.takeRight(f.len).reverse.padTo(f.len, ' ').reverse
        case ('C', _) => Option(r.getString(idx)).getOrElse("").padTo(f.len, ' ').take(f.len)
        case _ => " " * f.len
      }
      out.put(s.getBytes("US-ASCII"))
    }
    out.array()
  }

  // ----------------------------------------------------------------- read

  /** Parse one layer's .shp + .dbf into (dbf fields, rows with a
    * trailing `geom` WKB) — the executor-safe core shared by [[read]]
    * (driver, one layer) and [[readParts]] (one call per part file). */
  private def partData(base: String): (Seq[Field], Seq[Row]) = {
    val shp = ByteBuffer.wrap(Files.readAllBytes(Paths.get(base + ".shp")))
    val dbf = ByteBuffer.wrap(Files.readAllBytes(Paths.get(base + ".dbf")))
      .order(ByteOrder.LITTLE_ENDIAN)

    // --- dbf header + fields
    dbf.position(4)
    val nRecords = dbf.getInt
    val headerSize = dbf.getShort & 0xffff
    val recordSize = dbf.getShort & 0xffff
    val nFields = (headerSize - 33) / 32
    val fields = (0 until nFields).map { i =>
      dbf.position(32 + i * 32)
      val nameBytes = new Array[Byte](11); dbf.get(nameBytes)
      val name = new String(nameBytes, "US-ASCII").takeWhile(_ != 0).trim
      val ftype = dbf.get().toChar
      dbf.getInt
      val len = dbf.get() & 0xff
      val dec = dbf.get() & 0xff
      Field(name, ftype, len, dec)
    }

    // --- shp records
    val geoms = ArrayBuffer.empty[Geometry]
    shp.position(100)
    while (shp.position() < shp.capacity() - 7) {
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.getInt // record number
      val contentWords = shp.getInt
      // hostile-bytes: a crafted negative/zero length would move the
      // cursor BACKWARD (or pin it) and loop forever inside the scan
      require(contentWords >= 2,
        s"shp record content length $contentWords words")
      val end = shp.position() + contentWords * 2
      shp.order(ByteOrder.LITTLE_ENDIAN)
      val shapeType = shp.getInt
      if (shapeType == 5) {
        shp.position(shp.position() + 32) // bbox
        val nParts = shp.getInt
        val nPoints = shp.getInt
        val parts = (0 until nParts).map(_ => shp.getInt)
        val pts = (0 until nPoints).map(_ => new Coordinate(shp.getDouble, shp.getDouble))
        val bounds = parts :+ nPoints
        val rings = (0 until nParts).map { i =>
          Wkb.factory.createLinearRing(pts.slice(bounds(i), bounds(i + 1)).toArray)
        }
        geoms += Wkb.factory.createPolygon(rings.head,
          rings.tail.toArray[LinearRing])
      } else {
        geoms += Wkb.factory.createGeometryCollection(Array.empty)
      }
      shp.position(end)
    }

    // --- dbf records → rows (bounds before the loop: a crafted count
    // with recordSize 0 would otherwise build rows until OOM)
    require(nRecords >= 0 && recordSize >= 1 &&
      headerSize.toLong + nRecords.toLong * recordSize <= dbf.capacity() + 1,
      s"dbf claims $nRecords x $recordSize-byte records beyond ${dbf.capacity()} bytes")
    val rows = (0 until nRecords).map { i =>
      var pos = headerSize + i * recordSize + 1 // skip deletion flag
      val vals = fields.map { f =>
        val bytes = new Array[Byte](f.len)
        dbf.position(pos); dbf.get(bytes); pos += f.len
        val s = new String(bytes, "US-ASCII").trim
        f.ftype match {
          case 'N' if f.dec == 0 => if (s.isEmpty) null else java.lang.Long.valueOf(s)
          case 'N' => if (s.isEmpty) null else java.lang.Double.valueOf(s)
          case _ => s
        }
      }
      Row.fromSeq(vals :+ Wkb.write(geoms(i)))
    }
    (fields, rows)
  }

  private def sparkSchema(fields: Seq[Field]): StructType =
    StructType(fields.map { f =>
      f.ftype match {
        case 'N' if f.dec == 0 => StructField(f.name, LongType)
        case 'N' => StructField(f.name, DoubleType)
        case _ => StructField(f.name, StringType)
      }
    } :+ StructField("geom", BinaryType))

  /** Read `base`.shp + .dbf into a DataFrame: dbf attributes (N dec=0 →
    * long, N dec>0 → double, C → trimmed string) + `geom` WKB. */
  def read(spark: SparkSession, base: String): DataFrame = {
    val (fields, rows) = partData(base)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), sparkSchema(fields))
  }

  /** Distributed scan over a [[writeParts]] directory: one Spark
    * partition per part layer, each parsed on an executor. Schema comes
    * from the lexicographically first part's dbf header. */
  def readParts(spark: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val bases = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".shp")).map(_.dropRight(4))
      .toSeq.sorted
    require(bases.nonEmpty, s"no .shp parts under $dir")
    val schema = sparkSchema(partData(bases.head)._1)
    val rdd = spark.sparkContext.parallelize(bases, bases.length)
      .flatMap(b => partData(b)._2)
    spark.createDataFrame(rdd, schema)
  }
}
