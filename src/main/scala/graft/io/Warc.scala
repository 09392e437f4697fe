package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC 1.0 (ISO 28500) web-archive codec — the interchange format
  * web-scale corpus construction starts from (Common Crawl ships WARC;
  * a training-data pipeline's first batch job is "parse the WARCs").
  * From-scratch reader + writer over the published format: records are
  * `WARC/1.0` + CRLF named headers + CRLF CRLF + `Content-Length`
  * payload + CRLF CRLF, and a `.warc.gz` file is a sequence of gzip
  * MEMBERS, one record each, so readers can split on member boundaries.
  *
  * Scale shape: the writer emits one `part-NNNNN.warc.gz` per input
  * partition executor-side (the driver never materializes the frame);
  * the reader schedules ONE TASK PER FILE — a gzipped member sequence
  * is not block-splittable, which is exactly how Common Crawl shards
  * parallelism (many ~1 GB files, not few huge ones). Java's
  * GZIPInputStream consumes concatenated members transparently, so a
  * file scans as one sequential stream with no per-record open cost.
  *
  * Records are written as `WARC-Type: resource` (direct capture of a
  * text payload) with deterministic `WARC-Record-ID`s derived from the
  * record's URI — re-running a write produces byte-identical archives,
  * which keeps the round-trip oracle hash-stable.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("rec_type", StringType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private val Crlf = "\r\n"

  private def record(uri: String, date: String, text: String): Array[Byte] = {
    val payload = text.getBytes(UTF_8)
    val id = java.util.UUID.nameUUIDFromBytes(uri.getBytes(UTF_8))
    val head = new StringBuilder()
      .append("WARC/1.0").append(Crlf)
      .append("WARC-Type: resource").append(Crlf)
      .append("WARC-Record-ID: <urn:uuid:").append(id).append(">").append(Crlf)
      .append("WARC-Date: ").append(date).append(Crlf)
      .append("WARC-Target-URI: ").append(uri).append(Crlf)
      .append("Content-Type: text/plain; charset=utf-8").append(Crlf)
      .append("Content-Length: ").append(payload.length).append(Crlf)
      .append(Crlf)
      .toString.getBytes(UTF_8)
    val out = new java.io.ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head); out.write(payload)
    out.write(Crlf.getBytes(UTF_8)); out.write(Crlf.getBytes(UTF_8))
    out.toByteArray
  }

  /** Write `df` as a directory of `.warc.gz` parts, one per partition,
    * each record its own gzip member. Executor-side: the driver only
    * creates the directory and counts part sizes. */
  def write(df: DataFrame, dir: String, uriCol: String, dateCol: String,
      textCol: String): Unit = {
    val dirPath = Paths.get(dir)
    Files.createDirectories(dirPath)
    // a rewrite with fewer partitions must not leave stale parts that a
    // later read() would happily ingest alongside the fresh ones; also
    // sweep attempt tmp files orphaned by a killed JVM (their finally
    // never ran). Files.list holds an open DirectoryStream — close it.
    val listing = Files.list(dirPath)
    try listing.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.matches(
        "(part-\\d{5}\\.warc\\.gz|\\.part-\\d{5}\\.warc\\.gz\\.\\d+\\.tmp)"))
      .foreach(Files.delete)
    finally listing.close()
    val (ui, di, ti) = (df.schema.fieldIndex(uriCol),
      df.schema.fieldIndex(dateCol), df.schema.fieldIndex(textCol))
    df.rdd.mapPartitionsWithIndex { (p, it) =>
      var n = 0
      if (it.hasNext) {
        // task-attempt temp name + atomic rename on commit, so a
        // speculative or retried attempt never interleaves with another
        // writer on the final part path
        val attempt = org.apache.spark.TaskContext.get() match {
          case null => 0L
          case tc => tc.taskAttemptId()
        }
        val fin = Paths.get(f"$dir/part-$p%05d.warc.gz")
        val tmp = Paths.get(f"$dir/.part-$p%05d.warc.gz.$attempt%d.tmp")
        val fos = new BufferedOutputStream(Files.newOutputStream(tmp), 1 << 16)
        // one native zlib stream + CRC for the whole partition, reset
        // between members — a GZIPOutputStream per record allocates and
        // initializes a fresh native Deflater per member, which
        // dominates archive-write time at small record sizes
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        try {
          it.foreach { r =>
            // one gzip member per record so members concatenate per the
            // .warc.gz convention
            writeGzipMember(fos,
              record(r.getString(ui), r.getString(di), r.getString(ti)),
              deflater)
            n += 1
          }
          fos.close()
          Files.move(tmp, fin,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } finally {
          deflater.end()
          fos.close()
          Files.deleteIfExists(tmp)
        }
      }
      Iterator.single(n)
    }.count()
    ()
  }

  /** One gzip member (RFC 1952) from scratch: fixed 10-byte header
    * (deflate method, zero mtime/flags/XFL, OS=255 "unknown"), raw
    * deflate body from the caller's REUSED nowrap Deflater, CRC-32 and
    * ISIZE little-endian trailer. Java's GZIPInputStream consumes it
    * like any other member; reusing one native zlib stream across a
    * partition's members is the point (see the writer). */
  private def writeGzipMember(out: java.io.OutputStream, data: Array[Byte],
      deflater: java.util.zip.Deflater): Unit = {
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    deflater.reset()
    deflater.setInput(data)
    deflater.finish()
    val buf = new Array[Byte](1 << 14)
    while (!deflater.finished()) {
      val k = deflater.deflate(buf)
      if (k > 0) out.write(buf, 0, k)
    }
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    val cv = crc.getValue
    val isize = data.length.toLong & 0xffffffffL
    out.write(Array[Byte](
      (cv & 0xff).toByte, ((cv >>> 8) & 0xff).toByte,
      ((cv >>> 16) & 0xff).toByte, ((cv >>> 24) & 0xff).toByte,
      (isize & 0xff).toByte, ((isize >>> 8) & 0xff).toByte,
      ((isize >>> 16) & 0xff).toByte, ((isize >>> 24) & 0xff).toByte))
  }

  /** Read a directory of `.warc.gz` (or plain `.warc`) files — one
    * task per file, records streamed, never a whole file in memory. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val listing = Files.list(Paths.get(dir))
    val files =
      try listing.toArray.map(_.toString)
        .filter(p => p.endsWith(".warc.gz") || p.endsWith(".warc"))
        .sorted.toSeq
      finally listing.close()
    require(files.nonEmpty, s"no .warc[.gz] files under $dir")
    val rows = spark.sparkContext
      .parallelize(files, files.length)
      .flatMap(readFile)
    spark.createDataFrame(rows, schema)
  }

  private def readFile(path: String): Iterator[Row] = {
    val raw = new BufferedInputStream(
      Files.newInputStream(Paths.get(path)), 1 << 16)
    records(raw, gzipped = path.endsWith(".gz"), label = path)
  }

  /** Parse a (possibly gzip-member-concatenated) WARC byte stream into
    * record rows — the shared scan behind the batch reader and the
    * streaming source. Streams record by record; never holds more than
    * one payload in memory. */
  def records(rawIn: java.io.InputStream, gzipped: Boolean,
      label: String): Iterator[Row] = {
    val in = new DataInputStream(
      if (gzipped) new BufferedInputStream(
        new GZIPInputStream(rawIn, 1 << 16), 1 << 16)
      else rawIn)
    new Iterator[Row] {
      private var nextRow: Row = advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): Row = {
        val r = nextRow; nextRow = advance(); r
      }
      private def line(): String = {
        // accumulate raw bytes and decode as UTF-8 once the line ends —
        // headers are UTF-8 on the wire (the writer emits them so), and
        // per-byte toChar would mis-decode any non-ASCII URI as Latin-1
        val buf = new java.io.ByteArrayOutputStream(64)
        var c = in.read()
        if (c < 0) return null
        while (c >= 0 && c != '\n') {
          if (c != '\r') buf.write(c)
          // real WARC headers are tiny; without a cap a gzip bomb
          // expanding to endless newline-free bytes buffers until OOM
          require(buf.size <= (1 << 16),
            s"WARC header line exceeds 64 KiB in $label")
          c = in.read()
        }
        new String(buf.toByteArray, UTF_8)
      }
      private def advance(): Row = {
        // skip inter-record blank lines; EOF here is a clean end
        var l = line()
        while (l != null && l.isEmpty) l = line()
        if (l == null) { in.close(); return null }
        require(l.startsWith("WARC/"), s"bad WARC version line: '$l'")
        var uri: String = null; var date: String = null
        var rtype: String = null; var len = -1L
        var h = line()
        while (h != null && h.nonEmpty) {
          val k = h.indexOf(':')
          require(k > 0, s"bad WARC header: '$h'")
          val (name, value) = (h.substring(0, k).trim, h.substring(k + 1).trim)
          name.toLowerCase match {
            case "warc-target-uri" => uri = value
            case "warc-date" => date = value
            case "warc-type" => rtype = value
            case "content-length" => len = value.toLong
            case _ => ()
          }
          h = line()
        }
        require(len >= 0, "missing Content-Length")
        require(len <= Int.MaxValue, s"WARC record too large: $len")
        require(rtype != null, "missing WARC-Type")
        // read INCREMENTALLY up to the claimed length: a crafted
        // Content-Length must not allocate gigabytes up front — the
        // buffer grows only with bytes the stream actually delivers,
        // and a short stream rejects at the actual truncation point
        val acc = new java.io.ByteArrayOutputStream(
          math.min(len, 1L << 16).toInt)
        val chunk = new Array[Byte](1 << 16)
        var remaining = len
        while (remaining > 0) {
          val n = in.read(chunk, 0,
            math.min(chunk.length.toLong, remaining).toInt)
          if (n < 0)
            throw new IllegalStateException(s"truncated WARC payload in $label")
          acc.write(chunk, 0, n)
          remaining -= n
        }
        Row(uri, date, rtype, new String(acc.toByteArray, UTF_8))
      }
    }
  }

  /** STREAMING WARC source: `readStream` over a `.warc.gz` drop
    * directory — the shape of an unbounded crawl ingest, where archive
    * shards land continuously and each must be parsed exactly once.
    *
    * Built by composition, not a bespoke source: Spark's `binaryFile`
    * file-stream source supplies the durable parts (exactly-once file
    * tracking in the checkpoint's file log, drop-directory discovery,
    * `maxFilesPerTrigger` pacing), and each discovered file's member
    * run is decoded by the same from-scratch [[records]] scan the batch
    * reader uses. One file = one row = one decode task, matching the
    * batch reader's one-task-per-file parallelism (a gzip member
    * sequence is not block-splittable — Common Crawl shards parallelism
    * across many ~1 GB files for exactly this reason). The per-task
    * memory bound is one file's bytes plus one decoded payload, the
    * same bound Common Crawl sizing already assumes. */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    // binaryFile's fixed schema, stated explicitly — streaming sources
    // don't infer
    val fileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    var reader = spark.readStream.format("binaryFile")
      .schema(fileSchema)
      .option("pathGlobFilter", "*.warc.gz")
    if (maxFilesPerTrigger > 0)
      reader = reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val files = reader.load(dir)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    files.select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
      .flatMap { r =>
        records(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("content")),
          gzipped = true, label = r.getString(0))
      }(enc)
  }
}
