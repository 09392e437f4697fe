package graft

import java.nio.file.{Files, Paths}

import graft.io.Warc

/** WARC codec round trips: payload fidelity (unicode, empty, embedded
  * CRLF), one-gzip-member-per-record layout, deterministic rewrite. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "plain ascii body"),
    (2L, ""), // empty payload: Content-Length 0
    (3L, "unicode café 中文 😀"),
    (4L, "embedded\r\n\r\nrecord-separator lookalike"),
    (5L, "trailing newline\n"))

  private def frame(rows: Seq[(Long, String)]) =
    rows.toDF("id", "text").selectExpr(
      "concat('https://t.example.org/doc/', id) AS uri",
      "'2026-01-01T00:00:00Z' AS date", "text")

  test("write then read returns every record byte-exactly") {
    val dir = Files.createTempDirectory("warc_rt").toString
    Warc.write(frame(docs).repartition(3), dir, "uri", "date", "text")
    val back = Warc.read(spark, dir)
      .selectExpr("cast(regexp_extract(uri, '/doc/(\\\\d+)$', 1) as long)",
        "text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(back === docs)
    val types = Warc.read(spark, dir).select("rec_type", "date")
      .distinct().as[(String, String)].collect().toSeq
    assert(types === Seq(("resource", "2026-01-01T00:00:00Z")))
  }

  test("each record is its own gzip member (Common-Crawl layout)") {
    val dir = Files.createTempDirectory("warc_members").toString
    Warc.write(frame(docs).coalesce(1), dir, "uri", "date", "text")
    val part = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".warc.gz")).head
    val bytes = Files.readAllBytes(Paths.get(part))
    // count gzip member headers: magic 1f 8b 08 at member starts
    var members = 0
    var i = 0
    while (i < bytes.length - 2) {
      if ((bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b &&
        bytes(i + 2) == 8) members += 1
      i += 1
    }
    assert(members === docs.length,
      s"expected ${docs.length} gzip members, found $members")
  }

  test("rewrite of the same frame is byte-identical (deterministic ids)") {
    val d1 = Files.createTempDirectory("warc_a").toString
    val d2 = Files.createTempDirectory("warc_b").toString
    val f = frame(docs).coalesce(1)
    Warc.write(f, d1, "uri", "date", "text")
    Warc.write(f, d2, "uri", "date", "text")
    def bytes(d: String) = Files.readAllBytes(Paths.get(
      Files.list(Paths.get(d)).toArray.map(_.toString)
        .filter(_.endsWith(".warc.gz")).head))
    assert(java.util.Arrays.equals(bytes(d1), bytes(d2)))
  }

  test("non-ASCII header values round-trip as UTF-8 (URI, date)") {
    val dir = Files.createTempDirectory("warc_utf8").toString
    val f = Seq((1L, "body")).toDF("id", "text").selectExpr(
      "'https://t.example.org/café/中文/😀' AS uri",
      "'2026-01-01T00:00:00Z' AS date", "text")
    Warc.write(f, dir, "uri", "date", "text")
    val uri = Warc.read(spark, dir).select("uri").as[String].head()
    assert(uri === "https://t.example.org/café/中文/😀")
  }

  test("rewrite with fewer partitions clears stale parts") {
    val dir = Files.createTempDirectory("warc_stale").toString
    Warc.write(frame(docs).repartition(4), dir, "uri", "date", "text")
    assert(Files.list(Paths.get(dir)).count() >= 2)
    Warc.write(frame(docs.take(2)).coalesce(1), dir, "uri", "date", "text")
    val back = Warc.read(spark, dir).select("text")
      .as[String].collect().toSeq.sorted
    assert(back === docs.take(2).map(_._2).sorted)
  }

  test("oversized Content-Length fails with a clear error") {
    val dir = Files.createTempDirectory("warc_big").toString
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
      .append("WARC-Type: resource\r\n")
      .append("WARC-Target-URI: https://t.example.org/doc/1\r\n")
      .append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      .append(s"Content-Length: ${Int.MaxValue.toLong + 1}\r\n\r\n")
    Files.write(Paths.get(dir, "x.warc"), sb.toString.getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, dir).count()
    }
    assert(e.getMessage.contains("WARC record too large") ||
      Option(e.getCause).exists(_.getMessage.contains("WARC record too large")))
  }

  test("uncompressed .warc files read too") {
    val dir = Files.createTempDirectory("warc_plain").toString
    // hand-build a plain .warc with two records
    val sb = new StringBuilder
    for ((id, text) <- docs.take(2)) {
      val payload = text.getBytes("UTF-8")
      sb.append("WARC/1.0\r\n")
        .append("WARC-Type: resource\r\n")
        .append(s"WARC-Target-URI: https://t.example.org/doc/$id\r\n")
        .append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
        .append(s"Content-Length: ${payload.length}\r\n\r\n")
        .append(text).append("\r\n\r\n")
    }
    Files.write(Paths.get(dir, "x.warc"), sb.toString.getBytes("UTF-8"))
    val back = Warc.read(spark, dir).select("text")
      .as[String].collect().toSeq.sorted
    assert(back === docs.take(2).map(_._2).sorted)
  }

  test("streaming source replays the archive identically to the batch reader") {
    val dir = Files.createTempDirectory("warc_stream").toString
    Warc.write(frame(docs).repartition(3, $"uri"), dir, "uri", "date", "text")
    val name = "warc_stream_parity"
    val q = Warc.readStream(spark, dir, maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // one micro-batch per file: 3 non-empty parts → ≥3 batches processed
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    val streamed = spark.table(name)
      .select("uri", "date", "rec_type", "text")
      .as[(String, String, String, String)].collect().toSeq.sorted
    val batch = Warc.read(spark, dir)
      .select("uri", "date", "rec_type", "text")
      .as[(String, String, String, String)].collect().toSeq.sorted
    assert(streamed === batch)
    assert(streamed.size === docs.size)
  }

  test("streaming source picks up files that land after the first pass") {
    val dir = Files.createTempDirectory("warc_drop").toString
    Warc.write(frame(docs.take(2)).coalesce(1), dir, "uri", "date", "text")
    val ckpt = Files.createTempDirectory("warc_drop_ckpt").toString
    val out = Files.createTempDirectory("warc_drop_out").toString
    def runOnce(): Unit = {
      val q = Warc.readStream(spark, dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() === 2)
    // a new shard lands in the drop directory under a DIFFERENT part
    // name (a rewrite would clear existing parts); the checkpoint's
    // file log must replay ONLY the new file on restart — the sink
    // ending with exactly one copy of every record is the
    // exactly-once claim
    val d2 = Files.createTempDirectory("warc_drop2").toString
    Warc.write(frame(docs.drop(2)).coalesce(1), d2, "uri", "date", "text")
    Files.move(Paths.get(d2, "part-00000.warc.gz"),
      Paths.get(dir, "part-10000.warc.gz"))
    runOnce()
    val all = spark.read.parquet(out)
      .select("text").as[String].collect().toSeq.sorted
    assert(all === docs.map(_._2).sorted)
  }
}
