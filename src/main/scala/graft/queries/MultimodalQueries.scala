package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column coverage over `documents` (payload = UTF-8 bytes,
  * pure ASCII — verified — so the DuckDB oracle recomputes byte values
  * as `ord()` codepoints exactly). */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Decode + per-item features: byte stats from the decoded payload. */
  val qMmFeatures: Q = (spark, dir) => {
    val d = Multimodal.withPayload(Tables(spark, dir, "documents"), "text")
      .select(col("doc_id"), Multimodal.decode(col("payload")).as("px"))
    d.select(col("doc_id"),
      size(col("px")).cast("long").as("n_bytes"),
      Multimodal.checksum(col("px")).as("checksum"),
      Multimodal.countBelow(col("px"), 32).as("n_dark"),
      element_at(col("px"), 1).as("first_byte"),
      element_at(col("px"), size(col("px"))).as("last_byte"))
      .withColumn("mean_milli",
        round(lit(1000.0) * col("checksum") / col("n_bytes")).cast("long"))
      .orderBy("doc_id")
  }

  val qMmFeaturesSql: String =
    """WITH b AS (
      |  SELECT doc_id, list_transform(range(1, length(text) + 1),
      |    i -> ord(substr(text, i, 1))) AS bs
      |  FROM documents)
      |SELECT doc_id, cast(len(bs) as bigint) AS n_bytes,
      |  cast(list_sum(bs) as bigint) AS checksum,
      |  cast(len(list_filter(bs, x -> x < 32)) as bigint) AS n_dark,
      |  bs[1] AS first_byte, bs[len(bs)] AS last_byte,
      |  cast(round((1000.0 * list_sum(bs)) / len(bs)) as bigint) AS mean_milli
      |FROM b ORDER BY doc_id""".stripMargin

  /** Metadata struct usable without touching payload bytes + the
    * frame-sampling pattern (every 7th byte). */
  val qMmFrameSample: Q = (spark, dir) => {
    val d = Multimodal.withPayload(Tables(spark, dir, "documents"), "text")
    d.select(col("doc_id"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      Multimodal.frameSample(Multimodal.decode(col("payload")), 7).as("fr"))
      .select(col("doc_id"), col("width"), col("height"),
        size(col("fr")).cast("long").as("n_frames"),
        Multimodal.checksum(col("fr")).as("frame_checksum"))
      .orderBy("doc_id")
  }

  val qMmFrameSampleSql: String =
    """WITH b AS (
      |  SELECT doc_id, length(text) AS n,
      |    list_transform(range(1, length(text) + 1, 7),
      |      i -> ord(substr(text, i, 1))) AS fr
      |  FROM documents)
      |SELECT doc_id, cast(n % 64 + 1 as bigint) AS width,
      |  cast((n + (n % 64 + 1) - 1) // (n % 64 + 1) as bigint) AS height,
      |  cast(len(fr) as bigint) AS n_frames,
      |  cast(list_sum(fr) as bigint) AS frame_checksum
      |FROM b ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "mm_features" -> qMmFeatures,
    "mm_frame_sample" -> qMmFrameSample)

  val oracles: Map[String, String] = Map(
    "mm_features" -> qMmFeaturesSql,
    "mm_frame_sample" -> qMmFrameSampleSql)
}
