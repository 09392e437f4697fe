package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side soak-scale generator: writes `documents` and `events`
  * tables mirroring TESTDATA.md's schemas at a multiple of the sf0.1
  * bench scale, under a caller-chosen directory (the driver testdata is
  * read-only — soak data lives in /tmp). Deterministic (hash-seeded,
  * no RNG state), so soak runs are reproducible.
  *
  * Structure mirrors what makes the heavy queries heavy, not just row
  * counts: documents are word soup over a small shared vocabulary
  * (dense shingle collisions for the PPJoin prefix index) with ~5% of
  * docs near-copies of their predecessor (one trailing word changed →
  * Jaccard ≈ 0.9 pairs for CC/split), and events carry sequential ids
  * (the distance-join lattice derives coordinates from event_id).
  *
  * `runMain graft.tools.SoakGen [outDir] [scaleVsSf01]` — scale 10 ≈
  * "sf1": 50k docs / 1M events.
  */
object SoakGen {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/sfsoak"
    val scale = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocab = Seq("batch", "part", "spark", "line", "column", "order",
      "small", "sort", "fast", "value", "scan", "hash", "slow", "group",
      "agg", "filter", "query", "big", "key", "window", "row", "table",
      "stream", "merge", "data", "a", "vector", "join", "shuffle", "plan",
      "cache", "disk", "node", "task", "stage", "skew", "limit", "count",
      "index", "range")
    val vlit = array(vocab.map(lit): _*)

    val nDocs = 5000L * scale
    // ~5% near-copies: doc 20k+19 reuses doc 20k+18's word seeds except
    // the final word, giving high-Jaccard pairs without exact equality
    val seed = when(col("id") % 20 === 19, col("id") - 1).otherwise(col("id"))
    // length MUST derive from the copy seed too: a copy truncated at an
    // independent random length shares only min(len) words and its
    // Jaccard collapses (~0.2 instead of ~0.9) — the near-dup structure
    // the generator exists to plant
    val len = (pmod(hash(seed, lit(7)), lit(51)) + 10).cast("int")
    val words = transform(sequence(lit(0), lit(60)), i =>
      element_at(vlit,
        pmod(hash(seed, i, lit(13)), lit(vocab.size)).cast("int") + 1))
    val lastWord = element_at(vlit,
      pmod(hash(col("id"), lit(99)), lit(vocab.size)).cast("int") + 1)
    val text = concat_ws(" ",
      concat(slice(words, lit(1), greatest(len - 1, lit(1))), array(lastWord)))
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"), text.as("text"),
      element_at(array(lit("en"), lit("de"), lit("zh"), lit("fr")),
        pmod(hash(col("id"), lit(3)), lit(4)).cast("int") + 1).as("lang"),
      concat(lit("src"), pmod(hash(col("id"), lit(5)), lit(5))).as("source"))
      .withColumn("n_chars", length(col("text")))
    docs.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val nEvents = 100000L * scale
    val events = spark.range(nEvents).select(
      col("id").as("event_id"),
      expr("timestamp_micros(1704067200000000 + id * 43000000)").as("ts"),
      pmod(hash(col("id"), lit(17)), lit(2000)).cast("long").as("user_id"),
      element_at(array(lit("view"), lit("click"), lit("error"), lit("buy"),
          lit("scroll")),
        pmod(hash(col("id"), lit(19)), lit(5)).cast("int") + 1).as("event_type"),
      (pmod(hash(col("id"), lit(23)), lit(20000)).cast("double") / 100.0)
        .as("value"),
      concat(lit("{\"k\": "), pmod(hash(col("id"), lit(29)), lit(100)),
        lit("}")).as("props"))
    events.repartition(32).write.mode("overwrite")
      .parquet(s"$out/events.parquet")

    println(s"""{"out":"$out","scale":$scale,"docs":$nDocs,"events":$nEvents}""")
    spark.stop()
  }
}
