package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.Stateful
import graft.streaming.Stateful.KeyedValue

/** flatMapGroupsWithState: per-key state accumulates across micro-batches
  * and the final emission matches the batch aggregate. */
class StatefulStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("append-mode session windows emit once on watermark pass and evict state") {
    val dir = Files.createTempDirectory("sess_evict")
    def ev(rows: Seq[(Long, String, Double)]) = rows
      .toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    // micro-batch 0: user 1 has two sessions (>6h gap), user 2 one
    ev(Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 01:00:00", 2.0),
      (1L, "2024-01-01 10:00:00", 3.0),
      (2L, "2024-01-01 00:30:00", 4.0)))
      .coalesce(1).write.parquet(dir.resolve("b0").toString)
    // micro-batch 1: far-future sentinel pushes the watermark past
    // every real session's close
    ev(Seq((-1L, "2025-01-01 00:00:00", 0.0)))
      .coalesce(1).write.parquet(dir.resolve("b1").toString)

    val stream = spark.readStream
      .schema(ev(Seq((0L, "2024-01-01 00:00:00", 0.0))).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*/")
    val agg = stream.withWatermark("ts", "1 hour")
      .groupBy($"user_id", session_window($"ts", "6 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
      .select($"user_id", $"sw.start".as("start"), $"n_events", $"sum_value")

    val q = agg.writeStream.format("memory")
      .queryName("sess_evict").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("sess_evict")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()
      .map(t => (t._1, t._2.toString, t._3, t._4)).toSet
    // every REAL session emitted exactly once; the sentinel's own
    // session never closes past the watermark, so it is never emitted
    assert(out == Set(
      (1L, "2024-01-01 00:00:00.0", 2L, 3.0),
      (1L, "2024-01-01 10:00:00.0", 1L, 3.0),
      (2L, "2024-01-01 00:30:00.0", 1L, 4.0)), s"got $out")
    // state EVICTION across micro-batches: after the watermark passed,
    // only the sentinel's open session remains in the state store
    val stateTotals = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal)
    assert(stateTotals.nonEmpty)
    assert(stateTotals.max >= 3, s"state never held the open sessions: $stateTotals")
    assert(stateTotals.last <= 1,
      s"closed sessions were not evicted from state: $stateTotals")
  }

  test("stream-stream range join emits pairs and evicts both sides' state") {
    val dir = Files.createTempDirectory("ssj_evict")
    def ev(rows: Seq[(Long, Long, String, Double)]) = rows
      .toDF("event_id", "user_id", "s", "value")
      .select($"event_id", $"user_id", to_timestamp($"s").as("ts"), $"value")
    // batch 0: one anchor (value > 180) and follows inside/outside 1 h
    ev(Seq(
      (0L, 1L, "2024-01-01 00:00:00", 200.0), // anchor (also its own follow)
      (1L, 1L, "2024-01-01 00:10:00", 5.0),   // inside the window
      (2L, 1L, "2024-01-01 02:00:00", 6.0),   // outside
      (3L, 2L, "2024-01-01 00:20:00", 7.0)))  // other user
      .coalesce(1).write.parquet(dir.resolve("b0").toString)
    // batch 1: far-future sentinel pushes the watermark past every
    // 2024 row's eviction horizon; batch 2 triggers the state-cleanup
    // pass that runs under the batch-1 watermark (join state removal
    // happens one batch after the watermark advances). The sentinels
    // must THEMSELVES be anchors (value > 180): the anchor-side
    // predicate is pushed below the watermark node, so only rows
    // surviving it advance that side's watermark — the documented
    // idle-side caveat; in production anchors advance the watermark by
    // arriving, here the sentinel plays that role.
    ev(Seq((9L, 99L, "2025-01-01 00:00:00", 999.0)))
      .coalesce(1).write.parquet(dir.resolve("b1").toString)
    ev(Seq((10L, 99L, "2025-01-02 00:00:00", 999.0)))
      .coalesce(1).write.parquet(dir.resolve("b2").toString)

    val schema = ev(Seq((0L, 0L, "2024-01-01 00:00:00", 0.0))).schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString + "/*/")
    val anchors = stream.withWatermark("ts", "1 hour")
      .filter($"value" > 180)
      .select($"event_id".as("a_id"), $"user_id".as("a_user"), $"ts".as("a_ts"))
    val follows = stream.withWatermark("ts", "1 hour")
      .select($"event_id".as("b_id"), $"user_id".as("b_user"), $"ts".as("b_ts"))
    val joined = anchors.join(follows, expr(
      "a_user = b_user AND b_ts >= a_ts AND b_ts < a_ts + INTERVAL 1 HOUR"))
      .select($"a_id", $"b_id")

    val q = joined.writeStream.format("memory")
      .queryName("ssj_evict").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("ssj_evict").as[(Long, Long)].collect().toSet
    // real pairs + each sentinel anchor matching itself
    assert(out == Set((0L, 0L), (0L, 1L), (9L, 9L), (10L, 10L)), s"got $out")
    // both join sides' buffered 2024 rows must be evicted once the
    // sentinel advanced the watermark past their match horizon; only
    // the sentinels themselves (2 anchors + 2 follows max) may remain
    val stateTotals = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal)
    assert(stateTotals.nonEmpty)
    assert(stateTotals.max >= 5, s"state never buffered batch 0: $stateTotals")
    assert(stateTotals.last <= 4,
      s"join state was not evicted: $stateTotals")
  }

  test("topKServe merges across batches, emits once on eviction, skips live keys") {
    val dir = Files.createTempDirectory("serve_evict")
    def cand(rows: Seq[(Long, Long, Double, String)]) = rows
      .toDF("key", "id", "score", "s")
      .select($"key", $"id", $"score", to_timestamp($"s").as("ts"))
    // batch 0: keys 1 (three candidates) and 2 (one)
    cand(Seq(
      (1L, 10L, 0.9, "2024-01-01 00:00:00"),
      (1L, 11L, 0.5, "2024-01-01 00:00:00"),
      (1L, 12L, 0.7, "2024-01-01 00:00:00"),
      (2L, 20L, 0.3, "2024-01-01 00:00:01")))
      .coalesce(1).write.parquet(dir.resolve("b0").toString)
    // batch 1: a LATE candidate for key 1, inside the grace window —
    // must merge into the standing state, displacing id 12
    cand(Seq((1L, 13L, 0.8, "2024-01-01 00:00:02")))
      .coalesce(1).write.parquet(dir.resolve("b1").toString)
    // batch 2: far-future sentinel advances the watermark past every
    // real key's deadline; its own key (-1) never times out
    cand(Seq((-1L, 0L, 0.0, "2025-01-01 00:00:00")))
      .coalesce(1).write.parquet(dir.resolve("b2").toString)

    val stream = spark.readStream
      .schema(cand(Seq((0L, 0L, 0.0, "2024-01-01 00:00:00"))).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*/")
      .withWatermark("ts", "10 seconds")
      .as[Stateful.ServeCand]
    val q = Stateful.topKServe(stream, k = 2, graceMs = 5000).toDF()
      .writeStream.format("memory")
      .queryName("serve_evict").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("serve_evict")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 1, 10L, 0.9), (1L, 2, 13L, 0.8), // late candidate merged in
      (2L, 1, 20L, 0.3)),                   // fewer than k rows is fine
      s"got $out")
    // exactly-once: no key appears with two generations of rows, and
    // the sentinel's live key was never flushed
    assert(!out.exists(_._1 == -1L))
  }

  test("topKServe survives a candidate arriving fully behind the watermark") {
    // ADVICE r9: setTimeoutTimestamp must be later than the current
    // watermark or Spark kills the whole query. A key whose
    // candidates arrive in a batch AFTER a far-future sentinel has
    // already advanced the watermark past maxTs + graceMs exercises
    // exactly that: unclamped, the query crashes; clamped to
    // watermark + 1 it evicts (and emits) on a later trigger.
    val dir = Files.createTempDirectory("serve_clamp")
    def cand(rows: Seq[(Long, Long, Double, String)]) = rows
      .toDF("key", "id", "score", "s")
      .select($"key", $"id", $"score", to_timestamp($"s").as("ts"))
    // batch 0: sentinel pushes the watermark to ~2025-01-01
    cand(Seq((-1L, 0L, 0.0, "2025-01-01 00:00:00")))
      .coalesce(1).write.parquet(dir.resolve("b0").toString)
    // batch 1: key 5's candidates are a YEAR behind the watermark —
    // maxTs + graceMs is far below it
    cand(Seq(
      (5L, 50L, 0.9, "2024-01-01 00:00:00"),
      (5L, 51L, 0.4, "2024-01-01 00:00:00")))
      .coalesce(1).write.parquet(dir.resolve("b1").toString)
    // batch 2: a later sentinel advances the watermark again so the
    // clamped timeout (old watermark + 1) can fire
    cand(Seq((-1L, 0L, 0.0, "2025-01-01 00:01:00")))
      .coalesce(1).write.parquet(dir.resolve("b2").toString)

    val stream = spark.readStream
      .schema(cand(Seq((0L, 0L, 0.0, "2024-01-01 00:00:00"))).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*/")
      .withWatermark("ts", "10 seconds")
      .as[Stateful.ServeCand]
    val q = Stateful.topKServe(stream, k = 2, graceMs = 1000).toDF()
      .writeStream.format("memory")
      .queryName("serve_clamp").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("serve_clamp")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(out == Set((5L, 1, 50L, 0.9), (5L, 2, 51L, 0.4)), s"got $out")
  }

  test("running per-user stats across two micro-batches match batch") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id".as("key"), $"value")

    val dir = Files.createTempDirectory("stateful_events")
    val mid = ev.agg(expr("percentile_approx(key, 0.5)")).head().getLong(0)
    ev.filter($"key" <= mid).coalesce(1).write.parquet(dir.resolve("b0").toString)
    ev.filter($"key" > mid).coalesce(1).write.parquet(dir.resolve("b1").toString)

    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString + "/*/")
      .as[KeyedValue]
    val out = Stateful.runningStats(stream)

    val q = out.writeStream.format("memory")
      .queryName("user_running").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    // last emission per key == final cumulative state
    val finalStates = spark.table("user_running")
      .groupBy("key").agg(max(struct($"n", $"total", $"max")).as("s"))
      .select($"key", $"s.n", $"s.total", $"s.max")
      .as[(Long, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

    val batch = ev.groupBy("key")
      .agg(count(lit(1)).as("n"),
        (sum(round($"value" * 100)) / 100.0).as("total"),
        max($"value").as("mx"))
      .as[(Long, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

    assert(finalStates.keySet == batch.keySet)
    finalStates.foreach { case (k, (n, total, mx)) =>
      val (bn, btotal, bmx) = batch(k)
      assert(n == bn, s"key $k count $n != $bn")
      assert(math.abs(total - btotal) < 1e-6, s"key $k total $total != $btotal")
      assert(mx == bmx, s"key $k max $mx != $bmx")
    }
  }
}
