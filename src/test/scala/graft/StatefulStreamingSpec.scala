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
