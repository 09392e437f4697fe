package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.Stateful
import graft.streaming.Stateful.KeyedValue

/** flatMapGroupsWithState: per-key state accumulates across micro-batches
  * and the final emission matches the batch aggregate. */
class StatefulStreamingSpec extends SparkSpec {
  import spark.implicits._

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
