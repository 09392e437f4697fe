package graft

import org.apache.spark.sql.SparkSession

/** Time a single declared query: `runMain graft.BenchOne <name> [sfDir]
  * [trials]` — the per-query iteration tool behind Bench's medians
  * (same noop-sink, clean-cache discipline).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val trials = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val times = (0 until trials).map { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] $name trial $i: $s%.3f s")
      s
    }.sorted
    println(f"[benchone] $name median: ${times(times.length / 2)}%.3f s")
    spark.stop()
  }
}
