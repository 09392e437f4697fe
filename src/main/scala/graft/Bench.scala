package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // EVERY query is measured as median-of-N (default 3): single trials
    // are dominated by JIT/run-order/machine-contention variance — the
    // round-4 snapshot recorded 2-15× phantom "regressions" on untouched
    // queries that vanished on an idle re-run of the same commit. A
    // median over trials from a cleared cache is the cheapest estimator
    // that survives a loaded box.
    val trials = math.max(sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt, 1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm session machinery (scheduler, codegen pipeline, parquet
    // datasource init, noop sink) so bring-up cost isn't charged to
    // whichever query happens to run first.
    spark.range(1000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/nation.parquet")
      .write.format("noop").mode("overwrite").save()
    // Optional args restrict the run to the named queries (targeted
    // timing during development); the driver passes none → full sweep.
    val wanted = SparkEntry.queries.filter { case (n, _) =>
      args.isEmpty || args.contains(n)
    }
    val results = wanted.map { case (name, fn) =>
      val times = (0 until trials).map { _ =>
        // Each trial runs from a clean cache: operators persist
        // intermediate frames (signature/bucket tables) that would
        // otherwise accumulate across all 60+ queries and evict each
        // other under memory pressure, charging later queries for
        // earlier ones.
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // noop-format write forces full evaluation of every column
        // (count() would let Catalyst prune projection-only plans).
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2) // median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
