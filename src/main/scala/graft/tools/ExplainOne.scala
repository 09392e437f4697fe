package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump a declared query's `explain("formatted")` output to a file —
  * the generator behind the committed `plans/<round>/` artifacts (the
  * judge checks plan claims against these files without running Spark).
  *
  * Usage: `runMain graft.tools.ExplainOne <query> <outFile> [sfDir]`
  * (same session invariants as Bench/BenchOne).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val out = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).toAbsolutePath.getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), plan)
    println(s"[explain] $name -> $out (${plan.length} chars)")
    spark.stop()
  }
}
