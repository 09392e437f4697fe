package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** throwaway: explain the domain-rank EDGE construction (the part
  * PageRank's eager checkpoint hides from the final plan) */
object EdgesExplain {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), concat(col("source"), lit(".example.org")).as("site"))
    def e(src: org.apache.spark.sql.Column, dst: org.apache.spark.sql.Column,
        keep: org.apache.spark.sql.Column) =
      struct(src.as("src"), dst.as("dst"), keep.as("keep"))
    val edges = d.select(explode(filter(array(
        e(col("site"), lit("spam.example.com"), col("doc_id") % 6 === 0),
        e(col("site"), lit("cdn.spam.example.com"), col("doc_id") % 8 === 0),
        e(col("site"), lit("good.example.org"), col("doc_id") % 8 === 0),
        e(col("site"), lit("hub.example.org"), col("doc_id") % 3 === 0),
        e(lit("hub.example.org"), col("site"), col("doc_id") % 4 === 0)),
      s => s.getField("keep"))).as("ed"))
      .select(col("ed.src").as("src"), col("ed.dst").as("dst"))
      .distinct()
    val plan = edges.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), plan)
    println(s"[explain] edges -> $out")
    spark.stop()
  }
}
