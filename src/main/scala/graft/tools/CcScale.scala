package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only timing harness for ScaleBench stage 31's graph (1M-vertex
  * planted chains + one adversarial long chain) — iterate on the
  * connected-components loop without running the whole suite.
  * `runMain graft.tools.CcScale [longChainLen]`.
  */
object CcScale {
  def main(args: Array[String]): Unit = {
    val chainLen = if (args.nonEmpty) args(0).toInt else 999
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 1000000L + chainLen + 1
    val ids = spark.range(n).select(col("id"))
    val pairs = spark.range(n)
      .filter((col("id") < 1000000L && col("id") % 10 =!= 9) ||
        (col("id") >= 1000000L && col("id") < lit(1000000L + chainLen)))
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val t0 = System.nanoTime()
    val labels = graft.operators.Dedup.connectedComponents(ids, pairs)
    val stats = labels.agg(sum("cluster_rep"), countDistinct("cluster_rep"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    println(f"[ccscale] chain=$chainLen comps=${stats._2} " +
      f"sum=${stats._1} ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
