package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quick recall smoke of the composed IVF-PQ stage shape at a chosen
  * corpus size (default 100k clustered vectors) — the triage tool for
  * ScaleBench stage 6b parameters. */
object IvfPqSmoke {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 100000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val nClusters = if (args.length > 1) args(1).toLong else 256L
    val cid = col("id") % nClusters
    val vec = array((0 until dim).map { d =>
      ((hash(cid, lit(d)).cast("double") / 2147483647.0) +
        (hash(col("id"), lit(d + 1000)).cast("double") / 2147483647.0) * 0.1)
        .cast("float")
    }: _*)
    val corpus = spark.range(rows).select(col("id"), vec.as("embedding"))
      .persist()
    val queries = corpus.filter(col("id") % (rows / 10) === 7)
    val t0 = System.nanoTime()
    val ivfpq = graft.operators.Ann.ivfPqRerankTopK(corpus, queries,
        "id", "embedding", 10, shortlist = 50, nlist = 64, nprobe = 8,
        m = 8, codebookK = 64, lloydIters = 1)
      .select(col("query_id"), col("neighbor_id")).persist()
    val nIvfPq = ivfpq.count()
    val t1 = System.nanoTime()
    val exact = graft.operators.Ann.l2TopK(corpus, queries,
        "id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id")).persist()
    val denom = exact.count()
    val recall = ivfpq.intersect(exact).count().toDouble / denom
    println(s"rows=$rows ivfpq_rows=$nIvfPq exact_rows=$denom " +
      s"recall=$recall ivfpq_sec=${(t1 - t0) / 1e9}")
    spark.stop()
  }
}
