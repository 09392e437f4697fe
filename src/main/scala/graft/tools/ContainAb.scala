package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** throwaway A/B: interleaved timings of dedup_containment's two sets-
  * cache layouts (pre-partitioned+sorted vs plain persist) in ONE JVM,
  * flipped via the graft.containCachePartitioned kill switch — the r16
  * calm baseline read dedup_containment at 3x its pre-restructure pool
  * floor and separate-JVM runs can't tell code from box. */
object ContainAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, dir, "documents")
    // the declared query's exact shape (TextQueries.qDedupContainment)
    def q = Dedup.containmentPairsIndexed(docs, "doc_id", "text", 3, 0.8)
      .orderBy("id_a", "id_b")
    def time(tag: String)(f: => Unit): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $tag: $s%.3f s"); s
    }
    def run(partitioned: Boolean): Unit = {
      sys.props("graft.containCachePartitioned") = partitioned.toString
      q.write.format("noop").mode("overwrite").save()
    }
    run(true); run(false) // warm both paths (JIT, rarity broadcast)
    val reps = (1 to 5).map { i =>
      (time(s"partitioned $i")(run(true)), time(s"plain $i")(run(false)))
    }
    sys.props.remove("graft.containCachePartitioned")
    println(f"[ab] min partitioned ${reps.map(_._1).min}%.3f  " +
      f"min plain ${reps.map(_._2).min}%.3f")
    spark.stop()
  }
}
