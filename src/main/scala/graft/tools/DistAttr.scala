package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SpatialJoin
import graft.queries.GeoQueries
import graft.util.Exact

/** throwaway same-JVM stage attribution for geo_distance_join: where
  * do its ~4 s go — the self-join, the exact fixed-point aggregate,
  * or the final global sort? */
object DistAttr {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pts = GeoQueries.eventPoints(spark, dir)
    def selfJ = SpatialJoin.selfJoinWithinDistance(pts, "event_id", "pt_geom",
      d = 0.35, cellSize = 0.35)
    def aggPlain = selfJ.groupBy("id_a")
      .agg(count(lit(1)).as("n"), sum("dist").as("s"), min("dist").as("m"))
    def aggExact = selfJ.groupBy("id_a")
      .agg(count(lit(1)).as("n_neighbors"),
        Exact.fixedSum(col("dist"), 6).as("sum_dist"),
        round(min(col("dist")) * 1000000).cast("long").as("min_dist_micros"))
    def full = aggExact.orderBy("id_a")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[attr] $tag: $s%.3f s"); s
    }
    // warmup
    time("warm full")(full)
    (1 to 3).foreach { i =>
      time(s"pts $i")(pts)
      time(s"selfjoin $i")(selfJ)
      time(s"agg_plain $i")(aggPlain)
      time(s"agg_exact $i")(aggExact)
      time(s"full $i")(full)
    }
    spark.stop()
  }
}
