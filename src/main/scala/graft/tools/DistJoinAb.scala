package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SpatialJoin
import graft.queries.GeoQueries

/** throwaway A/B: candidate volume + interleaved timings of the
  * generic vs self distance-join forms on the sf0.1 event points */
object DistJoinAb {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pts = GeoQueries.eventPoints(spark, dir)
    // candidate rows reaching the distance refine = joined rows before
    // the filter; count via a join with the refine predicate removed
    def genericPairs = SpatialJoin.joinWithinDistance(
      pts, "event_id", "pt_geom", pts, "event_id", "pt_geom", 0.35, 0.35)
    def selfPairs = SpatialJoin.selfJoinWithinDistance(
      pts, "event_id", "pt_geom", 0.35, 0.35)
    println(s"[ab] generic refined pairs (both orientations): ${genericPairs.count()}")
    println(s"[ab] self refined pairs (unordered): ${selfPairs.count()}")
    def time(tag: String)(f: => Unit): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); f; val s = (System.nanoTime()-t0)/1e9
      println(f"[ab] $tag: $s%.3f s"); s
    }
    def run(df: => org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def oldQ = genericPairs.filter(col("id_a") < col("id_b")).groupBy("id_a")
      .agg(count(lit(1)).as("n"), sum("dist").as("s"))
    def newQ = selfPairs.groupBy("id_a")
      .agg(count(lit(1)).as("n"), sum("dist").as("s"))
    run(oldQ) // warm both paths
    run(newQ)
    val pairs = (1 to 5).map { i =>
      (time(s"old $i")(run(oldQ)), time(s"new $i")(run(newQ)))
    }
    println(f"[ab] min old ${pairs.map(_._1).min}%.3f  min new ${pairs.map(_._2).min}%.3f")
    spark.stop()
  }
}
