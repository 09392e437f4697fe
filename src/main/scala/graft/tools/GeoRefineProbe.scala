package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.geom.{st, Wkb}
import graft.queries.GeoQueries

/** throwaway: attribute geo_pip_join cost (scan/explode/join vs JTS
  * refine) + a Wkb/JTS microbench */
object GeoRefineProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // microbench: parse box + parse point + contains, 1M reps
    val boxB = Wkb.write(Wkb.box(0.0, 0.0, 5.0, 4.0))
    val ptB = Wkb.write(Wkb.point(2.0, 2.0))
    var sink = 0
    var i = 0
    val t0 = System.nanoTime()
    while (i < 1000000) {
      val g = Wkb.read(boxB); val p = Wkb.read(ptB)
      if (g.contains(p)) sink += 1
      i += 1
    }
    println(f"[probe] 1M parse+parse+contains: ${(System.nanoTime()-t0)/1e9}%.3f s (sink $sink)")
    // stage attribution
    val cells = GeoQueries.supplierCells(spark, dir).drop("pop_cents")
    val pts = GeoQueries.eventPoints(spark, dir)
    import graft.operators.SpatialJoin
    def time(tag: String)(f: => Unit): Unit = {
      spark.catalog.clearCache()
      val t = System.nanoTime(); f
      println(f"[probe] $tag: ${(System.nanoTime()-t)/1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val l = cells.withColumn("__bucket", explode(SpatialJoin.bucketIds(col("geom"), 5.0)))
    val r = pts.withColumn("__bucket", explode(SpatialJoin.bucketIds(col("pt_geom"), 5.0)))
    for (rep <- 1 to 3) {
      time(s"join only (no refine) $rep") { noop(l.join(r, "__bucket")) }
      time(s"join + refBucket $rep") { noop(l.join(r, "__bucket")
        .filter(col("__bucket") === struct(
          floor(greatest(st.xmin(col("geom")), st.xmin(col("pt_geom"))) / 5.0).cast("long").as("bx"),
          floor(greatest(st.ymin(col("geom")), st.ymin(col("pt_geom"))) / 5.0).cast("long").as("by")))) }
      time(s"full joinContains $rep") {
        noop(SpatialJoin.joinContains(cells, pts, "geom", "pt_geom", 5.0)) }
      time(s"full query $rep") { noop(GeoQueries.qPipJoin(spark, dir)) }
    }
    println(s"[probe] candidates: ${l.join(r, "__bucket").count()}")
    spark.stop()
  }
}
