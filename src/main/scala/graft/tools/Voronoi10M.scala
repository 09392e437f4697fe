package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Voronoi

/** Voronoi tessellation at a SECOND scale point: 10M seeds through the
  * plain `tessellate()` API (auto-tiled path, VERDICT r10 #3), 10× the
  * ScaleBench stage-4 run — so the tiled path's scaling is measured,
  * not extrapolated from one point. A 3163×3163 jittered grid (jitter
  * a=0.3 < the 0.45 halo-sufficiency bound of `VoronoiTiledSpec`);
  * cell count must equal seed count and total tessellated area must
  * equal the clip area to 1e-6 relative (the per-tile sufficiency
  * guard + exact clip make partial coverage impossible — the area
  * check also forces full evaluation of every cell geometry).
  *
  * Prints one JSON line. Run: `sbt "runMain graft.tools.Voronoi10M"`.
  */
object Voronoi10M {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = 3163 // 3163² = 10,004,569 seeds
    val seeds = spark.range(n.toLong * n).select(
      col("id"),
      ((col("id") % n).cast("double") + 0.5 +
        (pmod(hash(col("id"), lit(1)), lit(1000)).cast("double") / 1000.0
          - 0.5) * 0.6).as("px"),
      ((col("id") / n).cast("long").cast("double") + 0.5 +
        (pmod(hash(col("id"), lit(2)), lit(1000)).cast("double") / 1000.0
          - 0.5) * 0.6).as("py"))

    val t0 = System.nanoTime()
    val cells = Voronoi.tessellate(seeds, "id", "px", "py",
      (0.0, 0.0, n.toDouble, n.toDouble))
    val stats = cells.agg(count(lit(1)).as("n"),
        sum(graft.geom.st.area(col("geom"))).as("area"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).head
    val sec = (System.nanoTime() - t0) / 1e9

    val clipArea = n.toDouble * n
    require(stats._1 == n.toLong * n, s"cells: ${stats._1}")
    require(math.abs(stats._2 / clipArea - 1.0) < 1e-6,
      s"area ratio: ${stats._2 / clipArea}")

    println(s"""{"metric":"voronoi_10m","seeds":${n.toLong * n},""" +
      s""""sec":$sec,"cells":${stats._1},""" +
      s""""area_ratio":${stats._2 / clipArea}}""")
    spark.stop()
  }
}
