package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.geom.st
import graft.grid.GridConfig
import graft.io.{GeoJson, GeoPackage, Hdf5, NetCdf}
import graft.operators.Voronoi
import graft.pipelines.Pipelines

/** Runnable end-to-end example of the README migration guide — the
  * `wrf_voronoi.py` workflow (ref lines 105-190) as a user of this
  * library would write it:
  *
  *  1. a WRF-shaped chunked NetCDF-4 file (here synthesized; point the
  *     path at real model output)
  *  2. native DataSource V2 scan (`GridSource`) with slab pruning
  *  3. daily min/max/mean per cell (`Pipelines.temporalDailyStats`,
  *     the `resample(XTIME="1D")` equivalent)
  *  4. finite Voronoi tessellation of the cell coordinates
  *     (`Voronoi.tessellate`, the `voronoi_finite_polygons_2d` + clip
  *     equivalent)
  *  5. bbox filter + equi-join of stats onto geometry
  *  6. GPKG + distributed GeoJSON sinks (`gdf.to_file` equivalents)
  *
  * Run: `sbt "runMain graft.examples.WrfPipeline"`.
  */
object WrfPipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- 1. WRF-shaped NetCDF-4 input: t2(time, y, x), chunked+deflate
    val work = java.nio.file.Files.createTempDirectory("wrf_example")
    val (nt, ny, nx) = (48, 12, 15)
    val dims = Seq(NetCdf.Dim("time", nt), NetCdf.Dim("y", ny), NetCdf.Dim("x", nx))
    val vars = Seq(
      NetCdf.Var("time", Seq(0), NetCdf.NcDouble, Seq("units" -> "s"),
        Array.tabulate(nt)(t => (t * 3600L * 1000000L).toDouble)),
      NetCdf.Var("y", Seq(1), NetCdf.NcDouble, Nil, Array.tabulate(ny)(_.toDouble)),
      NetCdf.Var("x", Seq(2), NetCdf.NcDouble, Nil, Array.tabulate(nx)(_.toDouble)),
      NetCdf.Var("t2", Seq(0, 1, 2), NetCdf.NcDouble, Seq("units" -> "K"),
        Array.tabulate(nt * ny * nx) { i =>
          280.0 + ((i * 2654435761L) % 200) / 10.0
        }))
    val ncPath = work.resolve("wrf_t2.h5").toString
    Hdf5.write(ncPath, dims, Nil, vars, chunkDeflate = true)

    // --- 2. native scan: long-form (time, y, x, lat, lon, value)
    val grid = spark.read.format("graft.sources.GridSource").load(ncPath)

    // --- 2b. post-processing the reference assumes already happened
    // (wrf-python territory): smooth the field (smooth2d) and compute
    // each timestep's departure from the per-cell period mean. A
    // staggered wind component would destagger the same way:
    //   GridOps.destagger(u, Seq("time", "y"), "xs", "u")
    // and a 3-D field interpolates to pressure surfaces with
    //   GridOps.interpLevels(t3d, Seq("time","y","x"), "p", "t", Seq(850, 700))
    val cfg = GridConfig("x", "y", "lon", "lat", "time", "value")
    val smoothed = graft.grid.GridOps.smooth(grid, cfg, dec = 1)
    val withAnom = smoothed.withColumn("anom",
      graft.grid.GridOps.anomaly(cfg, dec = 1))
    require(withAnom.filter(col("anom").isNotNull).count() > 0)

    // --- 3. daily stats per cell (tmin/tmax/tmean over day windows)
    val stats = Pipelines.temporalDailyStats(grid, cfg)

    // --- 4. Voronoi cells of the (curvilinear) cell centers: both
    // indices feed both coordinates, the 2-D XLAT/XLONG shape
    val seeds = grid.select(col("y"), col("x")).distinct()
      .withColumn("lon", col("x") * 2.0 + col("y") * 0.3)
      .withColumn("lat", col("y") * 1.5 + col("x") * 0.2)
      .withColumn("vid", col("y") * 1000L + col("x"))
    val (maxLon, maxLat) =
      ((nx - 1) * 2.0 + (ny - 1) * 0.3, (ny - 1) * 1.5 + (nx - 1) * 0.2)
    // single-domain form; Voronoi.tessellateTiled is the huge-grid path
    val cells = Voronoi.tessellate(seeds, "vid", "lon", "lat",
      clip = (-5.0, -5.0, maxLon + 5.0, maxLat + 5.0))

    // --- 5. clip to the domain bbox + join daily stats onto geometry
    val keyed = seeds.join(cells, Seq("vid"))
    val bbox = st.makeBox(lit(-1.0), lit(-1.0),
      lit(maxLon + 1.0), lit(maxLat + 1.0))
    val layer = keyed.filter(st.within(col("geom"), bbox))
      .join(stats, Seq("y", "x"))
      .select(col("y"), col("x"), col("lon"), col("lat"),
        col("n_days"), col("tmin_mean"), col("tmax_mean"),
        col("tmean_mean"), col("geom"))

    // --- 6. sinks: single-file GPKG (streamed) + executor-side GeoJSON
    GeoPackage.write(layer, "geom", work.resolve("wrf_voronoi.gpkg").toString,
      layer = "wrf_voronoi")
    GeoJson.writeParts(layer, "geom", work.resolve("cells_json").toString)

    val back = GeoJson.read(spark, work.resolve("cells_json").toString)
    println(s"[wrf-example] wrote ${back.count()} Voronoi cells with daily " +
      s"stats to $work (gpkg + geojson parts)")
    require(back.count() > 0, "example produced no cells")
    spark.stop()
  }
}
