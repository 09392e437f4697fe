package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.geom.st
import graft.grid.{Grid, GridConfig}
import graft.operators.{SpatialJoin, Voronoi}
import graft.util.Exact

/** Reusable pipeline templates — the reference's three scripts as
  * parameterized dataflows (SURVEY §3): the same template serves WRF,
  * HadUK and tas grids by swapping the [[GridConfig]], which is the
  * whole point of `haduk_voronoi.py` ("portable variant", §3.2).
  */
object Pipelines {

  /** How grid cells become polygons (SURVEY §4 "special-case strategy"):
    * Voronoi for curvilinear grids, closed-form boxes when the grid is
    * known rectilinear ("saves a bit of compute",
    * delphine/regrid.py:182-203). */
  sealed trait TessellationStrategy
  final case class RectilinearBoxes(dx: Double, dy: Double) extends TessellationStrategy
  final case class VoronoiCells(clip: (Double, Double, Double, Double)) extends TessellationStrategy

  /** Stages 2-4 of pipeline 3.1: unique grid cells → polygon geometry.
    * Input needs one row per cell with cfg.{x,y,lon,lat}Col. */
  def gridToPolygons(cells: DataFrame, cfg: GridConfig,
      strategy: TessellationStrategy): DataFrame = strategy match {
    case RectilinearBoxes(dx, dy) =>
      Grid.rectilinearCells(cells, cfg, dx, dy)
    case VoronoiCells(clip) =>
      // composite (y, x) key packed into the tessellation id, unpacked
      // and joined back after (J5 re-key, delphine/regrid.py:285-289)
      val keyed = cells.withColumn("__vid",
        col(cfg.yCol).cast("long") * 1000000L + col(cfg.xCol).cast("long"))
      val tess = Voronoi.tessellate(keyed, "__vid", cfg.lonCol, cfg.latCol, clip)
      keyed.join(tess, "__vid").drop("__vid")
  }

  /** Stages 7-8 of pipeline 3.1 (W1-W3 + A1): tumbling 1-day resample
    * producing per-day min/max/mean of the variable, then the per-cell
    * mean over days — `ds.resample(XTIME="1D")` + `.mean("XTIME")`
    * (wrf_voronoi.py:156-173). Fixed-point-exact aggregation (2-decimal
    * data) so results are order-independent and oracle-checkable. */
  def temporalDailyStats(grid: DataFrame, cfg: GridConfig): DataFrame = {
    val daily = grid
      .groupBy(col(cfg.yCol), col(cfg.xCol),
        window(col(cfg.timeCol), "1 day").as("w"))
      .agg(
        min(cfg.varCol).as("dmin"),
        max(cfg.varCol).as("dmax"),
        // carry the daily mean as its exact integer pair (cent sum,
        // count) instead of a double: the mean-of-means below
        // quantizes it to 4 decimals by INTEGER DIVISION
        // (s100·100 div c — the grid_anomaly discipline), NOT
        // round(dmean, 4), because rounding a computed double at a
        // decimal boundary is not cross-engine-stable: Spark rounds
        // the value's shortest decimal string, DuckDB scales the
        // binary value, and on .xxxx5-tie days they disagree by one
        // 1e-4 unit — invisible at sf0.01 group sizes, caught by the
        // sf0.1 gate (round 10). Both engines truncate identically
        // (toward zero) for the div/`//` pair.
        // Int128Sum via Exact.unitSum (r16): same exact cent sum, two
        // long buffer slots instead of a BigDecimal-backed decimal(38,0)
        // add per row
        Exact.unitSum(col(cfg.varCol), 100).cast("long").as("s100"),
        count(lit(1)).as("c"))
    daily.groupBy(col(cfg.yCol), col(cfg.xCol))
      .agg(
        count(lit(1)).as("n_days"),
        Exact.fixedAvg(col("dmin"), 2).as("tmin_mean"),
        Exact.fixedAvg(col("dmax"), 2).as("tmax_mean"),
        (Exact.int128Sum(expr("s100 * 100 div c")).cast("double") /
          (count(lit(1)) * lit(10000.0))).as("tmean_mean"))
  }

  /** Pipeline 3.3: conservative (integral-preserving) regrid — source
    * cells' values redistributed to target cells by overlay area weight:
    * per target, Σ value/area_src · area_piece (delphine/regrid.py:
    * 260-289). Generic double-precision API form; the oracle-checked
    * integer-exact variant lives in GeoQueries.qOverlayRegrid. */
  def conservativeRegrid(src: DataFrame, tgt: DataFrame,
      srcGeom: String, tgtGeom: String, valueCol: String,
      tgtKeys: Seq[String], bucketCell: Double): DataFrame = {
    val withArea = src.withColumn("__area_src", st.area(col(srcGeom)))
    SpatialJoin.overlayIntersection(withArea, tgt, srcGeom, tgtGeom, bucketCell)
      .groupBy(tgtKeys.map(col): _*)
      .agg(sum(col(valueCol) / col("__area_src") * col("piece_area"))
        .as("regridded"))
  }
}
