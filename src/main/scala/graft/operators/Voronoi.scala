package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import org.locationtech.jts.geom.{Coordinate, Envelope, Geometry}
import org.locationtech.jts.triangulate.VoronoiDiagramBuilder

import graft.geom.Wkb

/** Voronoi tessellation of seed points into cell polygons — the
  * reference's signature capability (`voronoi_finite_polygons_2d`,
  * wrf_voronoi.py:19-103, duplicated delphine/regrid.py:47-131).
  *
  * The reference reconstructs scipy's infinite border regions by hand
  * and clips to a bbox; JTS `VoronoiDiagramBuilder` + an explicit clip
  * intersection produces the same output semantics (finite cells that
  * partition the clip box) in one robust library call.
  *
  * Execution model: a tessellation is a GLOBAL geometric op over all
  * seeds of one domain, so one domain must be materialized on one task —
  * exactly the reference's memory profile (whole grid in RAM,
  * delphine/regrid.py:8). Scale-out across MANY domains comes from
  * `tessellateByDomain` (groupByKey → flatMapGroups, one task per
  * domain). Scale within a single 100 TB-grid domain would need
  * tile-with-halo tessellation — documented future work (SURVEY §7).
  */
object Voronoi {

  case class Seed(id: Long, x: Double, y: Double)
  case class DomainSeed(domain: Long, id: Long, x: Double, y: Double)

  private def cellsOf(seeds: Iterable[Seed], clip: Envelope): Iterator[(Long, Array[Byte])] = {
    val ss = seeds.toArray
    if (ss.isEmpty) return Iterator.empty
    val builder = new VoronoiDiagramBuilder()
    builder.setSites(ss.map(s => new Coordinate(s.x, s.y)).toSeq.asJava)
    builder.setClipEnvelope(clip)
    val clipPoly = Wkb.envelopePolygon(clip)
    val diagram = builder.getDiagram(Wkb.factory)
    // seed ids keyed by exact coordinate — sites pass through JTS
    // unperturbed and distinct (duplicate seeds are the caller's error)
    val byCoord = ss.map(s => (s.x, s.y) -> s.id).toMap
    (0 until diagram.getNumGeometries).iterator.map { i =>
      val cell = diagram.getGeometryN(i)
      val site = cell.getUserData.asInstanceOf[Coordinate]
      val id = byCoord.getOrElse((site.x, site.y),
        // robustness fallback: locate the seed the cell contains
        ss.find(s => cell.contains(Wkb.point(s.x, s.y)))
          .map(_.id)
          .getOrElse(throw new IllegalStateException(
            s"voronoi cell $i matches no seed")))
      // builder clips to an *expanded* envelope; intersect exactly
      (id, Wkb.write(cell.intersection(clipPoly)))
    }
  }

  /** Tessellate one domain of seeds, clipped to `clip`. Seeds must be
    * distinct points. Output: (idCol, geom WKB). The whole domain is
    * funneled to a single task (see scaladoc). */
  def tessellate(points: DataFrame, idCol: String, xCol: String, yCol: String,
      clip: (Double, Double, Double, Double)): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val (x0, y0, x1, y1) = clip
    val ds: Dataset[Seed] = points.select(
      col(idCol).cast("long").as("id"),
      col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).as[Seed]
    ds.repartition(1)
      .mapPartitions { it =>
        cellsOf(it.toSeq, new Envelope(x0, x1, y0, y1))
      }
      .toDF(idCol, "geom")
  }

  /** Domain-parallel tessellation: one Voronoi diagram per `domainCol`
    * value, one task per domain (`flatMapGroups`) — how many independent
    * grids (model runs, tiles, regions) tessellate concurrently on a
    * cluster. Clip envelope is per-domain: the seeds' extent expanded by
    * `margin`. */
  def tessellateByDomain(points: DataFrame, domainCol: String, idCol: String,
      xCol: String, yCol: String, margin: Double): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val ds: Dataset[DomainSeed] = points.select(
      col(domainCol).cast("long").as("domain"),
      col(idCol).cast("long").as("id"),
      col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).as[DomainSeed]
    ds.groupByKey(_.domain)
      .flatMapGroups { (dom, it) =>
        val seeds = it.map(s => Seed(s.id, s.x, s.y)).toSeq
        val env = new Envelope()
        seeds.foreach(s => env.expandToInclude(s.x, s.y))
        env.expandBy(margin)
        cellsOf(seeds, env).map { case (id, wkb) => (dom, id, wkb) }
      }
      .toDF(domainCol, idCol, "geom")
  }
}
