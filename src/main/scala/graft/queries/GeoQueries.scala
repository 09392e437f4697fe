package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.geom.st

/** Geometry operator coverage (SURVEY §2.7 G1-G8, §2.2 P3, §2.4 A6).
  *
  * The testdata carries no coordinates, so every query derives geometry
  * DETERMINISTICALLY from integer keys — closed-form constructions whose
  * areas/predicates the DuckDB oracle can recompute as pure arithmetic
  * (the "rectilinear first for oracle-ability" strategy). Coordinates are
  * multiples of 0.25 (exactly representable in binary floating point), so
  * JTS shoelace areas are exact and integer-scaled outputs (×16, ×8, ×2)
  * hash-match the oracle bit-for-bit.
  *
  * Grid layouts (all scale-factor-independent, keyed off row keys):
  *  - part target grid: tx = p % 50, ty = p ÷ 50, variable cell size
  *    w = 0.25·(1 + p%4), h = 0.25·(1 + p%3)
  *  - supplier "population" grid: cx = s % 10, cy = s ÷ 10, 5×4 cells —
  *    the source grid of the conservative-regrid pipeline
  *    (ref delphine/regrid.py:182-203 box construction)
  */
object GeoQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Supplier 5×4 "population" cells — shared by filter/join/regrid
    * queries. Columns: s_suppkey, cx, cy, geom, pop_cents. */
  def supplierCells(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables(spark, dir, "supplier")
    s.select(
      col("s_suppkey"),
      (col("s_suppkey") % 10).as("cx"),
      (col("s_suppkey") / 10).cast("long").as("cy"),
      round(col("s_acctbal") * 100).cast("long").as("pop_cents"))
      .withColumn("geom", st.makeBox(
        col("cx") * 5.0, col("cy") * 4.0,
        col("cx") * 5.0 + 5.0, col("cy") * 4.0 + 4.0))
  }

  /** Part target cells on a 0.25-shifted unit lattice (sizes vary so
    * area checks aren't constant). Columns: p_partkey, tx, ty, geom. */
  def partCells(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    p.select(
      col("p_partkey"),
      (col("p_partkey") % 50).as("tx"),
      (col("p_partkey") / 50).cast("long").as("ty"),
      ((col("p_partkey") % 4 + 1) * 0.25).as("w"),
      ((col("p_partkey") % 3 + 1) * 0.25).as("h"))
      .withColumn("geom", st.makeBox(col("tx"), col("ty"),
        col("tx") + col("w"), col("ty") + col("h")))
  }

  /** G3+G7+A7: box construction, planar area, centroid — per-row geometry
    * math, integer-scaled for exact oracle compare. */
  val qCellsArea: Q = (spark, dir) => {
    partCells(spark, dir)
      .select(col("p_partkey"),
        round(st.area(col("geom")) * 16).cast("long").as("area16"),
        round(st.stx(st.centroid(col("geom"))) * 8).cast("long").as("cx8"),
        round(st.sty(st.centroid(col("geom"))) * 8).cast("long").as("cy8"))
      .orderBy("p_partkey")
  }

  val qCellsAreaSql: String =
    """SELECT p_partkey,
      |  cast(round(16 * (0.25*(1 + p_partkey%4)) * (0.25*(1 + p_partkey%3))) as bigint) AS area16,
      |  cast(8*(p_partkey%50) + (1 + p_partkey%4) as bigint) AS cx8,
      |  cast(8*(p_partkey//50) + (1 + p_partkey%3) as bigint) AS cy8
      |FROM part ORDER BY p_partkey""".stripMargin

  /** G1+G7: polygon from vertex arrays (shoelace area) — triangle
    * (0,0)-(a,0)-(0,b) has area a·b/2; ring auto-closes to 4 points. */
  val qPolygonArea: Q = (spark, dir) => {
    val s = Tables(spark, dir, "supplier")
    val a = (col("s_suppkey") % 7 + 1).cast("double")
    val b = (col("s_nationkey") + 2).cast("double")
    val tri = st.polygon(
      array(lit(0.0), a, lit(0.0)), array(lit(0.0), lit(0.0), b))
    s.select(col("s_suppkey"),
      round(st.area(tri) * 2).cast("long").as("area2"),
      st.npoints(tri).cast("long").as("npts"))
      .orderBy("s_suppkey")
  }

  val qPolygonAreaSql: String =
    """SELECT s_suppkey,
      |  cast((s_suppkey%7 + 1) * (s_nationkey + 2) as bigint) AS area2,
      |  cast(4 as bigint) AS npts
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  /** P3+G4: spatial bbox filter — keep supplier cells within
    * [0,25]×[0,20] (ref wrf_voronoi.py:143-148 `within` bbox filter). */
  val qBboxFilter: Q = (spark, dir) => {
    val bbox = st.makeBox(lit(0.0), lit(0.0), lit(25.0), lit(20.0))
    supplierCells(spark, dir)
      .filter(st.within(col("geom"), bbox))
      .select(col("s_suppkey"), col("cx").cast("long").as("cx"), col("cy"))
      .orderBy("s_suppkey")
  }

  val qBboxFilterSql: String =
    """SELECT s_suppkey, cast(s_suppkey%10 as bigint) AS cx,
      |  cast(s_suppkey//10 as bigint) AS cy
      |FROM supplier
      |WHERE (s_suppkey%10)*5 + 5 <= 25 AND (s_suppkey//10)*4 + 4 <= 20
      |ORDER BY s_suppkey""".stripMargin

  /** A6/G8: geometric union aggregate — per-nation chain of overlapping
    * boxes [r, r+2]×[0,1] unions to [0, n+1]×[0,1], area n+1 (ref
    * `unary_union` wrf_voronoi.py:188). Exercises partial-aggregate
    * merge of the TypedImperativeAggregate across partitions. */
  val qUnionArea: Q = (spark, dir) => {
    val s = Tables(spark, dir, "supplier")
    val w = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    s.withColumn("rk", (row_number().over(w) - 1).cast("double"))
      .select(col("s_nationkey"),
        st.makeBox(col("rk"), lit(0.0), col("rk") + 2.0, lit(1.0)).as("g"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_supp"),
        round(st.area(st.unionAggr(col("g")))).cast("long").as("union_area"))
      .orderBy("s_nationkey")
  }

  val qUnionAreaSql: String =
    """SELECT s_nationkey, count(*) AS n_supp,
      |  cast(count(*) + 1 as bigint) AS union_area
      |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "geo_cells_area" -> qCellsArea,
    "geo_polygon_area" -> qPolygonArea,
    "geo_bbox_filter" -> qBboxFilter,
    "geo_union_area" -> qUnionArea)

  val oracles: Map[String, String] = Map(
    "geo_cells_area" -> qCellsAreaSql,
    "geo_polygon_area" -> qPolygonAreaSql,
    "geo_bbox_filter" -> qBboxFilterSql,
    "geo_union_area" -> qUnionAreaSql)
}
