package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.geom.st
import graft.grid.{Grid, GridConfig}
import graft.pipelines.Pipelines
import graft.pipelines.Pipelines.RectilinearBoxes

/** Long-form grid model coverage (SURVEY §1.3, §3.1-3.2): the full
  * wrf_voronoi temporal pipeline composed in one query, plus the small
  * projection/slice operators (P2/P6/P7/S5). The grid derives from
  * `events`: cell keys (y = event_id mod 20, x = user_id mod 30), time,
  * value — a deterministic long-form (time, y, x, var) table both
  * engines can build. */
object GridQueries {

  type Q = (SparkSession, String) => DataFrame

  private val cfg = GridConfig("x", "y", "lon", "lat", "ts", "value")

  private def eventsGrid(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select(
      (col("event_id") % 20).as("y"),
      (col("user_id") % 30).as("x"),
      col("ts"), col("value"))

  /** Pipeline 3.1 end-to-end shape: long-form grid scan → rectilinear
    * tessellation (G11) → spatial bbox filter (P3) → tumbling-window
    * temporal stats W1-W3 + mean-over-days A1 → multi-key equi-join J1
    * of stats onto geometry (wrf_voronoi.py:107-183 re-expressed). */
  val qGridPipeline: Q = (spark, dir) => {
    val grid = eventsGrid(spark, dir)
    val stats = Pipelines.temporalDailyStats(grid, cfg)
    val cells = grid.select("y", "x").distinct()
      .withColumn("lon", col("x") * 2.0 + 1.0)
      .withColumn("lat", col("y") * 1.5 + 0.75)
    val polys = Pipelines.gridToPolygons(cells, cfg, RectilinearBoxes(2.0, 1.5))
    val bbox = st.makeBox(lit(0.0), lit(0.0), lit(40.0), lit(21.0))
    polys.filter(st.within(col("geom"), bbox))
      .join(stats, Seq("y", "x"))
      .select(col("y"), col("x"),
        round(st.stx(st.centroid(col("geom"))) * 2).cast("long").as("cx2"),
        round(st.sty(st.centroid(col("geom"))) * 4).cast("long").as("cy4"),
        round(st.area(col("geom")) * 16).cast("long").as("area16"),
        col("n_days"), col("tmin_mean"), col("tmax_mean"), col("tmean_mean"))
      .orderBy("y", "x")
  }

  val qGridPipelineSql: String =
    """WITH g AS (
      |  SELECT event_id%20 AS y, user_id%30 AS x,
      |    cast(date_trunc('day', ts) as date) AS day, value FROM events),
      |d AS (
      |  SELECT y, x, day, min(value) AS dmin, max(value) AS dmax,
      |    sum(cast(round(value*100) as bigint)) AS s100, count(*) AS c
      |  FROM g GROUP BY 1, 2, 3),
      |s AS (
      |  SELECT y, x, count(*) AS n_days,
      |    sum(cast(round(dmin*100) as bigint)) / (count(*) * 100.0) AS tmin_mean,
      |    sum(cast(round(dmax*100) as bigint)) / (count(*) * 100.0) AS tmax_mean,
      |    sum((s100 * 100) // c) / (count(*) * 10000.0) AS tmean_mean
      |  FROM d GROUP BY 1, 2)
      |SELECT y, x, cast(4*x + 2 as bigint) AS cx2, cast(6*y + 3 as bigint) AS cy4,
      |  cast(48 as bigint) AS area16, n_days, tmin_mean, tmax_mean, tmean_mean
      |FROM s WHERE x <= 19 AND y <= 13 ORDER BY y, x""".stripMargin

  /** P2 drop + P6 positional time slice + P7 row-count guard + S5
    * float32 narrowing on output (delphine/regrid.py:311,
    * haduk_voronoi.py:72-74). */
  val qDropCastSlice: Q = (spark, dir) => {
    val ev = Tables(spark, dir, "events").withColumn("day", col("ts").cast("date"))
    val dayCfg = cfg.copy(timeCol = "day")
    val sliced = Grid.iselTime(ev, dayCfg, 1)
    val guardOk = Grid.underRowLimit(sliced, 10000)
    sliced.drop("props", "user_id", "ts")
      .withColumn("value_f32", col("value").cast("float"))
      .withColumn("guard_ok", lit(guardOk))
      .select("event_id", "event_type", "value_f32", "guard_ok")
      .orderBy("event_id")
  }

  val qDropCastSliceSql: String =
    """SELECT event_id, event_type, cast(value as real) AS value_f32,
      |  true AS guard_ok
      |FROM events
      |WHERE cast(ts as date) = (
      |  SELECT d FROM (SELECT DISTINCT cast(ts as date) AS d FROM events
      |                 ORDER BY d LIMIT 2) ORDER BY d DESC LIMIT 1)
      |ORDER BY event_id""".stripMargin

  /** S1: the DataSource V2 dense-grid scan — a deterministic MULTI-FILE
    * .ggrd dataset (24×10×20 cells over 4 slab files of 6 time steps
    * each, closed-form values) is written to a temp directory, scanned
    * through the custom source with y/x filters pushed to the decoder
    * and the time predicate pruning file 0 entirely plus nothing of
    * files 1-3 (6 of 24 IO slabs skipped, one InputPartition per
    * surviving (file, slab)), then aggregated. The oracle recomputes
    * everything from `range()` cross joins — the dense files and the
    * scan must agree cell-for-cell. */
  val qGridSourceScan: Q = (spark, dir) => {
    val tmp = graft.util.Scratch.dir("ggrd_q")
    for (k <- 0 until 4)
      graft.sources.GridBinary.write(tmp.resolve(f"slab-$k%02d.ggrd").toString,
        times = Array.tabulate(6)(i => (k * 6 + i) * 3600L * 1000000L),
        lats = Array.tabulate(10)(_ * 0.5),
        lons = Array.tabulate(20)(_ * 0.25),
        value = (tl, y, x) => (((k * 6 + tl) * 31 + y * 7 + x) % 100) / 4.0)
    spark.read.format("graft.sources.GridSource").load(tmp.toString)
      .filter(col("x").between(5, 14) && col("y") >= 2 &&
        col("time") >= lit("1970-01-01 06:00:00").cast("timestamp"))
      .groupBy(col("y").cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 4).cast("long")).as("sum4"))
      .orderBy("y")
  }

  val qGridSourceScanSql: String =
    """SELECT cast(y.y as bigint) AS y, count(*) AS n,
      |  cast(sum((t.t*31 + y.y*7 + x.x) % 100) as bigint) AS sum4
      |FROM range(0, 24) t(t), range(0, 10) y(y), range(0, 20) x(x)
      |WHERE x.x BETWEEN 5 AND 14 AND y.y >= 2 AND t.t >= 6
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** S1 over REAL self-describing inputs: the same scan + slab-pruned
    * aggregate as [[qGridSourceScan]], but the directory holds a MIX
    * of classic CDF files, chunked shuffle+deflate NetCDF-4 files AND
    * a chunked zlib Zarr v2 store — the GridSource treats all four
    * containers identically (one InputPartition per (file, time-slab),
    * pruned slabs never read, pruned chunks never inflated). Same
    * oracle. */
  val qGridSourceScanNc: Q = (spark, dir) => {
    import graft.io.{Hdf5, NetCdf, Zarr}
    val tmp = graft.util.Scratch.dir("ncgrid_q")
    val dims = Seq(NetCdf.Dim("time", 6), NetCdf.Dim("y", 10), NetCdf.Dim("x", 20))
    def vars(k: Int) = Seq(
      NetCdf.Var("time", Seq(0), NetCdf.NcDouble, Nil,
        Array.tabulate(6)(i => ((k * 6 + i) * 3600L * 1000000L).toDouble)),
      NetCdf.Var("y", Seq(1), NetCdf.NcDouble, Nil, Array.tabulate(10)(_ * 0.5)),
      NetCdf.Var("x", Seq(2), NetCdf.NcDouble, Nil, Array.tabulate(20)(_ * 0.25)),
      NetCdf.Var("t2", Seq(0, 1, 2), NetCdf.NcDouble, Nil,
        Array.tabulate(6 * 10 * 20) { i =>
          val tl = i / 200; val y = i % 200 / 20; val x = i % 20
          (((k * 6 + tl) * 31 + y * 7 + x) % 100) / 4.0
        }))
    for (k <- 0 until 4)
      if (k == 3)
        Zarr.write(tmp.resolve(f"slab-$k%02d.zarr").toString, dims, Nil,
          vars(k), compress = true, chunk0 = 2)
      else if (k % 2 == 0)
        NetCdf.write(tmp.resolve(f"slab-$k%02d.nc").toString, dims, Nil, vars(k))
      else
        Hdf5.write(tmp.resolve(f"slab-$k%02d.h5").toString, dims, Nil, vars(k),
          chunkDeflate = true)
    spark.read.format("graft.sources.GridSource").load(tmp.toString)
      .filter(col("x").between(5, 14) && col("y") >= 2 &&
        col("time") >= lit("1970-01-01 06:00:00").cast("timestamp"))
      .groupBy(col("y").cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 4).cast("long")).as("sum4"))
      .orderBy("y")
  }

  /** Pipeline 3.2 (`haduk_voronoi.py`, the "portable variant"): the
    * SAME pipeline template as [[qGridPipeline]] with a different
    * grid config — different dims (y = user_id mod 15, x = event_id
    * mod 25), different cell spacing (1×2), different bbox. One code
    * path, two datasets: the reference's whole point. */
  val qGridPipelineHaduk: Q = (spark, dir) => {
    val grid = Tables(spark, dir, "events").select(
      (col("user_id") % 15).as("y"),
      (col("event_id") % 25).as("x"),
      col("ts"), col("value"))
    val stats = Pipelines.temporalDailyStats(grid, cfg)
    val cells = grid.select("y", "x").distinct()
      .withColumn("lon", col("x") * 1.0 + 0.5)
      .withColumn("lat", col("y") * 2.0 + 1.0)
    val polys = Pipelines.gridToPolygons(cells, cfg, RectilinearBoxes(1.0, 2.0))
    val bbox = st.makeBox(lit(0.0), lit(0.0), lit(20.0), lit(24.0))
    polys.filter(st.within(col("geom"), bbox))
      .join(stats, Seq("y", "x"))
      .select(col("y"), col("x"),
        round(st.stx(st.centroid(col("geom"))) * 2).cast("long").as("cx2"),
        round(st.sty(st.centroid(col("geom"))) * 2).cast("long").as("cy2"),
        round(st.area(col("geom")) * 16).cast("long").as("area16"),
        col("n_days"), col("tmin_mean"), col("tmax_mean"), col("tmean_mean"))
      .orderBy("y", "x")
  }

  val qGridPipelineHadukSql: String =
    """WITH g AS (
      |  SELECT user_id%15 AS y, event_id%25 AS x,
      |    cast(date_trunc('day', ts) as date) AS day, value FROM events),
      |d AS (
      |  SELECT y, x, day, min(value) AS dmin, max(value) AS dmax,
      |    sum(cast(round(value*100) as bigint)) AS s100, count(*) AS c
      |  FROM g GROUP BY 1, 2, 3),
      |s AS (
      |  SELECT y, x, count(*) AS n_days,
      |    sum(cast(round(dmin*100) as bigint)) / (count(*) * 100.0) AS tmin_mean,
      |    sum(cast(round(dmax*100) as bigint)) / (count(*) * 100.0) AS tmax_mean,
      |    sum((s100 * 100) // c) / (count(*) * 10000.0) AS tmean_mean
      |  FROM d GROUP BY 1, 2)
      |SELECT y, x, cast(2*x + 1 as bigint) AS cx2, cast(4*y + 2 as bigint) AS cy2,
      |  cast(32 as bigint) AS area16, n_days, tmin_mean, tmax_mean, tmean_mean
      |FROM s WHERE x <= 19 AND y <= 11 ORDER BY y, x""".stripMargin

  /** THE FLAGSHIP COMPOSITION (SURVEY §3.1, wrf_voronoi.py:107-183) with
    * TRUE Voronoi on a CURVILINEAR grid — every stage in one plan:
    * long-form scan → per-domain Voronoi tessellation → st_within bbox
    * filter → tumbling daily stats → equi-join stats onto geometry →
    * distributed GeoJSON sink → scan back.
    *
    * The grid is curvilinear the way WRF output is: lon AND lat each
    * derive from BOTH indices (wrf_voronoi.py:121-127's 2-D XLONG/XLAT),
    * here a sheared lattice lon = 2·x + 0.3·y, lat = 1.5·y + 0.2·x per
    * domain, two domains offset 1000° apart tessellating in parallel
    * (`tessellateByDomain`, one task per domain).
    *
    * Oracle-exactness comes from lattice geometry: a Voronoi cell of an
    * interior lattice seed is the translated fundamental cell, so its
    * area is |det(u,v)| = 2·1.5 − 0.3·0.2 = 2.94 exactly and its
    * centroid is the seed itself (central symmetry); boundary-ring cells
    * are clipped by the domain envelope (extent+5°), so a bbox at
    * extent+3° passes EXACTLY the interior index ring (1 ≤ x%15 ≤ 13,
    * 1 ≤ y ≤ 10) — all closed-form for DuckDB, while Spark must get the
    * actual geometry right to match. */
  val qGridPipelineVoronoi: Q = (spark, dir) => {
    import graft.operators.Voronoi
    val ev = Tables(spark, dir, "events").select(
      (col("event_id") % 12).as("y"),
      (((col("event_id") / 12).cast("long") % 2) * 15 + col("user_id") % 15).as("x"),
      col("ts"), col("value"))
    val stats = Pipelines.temporalDailyStats(ev, cfg)
    // The lattice is FIXED and dense (12 × 30 = two 15-wide domains), as
    // a WRF grid is — deriving seeds from observed events would let a
    // sparse sample punch holes in the tessellation and inflate the
    // neighbouring cells, breaking the closed-form interior-cell oracle
    // at low SF. 360 rows: negligible, and Voronoi cost is data-free.
    val seeds = spark.range(12L * 30L).select(
      (col("id") / 30).cast("long").as("y"), (col("id") % 30).as("x"))
      .withColumn("d", (col("x") / 15).cast("long"))
      .withColumn("xl", col("x") % 15)
      .withColumn("lon",
        col("xl") * 2.0 + col("y") * 0.3 + 1.0 + col("d") * 1000.0)
      .withColumn("lat", col("y") * 1.5 + col("xl") * 0.2 + 0.75)
      .withColumn("__vid", col("y") * 1000000L + col("x"))
    // MaxValue: the lattice is statically 360 rows — no domain can
    // exceed the tiling threshold, so skip the per-domain stats pass
    val cells = Voronoi.tessellateByDomain(
      seeds, "d", "__vid", "lon", "lat", margin = 5.0,
      autoTileAbove = Long.MaxValue)
    // J5 re-key: cell geometry back onto the (y, x) grid index
    val keyed = seeds.join(cells, Seq("d", "__vid"))
    // P3: per-domain bbox = seed extent + 3° (inside the 5° envelope)
    val bbox = st.makeBox(col("d") * 1000.0 - 2.0, lit(-2.25),
      col("d") * 1000.0 + 35.3, lit(23.05))
    val joined = keyed.filter(st.within(col("geom"), bbox))
      .join(stats, Seq("y", "x"))
      .select(col("y"), col("x"), col("lon"), col("lat"), col("n_days"),
        col("tmin_mean"), col("tmax_mean"), col("tmean_mean"), col("geom"))
    // S3 sink: executor-side GeoJSON part files, scanned back through
    // the stock JSON datasource — the emitted stats/geometry below are
    // computed from the ROUNDTRIPPED layer
    val tmp = graft.util.Scratch.dir("graft_vor")
      .resolve("cells").toString
    graft.io.GeoJson.writeParts(joined, "geom", tmp)
    graft.io.GeoJson.read(spark, tmp)
      .select(col("y"), col("x"),
        round(st.area(col("geom")) * 100).cast("long").as("area100"),
        round(st.stx(st.centroid(col("geom"))) * 20).cast("long").as("cx20"),
        round(st.sty(st.centroid(col("geom"))) * 20).cast("long").as("cy20"),
        st.contains(col("geom"), st.point(col("lon"), col("lat"))).as("seed_inside"),
        col("n_days"), col("tmin_mean"), col("tmax_mean"), col("tmean_mean"))
      .orderBy("y", "x")
  }

  val qGridPipelineVoronoiSql: String =
    """WITH g AS (
      |  SELECT event_id%12 AS y,
      |    ((event_id//12)%2)*15 + user_id%15 AS x,
      |    cast(date_trunc('day', ts) as date) AS day, value FROM events),
      |d AS (
      |  SELECT y, x, day, min(value) AS dmin, max(value) AS dmax,
      |    sum(cast(round(value*100) as bigint)) AS s100, count(*) AS c
      |  FROM g GROUP BY 1, 2, 3),
      |s AS (
      |  SELECT y, x, count(*) AS n_days,
      |    sum(cast(round(dmin*100) as bigint)) / (count(*) * 100.0) AS tmin_mean,
      |    sum(cast(round(dmax*100) as bigint)) / (count(*) * 100.0) AS tmax_mean,
      |    sum((s100 * 100) // c) / (count(*) * 10000.0) AS tmean_mean
      |  FROM d GROUP BY 1, 2)
      |SELECT y, x,
      |  cast(294 as bigint) AS area100,
      |  cast(40*(x%15) + 6*y + 20 + 20000*(x//15) as bigint) AS cx20,
      |  cast(30*y + 4*(x%15) + 15 as bigint) AS cy20,
      |  true AS seed_inside,
      |  n_days, tmin_mean, tmax_mean, tmean_mean
      |FROM s
      |WHERE x%15 BETWEEN 1 AND 13 AND y BETWEEN 1 AND 10
      |ORDER BY y, x""".stripMargin

  /** [[qGridPipelineVoronoi]] at WIDTH: 16 sheared curvilinear domains
    * tessellating in parallel (VERDICT r15 #8 — the 2-domain flagship
    * exercises the per-domain path but not its parallelism; this pins
    * the domain-parallel plan, one task per domain, against the same
    * closed-form lattice oracle). Identical per-domain geometry —
    * lon = 2·xl + 0.3·y + 1 + 1000·d, lat = 1.5·y + 0.2·xl + 0.75 —
    * so an interior cell's area stays |det(u,v)| = 2.94 exactly and
    * its centroid is its seed; the per-domain bbox at extent+3°
    * (inside the 5° envelope) passes exactly the interior ring. The
    * GeoJSON sink stage stays with the flagship; this variant keeps
    * the geometry-through-stats plan so the width axis is isolated. */
  val qGridPipelineVoronoiWide: Q = (spark, dir) => {
    import graft.operators.Voronoi
    val ev = Tables(spark, dir, "events").select(
      (col("event_id") % 12).as("y"),
      ((col("user_id") % 16) * 15 +
        (col("event_id") / 12).cast("long") % 15).as("x"),
      col("ts"), col("value"))
    val stats = Pipelines.temporalDailyStats(ev, cfg)
    // fixed dense lattice, 12 × (16 · 15): seeds never derive from the
    // observed sample (see qGridPipelineVoronoi's hole-punching note)
    val seeds = spark.range(12L * 240L).select(
      (col("id") / 240).cast("long").as("y"), (col("id") % 240).as("x"))
      .withColumn("d", (col("x") / 15).cast("long"))
      .withColumn("xl", col("x") % 15)
      .withColumn("lon",
        col("xl") * 2.0 + col("y") * 0.3 + 1.0 + col("d") * 1000.0)
      .withColumn("lat", col("y") * 1.5 + col("xl") * 0.2 + 0.75)
      .withColumn("__vid", col("y") * 1000000L + col("x"))
    val cells = Voronoi.tessellateByDomain(
      seeds, "d", "__vid", "lon", "lat", margin = 5.0,
      autoTileAbove = Long.MaxValue)
    val keyed = seeds.join(cells, Seq("d", "__vid"))
    val bbox = st.makeBox(col("d") * 1000.0 - 2.0, lit(-2.25),
      col("d") * 1000.0 + 35.3, lit(23.05))
    keyed.filter(st.within(col("geom"), bbox))
      .join(stats, Seq("y", "x"))
      .select(col("y"), col("x"),
        round(st.area(col("geom")) * 100).cast("long").as("area100"),
        round(st.stx(st.centroid(col("geom"))) * 20).cast("long").as("cx20"),
        round(st.sty(st.centroid(col("geom"))) * 20).cast("long").as("cy20"),
        st.contains(col("geom"), st.point(col("lon"), col("lat"))).as("seed_inside"),
        col("n_days"), col("tmin_mean"), col("tmax_mean"), col("tmean_mean"))
      .orderBy("y", "x")
  }

  val qGridPipelineVoronoiWideSql: String =
    """WITH g AS (
      |  SELECT event_id%12 AS y,
      |    (user_id%16)*15 + (event_id//12)%15 AS x,
      |    cast(date_trunc('day', ts) as date) AS day, value FROM events),
      |d AS (
      |  SELECT y, x, day, min(value) AS dmin, max(value) AS dmax,
      |    sum(cast(round(value*100) as bigint)) AS s100, count(*) AS c
      |  FROM g GROUP BY 1, 2, 3),
      |s AS (
      |  SELECT y, x, count(*) AS n_days,
      |    sum(cast(round(dmin*100) as bigint)) / (count(*) * 100.0) AS tmin_mean,
      |    sum(cast(round(dmax*100) as bigint)) / (count(*) * 100.0) AS tmax_mean,
      |    sum((s100 * 100) // c) / (count(*) * 10000.0) AS tmean_mean
      |  FROM d GROUP BY 1, 2)
      |SELECT y, x,
      |  cast(294 as bigint) AS area100,
      |  cast(40*(x%15) + 6*y + 20 + 20000*(x//15) as bigint) AS cx20,
      |  cast(30*y + 4*(x%15) + 15 as bigint) AS cy20,
      |  true AS seed_inside,
      |  n_days, tmin_mean, tmax_mean, tmean_mean
      |FROM s
      |WHERE x%15 BETWEEN 1 AND 13 AND y BETWEEN 1 AND 10
      |ORDER BY y, x""".stripMargin

  /** S1+S4 (NetCDF): sink + scan roundtrip through the from-scratch
    * CDF-1 codec — a dense rectilinear grid (supplier balances on a
    * 10-wide lattice, 1-D coordinate variables, row-major data var,
    * the to_netcdf output shape of delphine/regrid.py:330) written as
    * a real .nc file, read back, re-expanded to long form. */
  val qNetcdfRoundtrip: Q = netcdfRoundtrip(hdf5 = false)

  /** Same roundtrip through the NetCDF-4 (HDF5) container: dimension
    * scales + DIMENSION_LIST references, CHUNKED data variables through
    * the shuffle+deflate filter pipeline (netCDF-4's default
    * compression), written and read by the from-scratch
    * [[graft.io.Hdf5]] codec, auto-dispatched by [[graft.io.NetCdf.read]]
    * on the \x89HDF signature. */
  val qNetcdf4Roundtrip: Q = netcdfRoundtrip(hdf5 = true)

  /** Same roundtrip through a Zarr v2 store ([[graft.io.Zarr]] —
    * chunked, zlib, `_ARRAY_DIMENSIONS` names): the xarray
    * ecosystem's other container, sharing the NetCdf in-memory model
    * so the long-form expansion below is container-agnostic. */
  val qZarrRoundtrip: Q = zarrRoundtrip("zlib")

  /** Same store framed the way a stock `ds.to_zarr(path)` writes it:
    * blosc(lz4) + byte-shuffle chunks ([[graft.io.Blosc]] — numcodecs'
    * DEFAULT compressor, which previously raised at
    * [[graft.io.Zarr.meta]]). Gate runs the full store AND per-chunk
    * scan decode paths through real blosc frames. */
  val qZarrBloscRoundtrip: Q = zarrRoundtrip("blosc")

  /** Same store in ZARR V3 (zarr.json metadata, c/-prefixed chunk
    * keys, bytes+zstd codec chain — what zarr-python 3 and therefore
    * current xarray `to_zarr` write by default). */
  val qZarrV3Roundtrip: Q = zarrRoundtrip("v3")

  /** Zarr v3 `sharding_indexed` roundtrip: shard files holding a grid
    * of independently-compressed inner chunks behind a crc32c'd
    * offset index — the layout zarr-python 3 writes for large arrays
    * when shards are configured (common for cloud stores). */
  val qZarrV3ShardedRoundtrip: Q = zarrRoundtrip("v3s")

  private def zarrRoundtrip(codec: String): Q = (spark, dir) => {
    import graft.io.{NetCdf, Zarr}
    val supp = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"), round(col("s_acctbal") * 100).as("cents"))
      .orderBy("s_suppkey")
      .collect()
    val ny = supp.length / 10
    val cents = supp.take(ny * 10).map(_.getDouble(1))
    val tmp = graft.util.Scratch.dir(s"graft_zarr_$codec")
      .resolve("pop.zarr").toString
    val dims = Seq(NetCdf.Dim("y", ny), NetCdf.Dim("x", 10))
    val vars = Seq(
      NetCdf.Var("lat", Seq(0), NetCdf.NcDouble, Seq("units" -> "degrees_north"),
        Array.tabulate(ny)(_ + 0.5)),
      NetCdf.Var("lon", Seq(1), NetCdf.NcDouble, Seq("units" -> "degrees_east"),
        Array.tabulate(10)(_ * 2.0 + 1.0)),
      NetCdf.Var("pop_cents", Seq(0, 1), NetCdf.NcDouble, Nil, cents))
    if (codec == "v3")
      Zarr.write3(tmp, dims, Seq("title" -> "graft regrid output"), vars,
        codec = "zstd", chunk0 = 7)
    else if (codec == "v3s")
      // sharded store: 8-row shards of 2-row inner chunks (trailing
      // crc32c'd index), read back through the same version-agnostic
      // chunk machinery
      Zarr.write3(tmp, dims, Seq("title" -> "graft regrid output"), vars,
        codec = "zstd", chunk0 = 8, shardInner0 = 2)
    else Zarr.write(tmp, dims, Seq("title" -> "graft regrid output"), vars,
      compress = true, chunk0 = 7, codec = codec)
    val nc = Zarr.read(tmp)
    val lat = nc.variable("lat").data.asInstanceOf[Array[Double]]
    val lon = nc.variable("lon").data.asInstanceOf[Array[Double]]
    val pop = nc.variable("pop_cents").data.asInstanceOf[Array[Double]]
    val rows = for (y <- 0 until ny; x <- 0 until 10)
      yield (y.toLong, x.toLong, lat(y), lon(x), pop(y * 10 + x))
    import spark.implicits._
    rows.toDF("y", "x", "lat", "lon", "pop_cents").orderBy("y", "x")
  }

  private def netcdfRoundtrip(hdf5: Boolean): Q = (spark, dir) => {
    import graft.io.{Hdf5, NetCdf}
    val supp = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"), round(col("s_acctbal") * 100).as("cents"))
      .orderBy("s_suppkey")
      .collect()
    val ny = supp.length / 10
    val cents = supp.take(ny * 10).map(_.getDouble(1))
    val tmp = graft.util.Scratch.dir("graft_nc")
      .resolve("pop.nc").toString
    val dims = Seq(NetCdf.Dim("y", ny), NetCdf.Dim("x", 10))
    // >8 global attrs: past libhdf5's compact threshold, so the HDF5
    // leg writes them DENSELY (fractal heap + type-8 name btree) and
    // the gate exercises the dense-attribute read path end-to-end
    val gattrs = ("title" -> "graft regrid output") +:
      (0 until 9).map(i => s"aux_$i" -> s"meta$i")
    val vars = Seq(
      NetCdf.Var("lat", Seq(0), NetCdf.NcDouble, Seq("units" -> "degrees_north"),
        Array.tabulate(ny)(_ + 0.5)),
      NetCdf.Var("lon", Seq(1), NetCdf.NcDouble, Seq("units" -> "degrees_east"),
        Array.tabulate(10)(_ * 2.0 + 1.0)),
      NetCdf.Var("pop_cents", Seq(0, 1), NetCdf.NcDouble, Nil, cents))
    // denseGroups + denseAttrs: latest-format fractal-heap link AND
    // attribute storage — the gate exercises both dense read paths
    // end-to-end, not just NetCdfSpec
    if (hdf5) Hdf5.write(tmp, dims, gattrs, vars, chunkDeflate = true,
      denseGroups = true, denseAttrs = true)
    else NetCdf.write(tmp, dims, gattrs, vars)
    val nc = NetCdf.read(tmp)
    require(nc.globalAttrs.toMap == gattrs.toMap,
      s"global attrs did not roundtrip: ${nc.globalAttrs}")
    val lat = nc.variable("lat").data.asInstanceOf[Array[Double]]
    val lon = nc.variable("lon").data.asInstanceOf[Array[Double]]
    val pop = nc.variable("pop_cents").data.asInstanceOf[Array[Double]]
    val rows = for (y <- 0 until ny; x <- 0 until 10)
      yield (y.toLong, x.toLong, lat(y), lon(x), pop(y * 10 + x))
    import spark.implicits._
    rows.toDF("y", "x", "lat", "lon", "pop_cents").orderBy("y", "x")
  }

  val qNetcdfRoundtripSql: String =
    """WITH s AS (
      |  SELECT row_number() OVER (ORDER BY s_suppkey) - 1 AS i,
      |    round(s_acctbal*100) AS cents
      |  FROM supplier)
      |SELECT cast(i//10 as bigint) AS y, cast(i%10 as bigint) AS x,
      |  i//10 + 0.5 AS lat, (i%10)*2 + 1.0 AS lon, cents AS pop_cents
      |FROM s
      |WHERE i < 10 * ((SELECT count(*) FROM supplier) // 10)
      |ORDER BY 1, 2""".stripMargin

  /** CF mask-and-scale roundtrip: supplier balances packed as INT
    * cents with `scale_factor` 0.01 and a fill sentinel — the packed
    * layout real HadUK/WRF-derived NetCDF files carry, which the
    * reference reads through xarray's `mask_and_scale=True` default
    * (`xr.open_dataset`, haduk_voronoi.py:33, delphine/regrid.py:208).
    * The writer emits TYPED attributes (`_FillValue` in the variable's
    * own type per CF); the reader decodes to doubles with NaN at
    * fills, emitted here as SQL NULL so the oracle compare is exact. */
  val qPackedRoundtrip: Q = (spark, dir) => {
    import graft.io.NetCdf
    val supp = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"),
        round(col("s_acctbal") * 100).cast("int").as("cents"))
      .orderBy("s_suppkey").collect()
    val n = supp.length
    val fill = -999999999
    val raw = Array.tabulate(n)(i =>
      if (i % 7 == 3) fill else supp(i).getInt(1))
    val tmp = graft.util.Scratch.dir("graft_nc").resolve("packed.nc").toString
    NetCdf.write(tmp, Seq(NetCdf.Dim("i", n)), Nil, Seq(
      NetCdf.Var("bal", Seq(0), NetCdf.NcInt, Nil, raw,
        numAttrs = Seq("scale_factor" -> 0.01, "add_offset" -> 0.0,
          "_FillValue" -> fill.toDouble))))
    val v = NetCdf.read(tmp).variable("bal")
    require(v.ncType == NetCdf.NcDouble, "CF decode did not apply")
    val d = v.data.asInstanceOf[Array[Double]]
    import spark.implicits._
    d.zipWithIndex
      .map { case (x, i) => (i.toLong, if (x.isNaN) None else Some(x)) }
      .toSeq.toDF("i", "dollars").orderBy("i")
  }

  val qPackedRoundtripSql: String =
    """WITH s AS (
      |  SELECT row_number() OVER (ORDER BY s_suppkey) - 1 AS i,
      |    cast(round(s_acctbal*100) as int) AS cents
      |  FROM supplier)
      |SELECT i, CASE WHEN i % 7 = 3 THEN NULL
      |  ELSE cents * 0.01::DOUBLE END AS dollars
      |FROM s ORDER BY i""".stripMargin

  /** WRF destaggering (GridOps.destagger): a staggered-in-x wind
    * component U(day, y, xs) averaged onto mass points — the
    * Arakawa-C pre-step that produces the U10-like fields the
    * reference consumes (wrf_voronoi.py:109-111). The grid derives
    * from events (xs = user_id mod 31 — 31 staggered faces for 30
    * mass points); sparse pencils destagger only where both adjacent
    * faces exist. (u0+u1)/2 of identical doubles is the same IEEE op
    * on both engines — hash-exact without rounding tricks. */
  val qGridDestagger: Q = (spark, dir) => {
    import graft.grid.GridOps
    val u = Tables(spark, dir, "events")
      .groupBy(col("ts").cast("date").as("day"),
        (col("event_id") % 20).as("y"),
        (col("user_id") % 31).as("xs"))
      .agg(min(col("value")).as("u"))
    GridOps.destagger(u, Seq("day", "y"), "xs", "u", massCol = "x")
      .orderBy("day", "y", "x")
  }

  val qGridDestaggerSql: String =
    """WITH g AS (
      |  SELECT cast(ts as date) AS day, event_id%20 AS y,
      |    user_id%31 AS xs, min(value) AS u
      |  FROM events GROUP BY 1, 2, 3),
      |d AS (
      |  SELECT day, y, xs, u,
      |    lead(u)  OVER (PARTITION BY day, y ORDER BY xs) AS un,
      |    lead(xs) OVER (PARTITION BY day, y ORDER BY xs) AS xn
      |  FROM g)
      |SELECT day, y, xs AS x, (u + un)/2 AS u
      |FROM d WHERE xn = xs + 1 ORDER BY day, y, x""".stripMargin

  /** Bilinear regrid (GridOps.regridBilinear): the interpolating remap
    * onto a 2×-finer index grid (r = 0.5 → quarter weights, wScale 4).
    * Values blend as fixed-point integer dot products with one final
    * division — hash-exact; incomplete-corner targets emit no row. */
  val qGridRegridBilinear: Q = (spark, dir) => {
    import graft.grid.GridOps
    val g = Tables(spark, dir, "events")
      .groupBy((col("event_id") % 20).as("y"), (col("user_id") % 30).as("x"))
      .agg(min(col("value")).as("v"))
    GridOps.regridBilinear(g, "y", "x", "v", ry = 0.5, rx = 0.5,
        nTy = 39, nTx = 59, dec = 2, wScale = 4)
      .orderBy("ty", "tx")
  }

  val qGridRegridBilinearSql: String =
    """WITH g AS (
      |  SELECT event_id%20 AS y, user_id%30 AS x, min(value) AS v
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT cast(idx // 59 as int) AS ty, cast(idx % 59 as int) AS tx
      |  FROM range(0, 2301) r(idx)),
      |c1 AS (SELECT ty, tx,
      |    cast(floor(ty*0.5) as int) AS y0, cast(floor(tx*0.5) as int) AS x0,
      |    ty*0.5 - floor(ty*0.5) AS fy, tx*0.5 - floor(tx*0.5) AS fx
      |  FROM t),
      |corners AS (
      |  SELECT ty, tx, y0 AS y, x0 AS x,
      |    cast((1-fy)*(1-fx)*4 as bigint) AS w FROM c1
      |  UNION ALL SELECT ty, tx, y0, x0+1, cast((1-fy)*fx*4 as bigint) FROM c1
      |  UNION ALL SELECT ty, tx, y0+1, x0, cast(fy*(1-fx)*4 as bigint) FROM c1
      |  UNION ALL SELECT ty, tx, y0+1, x0+1, cast(fy*fx*4 as bigint) FROM c1),
      |j AS (SELECT ty, tx, w, cast(round(v*100) as bigint) AS v100
      |  FROM corners JOIN g USING (y, x) WHERE w > 0),
      |s AS (SELECT ty, tx, cast(sum(w*v100) as bigint) AS sv,
      |    cast(sum(w) as bigint) AS wsum
      |  FROM j GROUP BY 1, 2)
      |SELECT ty, tx, sv / 400.0 AS v FROM s WHERE wsum = 4
      |ORDER BY ty, tx""".stripMargin

  /** Nearest-neighbor regrid (GridOps.regridNearest): the categorical
    * remap — each target cell copies the nearest source value
    * untouched (exactness free). r = 0.4 exercises non-trivial
    * rounding; half-up ties spelled floor(s + 0.5) on both engines. */
  val qGridRegridNearest: Q = (spark, dir) => {
    import graft.grid.GridOps
    val g = Tables(spark, dir, "events")
      .groupBy((col("event_id") % 20).as("y"), (col("user_id") % 30).as("x"))
      .agg(min(col("value")).as("v"))
    GridOps.regridNearest(g, "y", "x", "v", ry = 0.4, rx = 0.4,
        nTy = 48, nTx = 73)
      .orderBy("ty", "tx")
  }

  val qGridRegridNearestSql: String =
    """WITH g AS (
      |  SELECT event_id%20 AS y, user_id%30 AS x, min(value) AS v
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT cast(idx // 73 as int) AS ty, cast(idx % 73 as int) AS tx
      |  FROM range(0, 3504) r(idx)),
      |n AS (SELECT ty, tx,
      |    cast(floor(ty*0.4 + 0.5) as int) AS y,
      |    cast(floor(tx*0.4 + 0.5) as int) AS x
      |  FROM t)
      |SELECT ty, tx, v FROM n JOIN g USING (y, x) ORDER BY ty, tx""".stripMargin

  /** Block-mean coarsening (GridOps.coarsen): xarray's
    * `coarsen(y=3, x=3).mean()` — the archive downsample. Fixed-point
    * exact mean; `n` carries real block population so partial edge
    * blocks divide by what is present. */
  val qGridCoarsen: Q = (spark, dir) => {
    import graft.grid.GridOps
    val g = Tables(spark, dir, "events")
      .groupBy((col("event_id") % 20).as("y"), (col("user_id") % 30).as("x"))
      .agg(min(col("value")).as("v"))
    GridOps.coarsen(g, Seq.empty, "y", "x", "v", k = 3, dec = 2)
      .orderBy("y", "x")
  }

  val qGridCoarsenSql: String =
    """WITH g AS (
      |  SELECT event_id%20 AS y, user_id%30 AS x, min(value) AS v
      |  FROM events GROUP BY 1, 2)
      |SELECT cast(floor(y/3) as int) AS y, cast(floor(x/3) as int) AS x,
      |  sum(cast(round(v*100) as bigint)) / (count(*) * 100.0) AS v,
      |  count(*) AS n
      |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Wind diagnostics (GridOps.windDiagnostics): speed + centered-
    * difference relative vorticity and divergence over a destaggered
    * (day, y, x) U/V panel — the wrf-python `avo`-family step after
    * the reference's destagger. Interior cells only (all four index
    * neighbors present). sqrt/±/÷2 of identical doubles are single
    * IEEE ops on both engines — hash-exact. */
  val qGridWind: Q = (spark, dir) => {
    import graft.grid.GridOps
    val uv = Tables(spark, dir, "events")
      .groupBy(col("ts").cast("date").as("day"),
        (col("event_id") % 20).as("y"),
        (col("user_id") % 30).as("x"))
      .agg(min(col("value")).as("u"), max(col("value")).as("v"))
    GridOps.windDiagnostics(uv, "day", "y", "x", "u", "v")
      .orderBy("day", "y", "x")
  }

  val qGridWindSql: String =
    """WITH g AS (
      |  SELECT cast(ts as date) AS day, event_id%20 AS y,
      |    user_id%30 AS x, min(value) AS u, max(value) AS v
      |  FROM events GROUP BY 1, 2, 3),
      |dx AS (
      |  SELECT day, y, x, u, v,
      |    lead(x) OVER wx AS xp,  lag(x) OVER wx AS xm,
      |    lead(v) OVER wx AS vxp, lag(v) OVER wx AS vxm,
      |    lead(u) OVER wx AS uxp, lag(u) OVER wx AS uxm
      |  FROM g WINDOW wx AS (PARTITION BY day, y ORDER BY x)),
      |dy AS (
      |  SELECT *, lead(y) OVER wy AS yp,  lag(y) OVER wy AS ym,
      |    lead(u) OVER wy AS uyp, lag(u) OVER wy AS uym,
      |    lead(v) OVER wy AS vyp, lag(v) OVER wy AS vym
      |  FROM dx WINDOW wy AS (PARTITION BY day, x ORDER BY y))
      |SELECT day, y, x, sqrt(u*u + v*v) AS speed,
      |  (vxp - vxm)/2 - (uyp - uym)/2 AS vort,
      |  (uxp - uxm)/2 + (vyp - vym)/2 AS div
      |FROM dy
      |WHERE xp = x + 1 AND xm = x - 1 AND yp = y + 1 AND ym = y - 1
      |ORDER BY day, y, x""".stripMargin

  /** Vertical interpolation to constant-pressure surfaces
    * (GridOps.interpLevels — the wrf-python `interplevel` step): a
    * 3-D field T(y, x, lev) on model levels with pressure
    * p = 1000 − 100·lev is interpolated to 975/850/625 hPa. Linear
    * bracketing in the DESCENDING vertical coordinate; targets
    * broadcast. The interpolation weights are exact binary fractions
    * of the level spacing, and every arithmetic step is the same IEEE
    * sequence in DuckDB — hash-exact. */
  val qGridInterpLevels: Q = (spark, dir) => {
    import graft.grid.GridOps
    val t3d = Tables(spark, dir, "events")
      .groupBy((col("event_id") % 10).as("y"),
        (col("user_id") % 10).as("x"),
        ((col("event_id") + col("user_id")) % 5).as("lev"))
      .agg(min(col("value")).as("t"))
      .withColumn("p", lit(1000.0) - col("lev") * 100.0)
    GridOps.interpLevels(t3d, Seq("y", "x"), "p", "t",
        Seq(975.0, 850.0, 625.0))
      .orderBy("y", "x", "target")
  }

  val qGridInterpLevelsSql: String =
    """WITH g AS (
      |  SELECT event_id%10 AS y, user_id%10 AS x,
      |    (event_id + user_id)%5 AS lev, min(value) AS t
      |  FROM events GROUP BY 1, 2, 3),
      |p AS (SELECT y, x, 1000.0 - lev*100.0 AS p, t FROM g),
      |b AS (
      |  SELECT y, x, p, t,
      |    lead(p) OVER (PARTITION BY y, x ORDER BY p DESC) AS p1,
      |    lead(t) OVER (PARTITION BY y, x ORDER BY p DESC) AS t1
      |  FROM p),
      |tg AS (SELECT unnest([975.0, 850.0, 625.0]) AS target)
      |SELECT b.y, b.x, tg.target,
      |  b.t + (b.t1 - b.t) * ((b.p - tg.target) / (b.p - b.p1)) AS t
      |FROM b JOIN tg ON tg.target <= b.p AND tg.target > b.p1
      |ORDER BY y, x, target""".stripMargin

  /** Vertical column integral (GridOps.columnIntegral): trapezoidal
    * ∫ T dp per (y, x) column over the [[qGridInterpLevels]] 3-D
    * fixture — the precipitable-water-style reduction of a model-level
    * stack to one 2-D field. Per-layer trapezoid terms are identical
    * IEEE sequences in both engines; the per-column accumulation is a
    * fixed-point integer sum, so the hash pins layer pairing AND
    * arithmetic. */
  val qGridColumnIntegral: Q = (spark, dir) => {
    import graft.grid.GridOps
    val t3d = Tables(spark, dir, "events")
      .groupBy((col("event_id") % 10).as("y"),
        (col("user_id") % 10).as("x"),
        ((col("event_id") + col("user_id")) % 5).as("lev"))
      .agg(min(col("value")).as("t"))
      .withColumn("p", lit(1000.0) - col("lev") * 100.0)
    GridOps.columnIntegral(t3d, Seq("y", "x"), "p", "t", dec = 6)
      .orderBy("y", "x")
  }

  val qGridColumnIntegralSql: String =
    s"""WITH g AS (
      |  SELECT event_id%10 AS y, user_id%10 AS x,
      |    (event_id + user_id)%5 AS lev, min(value) AS t
      |  FROM events GROUP BY 1, 2, 3),
      |p AS (SELECT y, x, 1000.0 - lev*100.0 AS p, t FROM g),
      |b AS (
      |  SELECT y, x, p, t,
      |    lead(p) OVER (PARTITION BY y, x ORDER BY p DESC) AS p1,
      |    lead(t) OVER (PARTITION BY y, x ORDER BY p DESC) AS t1
      |  FROM p)
      |SELECT y, x,
      |  ${graft.util.Exact.sqlFixedSum("(p - p1) * (t + t1) / 2", 6)} AS integral,
      |  count(*) AS n_layers
      |FROM b WHERE p1 IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Calendar resample (GridOps.resampleTime): the reference's
    * `resample(XTIME="1D")` generalized — weekly per-cell means over
    * the events grid, fixed-point-exact accumulation. */
  val qGridResample: Q = (spark, dir) => {
    import graft.grid.GridOps
    val grid = Tables(spark, dir, "events").select(
      (col("event_id") % 6).as("y"), (col("user_id") % 8).as("x"),
      col("ts"), col("value"))
    GridOps.resampleTime(grid, cfg.copy(timeCol = "ts"), "week", dec = 2)
      .orderBy("y", "x", "bucket")
  }

  val qGridResampleSql: String =
    """SELECT event_id%6 AS y, user_id%8 AS x,
      |  cast(date_trunc('week', ts) as date) AS bucket,
      |  sum(cast(round(value*100) as bigint)) / (count(*) * 100.0) AS vmean,
      |  count(*) AS n
      |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Climatology departure (GridOps.anomaly): per-cell daily means,
    * then each day's departure from the cell's period mean — the
    * "subtract the time mean" step of every anomaly map. One window
    * pass; no join-back. */
  val qGridAnomaly: Q = (spark, dir) => {
    import graft.grid.GridOps
    // Daily mean quantized to 4 decimals by INTEGER DIVISION of exact
    // cent sums — not round(x, 4): Spark rounds the decimal string of
    // the double, DuckDB rounds the binary value, and they disagree on
    // .xxxx5 ties. `div` is exact and identical in both engines.
    val daily = Tables(spark, dir, "events")
      .groupBy((col("event_id") % 6).as("y"), (col("user_id") % 8).as("x"),
        col("ts").cast("date").as("day"))
      .agg(graft.util.Exact.unitSum(col("value"), 100)
        .cast("long").as("s100"), count(lit(1)).as("c"))
      .withColumn("dmean",
        expr("cast(s100 * 100 div c as double) / 10000.0d"))
      .drop("s100", "c")
    daily
      .withColumn("anom",
        GridOps.anomaly(cfg.copy(varCol = "dmean"), dec = 4))
      .orderBy("y", "x", "day")
  }

  val qGridAnomalySql: String =
    """WITH d AS (
      |  SELECT event_id%6 AS y, user_id%8 AS x, cast(ts as date) AS day,
      |    ((sum(cast(round(value*100) as bigint)) * 100) // count(*))
      |      / 10000.0 AS dmean
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT y, x, day, dmean,
      |  dmean - sum(cast(round(dmean*10000) as bigint)) OVER (PARTITION BY y, x)
      |    / (count(*) OVER (PARTITION BY y, x) * 10000.0) AS anom
      |FROM d ORDER BY y, x, day""".stripMargin

  /** 3×3 neighbor-mean smoothing (GridOps.smooth — the smooth2d pass)
    * over per-day grids: two cascaded ±1 RANGE windows, fixed-point
    * accumulation. The oracle restates the identical cascade, pinning
    * both the kernel arithmetic and the sparse-pivot semantics. */
  val qGridSmooth: Q = (spark, dir) => {
    import graft.grid.GridOps
    val grid = Tables(spark, dir, "events")
      .groupBy(col("ts").cast("date").as("day"),
        (col("event_id") % 12).as("y"), (col("user_id") % 15).as("x"))
      .agg(min(col("value")).as("v"))
    GridOps.smooth(grid, cfg.copy(timeCol = "day", varCol = "v"), dec = 2)
      .orderBy("day", "y", "x")
  }

  val qGridSmoothSql: String =
    """WITH g AS (
      |  SELECT cast(ts as date) AS day, event_id%12 AS y, user_id%15 AS x,
      |    min(value) AS v
      |  FROM events GROUP BY 1, 2, 3),
      |sx AS (
      |  SELECT day, y, x, v,
      |    sum(cast(round(v*100) as bigint)) OVER (PARTITION BY day, y
      |      ORDER BY x RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s,
      |    count(*) OVER (PARTITION BY day, y
      |      ORDER BY x RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS n
      |  FROM g)
      |SELECT day, y, x, v,
      |  sum(s) OVER (PARTITION BY day, x
      |    ORDER BY y RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)::DOUBLE /
      |  (sum(n) OVER (PARTITION BY day, x
      |    ORDER BY y RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) * 100.0)
      |  AS smoothed
      |FROM sx ORDER BY day, y, x""".stripMargin

  val queries: Map[String, Q] = Map(
    "grid_anomaly" -> qGridAnomaly,
    "grid_smooth" -> qGridSmooth,
    "grid_destagger" -> qGridDestagger,
    "grid_wind" -> qGridWind,
    "grid_regrid_bilinear" -> qGridRegridBilinear,
    "grid_regrid_nearest" -> qGridRegridNearest,
    "grid_coarsen" -> qGridCoarsen,
    "grid_interp_levels" -> qGridInterpLevels,
    "grid_column_integral" -> qGridColumnIntegral,
    "grid_resample" -> qGridResample,
    "grid_netcdf_roundtrip" -> qNetcdfRoundtrip,
    "grid_netcdf4_roundtrip" -> qNetcdf4Roundtrip,
    "grid_zarr_roundtrip" -> qZarrRoundtrip,
    "grid_zarr_blosc" -> qZarrBloscRoundtrip,
    "grid_zarr_v3" -> qZarrV3Roundtrip,
    "grid_zarr_v3_sharded" -> qZarrV3ShardedRoundtrip,
    "grid_pipeline_haduk" -> qGridPipelineHaduk,
    "grid_pipeline" -> qGridPipeline,
    "grid_pipeline_voronoi" -> qGridPipelineVoronoi,
    "grid_pipeline_voronoi_wide" -> qGridPipelineVoronoiWide,
    "grid_source_scan" -> qGridSourceScan,
    "grid_source_scan_nc" -> qGridSourceScanNc,
    "grid_packed_roundtrip" -> qPackedRoundtrip,
    "p_drop_cast_slice" -> qDropCastSlice)

  val oracles: Map[String, String] = Map(
    "grid_anomaly" -> qGridAnomalySql,
    "grid_smooth" -> qGridSmoothSql,
    "grid_destagger" -> qGridDestaggerSql,
    "grid_wind" -> qGridWindSql,
    "grid_regrid_bilinear" -> qGridRegridBilinearSql,
    "grid_regrid_nearest" -> qGridRegridNearestSql,
    "grid_coarsen" -> qGridCoarsenSql,
    "grid_interp_levels" -> qGridInterpLevelsSql,
    "grid_column_integral" -> qGridColumnIntegralSql,
    "grid_resample" -> qGridResampleSql,
    "grid_netcdf_roundtrip" -> qNetcdfRoundtripSql,
    "grid_netcdf4_roundtrip" -> qNetcdfRoundtripSql,
    "grid_zarr_roundtrip" -> qNetcdfRoundtripSql,
    "grid_zarr_blosc" -> qNetcdfRoundtripSql,
    "grid_zarr_v3" -> qNetcdfRoundtripSql,
    "grid_zarr_v3_sharded" -> qNetcdfRoundtripSql,
    "grid_pipeline_haduk" -> qGridPipelineHadukSql,
    "grid_pipeline" -> qGridPipelineSql,
    "grid_pipeline_voronoi" -> qGridPipelineVoronoiSql,
    "grid_pipeline_voronoi_wide" -> qGridPipelineVoronoiWideSql,
    "grid_source_scan" -> qGridSourceScanSql,
    "grid_source_scan_nc" -> qGridSourceScanSql,
    "grid_packed_roundtrip" -> qPackedRoundtripSql,
    "p_drop_cast_slice" -> qDropCastSliceSql)
}
