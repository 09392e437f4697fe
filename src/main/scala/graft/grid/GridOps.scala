package graft.grid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WRF post-processing operators over the long-form grid model — the
  * transforms a user of the reference runs BEFORE `wrf_voronoi.py`'s
  * tessellation sees the data (the reference consumes already-
  * destaggered 2-D diagnostics like T2/U10/V10, wrf_voronoi.py:109-111;
  * these operators produce such fields from raw staggered / 3-D model
  * output):
  *
  *  - [[destagger]] — Arakawa-C staggered wind components onto mass
  *    points (the average of the two adjacent staggered faces);
  *  - [[interpLevels]] — vertical interpolation of a 3-D field to
  *    constant-pressure surfaces (the `interplevel` post-processing
  *    step; linear in the vertical coordinate);
  *  - [[resampleTime]] — calendar resampling (the generalization of
  *    pipeline 3.1's `resample(XTIME="1D")`, wrf_voronoi.py:156-173,
  *    to any `date_trunc` unit);
  *  - [[anomaly]] — departure of each timestep from the per-cell
  *    period climatology (the standard "mean over time, subtract"
  *    two-step fused into one window pass).
  *
  * 100 TB shape: every operator is ONE hash shuffle on its grouping
  * key — destagger/interpLevels window-partition by grid column (the
  * vertical/staggered dim stays inside a partition, which is exactly
  * how a 1000-executor cluster wants a (time, y, x) panel cut),
  * resampleTime is a plain partial-aggregated groupBy, anomaly is a
  * single unbounded window per cell. No collect, no cross join; the
  * tiny target-levels frame in [[interpLevels]] broadcasts.
  */
object GridOps {

  /** Destagger a variable along its staggered dimension: the value at
    * mass point i is the mean of staggered faces i and i+1
    * (Arakawa-C grid, the U/V → mass-point average every WRF reader
    * applies before plotting winds).
    *
    * `keys` identify one 1-D pencil along the staggered dim (e.g.
    * (time, y) for U staggered in x). Sparse pencils destagger only
    * where BOTH adjacent faces exist — the `lead(stag)==stag+1`
    * adjacency filter, so holes never average non-neighbours.
    */
  def destagger(df: DataFrame, keys: Seq[String], stagCol: String,
      varCol: String, massCol: String = "mass"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(stagCol))
    df.withColumn("__vn", lead(col(varCol), 1).over(w))
      .withColumn("__sn", lead(col(stagCol), 1).over(w))
      .filter(col("__sn") === col(stagCol) + 1)
      .select(keys.map(col) ++ Seq(
        col(stagCol).as(massCol),
        ((col(varCol) + col("__vn")) / 2.0).as(varCol)): _*)
  }

  /** Linear vertical interpolation to constant surfaces of a MONOTONE
    * DECREASING vertical coordinate (pressure: decreases upward, the
    * wrf-python `interplevel` contract).
    *
    * For each grid column (`keys`) and each target t, finds the
    * bracketing pair p0 ≥ t > p1 of adjacent-in-sort-order coordinate
    * values and emits v0 + (v1−v0)·(p0−t)/(p0−p1). Targets outside
    * the column's range produce no row (the NaN of the dense-array
    * formulation). `targets` is driver-side tiny by construction
    * (a handful of standard pressure surfaces) and broadcasts.
    */
  def interpLevels(df: DataFrame, keys: Seq[String], vertCol: String,
      varCol: String, targets: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(vertCol).desc)
    val brackets = df
      .withColumn("__p1", lead(col(vertCol), 1).over(w))
      .withColumn("__v1", lead(col(varCol), 1).over(w))
      .filter(col("__p1").isNotNull)
    val t = broadcast(targets.toDF("target"))
    brackets
      .join(t, col("target") <= col(vertCol) && col("target") > col("__p1"))
      .select(keys.map(col) ++ Seq(
        col("target"),
        (col(varCol) + (col("__v1") - col(varCol)) *
          ((col(vertCol) - col("target")) / (col(vertCol) - col("__p1"))))
          .as(varCol)): _*)
  }

  /** Vertical column integral — trapezoidal ∫ q·dp over the
    * DESCENDING vertical coordinate, per grid column: the
    * precipitable-water / column-mass family of WRF diagnostics
    * (Σ (p_k − p_{k+1}) · (q_k + q_{k+1}) / 2 over adjacent levels).
    *
    * Same single-shuffle discipline as [[interpLevels]]: one window
    * partitioned by the grid-column key pairs adjacent levels, then
    * the per-layer terms accumulate FIXED-POINT (`dec` digits) so the
    * per-column sum is an order-independent integer add — exact at
    * any partitioning, hash-stable against any engine. */
  def columnIntegral(df: DataFrame, keys: Seq[String], vertCol: String,
      varCol: String, dec: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(vertCol).desc)
    df.withColumn("__p1", lead(col(vertCol), 1).over(w))
      .withColumn("__q1", lead(col(varCol), 1).over(w))
      .filter(col("__p1").isNotNull)
      .withColumn("__term",
        (col(vertCol) - col("__p1")) * (col(varCol) + col("__q1")) / 2)
      .groupBy(keys.map(col): _*)
      .agg(graft.util.Exact.fixedSum(col("__term"), dec).as("integral"),
        count(lit(1)).as("n_layers"))
  }

  /** Calendar resample: per-cell mean of the variable over
    * `date_trunc(unit)` buckets, order-independent fixed-point
    * accumulation (see [[graft.util.Exact]]) so the result is
    * oracle-exact. `dec` is the variable's fixed decimal precision. */
  def resampleTime(df: DataFrame, cfg: GridConfig, unit: String,
      dec: Int): DataFrame =
    df.groupBy(col(cfg.yCol), col(cfg.xCol),
        date_trunc(unit, col(cfg.timeCol)).cast("date").as("bucket"))
      .agg(graft.util.Exact.fixedAvg(col(cfg.varCol), dec).as("vmean"),
        count(lit(1)).as("n"))

  /** 3×3 neighbor-mean smoothing (the `smooth2d` post-processing pass)
    * as a SEPARABLE box filter: sum/count over a ±1 RANGE frame along
    * x, then the same along y — two cascaded window passes instead of
    * a 9-way self-join. RANGE (not ROWS) frames keep far cells out of
    * the kernel across index holes, and boundary cells divide by
    * their real neighbor count. On a DENSE grid (every (y, x) present
    * — the WRF case) this is exactly the 3×3 mean; on a sparse grid
    * row (y±1, x±1) only contributes when its pivot (y±1, x) exists,
    * because the second pass composes through the first pass's rows.
    *
    * Exactness: values accumulate as integer fixed-point units inside
    * the windows (`dec` decimals) and divide back once — the same
    * order-independence contract as [[graft.util.Exact]].
    *
    * 100 TB shape: two hash shuffles — one per pencil orientation —
    * each a full-width window over short pencils; no join, no
    * explode. */
  def smooth(df: DataFrame, cfg: GridConfig, dec: Int): DataFrame = {
    val unit = math.pow(10, dec)
    val wx = Window.partitionBy(col(cfg.timeCol), col(cfg.yCol))
      .orderBy(col(cfg.xCol)).rangeBetween(-1, 1)
    val wy = Window.partitionBy(col(cfg.timeCol), col(cfg.xCol))
      .orderBy(col(cfg.yCol)).rangeBetween(-1, 1)
    df.withColumn("__sx",
        // Int128Sum (r16): the sliding frame re-adds ~3 values per row,
        // and the decimal(38,0) form paid a BigDecimal add each time
        graft.util.Exact.unitSum(col(cfg.varCol), unit).over(wx).cast("long"))
      .withColumn("__nx", count(lit(1)).over(wx))
      .withColumn("__sxy",
        graft.util.Exact.int128Sum(col("__sx")).over(wy))
      .withColumn("__nxy", sum(col("__nx")).over(wy))
      .withColumn("smoothed",
        col("__sxy").cast("double") / (col("__nxy") * lit(unit)))
      .drop("__sx", "__nx", "__sxy", "__nxy")
  }

  /** Wind diagnostics from destaggered U/V on mass points — the
    * wrf-python `uvmet`/`avo` family reduced to its grid-arithmetic
    * core: wind speed per cell plus centered-difference relative
    * vorticity ζ = ∂v/∂x − ∂u/∂y and divergence δ = ∂u/∂x + ∂v/∂y
    * (unit grid spacing; the map-factor scaling of a real WRF run is
    * a per-cell multiply the caller applies).
    *
    * Centered differences need both index neighbors: cells whose
    * x±1 or y±1 neighbor is absent (domain boundary, sparse pencil)
    * emit no row, the interior-only contract of the dense-array
    * `np.gradient` formulation.
    *
    * Exactness: sqrt/add/subtract/divide-by-2 of identical doubles
    * are single correctly-rounded IEEE ops — hash-exact across
    * engines with no rounding tricks.
    *
    * 100 TB shape: two hash shuffles, one per pencil orientation
    * (x-derivatives ride a (time, y) window, y-derivatives a
    * (time, x) window) — the same cascade as [[smooth]]; no join, no
    * explode, speed is a pure map. */
  def windDiagnostics(df: DataFrame, timeCol: String, yCol: String,
      xCol: String, uCol: String, vCol: String): DataFrame = {
    val wx = Window.partitionBy(col(timeCol), col(yCol)).orderBy(col(xCol))
    val wy = Window.partitionBy(col(timeCol), col(xCol)).orderBy(col(yCol))
    df.withColumn("__xp", lead(col(xCol), 1).over(wx))
      .withColumn("__xm", lag(col(xCol), 1).over(wx))
      .withColumn("__vxp", lead(col(vCol), 1).over(wx))
      .withColumn("__vxm", lag(col(vCol), 1).over(wx))
      .withColumn("__uxp", lead(col(uCol), 1).over(wx))
      .withColumn("__uxm", lag(col(uCol), 1).over(wx))
      .withColumn("__yp", lead(col(yCol), 1).over(wy))
      .withColumn("__ym", lag(col(yCol), 1).over(wy))
      .withColumn("__uyp", lead(col(uCol), 1).over(wy))
      .withColumn("__uym", lag(col(uCol), 1).over(wy))
      .withColumn("__vyp", lead(col(vCol), 1).over(wy))
      .withColumn("__vym", lag(col(vCol), 1).over(wy))
      .filter(col("__xp") === col(xCol) + 1 && col("__xm") === col(xCol) - 1 &&
        col("__yp") === col(yCol) + 1 && col("__ym") === col(yCol) - 1)
      .select(col(timeCol), col(yCol), col(xCol),
        sqrt(col(uCol) * col(uCol) + col(vCol) * col(vCol)).as("speed"),
        ((col("__vxp") - col("__vxm")) / 2.0 -
          (col("__uyp") - col("__uym")) / 2.0).as("vort"),
        ((col("__uxp") - col("__uxm")) / 2.0 +
          (col("__vyp") - col("__vym")) / 2.0).as("div"))
  }

  /** Bilinear regridding onto a finer/coarser RECTILINEAR index grid —
    * the interpolating remap that complements the conservative overlay
    * regrid (delphine/regrid.py's integral-preserving path preserves
    * mass; bilinear preserves smooth fields — the two standard WRF
    * post-processing remaps). Target cell (ty, tx) samples source
    * index space at (ty·ry, tx·rx) and blends the 4 bracketing cells
    * with the usual tensor-product weights.
    *
    * Exactness contract: choose ry/rx and `wScale` so every weight
    * times wScale is an exact integer (e.g. r = 0.5 → quarters,
    * wScale = 4); values enter as `dec`-decimal fixed-point longs, so
    * the blend is an integer dot product and ONE final division —
    * order-independent, hash-exact (the [[graft.util.Exact]]
    * discipline). Targets whose in-range corners are incomplete in a
    * sparse source (weight mass < wScale) emit no row, the NaN of the
    * dense-array formulation.
    *
    * 100 TB shape: the target frame is generated (no scan), corners
    * explode 4-way map-side, then ONE equi-join on the (y, x) cell key
    * against the source and one map-side-combined groupBy(ty, tx) —
    * compact int/long rows in both shuffles; at cluster scale
    * co-partition source and corners on the cell key (the bucketed
    * docprep pattern) and neither side re-shuffles. */
  def regridBilinear(src: DataFrame, yCol: String, xCol: String,
      varCol: String, ry: Double, rx: Double, nTy: Int, nTx: Int,
      dec: Int, wScale: Int): DataFrame = {
    val spark = src.sparkSession
    val unit = math.pow(10, dec)
    def w(e: Column): Column = {
      val scaled = e * wScale
      scaled.cast("long")
    }
    val tgt = spark.range(nTy.toLong * nTx)
      .select((col("id") / nTx).cast("int").as("ty"),
        (col("id") % nTx).cast("int").as("tx"))
      .withColumn("sy", col("ty") * ry)
      .withColumn("sx", col("tx") * rx)
      .withColumn("y0", floor(col("sy")).cast("int"))
      .withColumn("x0", floor(col("sx")).cast("int"))
      .withColumn("fy", col("sy") - col("y0"))
      .withColumn("fx", col("sx") - col("x0"))
    val corners = tgt.select(col("ty"), col("tx"), explode(array(
        struct(col("y0").as("y"), col("x0").as("x"),
          w((lit(1.0) - col("fy")) * (lit(1.0) - col("fx"))).as("w")),
        struct(col("y0").as("y"), (col("x0") + 1).as("x"),
          w((lit(1.0) - col("fy")) * col("fx")).as("w")),
        struct((col("y0") + 1).as("y"), col("x0").as("x"),
          w(col("fy") * (lit(1.0) - col("fx"))).as("w")),
        struct((col("y0") + 1).as("y"), (col("x0") + 1).as("x"),
          w(col("fy") * col("fx")).as("w")))).as("c"))
      .select(col("ty"), col("tx"), col("c.y").as("y"), col("c.x").as("x"),
        col("c.w").as("w"))
      .filter(col("w") > 0)
    corners
      .join(src.select(col(yCol).as("y"), col(xCol).as("x"),
        round(col(varCol) * unit).cast("long").as("__v")), Seq("y", "x"))
      .groupBy("ty", "tx")
      .agg(sum(col("w") * col("__v")).as("__s"), sum(col("w")).as("__wsum"))
      .filter(col("__wsum") === wScale)
      .select(col("ty"), col("tx"),
        (col("__s").cast("double") / (unit * wScale)).as(varCol))
  }

  /** Nearest-neighbor regridding onto a RECTILINEAR index grid — the
    * third standard remap (conservative preserves mass, bilinear
    * preserves smooth fields, nearest preserves CATEGORICAL fields:
    * land-use class, dominant soil type — values that must never
    * blend). Target (ty, tx) copies the source cell nearest to
    * (ty·ry, tx·rx); values pass through untouched, so exactness is
    * free. Ties round half-up via `floor(s + 0.5)` — spelled the same
    * way in the oracle, sidestepping round-half-even divergence.
    *
    * 100 TB shape: generated target frame, ONE equi-join on the
    * (y, x) cell key — no explode, no groupBy; targets mapping to a
    * missing source cell emit no row. */
  def regridNearest(src: DataFrame, yCol: String, xCol: String,
      varCol: String, ry: Double, rx: Double, nTy: Int,
      nTx: Int): DataFrame = {
    val spark = src.sparkSession
    val tgt = spark.range(nTy.toLong * nTx)
      .select((col("id") / nTx).cast("int").as("ty"),
        (col("id") % nTx).cast("int").as("tx"))
      .withColumn("y", floor(col("ty") * ry + 0.5).cast("int"))
      .withColumn("x", floor(col("tx") * rx + 0.5).cast("int"))
    tgt.join(src.select(col(yCol).as("y"), col(xCol).as("x"),
        col(varCol)), Seq("y", "x"))
      .select(col("ty"), col("tx"), col(varCol))
  }

  /** Block-mean coarsening by an integer factor along both index dims
    * (xarray's `coarsen(y=k, x=k).mean()` — the downsample every
    * high-resolution model run gets before archiving). Each coarse
    * cell (y/k, x/k) averages the k×k block with the fixed-point
    * order-independent accumulation of [[graft.util.Exact]]; `n`
    * carries the real block population so partial edge blocks (and
    * sparse grids) divide by what is actually present.
    *
    * 100 TB shape: ONE map-side-combined groupBy on the coarse key —
    * the k²-fold reduction happens in the combiner, so the shuffle
    * carries the COARSE grid, not the fine one. */
  def coarsen(df: DataFrame, keys: Seq[String], yCol: String,
      xCol: String, varCol: String, k: Int, dec: Int): DataFrame = {
    require(k >= 1, s"coarsen factor must be >= 1, got $k")
    val groups = keys.map(col) ++ Seq(
      floor(col(yCol) / k).cast("int").as(yCol),
      floor(col(xCol) / k).cast("int").as(xCol))
    df.groupBy(groups: _*)
      .agg(graft.util.Exact.fixedAvg(col(varCol), dec).as(varCol),
        count(lit(1)).as("n"))
  }

  /** Departure from the per-cell period mean: one unbounded window per
    * (y, x) computes the climatology with the same fixed-point-exact
    * accumulation as [[resampleTime]]; the anomaly is a single IEEE
    * subtraction. No join-back — climatology and departure come out of
    * the same shuffle. */
  def anomaly(cfg: GridConfig, dec: Int): Column = {
    val unit = math.pow(10, dec)
    val w = Window.partitionBy(col(cfg.yCol), col(cfg.xCol))
    val clim = graft.util.Exact.unitSum(col(cfg.varCol), unit).over(w)
      .cast("double") / (count(lit(1)).over(w) * lit(unit))
    col(cfg.varCol) - clim
  }
}
