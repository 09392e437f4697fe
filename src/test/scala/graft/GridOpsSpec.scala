package graft

import org.apache.spark.sql.functions._

import graft.grid.{GridConfig, GridOps}

class GridOpsSpec extends SparkSpec {

  import spark.implicits._

  test("destagger averages adjacent staggered faces onto mass points") {
    // one pencil (t=0, y=0), faces 0..3 with a hole at 2
    val u = Seq((0, 0, 0, 10.0), (0, 0, 1, 20.0), (0, 0, 3, 50.0),
      (0, 1, 0, 1.0), (0, 1, 1, 3.0))
      .toDF("t", "y", "xs", "u")
    val out = GridOps.destagger(u, Seq("t", "y"), "xs", "u", "x")
      .orderBy("t", "y", "x")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    // face pair (0,1) -> mass 0; (1,3) skipped (not adjacent); (3,_) none
    assert(out.toSeq === Seq((0, 0, 0, 15.0), (0, 1, 0, 2.0)))
  }

  test("interpLevels brackets a descending coordinate and interpolates linearly") {
    // column (y=0,x=0): p 1000->600 step 100, v = 0,10,20,30,40
    val col3d = (0 to 4).map(l => (0, 0, 1000.0 - 100.0 * l, 10.0 * l))
      .toDF("y", "x", "p", "v")
    val out = GridOps.interpLevels(col3d, Seq("y", "x"), "p", "v",
        Seq(975.0, 850.0, 625.0, 1000.0, 599.0))
      .orderBy(desc("target"))
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    // 1000 is the top bracket's inclusive end (p0 >= t > p1): v = 0
    // 975 -> 2.5; 850 -> 15; 625 -> 37.5; 599 below range -> no row
    assert(out.toSeq === Seq((1000.0, 0.0), (975.0, 2.5), (850.0, 15.0),
      (625.0, 37.5)))
  }

  test("interpLevels emits nothing for an out-of-range target") {
    val col3d = Seq((0, 0, 900.0, 1.0), (0, 0, 800.0, 2.0)).toDF("y", "x", "p", "v")
    assert(GridOps.interpLevels(col3d, Seq("y", "x"), "p", "v",
      Seq(950.0, 700.0)).count() === 0)
  }

  test("resampleTime buckets by calendar unit with exact means") {
    val cfg = GridConfig("x", "y", "lon", "lat", "ts", "value")
    val df = Seq(
      (0, 0, "2024-01-01 05:00:00", 1.25),
      (0, 0, "2024-01-03 05:00:00", 2.75), // same ISO week (Mon Jan 1)
      (0, 0, "2024-01-08 05:00:00", 10.0)) // next week
      .toDF("y", "x", "s", "value")
      .withColumn("ts", col("s").cast("timestamp"))
    val out = GridOps.resampleTime(df, cfg, "week", dec = 2)
      .orderBy("bucket")
      .collect().map(r => (r.getDate(2).toString, r.getDouble(3), r.getLong(4)))
    assert(out.toSeq === Seq(("2024-01-01", 2.0, 2L), ("2024-01-08", 10.0, 1L)))
  }

  test("smooth is the exact 3x3 neighbor mean on a dense grid") {
    val cfg = GridConfig("x", "y", "lon", "lat", "t", "v")
    // 3x3 grid with values 1..9 (v = 3y + x + 1), one time slice
    val df = (for (y <- 0 to 2; x <- 0 to 2)
      yield (0, y, x, (3 * y + x + 1).toDouble)).toDF("t", "y", "x", "v")
    val got = GridOps.smooth(df, cfg, dec = 2)
      .collect().map(r => ((r.getInt(1), r.getInt(2)), r.getDouble(4))).toMap
    // center: mean of 1..9 = 5; corner (0,0): mean(1,2,4,5) = 3;
    // edge (0,1): mean(1,2,3,4,5,6) = 3.5
    assert(got((1, 1)) === 5.0)
    assert(got((0, 0)) === 3.0)
    assert(got((0, 1)) === 3.5)
    assert(got((2, 2)) === (5.0 + 6 + 8 + 9) / 4)
  }

  test("smooth range frames skip across index holes") {
    val cfg = GridConfig("x", "y", "lon", "lat", "t", "v")
    // one pencil with a hole at x=1: x=0 and x=2 are NOT neighbors
    val df = Seq((0, 0, 0, 10.0), (0, 0, 2, 30.0)).toDF("t", "y", "x", "v")
    val got = GridOps.smooth(df, cfg, dec = 2)
      .collect().map(r => (r.getInt(2), r.getDouble(4))).toMap
    assert(got(0) === 10.0 && got(2) === 30.0)
  }

  test("windDiagnostics: speed everywhere it emits, centered vort/div on interior cells") {
    // u = x, v = y over a 3x3 panel: dv/dx = 0, du/dy = 0 -> vort = 0;
    // du/dx = 1, dv/dy = 1 -> div = 2. Only (1,1) has all 4 neighbors.
    val df = (for (y <- 0 to 2; x <- 0 to 2)
      yield (0, y, x, x.toDouble, y.toDouble)).toDF("t", "y", "x", "u", "v")
    val got = GridOps.windDiagnostics(df, "t", "y", "x", "u", "v").collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getInt(1), r.getInt(2)) === ((1, 1)))
    assert(r.getDouble(3) === math.sqrt(2.0)) // speed at (1,1): |(1,1)|
    assert(r.getDouble(4) === 0.0)            // vort
    assert(r.getDouble(5) === 2.0)            // div
  }

  test("windDiagnostics: rotational field has vorticity, no divergence") {
    // solid-body rotation u = -y, v = x: vort = 2, div = 0
    val df = (for (y <- 0 to 2; x <- 0 to 2)
      yield (0, y, x, -y.toDouble, x.toDouble)).toDF("t", "y", "x", "u", "v")
    val r = GridOps.windDiagnostics(df, "t", "y", "x", "u", "v").collect().head
    assert(r.getDouble(4) === 2.0 && r.getDouble(5) === 0.0)
  }

  test("windDiagnostics: a missing neighbor suppresses the cell") {
    // 3x3 panel with (1,0) removed: (1,1) loses its x-1 neighbor
    val df = (for (y <- 0 to 2; x <- 0 to 2; if !(y == 1 && x == 0))
      yield (0, y, x, 1.0, 1.0)).toDF("t", "y", "x", "u", "v")
    assert(GridOps.windDiagnostics(df, "t", "y", "x", "u", "v").count() === 0)
  }

  test("regridBilinear blends the 4 corners with exact tensor weights") {
    // 2x2 source, v = (1,2,3,4); 2x-finer target: midpoints blend
    val src = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0), (1, 1, 4.0))
      .toDF("y", "x", "v")
    val got = GridOps.regridBilinear(src, "y", "x", "v", 0.5, 0.5,
        nTy = 3, nTx = 3, dec = 2, wScale = 4)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got.size === 9)
    assert(got((0, 0)) === 1.0 && got((2, 2)) === 4.0)  // on-node copies
    assert(got((0, 1)) === 1.5 && got((1, 0)) === 2.0)  // edge midpoints
    assert(got((1, 1)) === 2.5)                          // center: mean of 4
  }

  test("regridBilinear drops targets with incomplete corner mass") {
    // missing source cell (1,1): every target needing it emits no row
    val src = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0)).toDF("y", "x", "v")
    val got = GridOps.regridBilinear(src, "y", "x", "v", 0.5, 0.5,
        nTy = 3, nTx = 3, dec = 2, wScale = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got === Set((0, 0), (0, 1), (0, 2), (1, 0), (2, 0)))
  }

  test("regridNearest copies the nearest source value, half rounds up") {
    // r = 0.5: target 1 samples s = 0.5 -> rounds UP to source 1
    val src = Seq((0, 0, 10.0), (0, 1, 20.0), (1, 0, 30.0), (1, 1, 40.0))
      .toDF("y", "x", "v")
    val got = GridOps.regridNearest(src, "y", "x", "v", 0.5, 0.5,
        nTy = 3, nTx = 3)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(got.size === 9)
    assert(got((0, 0)) === 10.0 && got((2, 2)) === 40.0)
    assert(got((1, 1)) === 40.0)  // (0.5, 0.5) rounds up to (1, 1)
    assert(got((0, 1)) === 20.0 && got((1, 0)) === 30.0)
  }

  test("regridNearest drops targets mapping to missing source cells") {
    val src = Seq((0, 0, 10.0)).toDF("y", "x", "v")
    val got = GridOps.regridNearest(src, "y", "x", "v", 0.5, 0.5,
        nTy = 3, nTx = 3).collect()
    assert(got.map(r => (r.getInt(0), r.getInt(1))).toSet === Set((0, 0)))
  }

  test("coarsen block-means with real edge-block population") {
    // 3x3 grid, k=2: blocks (0,0) 2x2, (0,1) 2x1, (1,0) 1x2, (1,1) 1x1
    val src = (for (y <- 0 to 2; x <- 0 to 2)
      yield (y, x, (y * 3 + x).toDouble)).toDF("y", "x", "v")
    val got = GridOps.coarsen(src, Seq.empty, "y", "x", "v", k = 2, dec = 0)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got((0, 0)) === ((2.0, 4L)))   // mean(0,1,3,4)
    assert(got((0, 1)) === ((3.5, 2L)))   // mean(2,5)
    assert(got((1, 0)) === ((6.5, 2L)))   // mean(6,7)
    assert(got((1, 1)) === ((8.0, 1L)))
  }

  test("columnIntegral trapezoids adjacent levels per column") {
    // column (0,0): levels p=1000,900,800 with t=2,4,6
    //   terms: (1000-900)(2+4)/2 = 300; (900-800)(4+6)/2 = 500 → 800
    // column (0,1): single level → no layer, no row
    val df = Seq(
      (0, 0, 1000.0, 2.0), (0, 0, 900.0, 4.0), (0, 0, 800.0, 6.0),
      (0, 1, 1000.0, 9.0)
    ).toDF("y", "x", "p", "t")
    val got = GridOps.columnIntegral(df, Seq("y", "x"), "p", "t", dec = 6)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getDouble(2), r.getLong(3))))
    assert(got.toMap === Map((0, 0) -> ((800.0, 2L))))
  }

  test("anomaly is the departure from the per-cell period mean") {
    val cfg = GridConfig("x", "y", "lon", "lat", "ts", "v")
    val df = Seq((0, 0, 1.0), (0, 0, 3.0), (1, 0, 7.0))
      .toDF("y", "x", "v")
    val out = df.withColumn("a", GridOps.anomaly(cfg, dec = 2))
      .orderBy("y", "v")
      .collect().map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq((0, 1.0, -1.0), (0, 3.0, 1.0), (1, 7.0, 0.0)))
  }
}
