package graft

import graft.geom.{st, Wkb}
import graft.operators.Voronoi

/** Tile-with-halo tessellation must reproduce the single-task diagram
  * exactly (per cell, topologically) when the halo is sufficient. */
class VoronoiTiledSpec extends SparkSpec {
  import spark.implicits._

  private def lcgSeeds(n: Int): Seq[(Long, Double, Double)] = {
    var s = 98765L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); s >>> 33 }
    (0 until n).map { i =>
      (i.toLong, (next() % 10000) / 1000.0, (next() % 10000) / 1000.0)
    }.distinct
  }

  /** Jittered near-uniform grid — the reference's workload shape (WRF
    * cells), where cell extents are bounded by the grid spacing and the
    * halo-sufficiency condition is checkable a priori. Purely random
    * seed clouds can grow boundary cells wider than any fixed halo. */
  private def jitteredGrid(n: Int): Seq[(Long, Double, Double)] = {
    var s = 424242L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); s >>> 33 }
    (0 until n * n).map { i =>
      val jx = (next() % 600) / 1000.0 - 0.3
      val jy = (next() % 600) / 1000.0 - 0.3
      (i.toLong, (i % n) + 0.5 + jx, (i / n) + 0.5 + jy)
    }
  }

  test("tiled tessellation equals the single-task diagram cell-for-cell") {
    val pts = jitteredGrid(10).toDF("id", "x", "y")
    val clip = (0.0, 0.0, 10.0, 10.0)
    def collect(df: org.apache.spark.sql.DataFrame): Map[Long, org.locationtech.jts.geom.Geometry] =
      df.select($"id", st.asText($"geom")).as[(Long, String)].collect()
        .map { case (i, w) => i -> Wkb.readWkt(w) }.toMap

    val single = collect(Voronoi.tessellate(pts, "id", "x", "y", clip))
    // ~60 seeds in [0,10]^2 → spacing ~1.2; halo 4 ≫ sufficient; 3×3 tiles
    val tiled = collect(Voronoi.tessellateTiled(pts, "id", "x", "y", clip,
      tileSize = 4.0, halo = 4.0))

    assert(tiled.keySet == single.keySet)
    tiled.foreach { case (id, g) =>
      assert(g.equalsTopo(single(id)), s"cell $id differs from global diagram")
    }
  }

  test("undersized halo fails loudly instead of returning wrong cells") {
    // halo 0.2 ≪ the ~1.0 grid spacing: boundary-adjacent interior
    // cells get clipped at the halo-inflated tile envelope, which the
    // per-tile sufficiency guard detects — silent corruption becomes a
    // loud failure telling the caller to widen the halo.
    val pts = jitteredGrid(10).toDF("id", "x", "y")
    val ex = intercept[Exception] {
      Voronoi.tessellateTiled(pts, "id", "x", "y", (0.0, 0.0, 10.0, 10.0),
        tileSize = 4.0, halo = 0.2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("halo")),
      s"expected a halo-sufficiency failure, got: $ex")
  }

  test("tiled cells still partition the clip box") {
    val pts = lcgSeeds(50).toDF("id", "x", "y")
    val cells = Voronoi.tessellateTiled(pts, "id", "x", "y",
      (0.0, 0.0, 10.0, 10.0), tileSize = 5.0, halo = 5.0)
    val total = cells.select(org.apache.spark.sql.functions
      .sum(st.area($"geom"))).as[Double].head()
    assert(math.abs(total - 100.0) < 1e-9)
  }
}
