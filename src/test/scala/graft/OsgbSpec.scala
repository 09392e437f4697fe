package graft

import org.apache.spark.sql.functions._

import graft.geom.{st, Osgb}

/** st_transform / OSGB math against the published Ordnance Survey worked
  * example and roundtrip/physical-sanity properties. */
class OsgbSpec extends SparkSpec {
  import spark.implicits._

  // OS guide worked example (Annexe C): OSGB36 geodetic coordinates of
  // the test point and its published National Grid position.
  private val latOsgb36 = math.toRadians(52.0 + 39.0 / 60.0 + 27.2531 / 3600.0)
  private val lonOsgb36 = math.toRadians(1.0 + 43.0 / 60.0 + 4.5177 / 3600.0)

  test("transverse Mercator forward matches the OS worked example to mm") {
    val (e, n) = Osgb.tmForward(latOsgb36, lonOsgb36)
    assert(math.abs(e - 651409.903) < 0.002, s"E=$e")
    assert(math.abs(n - 313177.270) < 0.002, s"N=$n")
  }

  test("transverse Mercator inverse inverts the worked example") {
    val (lat, lon) = Osgb.tmInverse(651409.903, 313177.270)
    assert(math.abs(lat - latOsgb36) < 1e-9)
    assert(math.abs(lon - lonOsgb36) < 1e-9)
  }

  test("full WGS84 chain roundtrips to sub-centimeter over a GB grid") {
    for {
      lat <- Seq(50.0, 52.5, 55.0, 58.0)
      lon <- Seq(-6.0, -3.0, 0.0, 1.5)
    } {
      val (e, n) = Osgb.wgs84ToOsgb(lat, lon)
      val (lat2, lon2) = Osgb.osgbToWgs84(e, n)
      assert(math.abs(lat2 - lat) < 1e-7, s"lat $lat -> $lat2")
      assert(math.abs(lon2 - lon) < 1e-7, s"lon $lon -> $lon2")
    }
  }

  test("Helmert datum shift moves positions by the physical 50-200 m") {
    // projecting WGS84 geodetic coords directly (skipping the datum
    // shift) must differ from the correct chain by the known OSGB36
    // offset magnitude
    val lat = 51.5; val lon = -0.1 // London
    val (e1, n1) = Osgb.wgs84ToOsgb(lat, lon)
    val (e2, n2) = Osgb.tmForward(math.toRadians(lat), math.toRadians(lon))
    val d = math.hypot(e1 - e2, n1 - n2)
    assert(d > 50 && d < 200, s"datum shift $d m")
  }

  test("st_transform reprojects every vertex of a polygon and inverts") {
    val df = spark.range(1).select(
      st.makeBox(lit(-0.5), lit(51.3), lit(0.3), lit(51.7)).as("g"))
    val there = df.select(st.transform($"g", 4326, 27700).as("en"))
    val r = there.select(
      st.xmin($"en"), st.xmax($"en"), st.ymin($"en"), st.ymax($"en"),
      st.area($"en")).head()
    // London-ish box in metres: E ~ [490k, 560k], N ~ [170k, 220k]
    assert(r.getDouble(0) > 400000 && r.getDouble(1) < 600000)
    assert(r.getDouble(2) > 100000 && r.getDouble(3) < 300000)
    assert(r.getDouble(4) > 1e8) // tens of km on a side → > 100 km²
    val back = there.select(st.transform($"en", 27700, 4326).as("g2"))
      .select(st.xmin($"g2"), st.ymin($"g2"), st.xmax($"g2"), st.ymax($"g2")).head()
    assert(math.abs(back.getDouble(0) - -0.5) < 1e-6)
    assert(math.abs(back.getDouble(1) - 51.3) < 1e-6)
    assert(math.abs(back.getDouble(2) - 0.3) < 1e-6)
    assert(math.abs(back.getDouble(3) - 51.7) < 1e-6)
  }

  test("heat-island extract pattern: reproject then intersects-filter (P4)") {
    // ref wrf_voronoi.py:188-190: to_crs(27700) + intersects(union)
    val cells = Seq(
      (1L, -0.2, 51.4), (2L, -0.1, 51.5), (3L, 2.0, 48.8) // two London, one Paris-ish
    ).toDF("id", "lon", "lat")
      .select($"id", st.makeBox($"lon" - 0.05, $"lat" - 0.05,
        $"lon" + 0.05, $"lat" + 0.05).as("g"))
    // a metric-space London box: E [500k, 540k], N [170k, 190k]
    val london = st.makeBox(lit(500000.0), lit(170000.0), lit(540000.0), lit(190000.0))
    val kept = cells
      .filter(st.intersects(st.transform($"g", 4326, 27700), london))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("st_transform rejects unsupported CRS pairs with a clear error") {
    val ex = intercept[Exception] {
      spark.range(1).select(
        st.transform(st.point(lit(0.0), lit(0.0)), 4326, 99999)).head()
    }
    assert(ex.getMessage.contains("unsupported CRS pair")
      || ex.getCause != null && ex.getCause.getMessage.contains("unsupported CRS pair"))
  }
}
