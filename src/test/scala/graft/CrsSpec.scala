package graft

import graft.geom.Crs

/** CRS registry: Web Mercator against its published constants, UTM
  * structural invariants + roundtrips, and projected→projected routing
  * through 4326. (The OSGB pair is pinned separately in OsgbSpec
  * against the OS worked example.) */
class CrsSpec extends SparkSpec {

  private def xy(from: Int, to: Int)(x: Double, y: Double): (Double, Double) =
    Crs.convert(from, to).get(x, y)

  test("web mercator matches the published constants") {
    // the world bound: 180° → π·R exactly
    val (xMax, _) = xy(4326, 3857)(180.0, 0.0)
    assert(math.abs(xMax - 20037508.342789244) < 1e-6)
    val (x0, y0) = xy(4326, 3857)(0.0, 0.0)
    assert(x0 == 0.0 && math.abs(y0) < 1e-8) // tan(π/4) ≠ 1 in the last ulp
    // sanity: London ≈ (-0.1276, 51.5072)
    val (xl, yl) = xy(4326, 3857)(-0.1276, 51.5072)
    assert(math.abs(xl - -14205.0) < 50.0)
    assert(math.abs(yl - 6711744.0) < 2000.0)
  }

  test("web mercator roundtrip is exact to 1e-9 degrees") {
    for (li <- -5 to 5; pi <- -4 to 4) {
      val lon = li * 35.0; val lat = pi * 20.0
      val (x, y) = xy(4326, 3857)(lon, lat)
      val (lon2, lat2) = xy(3857, 4326)(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("UTM: central meridian / equator invariants and roundtrip") {
    // zone 30 north: central meridian -3°
    val (e0, n0) = xy(4326, 32630)(-3.0, 0.0)
    assert(math.abs(e0 - 500000.0) < 1e-6)
    assert(math.abs(n0) < 1e-6)
    // easting grows with longitude, northing with latitude
    val (eE, _) = xy(4326, 32630)(-1.0, 50.0)
    val (eW, _) = xy(4326, 32630)(-5.0, 50.0)
    assert(eE > 500000.0 && eW < 500000.0)
    // south zone false northing: equator maps to 10,000,000
    val (_, nS) = xy(4326, 32730)(-3.0, 0.0)
    assert(math.abs(nS - 10000000.0) < 1e-6)
    val (_, nS2) = xy(4326, 32730)(-3.0, -35.0)
    assert(nS2 < 10000000.0 && nS2 > 5000000.0)
    // roundtrips across the zone (and a bit beyond its edges)
    for (li <- -7 to 1; pi <- -4 to 4) {
      val lon = li * 1.0; val lat = pi * 15.0
      val (e, n) = xy(4326, 32630)(lon, lat)
      val (lon2, lat2) = xy(32630, 4326)(e, n)
      // ≈ 1 cm even 4° outside the zone edge
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("UTM scale at the central meridian is k0") {
    // 0.1° of latitude along the central meridian spans
    // ≈ k0 × (meridional arc length); check within 0.1%
    val (_, n1) = xy(4326, 32630)(-3.0, 45.0)
    val (_, n2) = xy(4326, 32630)(-3.0, 45.1)
    val arcPerDeg = 111131.0 // meridional metres/degree near 45°
    val expected = 0.9996 * arcPerDeg * 0.1
    assert(math.abs((n2 - n1) - expected) < expected * 0.001,
      s"dN = ${n2 - n1}, expected ≈ $expected")
  }

  test("projected → projected routes through 4326") {
    // 27700 → 3857 must equal (27700 → 4326) ∘ (4326 → 3857)
    val (e, n) = (530000.0, 180000.0) // central London-ish
    val (x1, y1) = xy(27700, 3857)(e, n)
    val (lon, lat) = xy(27700, 4326)(e, n)
    val (x2, y2) = xy(4326, 3857)(lon, lat)
    assert(x1 == x2 && y1 == y2)
  }

  test("LCC 2SP matches the EPSG Guidance Note 7-2 worked example") {
    // Method 9802's published example — NAD27 / Texas South Central
    // (Clarke 1866 in US survey feet): 28°30'N 96°W must project to
    // E 2,963,503.91 ft, N 254,759.80 ft.
    val lcc = Crs.Lcc(20925832.16, 0.00676866,
      math.toRadians(28.0 + 23.0 / 60), math.toRadians(30.0 + 17.0 / 60),
      math.toRadians(27.0 + 50.0 / 60), math.toRadians(-99.0),
      2000000.0, 0.0)
    val (e, n) = lcc.forward(math.toRadians(28.5), math.toRadians(-96.0))
    assert(math.abs(e - 2963503.91) < 0.02, s"E=$e")
    assert(math.abs(n - 254759.80) < 0.02, s"N=$n")
    val (lat, lon) = lcc.inverse(e, n)
    assert(math.abs(math.toDegrees(lat) - 28.5) < 1e-9)
    assert(math.abs(math.toDegrees(lon) + 96.0) < 1e-9)
  }

  test("Lambert-93: false origin identity, scale, and roundtrip") {
    // by definition of EPSG:2154, (3°E, 46.5°N) is exactly the false
    // origin (700000, 6600000); scale is 1 on the standard parallels
    val (e0, n0) = xy(4326, 2154)(3.0, 46.5)
    assert(math.abs(e0 - 700000.0) < 1e-6 && math.abs(n0 - 6600000.0) < 1e-6)
    for (li <- -4 to 7; pi <- 0 to 10) {
      val lon = li * 1.0; val lat = 41.0 + pi * 1.0
      val (e, n) = xy(4326, 2154)(lon, lat)
      val (lon2, lat2) = xy(2154, 4326)(e, n)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("WRF spherical LCC: scale 1 at the standard parallels, roundtrip") {
    // a CONUS-style domain: truelat 30/60, stand_lon -97
    val lcc = Crs.wrfLcc(30.0, 60.0, -97.0, 40.0)
    assert(math.abs(lcc.scale(math.toRadians(30.0)) - 1.0) < 1e-12)
    assert(math.abs(lcc.scale(math.toRadians(60.0)) - 1.0) < 1e-12)
    assert(lcc.scale(math.toRadians(45.0)) < 1.0) // secant cone dips between
    // domain center projects onto the central meridian (x = 0)
    val (x0, _) = lcc.forward(math.toRadians(40.0), math.toRadians(-97.0))
    assert(math.abs(x0) < 1e-9)
    for (li <- -12 to 12; pi <- 0 to 8) {
      val lon = -97.0 + li * 2.0; val lat = 25.0 + pi * 4.0
      val (x, y) = lcc.forward(math.toRadians(lat), math.toRadians(lon))
      val (lat2, lon2) = lcc.inverse(x, y)
      assert(math.abs(math.toDegrees(lon2) - lon) < 1e-9 &&
        math.abs(math.toDegrees(lat2) - lat) < 1e-9, s"($lon,$lat)")
    }
  }

  test("polar stereographic B matches the EPSG Guidance Note worked example") {
    // Method 9829's published example — WGS 84 / Australian Antarctic
    // Polar Stereographic (EPSG:3032): 75°S 120°E must project to
    // E 7 255 380.79 m, N 7 053 389.56 m.
    val (e, n) = xy(4326, 3032)(120.0, -75.0)
    assert(math.abs(e - 7255380.79) < 0.02, s"E=$e")
    assert(math.abs(n - 7053389.56) < 0.02, s"N=$n")
    val (lon, lat) = xy(3032, 4326)(e, n)
    assert(math.abs(lon - 120.0) < 1e-9 && math.abs(lat + 75.0) < 1e-9)
  }

  test("NSIDC north/south polar stereographic: pole identity and roundtrip") {
    // the projection pole is exactly the false origin
    val (xN, yN) = xy(4326, 3413)(37.0, 90.0)
    assert(math.abs(xN) < 1e-9 && math.abs(yN) < 1e-9)
    val (xS, yS) = xy(4326, 3976)(-12.0, -90.0)
    assert(math.abs(xS) < 1e-9 && math.abs(yS) < 1e-9)
    // northing decreases away from the north pole along the CM; the
    // stereographic radius at 20° colatitude is a bit under the arc
    // length × sec²(colat/2) stretch — bound it physically
    val (_, n70) = xy(4326, 3413)(-45.0, 70.0)
    assert(n70 < -2100000.0 && n70 > -2300000.0, s"n70=$n70")
    for (li <- -5 to 5; pi <- 0 to 4) {
      val lon = li * 35.0 - 1.0; val lat = 55.0 + pi * 8.0
      val (x, y) = xy(4326, 3413)(lon, lat)
      val (lon2, lat2) = xy(3413, 4326)(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat) -> ($lon2,$lat2)")
      val (xs2, ys2) = xy(4326, 3976)(lon, -lat)
      val (lonS, latS) = xy(3976, 4326)(xs2, ys2)
      assert(math.abs(lonS - lon) < 1e-9 && math.abs(latS + lat) < 1e-9)
    }
  }

  test("Mercator B matches the EPSG Guidance Note worked example") {
    // Method 9805's published example — Pulkovo 1942 / Caspian Sea
    // Mercator (Krassowsky 1940): 53°N 53°E must project to
    // E 165 704.29 m, N 5 171 848.07 m.
    val f = 1.0 / 298.3
    val m = Crs.Merc(6378245.0, 2.0 * f - f * f, 1.0,
      math.toRadians(42.0), math.toRadians(51.0), 0.0, 0.0)
    val (e, n) = m.forward(math.toRadians(53.0), math.toRadians(53.0))
    assert(math.abs(e - 165704.29) < 0.02, s"E=$e")
    assert(math.abs(n - 5171848.07) < 0.02, s"N=$n")
    val (lat, lon) = m.inverse(e, n)
    assert(math.abs(math.toDegrees(lat) - 53.0) < 1e-9)
    assert(math.abs(math.toDegrees(lon) - 53.0) < 1e-9)
  }

  test("World Mercator: equator invariants and roundtrip") {
    // variant A, k0 = 1: the equator maps to N 0 with E = a·λ
    val (e, n) = xy(4326, 3395)(90.0, 0.0)
    assert(math.abs(n) < 1e-8)
    assert(math.abs(e - 6378137.0 * math.Pi / 2.0) < 1e-6)
    for (li <- -4 to 4; pi <- -4 to 4) {
      val lon = li * 45.0; val lat = pi * 19.0
      val (x, y) = xy(4326, 3395)(lon, lat)
      val (lon2, lat2) = xy(3395, 4326)(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("WRF spherical polar stereographic and Mercator roundtrip") {
    val ps = Crs.wrfPs(60.0, -150.0) // an Alaska-style domain
    val (x0, y0) = ps.forward(math.toRadians(90.0), math.toRadians(11.0))
    assert(math.abs(x0) < 1e-9 && math.abs(y0) < 1e-9)
    val merc = Crs.wrfMercator(20.0, 100.0) // a tropical channel
    val (_, yEq) = merc.forward(0.0, math.toRadians(120.0))
    assert(math.abs(yEq) < 1e-9)
    for (li <- -1 to 6; pi <- 1 to 6) {
      val lon = -150.0 + li * 20.0; val lat = 30.0 + pi * 9.9
      val (x, y) = ps.forward(math.toRadians(lat), math.toRadians(lon))
      val (lat2, lon2) = ps.inverse(x, y)
      assert(math.abs(math.toDegrees(lon2) - lon) < 1e-9 &&
        math.abs(math.toDegrees(lat2) - lat) < 1e-9, s"ps ($lon,$lat)")
      val (xm, ym) = merc.forward(math.toRadians(lat - 60.0), math.toRadians(lon))
      val (latM, lonM) = merc.inverse(xm, ym)
      assert(math.abs(math.toDegrees(lonM) - lon) < 1e-9 &&
        math.abs(math.toDegrees(latM) - (lat - 60.0)) < 1e-9, s"merc ($lon,$lat)")
    }
  }

  test("unknown CRS is rejected") {
    assert(Crs.convert(4326, 99999).isEmpty)
    assert(!Crs.supported(12345))
    assert(Crs.supported(32701) && Crs.supported(32760))
    assert(!Crs.supported(32661) && !Crs.supported(32600))
  }
}
