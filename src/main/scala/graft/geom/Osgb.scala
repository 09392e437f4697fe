package graft.geom

/** EPSG:4326 (WGS84) ↔ EPSG:27700 (British National Grid) coordinate
  * math — the reference's `to_crs(27700)` reprojection
  * (wrf_voronoi.py:188), implemented from the published Ordnance Survey
  * formulas ("A guide to coordinate systems in Great Britain", Annexe C):
  * WGS84 geodetic → cartesian → 7-parameter Helmert → Airy 1830
  * geodetic → transverse Mercator (and the exact inverse chain).
  *
  * Accuracy: the standard single Helmert transformation (~±5 m vs the
  * OSTN grid shift — the same class of accuracy GeoPandas' proj gives
  * without grid files); the round trip converges to sub-millimeter.
  */
object Osgb {

  // WGS84 ellipsoid
  private val aW = 6378137.0
  private val e2W = { val f = 1.0 / 298.257223563; f * (2.0 - f) }
  // Airy 1830 ellipsoid
  private val aA = 6377563.396
  private val bA = 6356256.909
  private val e2A = (aA * aA - bA * bA) / (aA * aA)
  // National Grid transverse Mercator parameters
  private val F0 = 0.9996012717
  private val lat0 = math.toRadians(49.0)
  private val lon0 = math.toRadians(-2.0)
  private val E0 = 400000.0
  private val N0 = -100000.0
  // Helmert WGS84 → OSGB36 (tx ty tz metres, rx ry rz arcsec, s ppm)
  private val tX = -446.448
  private val tY = 125.157
  private val tZ = -542.060
  private val rX = arcsec(-0.1502)
  private val rY = arcsec(-0.2470)
  private val rZ = arcsec(-0.8421)
  private val sP = 20.4894e-6

  private def arcsec(v: Double): Double = math.toRadians(v / 3600.0)

  /** Geodetic (radians) → geocentric cartesian at h=0. */
  private def toCartesian(lat: Double, lon: Double, a: Double, e2: Double) = {
    val nu = a / math.sqrt(1.0 - e2 * math.sin(lat) * math.sin(lat))
    (nu * math.cos(lat) * math.cos(lon),
      nu * math.cos(lat) * math.sin(lon),
      nu * (1.0 - e2) * math.sin(lat))
  }

  /** Geocentric cartesian → geodetic (radians), iterative. */
  private def toGeodetic(x: Double, y: Double, z: Double, a: Double, e2: Double) = {
    val lon = math.atan2(y, x)
    val p = math.hypot(x, y)
    var lat = math.atan2(z, p * (1.0 - e2))
    var prev = 0.0
    var i = 0
    while (math.abs(lat - prev) > 1e-14 && i < 20) {
      prev = lat
      val nu = a / math.sqrt(1.0 - e2 * math.sin(lat) * math.sin(lat))
      lat = math.atan2(z + e2 * nu * math.sin(lat), p)
      i += 1
    }
    (lat, lon)
  }

  /** 7-parameter Helmert (small-angle form); `dir` = +1 forward
    * (WGS84→OSGB36), -1 approximate inverse. */
  private def helmert(x: Double, y: Double, z: Double, dir: Int) = {
    val (tx, ty, tz) = (dir * tX, dir * tY, dir * tZ)
    val (rx, ry, rz) = (dir * rX, dir * rY, dir * rZ)
    val s1 = 1.0 + dir * sP
    (tx + s1 * x - rz * y + ry * z,
      ty + rz * x + s1 * y - rx * z,
      tz - ry * x + rx * y + s1 * z)
  }

  /** Meridional arc M (OS guide eq. C3), Airy, from lat0 to `lat`. */
  private def meridionalArc(lat: Double): Double = {
    val n = (aA - bA) / (aA + bA)
    val n2 = n * n; val n3 = n2 * n
    val dphi = lat - lat0; val sphi = lat + lat0
    bA * F0 * (
      (1.0 + n + 1.25 * n2 + 1.25 * n3) * dphi
        - (3.0 * n + 3.0 * n2 + (21.0 / 8.0) * n3) * math.sin(dphi) * math.cos(sphi)
        + ((15.0 / 8.0) * (n2 + n3)) * math.sin(2.0 * dphi) * math.cos(2.0 * sphi)
        - (35.0 / 24.0) * n3 * math.sin(3.0 * dphi) * math.cos(3.0 * sphi))
  }

  /** Transverse Mercator forward: Airy 1830 geodetic (radians) → (E, N).
    * OS guide eqs. C4-C5. Public so the worked-example test can hit the
    * projection step in isolation. */
  def tmForward(lat: Double, lon: Double): (Double, Double) = {
    val sinL = math.sin(lat); val cosL = math.cos(lat); val tanL = math.tan(lat)
    val nu = aA * F0 / math.sqrt(1.0 - e2A * sinL * sinL)
    val rho = aA * F0 * (1.0 - e2A) * math.pow(1.0 - e2A * sinL * sinL, -1.5)
    val eta2 = nu / rho - 1.0
    val m = meridionalArc(lat)
    val i1 = m + N0
    val ii = nu / 2.0 * sinL * cosL
    val iii = nu / 24.0 * sinL * math.pow(cosL, 3) *
      (5.0 - tanL * tanL + 9.0 * eta2)
    val iiia = nu / 720.0 * sinL * math.pow(cosL, 5) *
      (61.0 - 58.0 * tanL * tanL + math.pow(tanL, 4))
    val iv = nu * cosL
    val v = nu / 6.0 * math.pow(cosL, 3) * (nu / rho - tanL * tanL)
    val vi = nu / 120.0 * math.pow(cosL, 5) *
      (5.0 - 18.0 * tanL * tanL + math.pow(tanL, 4) +
        14.0 * eta2 - 58.0 * tanL * tanL * eta2)
    val dl = lon - lon0
    val nOut = i1 + ii * dl * dl + iii * math.pow(dl, 4) + iiia * math.pow(dl, 6)
    val eOut = E0 + iv * dl + v * math.pow(dl, 3) + vi * math.pow(dl, 5)
    (eOut, nOut)
  }

  /** Transverse Mercator inverse: (E, N) → Airy 1830 geodetic (radians).
    * OS guide eqs. C6-C9. */
  def tmInverse(e: Double, n: Double): (Double, Double) = {
    var latP = lat0 + (n - N0) / (aA * F0)
    var m = meridionalArc(latP)
    var i = 0
    while (math.abs(n - N0 - m) >= 0.00001 && i < 30) {
      latP += (n - N0 - m) / (aA * F0)
      m = meridionalArc(latP)
      i += 1
    }
    val sinL = math.sin(latP); val tanL = math.tan(latP)
    val secL = 1.0 / math.cos(latP)
    val nu = aA * F0 / math.sqrt(1.0 - e2A * sinL * sinL)
    val rho = aA * F0 * (1.0 - e2A) * math.pow(1.0 - e2A * sinL * sinL, -1.5)
    val eta2 = nu / rho - 1.0
    val t2 = tanL * tanL; val t4 = t2 * t2; val t6 = t4 * t2
    val vii = tanL / (2.0 * rho * nu)
    val viii = tanL / (24.0 * rho * math.pow(nu, 3)) *
      (5.0 + 3.0 * t2 + eta2 - 9.0 * t2 * eta2)
    val ix = tanL / (720.0 * rho * math.pow(nu, 5)) *
      (61.0 + 90.0 * t2 + 45.0 * t4)
    val x10 = secL / nu
    val xi = secL / (6.0 * math.pow(nu, 3)) * (nu / rho + 2.0 * t2)
    val xii = secL / (120.0 * math.pow(nu, 5)) * (5.0 + 28.0 * t2 + 24.0 * t4)
    val xiia = secL / (5040.0 * math.pow(nu, 7)) *
      (61.0 + 662.0 * t2 + 1320.0 * t4 + 720.0 * t6)
    val de = e - E0
    val lat = latP - vii * de * de + viii * math.pow(de, 4) - ix * math.pow(de, 6)
    val lon = lon0 + x10 * de - xi * math.pow(de, 3) +
      xii * math.pow(de, 5) - xiia * math.pow(de, 7)
    (lat, lon)
  }

  /** WGS84 (lat, lon degrees) → OSGB36 National Grid (E, N metres). */
  def wgs84ToOsgb(latDeg: Double, lonDeg: Double): (Double, Double) = {
    val (x, y, z) = toCartesian(math.toRadians(latDeg), math.toRadians(lonDeg), aW, e2W)
    val (x2, y2, z2) = helmert(x, y, z, 1)
    val (latA, lonA) = toGeodetic(x2, y2, z2, aA, e2A)
    tmForward(latA, lonA)
  }

  /** OSGB36 National Grid (E, N metres) → WGS84 (lat, lon degrees). */
  def osgbToWgs84(e: Double, n: Double): (Double, Double) = {
    val (latA, lonA) = tmInverse(e, n)
    val (x, y, z) = toCartesian(latA, lonA, aA, e2A)
    val (x2, y2, z2) = helmert(x, y, z, -1)
    val (lat, lon) = toGeodetic(x2, y2, z2, aW, e2W)
    (math.toDegrees(lat), math.toDegrees(lon))
  }
}
