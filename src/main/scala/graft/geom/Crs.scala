package graft.geom

/** CRS registry behind `st_transform` — G9 breadth beyond the
  * reference's single `to_crs(27700)` pair (wrf_voronoi.py:188), all
  * from published closed-form projection math:
  *
  *  - 4326 ↔ 27700 — [[Osgb]] (7-param Helmert + Airy transverse
  *    Mercator, Ordnance Survey guide Annexe C)
  *  - 4326 ↔ 3857 — spherical Web Mercator (the EPSG-published
  *    formulas: x = R·λ, y = R·ln tan(π/4 + φ/2) on the WGS84 datum)
  *  - 4326 ↔ 32601-32660 / 32701-32760 — WGS84 UTM north/south zones
  *    (Redfearn-series transverse Mercator — the same series as the OS
  *    guide, on the WGS84 ellipsoid, k0 = 0.9996, per-zone central
  *    meridian, false easting 500 km, false northing 10 000 km south)
  *  - 4326 ↔ 2154 — RGF93 / Lambert-93, the secant two-parallel
  *    Lambert conformal conic (EPSG method 9802) on GRS80; the same
  *    [[Lcc]] math with e² = 0 is WRF's native spherical projection,
  *    exposed as [[wrfLcc]] for model-domain headers
  *
  * Any supported pair converts; non-4326 → non-4326 routes through
  * 4326. All functions operate in geometry axis order (x = lon/E,
  * y = lat/N).
  */
object Crs {

  /** (x, y) → (x', y') in geometry axis order. */
  type XY = (Double, Double) => (Double, Double)

  private val R = 6378137.0 // WGS84 semi-major = Web Mercator radius
  private val aW = 6378137.0
  private val fW = 1.0 / 298.257223563
  private val bW = aW * (1.0 - fW)

  /** Generic transverse Mercator on an ellipsoid (a, b) with scale k0,
    * true origin (lat0, lon0) radians and false origin (e0, n0) —
    * the published Redfearn series (OS guide eqs. C3-C9 with the
    * ellipsoid parameterized). */
  final case class Tm(a: Double, b: Double, k0: Double,
      lat0: Double, lon0: Double, e0: Double, n0: Double) {

    private val e2 = (a * a - b * b) / (a * a)

    private def meridionalArc(lat: Double): Double = {
      val n = (a - b) / (a + b)
      val n2 = n * n; val n3 = n2 * n
      val dphi = lat - lat0; val sphi = lat + lat0
      b * k0 * (
        (1.0 + n + 1.25 * n2 + 1.25 * n3) * dphi
          - (3.0 * n + 3.0 * n2 + (21.0 / 8.0) * n3) * math.sin(dphi) * math.cos(sphi)
          + ((15.0 / 8.0) * (n2 + n3)) * math.sin(2.0 * dphi) * math.cos(2.0 * sphi)
          - (35.0 / 24.0) * n3 * math.sin(3.0 * dphi) * math.cos(3.0 * sphi))
    }

    /** Geodetic (radians) → (E, N) metres. */
    def forward(lat: Double, lon: Double): (Double, Double) = {
      val sinL = math.sin(lat); val cosL = math.cos(lat); val tanL = math.tan(lat)
      val nu = a * k0 / math.sqrt(1.0 - e2 * sinL * sinL)
      val rho = a * k0 * (1.0 - e2) * math.pow(1.0 - e2 * sinL * sinL, -1.5)
      val eta2 = nu / rho - 1.0
      val i1 = meridionalArc(lat) + n0
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
      (e0 + iv * dl + v * math.pow(dl, 3) + vi * math.pow(dl, 5),
        i1 + ii * dl * dl + iii * math.pow(dl, 4) + iiia * math.pow(dl, 6))
    }

    /** (E, N) metres → geodetic (radians). */
    def inverse(e: Double, n: Double): (Double, Double) = {
      var latP = lat0 + (n - n0) / (a * k0)
      var m = meridionalArc(latP)
      var i = 0
      while (math.abs(n - n0 - m) >= 0.00001 && i < 30) {
        latP += (n - n0 - m) / (a * k0)
        m = meridionalArc(latP)
        i += 1
      }
      val sinL = math.sin(latP); val tanL = math.tan(latP)
      val secL = 1.0 / math.cos(latP)
      val nu = a * k0 / math.sqrt(1.0 - e2 * sinL * sinL)
      val rho = a * k0 * (1.0 - e2) * math.pow(1.0 - e2 * sinL * sinL, -1.5)
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
      val de = e - e0
      (latP - vii * de * de + viii * math.pow(de, 4) - ix * math.pow(de, 6),
        lon0 + x10 * de - xi * math.pow(de, 3) +
          xii * math.pow(de, 5) - xiia * math.pow(de, 7))
    }
  }

  /** Lambert conformal conic, secant two-parallel form (EPSG Guidance
    * Note 7-2 method 9802) on an ellipsoid (a, e²); e² = 0 gives the
    * spherical form WRF uses natively (the model's map projection for
    * mid-latitude domains — the grid the reference's wrf_voronoi.py
    * tessellates is defined in these coordinates). Angles in radians,
    * (lat1, lat2) the standard parallels, (lat0, lon0) the false
    * origin's latitude/central meridian, (fe, fn) false easting and
    * northing in the unit of `a`. */
  final case class Lcc(a: Double, e2: Double, lat1: Double, lat2: Double,
      lat0: Double, lon0: Double, fe: Double, fn: Double) {

    private val e = math.sqrt(e2)

    private def m(lat: Double): Double = {
      val s = math.sin(lat)
      math.cos(lat) / math.sqrt(1.0 - e2 * s * s)
    }

    private def t(lat: Double): Double = {
      val s = math.sin(lat)
      math.tan(math.Pi / 4.0 - lat / 2.0) /
        math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0)
    }

    /** Cone constant; the tangent (1SP) limit when lat1 == lat2. */
    val n: Double =
      if (lat1 == lat2) math.sin(lat1)
      else (math.log(m(lat1)) - math.log(m(lat2))) /
        (math.log(t(lat1)) - math.log(t(lat2)))
    private val f = m(lat1) / (n * math.pow(t(lat1), n))
    private val r0 = a * f * math.pow(t(lat0), n)

    /** Point scale factor — 1 on the standard parallels. */
    def scale(lat: Double): Double =
      a * f * math.pow(t(lat), n) * n / (a * m(lat))

    /** Geodetic (radians) → (E, N). */
    def forward(lat: Double, lon: Double): (Double, Double) = {
      val r = a * f * math.pow(t(lat), n)
      val th = n * (lon - lon0)
      (fe + r * math.sin(th), fn + r0 - r * math.cos(th))
    }

    /** (E, N) → geodetic (radians). */
    def inverse(east: Double, north: Double): (Double, Double) = {
      val de = east - fe
      val dn = r0 - (north - fn)
      val sgn = math.signum(n)
      val rp = sgn * math.sqrt(de * de + dn * dn)
      val tp = math.pow(rp / (a * f), 1.0 / n)
      val th = math.atan2(sgn * de, sgn * dn)
      var lat = math.Pi / 2.0 - 2.0 * math.atan(tp)
      var i = 0
      while (i < 15) { // converges in ~4 iterations; e=0 in one
        val s = math.sin(lat)
        val next = math.Pi / 2.0 - 2.0 * math.atan(
          tp * math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0))
        if (math.abs(next - lat) < 1e-14) i = 15 else i += 1
        lat = next
      }
      (lat, th / n + lon0)
    }
  }

  /** Polar stereographic "variant B" (EPSG method 9829): standard
    * parallel latC (sign selects the pole), central meridian lon0,
    * false origin (fe, fn); ellipsoid (a, e²), e² = 0 giving the
    * spherical form WRF uses for high-latitude domains (map_proj = 2,
    * TRUELAT1 the standard parallel). Snyder's t/ρ series (eqs.
    * 15-9, 21-34); the south-pole aspect mirrors the north math about
    * the false northing, which reproduces EPSG's published south
    * formulas exactly. */
  final case class Ps(a: Double, e2: Double, latC: Double,
      lon0: Double, fe: Double, fn: Double) {

    require(latC != 0.0, "polar stereographic needs a polar standard parallel")
    private val south = latC < 0.0
    private val e = math.sqrt(e2)

    // Snyder 15-9 on the |north| aspect
    private def t(lat: Double): Double = {
      val s = math.sin(lat)
      math.tan(math.Pi / 4.0 - lat / 2.0) /
        math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0)
    }
    private val latCn = math.abs(latC)
    private val mC = {
      val s = math.sin(latCn)
      math.cos(latCn) / math.sqrt(1.0 - e2 * s * s)
    }
    private val tC = t(latCn)

    /** Geodetic (radians) → (E, N). The pole maps exactly to (fe, fn). */
    def forward(lat: Double, lon: Double): (Double, Double) = {
      val latN = if (south) -lat else lat
      val rho = a * mC * t(latN) / tC
      val th = lon - lon0
      val n = fn - rho * math.cos(th)
      (fe + rho * math.sin(th), if (south) 2.0 * fn - n else n)
    }

    /** (E, N) → geodetic (radians). */
    def inverse(east: Double, north: Double): (Double, Double) = {
      val nN = if (south) 2.0 * fn - north else north
      val de = east - fe; val dn = fn - nN
      val rho = math.sqrt(de * de + dn * dn)
      val tp = rho * tC / (a * mC)
      var lat = math.Pi / 2.0 - 2.0 * math.atan(tp)
      var i = 0
      while (i < 15) { // e = 0 converges immediately
        val s = math.sin(lat)
        val next = math.Pi / 2.0 - 2.0 * math.atan(
          tp * math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0))
        if (math.abs(next - lat) < 1e-14) i = 15 else i += 1
        lat = next
      }
      var lon = if (rho == 0.0) lon0 else lon0 + math.atan2(de, dn)
      // lon0 + atan2 can leave (−π, π] when lon0 is nonzero — normalize
      while (lon <= -math.Pi) lon += 2.0 * math.Pi
      while (lon > math.Pi) lon -= 2.0 * math.Pi
      (if (south) -lat else lat, lon)
    }
  }

  /** Mercator on an ellipsoid (EPSG methods 9804/9805): either a
    * variant-A scale k0 at the equator or a variant-B standard
    * parallel lat1 (kEff = m(lat1)); e² = 0 gives WRF's spherical
    * Mercator (map_proj = 3, TRUELAT1 the true-scale latitude). */
  final case class Merc(a: Double, e2: Double, k0: Double,
      lat1: Double, lon0: Double, fe: Double, fn: Double) {

    private val e = math.sqrt(e2)
    private val kEff = {
      val s = math.sin(lat1)
      k0 * math.cos(lat1) / math.sqrt(1.0 - e2 * s * s)
    }

    /** Geodetic (radians) → (E, N). */
    def forward(lat: Double, lon: Double): (Double, Double) = {
      val s = math.sin(lat)
      val n = a * kEff * math.log(math.tan(math.Pi / 4.0 + lat / 2.0) *
        math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0))
      (fe + a * kEff * (lon - lon0), fn + n)
    }

    /** (E, N) → geodetic (radians). */
    def inverse(east: Double, north: Double): (Double, Double) = {
      val tp = math.exp(-(north - fn) / (a * kEff))
      var lat = math.Pi / 2.0 - 2.0 * math.atan(tp)
      var i = 0
      while (i < 15) {
        val s = math.sin(lat)
        val next = math.Pi / 2.0 - 2.0 * math.atan(
          tp * math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0))
        if (math.abs(next - lat) < 1e-14) i = 15 else i += 1
        lat = next
      }
      (lat, lon0 + (east - fe) / (a * kEff))
    }
  }

  /** WRF polar stereographic (map_proj = 2) on the model sphere. */
  def wrfPs(truelat1: Double, standLon: Double): Ps =
    Ps(6370000.0, 0.0, math.toRadians(truelat1), math.toRadians(standLon),
      0.0, 0.0)

  /** WRF Mercator (map_proj = 3) on the model sphere. */
  def wrfMercator(truelat1: Double, standLon: Double): Merc =
    Merc(6370000.0, 0.0, 1.0, math.toRadians(truelat1),
      math.toRadians(standLon), 0.0, 0.0)

  /** EPSG:3413 — WGS 84 / NSIDC Sea Ice Polar Stereographic North
    * (SP 70°N, CM 45°W); EPSG:3976 — the Antarctic twin (SP 70°S,
    * CM 0°); EPSG:3032 — WGS 84 / Australian Antarctic Polar
    * Stereographic (SP 71°S, CM 70°E, FE/FN 6 000 km) — the method's
    * published worked example, pinned in CrsSpec. */
  private def psRegistry(srid: Int): Option[Ps] = {
    val e2W = 2.0 * fW - fW * fW
    srid match {
      case 3413 => Some(Ps(aW, e2W, math.toRadians(70.0),
        math.toRadians(-45.0), 0.0, 0.0))
      case 3976 => Some(Ps(aW, e2W, math.toRadians(-70.0),
        math.toRadians(0.0), 0.0, 0.0))
      case 3032 => Some(Ps(aW, e2W, math.toRadians(-71.0),
        math.toRadians(70.0), 6000000.0, 6000000.0))
      case _ => None
    }
  }

  /** EPSG:3395 — WGS 84 / World Mercator (variant A, k0 = 1). */
  private def mercRegistry(srid: Int): Option[Merc] = srid match {
    case 3395 => Some(Merc(aW, 2.0 * fW - fW * fW, 1.0, 0.0, 0.0, 0.0, 0.0))
    case _ => None
  }

  /** WRF's native projection for a given domain header: LCC on the
    * model's spherical earth (DX/DY are true at the standard
    * parallels TRUELAT1/2; STAND_LON the central meridian; the false
    * origin at the domain center latitude, no false easting). */
  def wrfLcc(truelat1: Double, truelat2: Double, standLon: Double,
      cenLat: Double): Lcc =
    Lcc(6370000.0, 0.0, math.toRadians(truelat1), math.toRadians(truelat2),
      math.toRadians(cenLat), math.toRadians(standLon), 0.0, 0.0)

  /** EPSG:2154 — RGF93 / Lambert-93 (GRS80; the national CRS of
    * France): SP 44°/49°N, origin 46.5°N 3°E, FE 700 km, FN 6600 km. */
  private val lambert93: Lcc = {
    val fG = 1.0 / 298.257222101 // GRS80 flattening
    Lcc(6378137.0, 2.0 * fG - fG * fG,
      math.toRadians(44.0), math.toRadians(49.0),
      math.toRadians(46.5), math.toRadians(3.0), 700000.0, 6600000.0)
  }

  /** UTM zone parameters for EPSG 326zz (north) / 327zz (south). */
  private def utmZone(srid: Int): Option[Tm] = {
    val zone =
      if (srid >= 32601 && srid <= 32660) Some((srid - 32600, false))
      else if (srid >= 32701 && srid <= 32760) Some((srid - 32700, true))
      else None
    zone.map { case (z, south) =>
      Tm(aW, bW, 0.9996, 0.0, math.toRadians(-183.0 + 6.0 * z),
        500000.0, if (south) 10000000.0 else 0.0)
    }
  }

  /** 4326 → srid, in (x=lon, y=lat) axis order. */
  private def from4326(srid: Int): Option[XY] = srid match {
    case 4326 => Some((x, y) => (x, y))
    case 27700 => Some { (lon, lat) => Osgb.wgs84ToOsgb(lat, lon) }
    case 3857 => Some { (lon, lat) =>
      (R * math.toRadians(lon),
        R * math.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0)))
    }
    case 2154 => Some { (lon, lat) =>
      lambert93.forward(math.toRadians(lat), math.toRadians(lon))
    }
    case _ =>
      utmZone(srid).map[XY] { tm => (lon, lat) =>
        tm.forward(math.toRadians(lat), math.toRadians(lon))
      }.orElse(psRegistry(srid).map[XY] { ps => (lon, lat) =>
        ps.forward(math.toRadians(lat), math.toRadians(lon))
      }).orElse(mercRegistry(srid).map[XY] { m => (lon, lat) =>
        m.forward(math.toRadians(lat), math.toRadians(lon))
      })
  }

  /** srid → 4326, in (x=E/lon, y=N/lat) axis order. */
  private def to4326(srid: Int): Option[XY] = srid match {
    case 4326 => Some((x, y) => (x, y))
    case 27700 => Some { (e, n) =>
      val (lat, lon) = Osgb.osgbToWgs84(e, n); (lon, lat)
    }
    case 3857 => Some { (x, y) =>
      (math.toDegrees(x / R),
        math.toDegrees(2.0 * math.atan(math.exp(y / R)) - math.Pi / 2.0))
    }
    case 2154 => Some { (e, n) =>
      val (lat, lon) = lambert93.inverse(e, n)
      (math.toDegrees(lon), math.toDegrees(lat))
    }
    case _ =>
      utmZone(srid).map[XY] { tm => (e, n) =>
        val (lat, lon) = tm.inverse(e, n)
        (math.toDegrees(lon), math.toDegrees(lat))
      }.orElse(psRegistry(srid).map[XY] { ps => (e, n) =>
        val (lat, lon) = ps.inverse(e, n)
        (math.toDegrees(lon), math.toDegrees(lat))
      }).orElse(mercRegistry(srid).map[XY] { m => (e, n) =>
        val (lat, lon) = m.inverse(e, n)
        (math.toDegrees(lon), math.toDegrees(lat))
      })
  }

  /** Coordinate converter between two supported CRSs (through 4326 for
    * projected→projected pairs), or None if either side is unknown. */
  def convert(from: Int, to: Int): Option[XY] =
    if (from == to) Some((x, y) => (x, y))
    else for (i <- to4326(from); f <- from4326(to)) yield { (x, y) =>
      val (lon, lat) = i(x, y)
      f(lon, lat)
    }

  def supported(srid: Int): Boolean = from4326(srid).isDefined
}
