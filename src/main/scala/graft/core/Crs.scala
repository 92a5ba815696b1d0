package graft.core

/** CRS transforms to/from WGS84 (reference F10: hgt/file.py:132-166
  * get_transform, applied per traced path in hgt/contour.py:133-134).
  *
  * The reference delegates to osgeo/proj; here the supported sources are
  * EPSG:4326 (identity), EPSG:3857 (spherical web-Mercator, exact closed
  * form) and the UTM zones EPSG:326xx/327xx (ellipsoidal transverse
  * Mercator via the published 6th-order Krüger series — the formulation
  * GeographicLib/proj use, accurate to nanometers inside a zone; public
  * formulas, independent implementation). UTM matters because
  * lidar-derived national DEMs commonly ship UTM-projected GeoTIFFs.
  * Other codes fail loudly rather than silently mis-projecting.
  */
object Crs {

  val EarthRadius = 6378137.0

  // ------------------------------------------------------------- UTM ---
  // WGS84 ellipsoid + UTM frame constants (all public).
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2.0 - F)
  private val Ecc = math.sqrt(E2)
  private val N3 = F / (2.0 - F) // third flattening n
  private val K0 = 0.9996
  private val FalseEasting = 500000.0
  private val FalseNorthingSouth = 10000000.0
  /** Rectifying radius A = a/(1+n)·(1 + n²/4 + n⁴/64 + n⁶/256). */
  private val RectA = {
    val n2 = N3 * N3
    EarthRadius / (1.0 + N3) * (1.0 + n2 / 4.0 + n2 * n2 / 64.0 + n2 * n2 * n2 / 256.0)
  }
  // Krüger forward coefficients α1..α6 (Karney 2011, eq. 35 series)
  private val Alpha: Array[Double] = {
    val n = N3; val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
    Array(
      n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288 + 7891 * n6 / 37800,
      13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630 - 1983433 * n6 / 1935360,
      61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
      49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
      34729 * n5 / 80640 - 3418889 * n6 / 1995840,
      212378941 * n6 / 319334400)
  }
  // Krüger inverse coefficients β1..β6
  private val Beta: Array[Double] = {
    val n = N3; val n2 = n * n; val n3 = n2 * n; val n4 = n3 * n; val n5 = n4 * n; val n6 = n5 * n
    Array(
      n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512 + 96199 * n6 / 604800,
      n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
      17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
      4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
      4583 * n5 / 161280 - 108847 * n6 / 3991680,
      20648693 * n6 / 638668800)
  }

  /** Central meridian of UTM zone 1..60, degrees. */
  def utmCentralMeridian(zone: Int): Double = -183.0 + 6.0 * zone

  /** (lon, lat) degrees -> (easting, northing) meters in UTM `zone`
    * (1..60), `north` hemisphere flag. */
  def wgs84ToUtm(lon: Double, lat: Double, zone: Int, north: Boolean): (Double, Double) = {
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon - utmCentralMeridian(zone))
    // conformal latitude via tau' = tau·sqrt(1+sigma²) − sigma·sqrt(1+tau²)
    val tau = math.tan(phi)
    val sigma = math.sinh(Ecc * atanh(Ecc * tau / math.hypot(1.0, tau)))
    val tauP = tau * math.hypot(1.0, sigma) - sigma * math.hypot(1.0, tau)
    val xiP = math.atan2(tauP, math.cos(lam))
    val etaP = asinh(math.sin(lam) / math.hypot(tauP, math.cos(lam)))
    var xi = xiP
    var eta = etaP
    var j = 1
    while (j <= 6) {
      xi += Alpha(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
      eta += Alpha(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
      j += 1
    }
    val e = FalseEasting + K0 * RectA * eta
    val nn = (if (north) 0.0 else FalseNorthingSouth) + K0 * RectA * xi
    (e, nn)
  }

  /** (easting, northing) meters in UTM `zone`/`north` -> (lon, lat) degrees. */
  def utmToWgs84(easting: Double, northing: Double, zone: Int, north: Boolean): (Double, Double) = {
    val xi0 = (northing - (if (north) 0.0 else FalseNorthingSouth)) / (K0 * RectA)
    val eta0 = (easting - FalseEasting) / (K0 * RectA)
    var xiP = xi0
    var etaP = eta0
    var j = 1
    while (j <= 6) {
      xiP -= Beta(j - 1) * math.sin(2.0 * j * xi0) * math.cosh(2.0 * j * eta0)
      etaP -= Beta(j - 1) * math.cos(2.0 * j * xi0) * math.sinh(2.0 * j * eta0)
      j += 1
    }
    val sinhEta = math.sinh(etaP)
    val tauP = math.sin(xiP) / math.hypot(sinhEta, math.cos(xiP))
    // invert the conformal-latitude map by Newton iteration on tau
    // (Karney's scheme: 2-3 iterations reach double precision)
    var tau = tauP / (1.0 - E2) // good first guess (spherical would be tauP)
    var i = 0
    var delta = 1.0
    while (i < 8 && math.abs(delta) > 1e-16) {
      val sigma = math.sinh(Ecc * atanh(Ecc * tau / math.hypot(1.0, tau)))
      val fTau = tau * math.hypot(1.0, sigma) - sigma * math.hypot(1.0, tau) - tauP
      val dTau = (math.sqrt((1.0 + sigma * sigma) * (1.0 + tau * tau)) - sigma * tau) *
        (1.0 - E2) * math.hypot(1.0, tau) / (1.0 + (1.0 - E2) * tau * tau)
      delta = fTau / dTau
      tau -= delta
      i += 1
    }
    val phi = math.atan(tau)
    val lam = math.atan2(sinhEta, math.cos(xiP))
    (utmCentralMeridian(zone) + math.toDegrees(lam), math.toDegrees(phi))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
  private def asinh(x: Double): Double = math.log(x + math.hypot(1.0, x))

  // ------------------------------------------------- Lambert-93 (LCC) ---
  // EPSG:2154 — the French national grid (RGF93 / Lambert conformal conic,
  // 2 standard parallels), the CRS IGN's RGE ALTI lidar DEMs ship in.
  // Ellipsoidal LCC-2SP closed forms per Snyder, "Map Projections — A
  // Working Manual", pp. 107-109 (public). GRS80 ellipsoid.
  private object Lcc93 {
    val A = 6378137.0
    val F = 1.0 / 298.257222101 // GRS80
    val E2 = F * (2.0 - F)
    val E = math.sqrt(E2)
    val Lat0 = math.toRadians(46.5)
    val Lon0 = math.toRadians(3.0)
    val Lat1 = math.toRadians(44.0)
    val Lat2 = math.toRadians(49.0)
    val FE = 700000.0
    val FN = 6600000.0
    def m(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1.0 - E2 * s * s)
    }
    def t(phi: Double): Double = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4.0 - phi / 2.0) /
        math.pow((1.0 - E * s) / (1.0 + E * s), E / 2.0)
    }
    val N = (math.log(m(Lat1)) - math.log(m(Lat2))) / (math.log(t(Lat1)) - math.log(t(Lat2)))
    val Fc = m(Lat1) / (N * math.pow(t(Lat1), N))
    val Rho0 = A * Fc * math.pow(t(Lat0), N)
  }

  /** (lon, lat) degrees -> (easting, northing) meters in EPSG:2154. */
  def wgs84ToLambert93(lon: Double, lat: Double): (Double, Double) = {
    import Lcc93._
    val rho = A * Fc * math.pow(t(math.toRadians(lat)), N)
    val gamma = N * (math.toRadians(lon) - Lon0)
    (FE + rho * math.sin(gamma), FN + Rho0 - rho * math.cos(gamma))
  }

  /** (easting, northing) meters in EPSG:2154 -> (lon, lat) degrees. */
  def lambert93ToWgs84(x: Double, y: Double): (Double, Double) = {
    import Lcc93._
    val dx = x - FE
    val dy = Rho0 - (y - FN)
    val rho = math.signum(N) * math.hypot(dx, dy)
    val tP = math.pow(rho / (A * Fc), 1.0 / N)
    val theta = math.atan2(dx, dy)
    val lon = theta / N + Lon0
    // fixed-point iteration for phi (Snyder eq. 7-9; converges in ~4 steps)
    var phi = math.Pi / 2.0 - 2.0 * math.atan(tP)
    var i = 0
    var prev = Double.NaN
    while (i < 10 && phi != prev) {
      prev = phi
      val s = math.sin(phi)
      phi = math.Pi / 2.0 - 2.0 * math.atan(
        tP * math.pow((1.0 - E * s) / (1.0 + E * s), E / 2.0))
      i += 1
    }
    (math.toDegrees(lon), math.toDegrees(phi))
  }

  /** (x, y) in EPSG:3857 meters -> (lon, lat) degrees. */
  def mercatorToWgs84(x: Double, y: Double): (Double, Double) = {
    val lon = math.toDegrees(x / EarthRadius)
    val lat = math.toDegrees(2.0 * math.atan(math.exp(y / EarthRadius)) - math.Pi / 2.0)
    (lon, lat)
  }

  /** (lon, lat) degrees -> (x, y) EPSG:3857 meters. */
  def wgs84ToMercator(lon: Double, lat: Double): (Double, Double) = {
    val x = EarthRadius * math.toRadians(lon)
    val y = EarthRadius * math.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0))
    (x, y)
  }

  /** None = identity (already WGS84), as the reference's get_transform
    * returns None for matching authorities. */
  def toWgs84(epsg: Int): Option[(Double, Double) => (Double, Double)] = epsg match {
    case 4326 => None
    case 3857 => Some(mercatorToWgs84)
    case z if z >= 32601 && z <= 32660 =>
      Some((x, y) => utmToWgs84(x, y, z - 32600, north = true))
    case z if z >= 32701 && z <= 32760 =>
      Some((x, y) => utmToWgs84(x, y, z - 32700, north = false))
    // RGF93 (Lambert-93's datum) is coincident with WGS84 at cm level —
    // the same null-datum treatment pyproj applies at this accuracy
    case 2154 => Some(lambert93ToWgs84)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported source CRS EPSG:$other (supported: 4326, 3857, 326xx/327xx UTM, 2154 Lambert-93)")
  }

  /** Reverse transform (WGS84 -> source CRS), the reference's
    * get_transform(reverse=True). None = identity. */
  def fromWgs84(epsg: Int): Option[(Double, Double) => (Double, Double)] = epsg match {
    case 4326 => None
    case 3857 => Some(wgs84ToMercator)
    case z if z >= 32601 && z <= 32660 =>
      Some((lon, lat) => wgs84ToUtm(lon, lat, z - 32600, north = true))
    case z if z >= 32701 && z <= 32760 =>
      Some((lon, lat) => wgs84ToUtm(lon, lat, z - 32700, north = false))
    case 2154 => Some(wgs84ToLambert93)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported source CRS EPSG:$other (supported: 4326, 3857, 326xx/327xx UTM, 2154 Lambert-93)")
  }

  /** True when lon depends only on x and lat only on y under toWgs84 —
    * the property that lets a projected grid keep per-axis WGS84 arrays
    * (RasterPipeline.wgs84Axes) and the row-major polygon-mask
    * factorization. Holds for 4326/3857 (cylindrical, equator-aligned),
    * NOT for transverse Mercator (meridian convergence mixes axes). */
  def axisSeparable(epsg: Int): Boolean = epsg == 4326 || epsg == 3857

  /** Python math.isclose default semantics (rel_tol 1e-9). */
  def isClose(a: Double, b: Double, relTol: Double = 1e-9, absTol: Double = 0.0): Boolean =
    math.abs(a - b) <= math.max(relTol * math.max(math.abs(a), math.abs(b)), absTol)

  /** Transform a bbox corner-wise, requiring the result to stay an
    * axis-aligned rectangle in WGS84 (reference ensure_aligned_coordinates
    * + transform_lon_lats, hgt/__init__.py:20-68). */
  def transformBBox(b: BBox, f: (Double, Double) => (Double, Double)): BBox = {
    val lowLeft = f(b.minLon, b.minLat)
    val highLeft = f(b.minLon, b.maxLat)
    val highRight = f(b.maxLon, b.maxLat)
    val lowRight = f(b.maxLon, b.minLat)
    require(
      isClose(lowLeft._2, lowRight._2) && isClose(lowLeft._1, highLeft._1) &&
        isClose(highLeft._2, highRight._2) && isClose(highRight._1, lowRight._1),
      "Tile doesn't map to an aligned rectangle in WGS84 coordinates")
    val lons = Seq(lowLeft._1, highLeft._1, highRight._1, lowRight._1)
    val lats = Seq(lowLeft._2, highLeft._2, highRight._2, lowRight._2)
    BBox(lons.min, lats.min, lons.max, lats.max)
  }

  /** Corner-wise bbox transform WITHOUT the aligned-rectangle requirement:
    * the envelope (min/max over the four transformed corners). For
    * axis-separable CRSs (4326/3857) this equals transformBBox's result;
    * for transverse Mercator — where meridian convergence tilts the
    * rectangle and the strict form (the reference's refusal semantics)
    * would reject the tile — it returns the smallest aligned superset,
    * which is exactly what output naming/binning metadata needs. */
  def envelopeBBox(b: BBox, f: (Double, Double) => (Double, Double)): BBox = {
    val cs = Seq(
      f(b.minLon, b.minLat), f(b.minLon, b.maxLat),
      f(b.maxLon, b.maxLat), f(b.maxLon, b.minLat))
    BBox(cs.map(_._1).min, cs.map(_._2).min, cs.map(_._1).max, cs.map(_._2).max)
  }

  /** Transform a packed [x0,y0,x1,y1,...] path in place semantics-free
    * (returns a new array). */
  def transformPath(path: Array[Double], f: (Double, Double) => (Double, Double)): Array[Double] = {
    val out = new Array[Double](path.length)
    var i = 0
    while (i < path.length) {
      val (lon, lat) = f(path(i), path(i + 1))
      out(i) = lon
      out(i + 1) = lat
      i += 2
    }
    out
  }
}
