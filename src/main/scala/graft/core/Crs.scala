package graft.core

/** CRS transforms to/from WGS84 (reference F10: hgt/file.py:132-166
  * get_transform, applied per traced path in hgt/contour.py:133-134).
  *
  * The reference delegates to osgeo/proj; here the supported sources are
  * the ones its own fixtures exercise: EPSG:4326 (identity) and EPSG:3857
  * (spherical web-Mercator, exact closed form — public formulas). Other
  * codes fail loudly rather than silently mis-projecting.
  */
object Crs {

  val EarthRadius = 6378137.0

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
    case other =>
      throw new IllegalArgumentException(
        s"unsupported source CRS EPSG:$other (supported: 4326, 3857)")
  }

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
