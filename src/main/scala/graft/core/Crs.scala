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
