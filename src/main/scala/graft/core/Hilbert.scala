package graft.core

/** 2-D Hilbert curve codec (the classic rot/swap formulation, public
  * algorithm): maps grid (x, y) at order `level` to a curve position and
  * back. Consecutive curve positions are ALWAYS grid neighbours, which is
  * the locality property S2/H3-style indexes buy: range-partitioning by
  * curve position keeps each partition spatially compact, so a spatial
  * join's shuffle sends neighbouring points to the same reducer.
  *
  * Used as the engine's S2-style alternative to the row-major Cells codec
  * (Cells stays the oracle-parity form — its arithmetic is expressible in
  * plain SQL; the Hilbert index is the cluster-locality form). */
object Hilbert {

  /** (x, y) -> curve position d, for a 2^level x 2^level grid. */
  def xy2d(level: Int, x0: Long, y0: Long): Long = {
    var rx = 0L
    var ry = 0L
    var d = 0L
    var x = x0
    var y = y0
    var s = 1L << (level - 1)
    while (s > 0) {
      rx = if ((x & s) > 0) 1L else 0L
      ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate quadrant
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Curve position d -> (x, y). */
  def d2xy(level: Int, d: Long): (Long, Long) = {
    var rx = 0L
    var ry = 0L
    var x = 0L
    var y = 0L
    var t = d
    var s = 1L
    while (s < (1L << level)) {
      rx = 1L & (t / 2)
      ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** lon/lat -> Hilbert cell id on the equirectangular 2^level x 2^level
    * grid (lon spans x, lat spans y; poles clamp). */
  def cellId(lon: Double, lat: Double, level: Int): Long = {
    val n = 1L << level
    val x = math.min(n - 1, math.max(0L, math.floor((lon + 180.0) / 360.0 * n).toLong))
    val y = math.min(n - 1, math.max(0L, math.floor((lat + 90.0) / 180.0 * n).toLong))
    xy2d(level, x, y)
  }

  /** Cell bbox of a curve position. */
  def cellBBox(d: Long, level: Int): BBox = {
    val n = (1L << level).toDouble
    val (x, y) = d2xy(level, d)
    val minLon = x / n * 360.0 - 180.0
    val minLat = y / n * 180.0 - 90.0
    BBox(minLon, minLat, minLon + 360.0 / n, minLat + 180.0 / n)
  }
}
