package graft.core

/** Ramer-Douglas-Peucker path simplification.
  *
  * Matches the semantics of the reference's pybind11-rdp usage
  * (/root/reference/pyhgtmap/hgt/contour.py:14-33 and
  * /root/reference/tests/test_contour.py:14-64): keep a point iff its
  * perpendicular distance to the current chord is strictly greater than
  * epsilon; epsilon = 0 removes duplicates and collinear points.
  * Iterative (explicit stack) to survive long paths.
  */
object Rdp {

  /** coords interleaved lon0,lat0,lon1,lat1,... ; returns simplified coords. */
  def simplify(coords: Array[Double], epsilon: Double): Array[Double] = {
    val n = coords.length / 2
    if (n <= 2) return coords
    val keep = new Array[Boolean](n)
    keep(0) = true
    keep(n - 1) = true
    // stack of (start, end) index pairs
    var stack = List((0, n - 1))
    while (stack.nonEmpty) {
      val (s, e) = stack.head
      stack = stack.tail
      if (e - s > 1) {
        val x1 = coords(2 * s); val y1 = coords(2 * s + 1)
        val x2 = coords(2 * e); val y2 = coords(2 * e + 1)
        val dx = x2 - x1; val dy = y2 - y1
        val len = math.sqrt(dx * dx + dy * dy)
        var maxD = -1.0
        var maxI = -1
        var i = s + 1
        while (i < e) {
          val px = coords(2 * i) - x1; val py = coords(2 * i + 1) - y1
          val d =
            if (len == 0.0) math.sqrt(px * px + py * py)
            else math.abs(dx * py - dy * px) / len
          if (d > maxD) { maxD = d; maxI = i }
          i += 1
        }
        if (maxD > epsilon) {
          keep(maxI) = true
          stack = (s, maxI) :: (maxI, e) :: stack
        }
      }
    }
    var cnt = 0
    var i = 0
    while (i < n) { if (keep(i)) cnt += 1; i += 1 }
    if (cnt == n) return coords
    val out = new Array[Double](cnt * 2)
    var j = 0
    i = 0
    while (i < n) {
      if (keep(i)) { out(2 * j) = coords(2 * i); out(2 * j + 1) = coords(2 * i + 1); j += 1 }
      i += 1
    }
    out
  }
}
