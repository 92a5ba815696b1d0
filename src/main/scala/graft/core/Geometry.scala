package graft.core

import scala.collection.mutable.ArrayBuffer

/** Planar geometry kernels: point-in-polygon and convex-rectangle clipping.
  *
  * Capability analogues of the reference's polygon handling
  * (/root/reference/pyhgtmap/hgt/file.py:277-365). The reference delegates
  * PIP to matplotlib Path.contains_points, whose boundary behavior it calls
  * "unpredictable" (file.py:331-333); we pin a deterministic even-odd
  * ray-cast convention instead and document it: a point exactly on a
  * vertical-right or horizontal-bottom boundary is OUTSIDE, matching strict
  * interior for all the reference's non-degenerate golden masks
  * (tests/hgt/test_file.py:183-284).
  */
object Geometry {

  /** Even-odd ray cast to +x. `poly` interleaved lon,lat; auto-closed. */
  def contains(poly: Array[Double], px: Double, py: Double): Boolean = {
    val n = poly.length / 2
    if (n < 3) return false
    var inside = false
    var j = n - 1
    var i = 0
    while (i < n) {
      val xi = poly(2 * i); val yi = poly(2 * i + 1)
      val xj = poly(2 * j); val yj = poly(2 * j + 1)
      if ((yi > py) != (yj > py)) {
        val xint = xi + (py - yi) / (yj - yi) * (xj - xi)
        if (px < xint) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Signed area (shoelace). Positive = counter-clockwise. */
  def signedArea(poly: Array[Double]): Double = {
    val n = poly.length / 2
    var s = 0.0
    var j = n - 1
    var i = 0
    while (i < n) {
      s += (poly(2 * j) * poly(2 * i + 1)) - (poly(2 * i) * poly(2 * j + 1))
      j = i
      i += 1
    }
    s / 2.0
  }

  /** Sutherland-Hodgman clip of an arbitrary polygon to an axis-aligned
    * rectangle. Degenerate (zero-area) results are dropped, mirroring the
    * reference's discarding of line/point intersections
    * (file.py:296-305, tests/hgt/test_file.py:301-364). */
  def clipToRect(
      poly: Array[Double],
      minX: Double, minY: Double, maxX: Double, maxY: Double,
      areaEps: Double = 1e-12): Option[Array[Double]] = {
    var cur = poly
    // four half-planes: x>=minX, x<=maxX, y>=minY, y<=maxY
    var side = 0
    while (side < 4 && cur.length >= 6) {
      val out = new ArrayBuffer[Double](cur.length + 8)
      val n = cur.length / 2
      @inline def inside(x: Double, y: Double): Boolean = side match {
        case 0 => x >= minX
        case 1 => x <= maxX
        case 2 => y >= minY
        case _ => y <= maxY
      }
      @inline def intersect(x1: Double, y1: Double, x2: Double, y2: Double): (Double, Double) =
        side match {
          case 0 => (minX, y1 + (minX - x1) / (x2 - x1) * (y2 - y1))
          case 1 => (maxX, y1 + (maxX - x1) / (x2 - x1) * (y2 - y1))
          case 2 => (x1 + (minY - y1) / (y2 - y1) * (x2 - x1), minY)
          case _ => (x1 + (maxY - y1) / (y2 - y1) * (x2 - x1), maxY)
        }
      var j = n - 1
      var i = 0
      while (i < n) {
        val x1 = cur(2 * j); val y1 = cur(2 * j + 1)
        val x2 = cur(2 * i); val y2 = cur(2 * i + 1)
        val in1 = inside(x1, y1); val in2 = inside(x2, y2)
        if (in2) {
          if (!in1) { val (xi, yi) = intersect(x1, y1, x2, y2); out += xi; out += yi }
          out += x2; out += y2
        } else if (in1) {
          val (xi, yi) = intersect(x1, y1, x2, y2); out += xi; out += yi
        }
        j = i
        i += 1
      }
      cur = out.toArray
      side += 1
    }
    cur = cleanDegenerate(cur)
    if (cur.length < 6 || math.abs(signedArea(cur)) <= areaEps) None else Some(cur)
  }

  /** Remove duplicate and collinear vertices (including zero-area fold-back
    * spikes Sutherland-Hodgman emits along clip boundaries for non-convex
    * subjects) — shapely's intersection result has none. */
  private[core] def cleanDegenerate(poly: Array[Double]): Array[Double] = {
    var pts = poly.grouped(2).map(a => (a(0), a(1))).toVector
    var changed = true
    while (changed && pts.length >= 3) {
      changed = false
      val n = pts.length
      val keep = Vector.newBuilder[(Double, Double)]
      var i = 0
      while (i < n) {
        val p = pts((i + n - 1) % n)
        val v = pts(i)
        val q = pts((i + 1) % n)
        val cross = (v._1 - p._1) * (q._2 - p._2) - (v._2 - p._2) * (q._1 - p._1)
        val dup = v == p
        if (dup || cross == 0.0) changed = true
        else keep += v
        i += 1
      }
      pts = keep.result()
    }
    pts.flatMap(p => Seq(p._1, p._2)).toArray
  }

  sealed trait MaskResult
  case object AllInside extends MaskResult
  case object AllOutside extends MaskResult
  final case class Mixed(mask: Array[Boolean]) extends MaskResult // true = outside

  /** Grid mask vs a polygon list: true = point NOT covered by any polygon.
    * Mirrors polygon_mask (file.py:310-365): polygons are clipped to the
    * expanded grid bbox first; empty intersection -> AllOutside. */
  def polygonMask(
      xData: Array[Double],
      yData: Array[Double],
      polygons: Seq[Array[Double]],
      bboxExpand: Double = 0.1): MaskResult = {
    val minX = xData.min - bboxExpand
    val maxX = xData.max + bboxExpand
    val minY = yData.min - bboxExpand
    val maxY = yData.max + bboxExpand
    val clipped = polygons.flatMap(p => clipToRect(p, minX, minY, maxX, maxY))
    if (clipped.isEmpty) return AllOutside
    val mask = new Array[Boolean](xData.length * yData.length)
    var anyIn = false
    var anyOut = false
    var r = 0
    while (r < yData.length) {
      var c = 0
      while (c < xData.length) {
        val in = clipped.exists(p => contains(p, xData(c), yData(r)))
        mask(r * xData.length + c) = !in
        if (in) anyIn = true else anyOut = true
        c += 1
      }
      r += 1
    }
    if (!anyIn) AllOutside
    else if (!anyOut) AllInside
    else Mixed(mask)
  }
}
