package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's polygon mask / clip goldens
  * (/root/reference/tests/hgt/test_file.py:183-364), except exact-boundary
  * behavior, which the reference itself documents as unpredictable
  * (matplotlib contains_points) — our even-odd convention is pinned here.
  */
class GeometrySpec extends AnyFunSuite {

  private def poly(pts: (Double, Double)*): Array[Double] =
    pts.flatMap(p => Seq(p._1, p._2)).toArray

  private val xs = Array.tabulate(6)(_.toDouble)
  private val ys = Array.tabulate(6)(_.toDouble)

  private def maskOf(r: Geometry.MaskResult): Array[Array[Boolean]] = r match {
    case Geometry.Mixed(m) => Array.tabulate(6, 6)((j, i) => m(j * 6 + i))
    case Geometry.AllInside => Array.fill(6, 6)(false)
    case Geometry.AllOutside => Array.fill(6, 6)(true)
  }

  test("polygon bigger than data: nothing masked") {
    val p = poly((-1, -1), (-1, 6), (6, 6), (6, -1), (-1, -1))
    assert(Geometry.polygonMask(xs, ys, Seq(p)) == Geometry.AllInside)
  }

  test("polygon splitting data (reference golden)") {
    val p = poly((-1, -1), (-1, 6), (2, 6), (5, -1), (-1, -1))
    val m = maskOf(Geometry.polygonMask(xs, ys, Seq(p)))
    val expected = Array(
      Array(false, false, false, false, false, true),
      Array(false, false, false, false, false, true),
      Array(false, false, false, false, true, true),
      Array(false, false, false, false, true, true),
      Array(false, false, false, true, true, true),
      Array(false, false, false, true, true, true))
    assert(m.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
  }

  test("polygon with multiple intersection parts (reference golden)") {
    val p = poly(
      (-1, -1), (-1, 2.5), (2.5, 2.5), (2.5, -1), (4.5, -1), (4.5, 6), (6, 6), (6, -1), (-1, -1))
    val m = maskOf(Geometry.polygonMask(xs, ys, Seq(p)))
    val expected = Array(
      Array(false, false, false, true, true, false),
      Array(false, false, false, true, true, false),
      Array(false, false, false, true, true, false),
      Array(true, true, true, true, true, false),
      Array(true, true, true, true, true, false),
      Array(true, true, true, true, true, false))
    assert(m.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
  }

  test("polygon not intersecting data: all masked") {
    val p = poly((-1, -1), (-1, -2), (6, -2), (6, -1), (-1, -1))
    assert(Geometry.polygonMask(xs, ys, Seq(p)) == Geometry.AllOutside)
  }

  test("clip polygons: real intersection kept, line/point intersections dropped") {
    // reference test_clip_polygons (tests/hgt/test_file.py:301-364)
    val clipMinX = -0.1; val clipMaxX = 1.1
    val clipMinY = 48.900000000009435; val clipMaxY = 50.1
    val p1 = poly( // open polyline in the file; closes implicitly
      (2.3, 51.6), (2.5, 51.3), (2.4, 50.9), (1.3, 50.1), (0.7, 50.1),
      (0.4, 49.9), (-0.5, 50.0), (-0.9, 49.8), (-2.2, 49.7), (-2.9, 49.8))
    val p2 = poly( // no intersection
      (-14.6, 57.6), (-14.6, 57.9), (-13.9, 58.4), (-13.2, 58.3), (-12.8, 57.9),
      (-12.9, 57.1), (-13.4, 56.8), (-14.2, 56.9), (-14.6, 57.3), (-14.6, 57.6))
    val p3 = poly((2, 52), (2, 50.1), (1.1, 50.1), (1.1, 52), (2, 52)) // point only
    val p4 = poly((2, 48), (2, 50), (1.1, 50), (1.1, 48), (2, 48)) // line only

    def clip(p: Array[Double]) = Geometry.clipToRect(p, clipMinX, clipMinY, clipMaxX, clipMaxY)
    assert(clip(p2).isEmpty)
    assert(clip(p3).isEmpty)
    assert(clip(p4).isEmpty)
    val got = clip(p1).get
    // canonicalize: set-compare vertices against the reference's shapely result
    val expected = Set(
      (0.4, 49.9), (-0.1, 49.955555555555556), (-0.1, 50.1), (0.7, 50.1))
    val gotPts = got.grouped(2).map(a => (a(0), a(1))).toSet
    expected.foreach { e =>
      assert(gotPts.exists(g => math.abs(g._1 - e._1) < 1e-9 && math.abs(g._2 - e._2) < 1e-9),
        s"missing $e in $gotPts")
    }
    assert(gotPts.size == expected.size)
  }

  test("cell codec round trip and k-ring") {
    val res = 6 // 1/64 degree cells
    val cell = Cells.cellId(6.5, 43.5, res)
    val b = Cells.cellBBox(cell, res)
    assert(b.minLon <= 6.5 && 6.5 < b.maxLon)
    assert(b.minLat <= 43.5 && 43.5 < b.maxLat)
    val ring = Cells.kRing(cell, res, 1)
    assert(ring.length == 9)
    assert(ring.contains(cell))
    // neighbors differ by one row/col
    val w = Cells.lonWidth(res)
    assert(ring.toSet == (for (dy <- -1 to 1; dx <- -1 to 1)
      yield cell + dy * w + dx).toSet)
  }

  test("cover enumerates bbox cells") {
    val cells = Cells.cover(BBox(6, 43, 7, 44), 0)
    assert(cells.length == 4) // 2x2: floors of 6..7 and 43..44 inclusive
  }
}
