package graft.core

import org.scalatest.funsuite.AnyFunSuite
import MarchingSquares.{GridView, Scratch}

class MarchingSquaresSpec extends AnyFunSuite {

  private def grid(rows: Int, cols: Int, vals: Float*): Grid = {
    require(vals.length == rows * cols)
    Grid(rows, cols, vals.toArray, null)
  }
  private def axes(g: Grid): (Array[Double], Array[Double]) =
    (Array.tabulate(g.cols)(_.toDouble), Array.tabulate(g.rows)(_.toDouble))

  private def trace(g: Grid, level: Double): Seq[Array[Double]] = {
    val (xs, ys) = axes(g)
    MarchingSquares.trace(GridView.full(g), xs, ys, level, cornerMask = true, new Scratch).toSeq
  }

  test("single peak produces one closed loop") {
    val g = grid(3, 3,
      0, 0, 0,
      0, 10, 0,
      0, 0, 0)
    val paths = trace(g, 5.0)
    assert(paths.size == 1)
    val p = paths.head
    val n = p.length / 2
    assert(p(0) == p(2 * (n - 1)) && p(1) == p(2 * (n - 1) + 1)) // closed
    assert(n == 5) // 4 crossings + repeated first
    // crossing points at 0.5 interpolation around the center
    val pts = (0 until n - 1).map(i => (p(2 * i), p(2 * i + 1))).toSet
    assert(pts == Set((0.5, 1.0), (1.0, 0.5), (1.5, 1.0), (1.0, 1.5)))
  }

  test("open contour crossing the grid hits the boundary twice") {
    val g = grid(2, 3,
      0, 10, 20,
      0, 10, 20)
    val paths = trace(g, 5.0)
    assert(paths.size == 1)
    val p = paths.head
    assert(p.length / 2 == 2)
    val pts = (0 until 2).map(i => (p(2 * i), p(2 * i + 1))).toSet
    assert(pts == Set((0.5, 0.0), (0.5, 1.0)))
  }

  test("level exactly on grid values: above is strict >") {
    val g = grid(2, 2,
      5, 5,
      5, 5)
    assert(trace(g, 5.0).isEmpty)
  }

  test("saddle disambiguated by midpoint mean") {
    // corners above on one diagonal; zmid = (10+10+0+0)/4 = 5
    val g = grid(2, 2,
      10, 0,
      0, 10)
    // level 4: zmid=5 > 4 -> mid above -> above regions connected: 2 paths
    val lo = trace(g, 4.0)
    assert(lo.size == 2)
    // level 6: zmid=5 <= 6 -> mid below -> above corners isolated: 2 paths
    val hi = trace(g, 6.0)
    assert(hi.size == 2)
    // crossing sets must differ in pairing: compare path point sets
    def key(ps: Seq[Array[Double]]) =
      ps.map(p => p.grouped(2).map(a => (a(0), a(1))).toSet).toSet
    assert(key(lo) != key(hi))
  }

  test("masked quad splits a contour into two open paths") {
    val g0 = grid(3, 5,
      0, 0, 0, 0, 0,
      10, 10, 10, 10, 10,
      0, 0, 0, 0, 0)
    // no mask: two horizontal open contours (north and south of the ridge)
    assert(trace(g0, 5.0).size == 2)
    // mask the center point: with corner_mask, paths are cut around it
    val mask = new Array[Boolean](15)
    mask(7) = true // row 1, col 2
    val g1 = Grid(3, 5, g0.values, mask)
    val (xs, ys) = axes(g1)
    val paths = MarchingSquares.trace(GridView.full(g1), xs, ys, 5.0, cornerMask = true, new Scratch)
    // each of the two contours is interrupted by the masked region
    assert(paths.size == 4)
    paths.foreach { p =>
      val n = p.length / 2
      assert(n >= 2)
      assert(!(p(0) == p(2 * (n - 1)) && p(1) == p(2 * (n - 1) + 1)))
    }
  }

  test("fully masked grid yields nothing") {
    val mask = Array.fill(4)(true)
    val g = Grid(2, 2, Array(0f, 10f, 0f, 10f), mask)
    val (xs, ys) = axes(g)
    assert(MarchingSquares.trace(GridView.full(g), xs, ys, 5.0, cornerMask = true, new Scratch).isEmpty)
  }

  test("interpolation positions are linear") {
    val g = grid(2, 2,
      0, 100,
      0, 100)
    val paths = trace(g, 25.0)
    assert(paths.size == 1)
    val pts = paths.head.grouped(2).map(a => (a(0), a(1))).toSet
    assert(pts == Set((0.25, 0.0), (0.25, 1.0)))
  }
}
