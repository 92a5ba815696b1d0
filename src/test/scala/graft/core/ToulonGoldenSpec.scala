package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import MarchingSquares.GridView

/** Golden parity with the reference's own SRTM fixture tests:
  * /root/reference/tests/hgt/test_tile.py:66-127 (contour counts, exact
  * 1920 m loop, node/way totals) and tests/hgt/test_file.py:74-111
  * (chop shapes/bboxes/elevation ranges).
  */
class ToulonGoldenSpec extends AnyFunSuite {

  private val fixture = "/root/reference/tests/data/N43E006.hgt"
  private lazy val available = Files.exists(Paths.get(fixture))
  private lazy val grid: Grid = Hgt.decode(Files.readAllBytes(Paths.get(fixture)))
  private val bbox = BBox(6, 43, 7, 44)
  private def lonInc = 1.0 / (grid.cols - 1)
  private def latInc = 1.0 / (grid.rows - 1)

  // reference get_contours() defaults: step 20, no way split, no RDP
  private val goldenCfg = JobConfig(
    contourStepSize = 20, maxNodesPerWay = 0, rdpEpsilon = None, maxNodesPerTile = 0)

  private lazy val tileContours: ContourGen.TileContours =
    ContourGen.tileContours(GridView.full(grid), bbox, lonInc, latInc, goldenCfg)

  test("fixture decodes to a 1201x1201 grid") {
    assume(available)
    assert(grid.rows == 1201 && grid.cols == 1201)
  }

  test("golden: levels are range(0, 1940, 20)") {
    assume(available)
    assert(tileContours.levels == (0 until 1940 by 20))
  }

  test("golden: 145 contour paths at 20m, one with 5 points") {
    assume(available)
    val at20 = tileContours.contours.find(_.elevation == 20).get.paths
    assert(at20.size == 145)
    assert(at20.exists(_.length / 2 == 5))
  }

  test("golden: single 7-point closed loop at 1920m with exact coordinates") {
    assume(available)
    val at1920 = tileContours.contours.find(_.elevation == 1920).get.paths
    assert(at1920.size == 1)
    val p = at1920.head
    assert(p.length / 2 == 7)
    val expected = Set(
      (6.63732143, 43.89583333),
      (6.6375, 43.89591954),
      (6.63833333, 43.89583333),
      (6.63777778, 43.895),
      (6.6375, 43.8948913),
      (6.63714286, 43.895))
    val got = p.grouped(2).map(a => (a(0), a(1))).toSet
    assert(got.size == 6) // closed: first repeated
    expected.foreach { e =>
      assert(
        got.exists(g => math.abs(g._1 - e._1) < 1e-7 && math.abs(g._2 - e._2) < 1e-7),
        s"missing point $e in $got")
    }
  }

  test("golden: totals nb_nodes=1264395 nb_ways=10798") {
    assume(available)
    assert(tileContours.nbWays == 10798L)
    assert(tileContours.nbNodes == 1264395L)
  }

  test("golden: chop at maxNodesPerTile=500000 yields the 4 reference tiles") {
    assume(available)
    val slices = Chop.chop(
      grid, Chop.Slice(bbox, 0, grid.rows, 0, grid.cols), latInc, 20, 500000L)
    assert(slices.size == 4)
    val shapes = slices.map(s => (s.rows, s.cols))
    assert(shapes == Seq((601, 1201), (301, 1201), (151, 1201), (151, 1201)))
    val stats = slices.map { s =>
      val gv = new GridView(grid.values, grid.mask, s.rowOff * grid.cols + s.colOff, grid.cols, s.rows, s.cols)
      val (mn, mx) = Chop.elevRange(gv)
      (f"${s.bbox.minLon}%.2f ${s.bbox.minLat}%.2f ${s.bbox.maxLon}%.2f ${s.bbox.maxLat}%.2f", mn, mx)
    }
    assert(stats == Seq(
      ("6.00 43.00 7.00 43.50", -4, 770),
      ("6.00 43.50 7.00 43.75", -12, 1703),
      ("6.00 43.75 7.00 43.88", 327, 1908),
      ("6.00 43.88 7.00 44.00", 317, 1923)))
  }

  test("golden: chop with area 6.2:43.1:7.1:43.8 yields 2 tiles of 421x961") {
    assume(available)
    val t = Chop.truncate(Some("6.2:43.1:7.1:43.8"), bbox, grid.rows, grid.cols, lonInc, latInc)
    val slices = Chop.chop(grid, t, latInc, 20, 500000L)
    assert(slices.size == 2)
    assert(slices.map(s => (s.rows, s.cols)) == Seq((421, 961), (421, 961)))
    val stats = slices.map { s =>
      val gv = new GridView(grid.values, grid.mask, s.rowOff * grid.cols + s.colOff, grid.cols, s.rows, s.cols)
      val (mn, mx) = Chop.elevRange(gv)
      (f"${s.bbox.minLon}%.2f ${s.bbox.minLat}%.2f ${s.bbox.maxLon}%.2f ${s.bbox.maxLat}%.2f", mn, mx)
    }
    assert(stats == Seq(
      ("6.20 43.10 7.00 43.45", -4, 770),
      ("6.20 43.45 7.00 43.80", -12, 1703)))
  }

  test("truncate is extent-independent: snapped outward to grid lines at any scale") {
    // The reference's index formula divides by the file EXTENT as well as
    // the increment — a no-op only because its hgt tiles are 1 degree.
    // Pin the corrected delta/inc form on a 0.5-degree window and on a
    // projected-meter grid, via the snap property (smallest grid-aligned
    // superset of the clipped area) rather than re-deriving the indices.
    def check(fb: BBox, rows: Int, cols: Int, area: String): Unit = {
      val lonInc = (fb.maxLon - fb.minLon) / (cols - 1)
      val latInc = (fb.maxLat - fb.minLat) / (rows - 1)
      val Array(ra0, rb0, ra1, rb1) = area.split(":").map(_.toDouble)
      // truncate clamps the request to the file bbox before snapping
      val a0 = math.max(ra0, fb.minLon); val a1 = math.min(ra1, fb.maxLon)
      val b0 = math.max(rb0, fb.minLat); val b1 = math.min(rb1, fb.maxLat)
      val s = Chop.truncate(Some(area), fb, rows, cols, lonInc, latInc)
      val eps = 1e-9
      // outward snap, within one cell
      assert(s.bbox.minLon <= a0 + eps && s.bbox.minLon > a0 - lonInc - eps, s"$s")
      assert(s.bbox.maxLon >= a1 - eps && s.bbox.maxLon < a1 + lonInc + eps, s"$s")
      assert(s.bbox.minLat <= b0 + eps && s.bbox.minLat > b0 - latInc - eps, s"$s")
      assert(s.bbox.maxLat >= b1 - eps && s.bbox.maxLat < b1 + latInc + eps, s"$s")
      // grid-aligned: bbox corners sit on file grid lines
      def aligned(v: Double, origin: Double, inc: Double) = {
        val k = (v - origin) / inc
        math.abs(k - math.rint(k)) < 1e-6
      }
      assert(aligned(s.bbox.minLon, fb.minLon, lonInc) && aligned(s.bbox.maxLon, fb.minLon, lonInc))
      assert(aligned(s.bbox.minLat, fb.minLat, latInc) && aligned(s.bbox.maxLat, fb.minLat, latInc))
      // slice shape consistent with the snapped bbox
      assert(s.cols == math.rint((s.bbox.maxLon - s.bbox.minLon) / lonInc).toInt + 1, s"$s")
      assert(s.rows == math.rint((s.bbox.maxLat - s.bbox.minLat) / latInc).toInt + 1, s"$s")
      // slice offsets map back to the snapped corner coordinates
      assert(math.abs(fb.minLon + s.colOff * lonInc - s.bbox.minLon) < eps)
      assert(math.abs(fb.maxLat - s.rowOff * latInc - s.bbox.maxLat) < eps)
    }
    // half-degree windowed tiff (extent 0.5: the old formula would halve the deltas)
    check(BBox(6.25, 43.25, 6.75, 43.75), 101, 101, "6.301:43.302:6.603:43.604")
    // projected-meter grid (extent 1e5: the old formula would truncate nothing)
    check(BBox(300000.0, 4800000.0, 400000.0, 4900000.0), 101, 101,
      "312345:4811111:377777:4888888")
    // 1-degree case still agrees with the golden above by construction
    check(BBox(6.0, 43.0, 7.0, 44.0), 1201, 1201, "6.2:43.1:7.1:43.8")
  }
}
