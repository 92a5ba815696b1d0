package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests mirroring the reference's parametrized kernel cases
  * (/root/reference/tests/test_contour.py:14-64, tests/test_latlon.py). */
class KernelSpec extends AnyFunSuite {

  private def path(pts: (Double, Double)*): Array[Double] =
    pts.flatMap(p => Seq(p._1, p._2)).toArray

  test("rdp simplest: nothing to remove even with huge epsilon") {
    val p = path((0, 0), (1, 1))
    assert(Rdp.simplify(p, 10.0).toSeq == p.toSeq)
  }

  test("rdp removes duplicate points at epsilon 0") {
    val p = path((0, 0), (0, 0), (1, 1), (1, 1), (1, 1))
    assert(Rdp.simplify(p, 0.0).toSeq == path((0, 0), (1, 1)).toSeq)
  }

  test("rdp closed path with dupe points") {
    val p = path((0, 0), (0, 0), (1, 1), (1, 1), (1, 1), (1, 0), (1, 0), (0, 0), (0, 0))
    assert(Rdp.simplify(p, 0.0).toSeq == path((0, 0), (1, 1), (1, 0), (0, 0)).toSeq)
  }

  test("rdp straight line collapses to endpoints") {
    val p = path((0, 0), (0.2, 0.2), (0.4, 0.4), (0.7, 0.7), (1, 1))
    assert(Rdp.simplify(p, 0.0).toSeq == path((0, 0), (1, 1)).toSeq)
  }

  test("rdp corner kept, small detail dropped at eps=0.1") {
    val p = path((0, 0), (0.5, 0.5), (1, 1), (1.09, 0.2), (1, 0))
    assert(Rdp.simplify(p, 0.1).toSeq == path((0, 0), (1, 1), (1, 0)).toSeq)
  }

  test("rdp corner with detail above threshold kept") {
    val p = path((0, 0), (0.5, 0.5), (1, 1), (1.1, 0.2), (1, 0))
    assert(Rdp.simplify(p, 0.1).toSeq == path((0, 0), (1, 1), (1.1, 0.2), (1, 0)).toSeq)
  }

  test("way split: below threshold is a single way") {
    val p = path((0, 0), (1, 0), (2, 0))
    val s = WaySplit.split(p, 10)
    assert(s.nbPaths == 1 && s.nbNodes == 3)
  }

  test("way split: adjacent chunks share a boundary node") {
    // 5 points, max 3 per way -> chunks [0,3) start 0 and 2: [0..2],[2..4]
    val p = path((0, 0), (1, 0), (2, 0), (3, 0), (4, 0))
    val s = WaySplit.split(p, 3)
    assert(s.nbPaths == 2)
    assert(s.paths.map(_.length / 2) == Seq(3, 3))
    assert(s.nbNodes == 6) // reference counts shared node twice (distinct ids)
  }

  test("way split: closed loop unique-node accounting") {
    val p = path((1, 1), (1, 2), (2, 2), (2, 1), (1, 1))
    val s = WaySplit.split(p, 0)
    assert(s.nbPaths == 1 && s.nbNodes == 4)
  }

  test("way split: maxNodesPerWay=0 disables splitting") {
    val pts = (0 until 5000).map(i => (i.toDouble, 0.0))
    val s = WaySplit.split(path(pts: _*), 0)
    assert(s.nbPaths == 1 && s.nbNodes == 5000)
  }

  test("contour limit snapping (python modulo semantics)") {
    assert(Levels.contLimit(0, 20) == 0)
    assert(Levels.contLimit(-4, 20) == 0)
    assert(Levels.contLimit(-12, 20) == 0)
    assert(Levels.contLimit(1923, 20) == 1940)
    assert(Levels.contLimit(317, 20) == 320)
    assert(Levels.contLimit(-25, 20) == -20)
  }

  test("elevation classifier") {
    val cls = Levels.elevClassifier(100, 50) _
    assert(cls(0) == "elevation_major")
    assert(cls(50) == "elevation_medium")
    assert(cls(-50) == "elevation_medium")
    assert(cls(20) == "elevation_minor")
  }

  test("hgt filename parse") {
    assert(Hgt.parseHgtFilename("N43E006.hgt") == BBox(6, 43, 7, 44))
    assert(Hgt.parseHgtFilename("/a/b/S09W123.hgt") == BBox(-123, -9, -122, -8))
    assert(Hgt.tileKey(43, 6) == "N43E006")
    assert(Hgt.tileKey(-9, -123) == "S09W123")
  }

  test("alos 5-degree group key (reference sources/alos.py:51)") {
    assert(Hgt.roundToMultiple(43, 5) == 40)
    assert(Hgt.roundToMultiple(-43, 5) == -45) // Python floor division
    assert(Hgt.roundToMultiple(45, 5) == 45)
    assert(Hgt.alosGroupKey(43, 6) == "N040E005")
    assert(Hgt.alosGroupKey(-9, -123) == "S010W125")
    assert(Hgt.alosGroupKey(0, 0) == "N000E000")
  }

  test("hgt decode: big-endian int16, void masking") {
    val bytes = Array[Byte](0, 10, 0x7f, -1, -128, 0, -1, -4) // 10, 32767, -32768, -4
    val g = Hgt.decode(bytes)
    assert(g.rows == 2 && g.cols == 2)
    assert(g.values.toSeq == Seq(10f, 32767f, -32768f, -4f))
    assert(g.mask.toSeq == Seq(false, false, true, false))
  }
}
