package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the kernels the reference lacks them for
  * (SURVEY.md §5 port strategy): RDP, way split, varint codecs, cells.
  * Raw ScalaCheck generators driven with fixed seeds (the scalatestplus
  * bridge isn't in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  /** Deterministic forAll: 100 seeded samples per property. */
  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    (1 to 100).foreach { i =>
      ga.apply(params, Seed(i.toLong)).foreach(a => f(a))
    }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 100).foreach { i =>
      for {
        a <- ga.apply(params, Seed(i.toLong))
        b <- gb.apply(params, Seed(i.toLong + 10000))
      } f(a, b)
    }

  private val coordGen = Gen.chooseNum(-180.0, 180.0)
  private val pathGen: Gen[Array[Double]] = for {
    n <- Gen.chooseNum(2, 60)
    pts <- Gen.listOfN(n * 2, coordGen)
  } yield pts.toArray

  test("rdp: output is a subsequence keeping endpoints; epsilon=0 idempotent") {
    forAll(pathGen, Gen.chooseNum(0.0, 1.0)) { (path, eps) =>
      val out = Rdp.simplify(path, eps)
      val n = path.length / 2
      val m = out.length / 2
      assert(m >= 2 || n < 2)
      // endpoints preserved
      assert(out(0) == path(0) && out(1) == path(1))
      assert(out(2 * m - 2) == path(2 * n - 2) && out(2 * m - 1) == path(2 * n - 1))
      // subsequence of input points
      val inPts = path.grouped(2).map(a => (a(0), a(1))).toList
      val outPts = out.grouped(2).map(a => (a(0), a(1))).toList
      var i = 0
      outPts.foreach { p =>
        i = inPts.indexOf(p, i)
        assert(i >= 0, s"$p not found in order")
      }
      // idempotence
      val again = Rdp.simplify(out, eps)
      assert(again.toSeq == out.toSeq)
    }
  }

  test("way split: chunks reassemble to the path; node accounting consistent") {
    forAll(pathGen, Gen.chooseNum(0, 10)) { (path, maxRaw) =>
      val max = if (maxRaw < 2) 0 else maxRaw // 0 = no split (reference semantics)
      val s = WaySplit.split(path, max)
      val n = path.length / 2
      if (n >= 2) {
        assert(s.nbPaths == s.paths.size)
        // adjacent chunks share a boundary point; concatenation minus the
        // duplicated boundaries equals the original
        val rebuilt = s.paths.zipWithIndex.flatMap { case (p, i) =>
          val pts = p.grouped(2).map(a => (a(0), a(1))).toSeq
          if (i == 0) pts else pts.drop(1)
        }
        val orig = path.grouped(2).map(a => (a(0), a(1))).toSeq
        assert(rebuilt == orig)
        // unique-node accounting: sum(len) - closedChunks
        val closed = s.paths.count { p =>
          val m = p.length / 2
          m >= 2 && p(0) == p(2 * m - 2) && p(1) == p(2 * m - 1)
        }
        assert(s.nbNodes == s.paths.map(_.length / 2).sum - closed)
        if (max > 0) assert(s.paths.forall(_.length / 2 <= max))
      }
    }
  }

  test("varint: unsigned and signed round-trip any long") {
    forAll(Gen.chooseNum(Long.MinValue / 4, Long.MaxValue / 4)) { v =>
      assert(graft.sinks.Varint.readSigned(graft.sinks.Varint.signed(v), 0)._1 == v)
      if (v >= 0)
        assert(graft.sinks.Varint.readUnsigned(graft.sinks.Varint.unsigned(v), 0)._1 == v)
    }
  }

  test("cells: cellId consistent with cellBBox containment, kRing symmetric") {
    val res = 6
    forAll(Gen.chooseNum(-179.9, 179.9), Gen.chooseNum(-89.9, 89.9)) { (lon, lat) =>
      val c = Cells.cellId(lon, lat, res)
      val b = Cells.cellBBox(c, res)
      assert(b.minLon <= lon && lon < b.maxLon + 1e-9)
      assert(b.minLat <= lat && lat < b.maxLat + 1e-9)
      // neighbour relation is symmetric
      val ring = Cells.kRing(c, res, 1)
      ring.foreach { n =>
        assert(Cells.kRing(n, res, 1).contains(c) || math.abs(lat) > 89.0)
      }
    }
  }

  test("marching squares: total crossings equal emitted nodes on random grids") {
    val gridGen = for {
      rows <- Gen.chooseNum(3, 12)
      cols <- Gen.chooseNum(3, 12)
      vals <- Gen.listOfN(rows * cols, Gen.chooseNum(0, 100))
    } yield (rows, cols, vals.map(_.toFloat).toArray)
    // half-integer levels: with integer grid values no crossing sits exactly
    // on a grid point, so distinct crossings have distinct coordinates and
    // the first==last "closed" test (the reference's own convention,
    // output/__init__.py:130) cannot be confused by coincident endpoints
    forAll(gridGen, Gen.chooseNum(1, 99)) { case ((rows, cols, vals), levelInt) =>
      val level = levelInt + 0.5
      val g = Grid(rows, cols, vals, null)
      val xs = Array.tabulate(cols)(_.toDouble)
      val ys = Array.tabulate(rows)(_.toDouble)
      val paths = MarchingSquares.trace(
        MarchingSquares.GridView.full(g), xs, ys, level,
        cornerMask = true, new MarchingSquares.Scratch)
      // count crossings independently: edges whose endpoint classes differ
      var crossings = 0
      for (r <- 0 until rows; c <- 0 until cols - 1)
        if ((g(r, c) > level) != (g(r, c + 1) > level)) crossings += 1
      for (r <- 0 until rows - 1; c <- 0 until cols)
        if ((g(r, c) > level) != (g(r + 1, c) > level)) crossings += 1
      val emitted = paths.map { p =>
        val n = p.length / 2
        val closed = n >= 2 && p(0) == p(2 * n - 2) && p(1) == p(2 * n - 1)
        if (closed) n - 1 else n
      }.sum
      assert(emitted == crossings, s"grid ${rows}x$cols level $level")
    }
  }
}
