package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Invariant suite for the S2-scheme cell codec. No reference library is
  * available in this sandbox, so correctness is pinned by the format's
  * structural invariants (which together determine the codec up to the
  * published constants): center round-trip on every face, parent = bit
  * mask, sibling disjointness, Hilbert adjacency, unsigned range algebra,
  * and token round-trip.
  */
class S2Spec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def randPoint(): (Double, Double) =
    (rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85)

  test("center round-trip: a cell's center maps back to the same cell, all levels") {
    for (_ <- 1 to 500) {
      val (lon, lat) = randPoint()
      for (lvl <- Seq(0, 1, 4, 11, 20, 30)) {
        val c = S2.cellId(lon, lat, lvl)
        val (clon, clat) = S2.center(c)
        assert(S2.cellId(clon, clat, lvl) == c, s"($lon,$lat) level $lvl")
        assert(S2.level(c) == lvl)
      }
    }
  }

  test("all six faces are reachable and disjoint at level 0") {
    val probes = Seq(
      (0.0, 0.0) -> 0, (90.0, 0.0) -> 1, (0.0, 89.9) -> 2,
      (179.9, 0.0) -> 3, (-90.0, 0.0) -> 4, (0.0, -89.9) -> 5)
    val faces = probes.map { case ((lon, lat), expect) =>
      val c = S2.cellId(lon, lat, 0)
      val f = (c >>> 61).toInt
      assert(f == expect, s"($lon,$lat) expected face $expect got $f")
      f
    }
    assert(faces.distinct.size == 6)
  }

  test("parent is a pure bit operation and contains every descendant") {
    for (_ <- 1 to 300) {
      val (lon, lat) = randPoint()
      val leaf = S2.cellId(lon, lat, 30)
      for (lvl <- 0 to 29) {
        val p = S2.parent(leaf, lvl)
        // parent-by-mask == recompute-at-coarser-level: the id really is
        // a trie (prefix) encoding of the position
        assert(p == S2.cellId(lon, lat, lvl), s"level $lvl")
        assert(S2.contains(p, leaf))
        assert(!S2.contains(leaf, p))
      }
    }
  }

  test("sibling ranges partition the parent range exactly") {
    val (lon, lat) = (6.5, 43.5)
    val p = S2.cellId(lon, lat, 8)
    val kids = {
      // enumerate the 4 children by id arithmetic: each child occupies a
      // 2*childLsb-wide id block inside the parent's range, centred on its id
      val childLsb = 1L << (2 * (S2.MaxLevel - 9))
      (0 until 4).map(k => S2.rangeMin(p) + (childLsb - 1) + k * 2 * childLsb)
    }
    kids.foreach { c =>
      assert(S2.level(c) == 9)
      assert(S2.parent(c, 8) == p)
      assert(S2.contains(p, c))
    }
    assert(S2.rangeMin(kids.head) == S2.rangeMin(p))
    assert(S2.rangeMax(kids.last) == S2.rangeMax(p))
    kids.sliding(2).foreach { case Seq(a, b) =>
      // leaf ids are odd (step 2): consecutive sibling ranges tile exactly
      assert(S2.rangeMax(a) + 2 == S2.rangeMin(b))
    }
  }

  test("Hilbert adjacency: consecutive leaf cells on a face are grid neighbours") {
    val base = S2.cellId(6.5, 43.5, 30)
    val (f0, i0, j0) = S2.toFaceIJ(base)
    var prev = (i0, j0)
    for (step <- 1 to 4096) {
      val id = base + 2L * step // next leaf on the curve
      val (f, i, j) = S2.toFaceIJ(id)
      if (f == f0) { // adjacency holds within a face
        val d = math.abs(i - prev._1) + math.abs(j - prev._2)
        assert(d == 1, s"step $step: manhattan $d")
        prev = (i, j)
      }
    }
  }

  test("unsigned range algebra on sign-bit faces (4, 5)") {
    val c = S2.cellId(-90.0, -10.0, 12) // face 4 -> id has the top bit set
    assert((c >>> 61).toInt == 4)
    assert(c < 0) // as a signed long
    assert(S2.contains(S2.parent(c, 5), c))
    val leaf = S2.cellId(-90.0, -10.0, 30)
    assert(S2.contains(c, leaf))
  }

  test("token round-trip") {
    for (_ <- 1 to 200) {
      val (lon, lat) = randPoint()
      val c = S2.cellId(lon, lat, rnd.nextInt(31))
      assert(S2.fromToken(S2.token(c)) == c)
    }
    assert(S2.token(S2.cellId(0, 0, 0)) == "1") // face 0 cell = 1L<<60
  }

  test("known geometry: equator/prime-meridian leaf sits at the face-0 center ij") {
    // lat=0, lon=0 -> xyz (1,0,0) -> face 0, u=v=0 -> s=t=0.5 exactly ->
    // i=j=2^29: the one input where every projection step is exact.
    val c = S2.cellId(0, 0, 30)
    val (f, i, j) = S2.toFaceIJ(c)
    assert(f == 0 && i == (1 << 29) && j == (1 << 29))
  }

  test("coverRect is a superset covering on every face geometry") {
    val rects = Seq(
      (6.0, 43.0, 7.0, 44.0),      // the doc tile (face 0 interior)
      (-1.0, -1.0, 1.0, 1.0),      // around (0,0): u/v crossings
      (40.0, 10.0, 50.0, 20.0),    // straddles the face 0|1 seam at 45 deg
      (170.0, 10.0, 179.9, 20.0),  // approaches the antimeridian from the west
      (-179.9, -20.0, -170.0, -10.0),
      (-180.0, 85.0, 180.0, 90.0), // polar cap: all longitudes
      (10.0, -90.0, 20.0, -85.0))  // south polar wedge
    for ((lo0, la0, lo1, la1) <- rects; level <- Seq(4, 8)) {
      val cover = S2.coverRect(lo0, la0, lo1, la1, level)
      assert(cover.nonEmpty)
      cover.foreach(c => assert(S2.level(c) <= level)) // adaptive: mixed levels
      for (s <- 0 until 400) {
        val lon = lo0 + (lo1 - lo0) * ((s * 2654435761L % 1000L) / 999.0)
        val lat = la0 + (la1 - la0) * ((s * 40503L % 1000L) / 999.0)
        val leaf = S2.cellId(lon, lat, 30)
        assert(cover.exists(S2.contains(_, leaf)),
          s"rect ($lo0,$la0,$lo1,$la1) level $level point ($lon,$lat)")
      }
    }
  }

  test("coverRect stays tight on an interior rect and coarsens its interior") {
    // 1x1 deg at maxLevel 10 (leaf-of-cover cell ~0.09 deg): edge cells
    // subdivide, interior cells emit coarse — far fewer than the ~130
    // uniform level-10 cells the rect spans
    val cover = S2.coverRect(6.0, 43.0, 7.0, 44.0, 10)
    assert(cover.size <= 100, s"cover size ${cover.size}") // ~130 uniform
    assert(cover.exists(c => S2.level(c) < 10), "no interior coarsening")
    // and the ranges are usable pruning handles: disjoint, sorted-mergeable
    val ranges = cover.map(c => (S2.rangeMin(c), S2.rangeMax(c))).sortBy(_._1)
    ranges.sliding(2).foreach { case Seq(a, b) => assert(a._2 < b._1) case _ => }
  }

  test("gate-margin guard: doc-lattice points sit far from level-11 cell walls") {
    // q16's oracle recomputes the trig pipeline in DuckDB; cross-engine
    // sin/cos may differ by ulps. A gate flip would need a point within
    // ~1e-16 of a cell boundary in (s,t); assert the synthetic doc lattice
    // keeps a >=1e-7 margin so the oracle can never disagree.
    val grid = (1 << 11).toDouble
    var minMargin = Double.MaxValue
    for (docId <- 0L until 120000L) {
      val lon = 6.0 + (docId * 2654435761L % 1000000L).toDouble / 1000000.0
      val lat = 43.0 + ((docId * 40503L + 17L) % 1000000L).toDouble / 1000000.0
      val (x, y, z) = S2.xyz(lon, lat)
      val f = S2.face(x, y, z)
      assert(f == 0) // the whole doc tile projects onto face 0
      val (u, v) = S2.faceUv(f, x, y, z)
      for (st <- Seq(S2.stFromUv(u), S2.stFromUv(v))) {
        val scaled = st * grid
        val m = math.abs(scaled - math.rint(scaled))
        if (m < minMargin) minMargin = m
      }
    }
    assert(minMargin > 1e-7, s"min boundary margin $minMargin")
  }
}
