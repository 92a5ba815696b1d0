package graft.core

/** S2-scheme hierarchical sphere cells (the public s2geometry cell-id
  * design, s2geometry.io/devguide/s2cell_hierarchy): the unit sphere is
  * projected onto 6 cube faces, each face carries a quadratic-corrected
  * (s,t) grid subdivided 30 levels deep along a Hilbert curve, and a cell
  * is a 64-bit id `face(3b) | curve position(2·level b) | 1 | 0...` whose
  * bit layout makes parent/child containment a trailing-bit mask and
  * spatial locality a 1-D range — the index shape the north rule's
  * "batch-encoded into H3/S2 cells" asks for.
  *
  * This is an independent implementation of the published cell scheme
  * (projection formulas and Hilbert lookup tables are public constants of
  * the format, like a file-format magic): no code from s2geometry is used.
  * The lat/lon→cell math is kept expression-friendly so the Catalyst
  * wrapper (functions/S2CellId.scala) stays inside whole-stage codegen,
  * and every step has an exact ANSI-SQL twin for the DuckDB oracle
  * (engine/Queries q16).
  */
object S2 {

  val MaxLevel = 30
  private val MaxSize = 1 << MaxLevel // ij coordinates per face axis

  // Hilbert sub-cell orderings per orientation (public format constants):
  // IJtoPos(orientation)(i<<1|j) = curve position of the sub-cell, and
  // entering sub-cell `pos` XORs the orientation with PosToOrientation(pos)
  // (bit 0 = swap i/j, bit 1 = invert both).
  private[core] val IJtoPos: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), Array(0, 3, 1, 2), Array(2, 3, 1, 0), Array(2, 1, 3, 0))

  /** Read-only view of IJtoPos for oracle-SQL generation (engine/Queries). */
  def ijToPosTable(orientation: Int): IndexedSeq[Int] = IJtoPos(orientation).toIndexedSeq
  private[core] val PosToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), Array(0, 2, 3, 1), Array(3, 2, 0, 1), Array(3, 1, 0, 2))
  private[core] val PosToOrientation: Array[Int] = Array(1, 0, 0, 3)

  /** Degrees -> unit-sphere xyz. Radian conversion is `deg / 180.0 * Pi`
    * IN THAT ORDER — the SQL twin must round identically. */
  def xyz(lonDeg: Double, latDeg: Double): (Double, Double, Double) = {
    val lon = lonDeg / 180.0 * math.Pi
    val lat = latDeg / 180.0 * math.Pi
    val cosLat = math.cos(lat)
    (cosLat * math.cos(lon), cosLat * math.sin(lon), math.sin(lat))
  }

  /** Cube face 0..5 of an xyz direction: the axis with the largest |coord|
    * (x-then-y-then-z tie order, matching the published comparison chain),
    * +3 when that coordinate is negative. */
  def face(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val axis = if (ax > ay) { if (ax > az) 0 else 2 } else { if (ay > az) 1 else 2 }
    val coord = axis match { case 0 => x; case 1 => y; case _ => z }
    if (coord < 0) axis + 3 else axis
  }

  /** Gnomonic (u,v) of xyz on its face (the published per-face ratios). */
  def faceUv(f: Int, x: Double, y: Double, z: Double): (Double, Double) = f match {
    case 0 => (y / x, z / x)
    case 1 => (-x / y, z / y)
    case 2 => (-x / z, -y / z)
    case 3 => (z / x, y / x)
    case 4 => (z / y, -x / y)
    case _ => (-y / z, -x / z)
  }

  /** Center xyz of face/(u,v) (inverse of faceUv, unnormalized). */
  def faceUvToXyz(f: Int, u: Double, v: Double): (Double, Double, Double) = f match {
    case 0 => (1, u, v)
    case 1 => (-u, 1, v)
    case 2 => (-u, -v, 1)
    case 3 => (-1, -v, -u)
    case 4 => (v, -1, -u)
    case _ => (v, u, -1)
  }

  /** Quadratic uv->st correction (the area-equalizing projection the
    * format specifies): s = sqrt(1+3u)/2 for u>=0, 1-sqrt(1-3u)/2 else. */
  def stFromUv(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)

  def uvFromSt(s: Double): Double =
    if (s >= 0.5) (4 * s * s - 1) / 3 else (1 - 4 * (1 - s) * (1 - s)) / 3

  /** st in [0,1) -> leaf ij in [0, 2^30). */
  def ijFromSt(s: Double): Int =
    math.max(0, math.min(MaxSize - 1, math.floor(s * MaxSize).toInt))

  /** Cell id at `level` from a face + leaf ij: walk `level` Hilbert steps
    * from the MSB of (i,j), then place the sentinel bit. */
  def fromFaceIJ(f: Int, i: Int, j: Int, level: Int): Long = {
    require(level >= 0 && level <= MaxLevel, s"bad level $level")
    var pos = 0L
    var orientation = f & 1 // odd faces start swapped (format constant)
    var k = MaxLevel - 1
    while (k >= MaxLevel - level) {
      val ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
      val p = IJtoPos(orientation)(ij)
      pos = (pos << 2) | p
      orientation ^= PosToOrientation(p)
      k -= 1
    }
    val shift = 2 * (MaxLevel - level)
    (f.toLong << 61) | (pos << (shift + 1)) | (1L << shift)
  }

  /** lat/lon (degrees) -> cell id at `level`. */
  def cellId(lonDeg: Double, latDeg: Double, level: Int): Long = {
    val (x, y, z) = xyz(lonDeg, latDeg)
    val f = face(x, y, z)
    val (u, v) = faceUv(f, x, y, z)
    fromFaceIJ(f, ijFromSt(stFromUv(u)), ijFromSt(stFromUv(v)), level)
  }

  /** Level of a cell id (position of the sentinel bit). */
  def level(id: Long): Int = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  private def lsb(id: Long): Long = id & -id

  /** Ancestor of `id` at a coarser `level`. */
  def parent(id: Long, level: Int): Long = {
    val newLsb = 1L << (2 * (MaxLevel - level))
    (id & -newLsb) | newLsb
  }

  /** Smallest/largest leaf id contained in this cell: containment tests
    * and range-partition pruning are unsigned BETWEENs on these. */
  def rangeMin(id: Long): Long = id - (lsb(id) - 1)
  def rangeMax(id: Long): Long = id + (lsb(id) - 1)

  /** Unsigned containment (faces 4/5 have the sign bit set). */
  def contains(parent: Long, child: Long): Boolean =
    java.lang.Long.compareUnsigned(rangeMin(parent), child) <= 0 &&
      java.lang.Long.compareUnsigned(child, rangeMax(parent)) <= 0

  /** (face, leaf i, leaf j) of the cell's minimum corner + final curve
    * orientation — inverse of fromFaceIJ's walk. */
  def toFaceIJ(id: Long): (Int, Int, Int) = {
    val f = (id >>> 61).toInt
    val lvl = level(id)
    var orientation = f & 1
    var i = 0; var j = 0
    var k = MaxLevel - 1
    var step = 0
    while (step < lvl) {
      val p = ((id >>> (2 * (MaxLevel - 1 - step) + 1)) & 3L).toInt
      val ij = PosToIJ(orientation)(p)
      i |= (ij >> 1) << k
      j |= (ij & 1) << k
      orientation ^= PosToOrientation(p)
      k -= 1
      step += 1
    }
    (f, i, j)
  }

  /** Cell-center lat/lon in degrees. */
  def center(id: Long): (Double, Double) = {
    val (f, i, j) = toFaceIJ(id)
    val lvl = level(id)
    val half = if (lvl == MaxLevel) 0.5 else (1 << (MaxLevel - lvl - 1)).toDouble
    val s = (i + half) / MaxSize
    val t = (j + half) / MaxSize
    val (x, y, z) = faceUvToXyz(f, uvFromSt(s), uvFromSt(t))
    val lat = math.atan2(z, math.sqrt(x * x + y * y))
    val lon = math.atan2(y, x)
    (lon * 180.0 / math.Pi, lat * 180.0 / math.Pi)
  }

  /** Compact hex token (trailing zeros stripped; "X" for 0). */
  def token(id: Long): String = {
    if (id == 0) return "X"
    val hex = f"$id%016x"
    hex.substring(0, hex.lastIndexWhere(_ != '0') + 1)
  }

  def fromToken(tok: String): Long =
    if (tok == "X") 0L
    else java.lang.Long.parseUnsignedLong(tok.padTo(16, '0'), 16)

  // ------------------------------------------------------------ covering --

  /** Exact lat/lon bounding box of a uv-rect on face `f`, as
    * (latMin, latMax, lonLo, lonHi, fullLon). Extremes of lat/lon over an
    * axis-aligned uv rect are attained at its corners or at the u=0 / v=0
    * crossings (lat is monotone in each uv quadrant; lon is monotone along
    * every edge), so evaluating those candidate points gives the exact
    * bound; a polar-face rect containing the face centre reaches the pole
    * and spans all longitudes. `lonLo..lonHi` is a circular interval
    * (lonLo > lonHi means it wraps the antimeridian). */
  private[core] def uvRectBound(
      f: Int, u0: Double, u1: Double, v0: Double, v1: Double): (Double, Double, Double, Double, Boolean) = {
    val pts = scala.collection.mutable.ArrayBuffer(
      (u0, v0), (u0, v1), (u1, v0), (u1, v1))
    val uCross = u0 < 0 && u1 > 0
    val vCross = v0 < 0 && v1 > 0
    if (uCross) { pts += ((0.0, v0)); pts += ((0.0, v1)) }
    if (vCross) { pts += ((u0, 0.0)); pts += ((u1, 0.0)) }
    val ll = pts.map { case (u, v) =>
      val (x, y, z) = faceUvToXyz(f, u, v)
      (math.atan2(z, math.hypot(x, y)) * 180.0 / math.Pi,
        math.atan2(y, x) * 180.0 / math.Pi)
    }
    var latMin = ll.map(_._1).min
    var latMax = ll.map(_._1).max
    // polar-face rect containing the face centre: includes the pole
    val atPole = uCross && vCross && (f == 2 || f == 5)
    if (atPole) { if (f == 2) latMax = 90.0 else latMin = -90.0 }
    val fullLon = atPole
    if (fullLon) (latMin, latMax, -180.0, 180.0, true)
    else {
      // circular hull of the corner longitudes: the rect's (x,y) shadow is
      // convex and excludes the origin, so its angular span is < 180 deg —
      // map angles into a half-circle around the first and take min/max
      val lons = ll.map(_._2)
      val ref = lons.head
      val rel = lons.map { l =>
        var d = l - ref
        while (d > 180) d -= 360
        while (d < -180) d += 360
        d
      }
      var lo = ref + rel.min
      var hi = ref + rel.max
      if (lo < -180) lo += 360
      if (hi > 180) hi -= 360
      (latMin, latMax, lo, hi, false)
    }
  }

  private def lonIntervalsOverlap(aLo: Double, aHi: Double, bLo: Double, bHi: Double): Boolean = {
    // circular intervals (lo > hi wraps)
    def contains(lo: Double, hi: Double, x: Double) =
      if (lo <= hi) x >= lo && x <= hi else x >= lo || x <= hi
    contains(aLo, aHi, bLo) || contains(aLo, aHi, bHi) ||
      contains(bLo, bHi, aLo) || contains(bLo, bHi, aHi)
  }

  /** Adaptive cell covering of a lat/lon rectangle (the published
    * RegionCoverer idea): descend the cell tree, emitting a cell early
    * when its exact bound lies FULLY inside the rect (interior cells stay
    * coarse — one wide pruning range instead of 4^k fine ones) and
    * otherwise subdividing down to `maxLevel` along the rect's edges.
    * Superset-guaranteed: every point of the rect lies in some returned
    * cell; the covering may spill over the edges, callers re-filter
    * exactly. Works on any face mix, including the poles and rects
    * touching the antimeridian seam from the west side. The returned ids
    * (mixed levels) are the range-pruning handles: a table clustered by
    * leaf cell id serves the rect from `cell BETWEEN rangeMin(c) AND
    * rangeMax(c)` per cover cell. */
  def coverRect(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double, maxLevel: Int): Seq[Long] = {
    require(maxLevel >= 0 && maxLevel <= MaxLevel)
    val eps = 1e-9 // fp guard: pad the query so boundary points stay covered
    val qLat0 = minLat - eps; val qLat1 = maxLat + eps
    val qLon0 = minLon - eps; val qLon1 = maxLon + eps
    val fullLonQuery = maxLon - minLon >= 360.0 - 2e-9
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    def descend(f: Int, lvl: Int, i: Int, j: Int): Unit = {
      val size = 1 << (MaxLevel - lvl)
      val u0 = uvFromSt(i.toDouble / MaxSize)
      val u1 = uvFromSt((i + size).toDouble / MaxSize)
      val v0 = uvFromSt(j.toDouble / MaxSize)
      val v1 = uvFromSt((j + size).toDouble / MaxSize)
      val (latMin, latMax, lonLo, lonHi, _) = uvRectBound(f, u0, u1, v0, v1)
      if (latMax + eps < qLat0 || latMin - eps > qLat1) return
      if (!lonIntervalsOverlap(lonLo - eps, lonHi + eps, qLon0, qLon1)) return
      // early emit: the cell's (outward-padded) bound inside the rect
      // implies the cell itself is — keep it coarse
      val latInside = qLat0 <= latMin - eps && latMax + eps <= qLat1
      val lonInside = fullLonQuery ||
        (lonLo <= lonHi && qLon0 <= lonLo - eps && lonHi + eps <= qLon1)
      if (lvl == maxLevel || (latInside && lonInside)) {
        out += fromFaceIJ(f, i, j, lvl); return
      }
      val h = size >> 1
      descend(f, lvl + 1, i, j); descend(f, lvl + 1, i + h, j)
      descend(f, lvl + 1, i, j + h); descend(f, lvl + 1, i + h, j + h)
    }
    (0 to 5).foreach(f => descend(f, 0, 0, 0))
    out.toSeq
  }
}
