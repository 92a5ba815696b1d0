package graft.core

import scala.collection.mutable.ArrayBuffer
import MarchingSquares.GridView

/** Area truncation + recursive tile chopping driven by a contour-node-count
  * estimator. Faithful to the reference's make_tiles
  * (/root/reference/pyhgtmap/hgt/file.py:561-773): horizontal (latitude)
  * cuts at the row midpoint, the upper chop keeping one overlap row; chops
  * estimated to produce more than maxNodesPerTile nodes are split again;
  * fully-void chops are discarded; southern chop is emitted first.
  */
object Chop {

  /** A rectangular sub-grid selection plus its geographic bbox. */
  final case class Slice(bbox: BBox, rowOff: Int, rows: Int, colOff: Int, cols: Int)

  /** Contour-node-count estimator: sum of |d(z/step)| along both axes, void
    * pairs skipped (reference estim_num_of_nodes, file.py:654-669; division
    * by step happens before differencing, in float32, as in numpy). */
  def estimNumOfNodes(gv: GridView, step: Int): Double = {
    var sum = 0.0
    val stepF = step.toFloat
    var r = 0
    while (r < gv.rows) {
      var c = 0
      while (c < gv.cols) {
        val v = !gv.masked(r, c)
        if (v) {
          val h = (gv.values(gv.base + r * gv.stride + c) / stepF)
          if (c + 1 < gv.cols && !gv.masked(r, c + 1)) {
            val h2 = (gv.values(gv.base + r * gv.stride + c + 1) / stepF)
            sum += math.abs((h2 - h).toDouble)
          }
          if (r + 1 < gv.rows && !gv.masked(r + 1, c)) {
            val h2 = (gv.values(gv.base + (r + 1) * gv.stride + c) / stepF)
            sum += math.abs((h2 - h).toDouble)
          }
        }
        c += 1
      }
      r += 1
    }
    sum
  }

  def elevRange(gv: GridView): (Int, Int) = {
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var r = 0
    while (r < gv.rows) {
      var c = 0
      while (c < gv.cols) {
        if (!gv.masked(r, c)) {
          val z = gv.z(r, c)
          if (z < mn) mn = z
          if (z > mx) mx = z
        }
        c += 1
      }
      r += 1
    }
    (mn.toInt, mx.toInt) // Python int(): truncation toward zero
  }

  private def allVoid(gv: GridView): Boolean = {
    if (gv.mask == null) return false
    var r = 0
    while (r < gv.rows) {
      var c = 0
      while (c < gv.cols) {
        if (!gv.masked(r, c)) return false
        c += 1
      }
      r += 1
    }
    true
  }

  /** Truncate a file grid to an `--area minLon:minLat:maxLon:maxLat` string,
    * returning the snapped bbox and row/col slice (reference truncate_data,
    * file.py:569-645, incl. antimeridian wrap). */
  def truncate(
      area: Option[String],
      fileBbox: BBox,
      rows: Int,
      cols: Int,
      lonInc: Double,
      latInc: Double): Slice = area match {
    case None => Slice(fileBbox, 0, rows, 0, cols)
    case Some(a) =>
      val Array(bMinLon0, bMinLat0, bMaxLon0, bMaxLat0) = a.split(":").map(_.toDouble)
      var bMinLon = bMinLon0; var bMaxLon = bMaxLon0
      var bMinLat = bMinLat0; var bMaxLat = bMaxLat0
      if (bMinLon > bMaxLon) {
        // area crosses W180/E180
        if (fileBbox.minLon < 0 || fileBbox.minLon < bMaxLon) {
          bMinLon = fileBbox.minLon
          if (bMaxLon >= fileBbox.maxLon) bMaxLon = fileBbox.maxLon
        } else {
          bMaxLon = fileBbox.maxLon
          if (bMinLon <= fileBbox.minLon) bMinLon = fileBbox.minLon
        }
      } else {
        if (bMinLon <= fileBbox.minLon) bMinLon = fileBbox.minLon
        if (bMaxLon >= fileBbox.maxLon) bMaxLon = fileBbox.maxLon
      }
      if (bMinLat <= fileBbox.minLat) bMinLat = fileBbox.minLat
      if (bMaxLat >= fileBbox.maxLat) bMaxLat = fileBbox.maxLat
      // grid-index form Δ/inc. The reference (file.py:609-628) divides by
      // the file EXTENT as well — dimensionally a no-op for its 1-degree
      // hgt tiles (extent = 1) but silently wrong for any other extent
      // (projected meters, windowed tiffs), where it truncates nothing /
      // over-truncates; the goldens pin the 1-degree case, where the two
      // forms agree exactly
      val minLonIdx = ((bMinLon - fileBbox.minLon) / lonInc).toInt
      val minLatIdx = -1 * ((bMinLat - fileBbox.minLat) / latInc).toInt
      val maxLonIdx = ((bMaxLon - fileBbox.maxLon) / lonInc).toInt
      val maxLatIdx = -1 * ((bMaxLat - fileBbox.maxLat) / latInc).toInt
      val realMinLon = fileBbox.minLon + minLonIdx * lonInc
      val realMinLat = fileBbox.minLat - minLatIdx * latInc
      val realMaxLon = fileBbox.maxLon + maxLonIdx * lonInc
      val realMaxLat = fileBbox.maxLat - maxLatIdx * latInc
      // python slice [maxLatTrunc : minLatTrunc, minLonTrunc : maxLonTrunc]
      // with 0 -> None on maxLonTrunc / minLatTrunc
      val rowStart = maxLatIdx // >= 0 after sign flip? python: negative of int of negative = >=0
      val rowEnd = if (minLatIdx == 0) rows else rows + minLatIdx
      val colStart = minLonIdx
      val colEnd = if (maxLonIdx == 0) cols else cols + maxLonIdx
      Slice(
        BBox(realMinLon, realMinLat, realMaxLon, realMaxLat),
        rowStart, rowEnd - rowStart, colStart, colEnd - colStart)
  }

  /** Recursive chop of a (possibly truncated) grid slice into tiles whose
    * estimated node count fits maxNodesPerTile (0 = no chopping). Southern
    * (lower) chop first; upper chop keeps one overlap row. */
  def chop(
      grid: Grid,
      start: Slice,
      latInc: Double,
      step: Int,
      maxNodesPerTile: Long): Seq[Slice] = {
    val out = new ArrayBuffer[Slice]()
    def view(s: Slice): GridView =
      new GridView(grid.values, grid.mask, s.rowOff * grid.cols + s.colOff, grid.cols, s.rows, s.cols)
    def rec(s: Slice): Unit = {
      val gv = view(s)
      if (allVoid(gv)) return
      // s.rows <= 2 cannot split further: the upper chop of a 2-row slice
      // is the identical slice (chopLatIndex = 1, +1 overlap row), so
      // recursing would never terminate — emit the minimal tile instead,
      // even when its estimate still exceeds the limit
      if (s.rows > 2 && maxNodesPerTile != 0 && estimNumOfNodes(gv, step) > maxNodesPerTile) {
        val chopLatIndex = (s.rows / 2.0).toInt
        val chopLat = s.bbox.maxLat - chopLatIndex * latInc
        val lower = Slice(
          BBox(s.bbox.minLon, s.bbox.minLat, s.bbox.maxLon, chopLat),
          s.rowOff + chopLatIndex, s.rows - chopLatIndex, s.colOff, s.cols)
        val upper = Slice(
          BBox(s.bbox.minLon, chopLat, s.bbox.maxLon, s.bbox.maxLat),
          s.rowOff, chopLatIndex + 1, s.colOff, s.cols)
        rec(lower)
        rec(upper)
      } else out += s
    }
    rec(start)
    out.toSeq
  }
}
