package graft.core

import scala.collection.mutable.ArrayBuffer

/** Iso-line extraction (marching squares with linear edge interpolation,
  * masked-cell and single-masked-corner "triangle" handling).
  *
  * From-scratch implementation of the capability the reference delegates to
  * the contourpy C++ extension (/root/reference/pyhgtmap/hgt/contour.py:143-168
  * with corner_mask=True, chunk_size=0, LineType.SeparateCode). Conventions
  * chosen to reproduce the reference's golden path/node counts on its SRTM
  * fixture (/root/reference/tests/hgt/test_tile.py:66-127):
  *   - a grid point is "above" iff z > level (strict);
  *   - saddle quads disambiguated by zmid = mean of the 4 corners vs level;
  *   - closed paths repeat their first point as last.
  */
object MarchingSquares {

  /** Zero-copy rectangular view into a row-major grid. */
  final class GridView(
      val values: Array[Float],
      val mask: Array[Boolean],
      val base: Int,
      val stride: Int,
      val rows: Int,
      val cols: Int) {
    @inline def z(r: Int, c: Int): Double = values(base + r * stride + c).toDouble
    @inline def masked(r: Int, c: Int): Boolean =
      mask != null && mask(base + r * stride + c)
  }

  object GridView {
    def full(g: Grid): GridView = new GridView(g.values, g.mask, 0, g.cols, g.rows, g.cols)
    def slice(g: Grid, rowOff: Int, rows: Int): GridView =
      new GridView(g.values, g.mask, rowOff * g.cols, g.cols, rows, g.cols)
  }

  /** Reusable per-thread buffers (visited stamps survive across levels
    * without clearing). */
  final class Scratch {
    var visited: Array[Int] = new Array[Int](0)
    var stamp: Int = 0
    var aboveA: Array[Boolean] = new Array[Boolean](0)
    var aboveB: Array[Boolean] = new Array[Boolean](0)
    def ensure(n: Int): Unit =
      if (visited.length < n) { visited = new Array[Int](n); stamp = 0 }
    def ensureRows(cols: Int): Unit =
      if (aboveA.length < cols) { aboveA = new Array[Boolean](cols); aboveB = new Array[Boolean](cols) }
  }

  /** Per-point-row min/max over valid points — computed once per tile and
    * shared across all levels (row skipping). */
  def rowStats(gv: GridView): (Array[Double], Array[Double]) = {
    val rowMin = new Array[Double](gv.rows)
    val rowMax = new Array[Double](gv.rows)
    var r = 0
    while (r < gv.rows) {
      var mn = Double.PositiveInfinity
      var mx = Double.NegativeInfinity
      var c = 0
      while (c < gv.cols) {
        if (!gv.masked(r, c)) {
          val z = gv.z(r, c)
          if (z < mn) mn = z
          if (z > mx) mx = z
        }
        c += 1
      }
      rowMin(r) = mn; rowMax(r) = mx
      r += 1
    }
    (rowMin, rowMax)
  }

  /** Growable primitive double buffer (ArrayBuffer[Double] would box every
    * coordinate — at tens of millions of nodes the allocation rate becomes
    * the scaling bottleneck). */
  final class DoubleBuf(initial: Int = 32) {
    private var arr = new Array[Double](initial)
    private var len = 0
    @inline def +=(v: Double): Unit = {
      if (len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(len) = v
      len += 1
    }
    def toArray: Array[Double] = java.util.Arrays.copyOf(arr, len)
  }

  // Edge kind bases are computed per grid inside trace().

  /** Trace all iso-lines of `level`. Returns interleaved-coordinate paths;
    * closed paths have first point repeated as last (exact copy). */
  def trace(
      gv: GridView,
      xData: Array[Double],
      yData: Array[Double],
      level: Double,
      cornerMask: Boolean,
      scratch: Scratch,
      stats: (Array[Double], Array[Double]) = null): ArrayBuffer[Array[Double]] = {
    val rows = gv.rows
    val cols = gv.cols
    val out = new ArrayBuffer[Array[Double]]()
    if (rows < 2 || cols < 2) return out

    val HB = rows * (cols - 1) // H edge ids [0, HB)
    val VB = (rows - 1) * cols // V edge ids [HB, HB+VB)
    val DB = (rows - 1) * (cols - 1)
    val nEdges = HB + VB + DB
    scratch.ensure(nEdges)
    scratch.stamp += 1
    val visited = scratch.visited
    val stamp = scratch.stamp

    @inline def hId(r: Int, c: Int): Int = r * (cols - 1) + c
    @inline def vId(r: Int, c: Int): Int = HB + r * cols + c
    @inline def dId(r: Int, c: Int): Int = HB + VB + r * (cols - 1) + c

    @inline def above(r: Int, c: Int): Boolean = !gv.masked(r, c) && gv.z(r, c) > level

    // number of masked corners of quad (r, c); 0 <= r < rows-1, 0 <= c < cols-1
    @inline def maskCount(r: Int, c: Int): Int = {
      var n = 0
      if (gv.masked(r, c)) n += 1
      if (gv.masked(r, c + 1)) n += 1
      if (gv.masked(r + 1, c)) n += 1
      if (gv.masked(r + 1, c + 1)) n += 1
      n
    }

    @inline def quadValid(r: Int, c: Int): Boolean = {
      if (r < 0 || c < 0 || r >= rows - 1 || c >= cols - 1) false
      else {
        val n = maskCount(r, c)
        n == 0 || (cornerMask && n == 1)
      }
    }

    /** masked-corner index for a 1-masked quad: 0=TL 1=TR 2=BL 3=BR, -1 if none */
    @inline def maskedCorner(r: Int, c: Int): Int =
      if (gv.masked(r, c)) 0
      else if (gv.masked(r, c + 1)) 1
      else if (gv.masked(r + 1, c)) 2
      else if (gv.masked(r + 1, c + 1)) 3
      else -1

    /** Exit edge when entering quad (r,c) through edge `enter`. */
    def exitEdge(r: Int, c: Int, enter: Int): Int = {
      val mc = if (gv.mask == null) -1 else maskedCorner(r, c)
      val aTL = above(r, c); val aTR = above(r, c + 1)
      val aBL = above(r + 1, c); val aBR = above(r + 1, c + 1)
      if (mc == -1) {
        val n = hId(r, c); val s = hId(r + 1, c); val w = vId(r, c); val e = vId(r, c + 1)
        val cn = aTL != aTR; val cs = aBL != aBR; val cw = aTL != aBL; val ce = aTR != aBR
        val cnt = (if (cn) 1 else 0) + (if (cs) 1 else 0) + (if (cw) 1 else 0) + (if (ce) 1 else 0)
        if (cnt == 2) {
          if (cn && enter != n) n
          else if (cs && enter != s) s
          else if (cw && enter != w) w
          else if (ce && enter != e) e
          else -1
        } else if (cnt == 4) {
          // saddle: pair by mid-point class (contourpy convention)
          val zmid = 0.25 * (gv.z(r, c) + gv.z(r, c + 1) + gv.z(r + 1, c) + gv.z(r + 1, c + 1))
          val midAbove = zmid > level
          // pairs (N,E),(W,S) iff aTL == midAbove else (N,W),(S,E)
          if (aTL == midAbove) {
            if (enter == n) e else if (enter == e) n
            else if (enter == w) s else if (enter == s) w
            else -1
          } else {
            if (enter == n) w else if (enter == w) n
            else if (enter == s) e else if (enter == e) s
            else -1
          }
        } else -1
      } else {
        // triangle: two quad edges + the diagonal opposite the masked corner
        val d = dId(r, c)
        mc match {
          case 0 => // masked TL: edges E, S, D(TR-BL)
            val e = vId(r, c + 1); val s = hId(r + 1, c)
            val ce = aTR != aBR; val cs = aBL != aBR; val cd = aTR != aBL
            if (ce && enter != e) e else if (cs && enter != s) s else if (cd && enter != d) d else -1
          case 1 => // masked TR: edges W, S, D(TL-BR)
            val w = vId(r, c); val s = hId(r + 1, c)
            val cw = aTL != aBL; val cs = aBL != aBR; val cd = aTL != aBR
            if (cw && enter != w) w else if (cs && enter != s) s else if (cd && enter != d) d else -1
          case 2 => // masked BL: edges N, E, D(TL-BR)
            val n = hId(r, c); val e = vId(r, c + 1)
            val cn = aTL != aTR; val ce = aTR != aBR; val cd = aTL != aBR
            if (cn && enter != n) n else if (ce && enter != e) e else if (cd && enter != d) d else -1
          case _ => // masked BR: edges N, W, D(TR-BL)
            val n = hId(r, c); val w = vId(r, c)
            val cn = aTL != aTR; val cw = aTL != aBL; val cd = aTR != aBL
            if (cn && enter != n) n else if (cw && enter != w) w else if (cd && enter != d) d else -1
        }
      }
    }

    /** Append the interpolated crossing point of `edge` to buf. */
    def appendPoint(edge: Int, buf: DoubleBuf): Unit = {
      if (edge < HB) {
        val r = edge / (cols - 1); val c = edge % (cols - 1)
        val z0 = gv.z(r, c); val z1 = gv.z(r, c + 1)
        val t = (level - z0) / (z1 - z0)
        buf += xData(c) + t * (xData(c + 1) - xData(c))
        buf += yData(r)
      } else if (edge < HB + VB) {
        val e = edge - HB
        val r = e / cols; val c = e % cols
        val z0 = gv.z(r, c); val z1 = gv.z(r + 1, c)
        val t = (level - z0) / (z1 - z0)
        buf += xData(c)
        buf += yData(r) + t * (yData(r + 1) - yData(r))
      } else {
        val e = edge - HB - VB
        val r = e / (cols - 1); val c = e % (cols - 1)
        val mc = maskedCorner(r, c)
        if (mc == 0 || mc == 3) {
          // diagonal TR-BL
          val z0 = gv.z(r, c + 1); val z1 = gv.z(r + 1, c)
          val t = (level - z0) / (z1 - z0)
          buf += xData(c + 1) + t * (xData(c) - xData(c + 1))
          buf += yData(r) + t * (yData(r + 1) - yData(r))
        } else {
          // diagonal TL-BR
          val z0 = gv.z(r, c); val z1 = gv.z(r + 1, c + 1)
          val t = (level - z0) / (z1 - z0)
          buf += xData(c) + t * (xData(c + 1) - xData(c))
          buf += yData(r) + t * (yData(r + 1) - yData(r))
        }
      }
    }

    /** Quad on the other side of `edge` from quad (r,c); (-1,-1) if none. */
    @inline def otherQuadR(edge: Int, r: Int): Int = {
      if (edge < HB) { val er = edge / (cols - 1); if (er == r) er - 1 else er }
      else if (edge < HB + VB) r
      else -2 // diagonal: no neighbor
    }
    @inline def otherQuadC(edge: Int, c: Int): Int = {
      if (edge < HB) c
      else if (edge < HB + VB) { val ec = (edge - HB) % cols; if (ec == c) ec - 1 else ec }
      else -2
    }

    /** Walk from `start` entering quad (qr,qc); emit path into out. */
    def walk(start: Int, qr0: Int, qc0: Int): Unit = {
      val buf = new DoubleBuf(32)
      appendPoint(start, buf)
      visited(start) = stamp
      var cur = start
      var qr = qr0
      var qc = qc0
      var closed = false
      var open = false
      while (!closed && !open) {
        val exit = exitEdge(qr, qc, cur)
        if (exit < 0) { open = true } // defensive: inconsistent quad
        else if (exit == start) {
          appendPoint(exit, buf)
          closed = true
        } else {
          appendPoint(exit, buf)
          visited(exit) = stamp
          val nr = otherQuadR(exit, qr)
          val nc = otherQuadC(exit, qc)
          if (nr == -2 || !quadValid(nr, nc)) open = true
          else { cur = exit; qr = nr; qc = nc }
        }
      }
      out += buf.toArray
    }

    // per-point-row min/max over valid points, for fast row skipping
    val (rowMin, rowMax) = if (stats != null) stats else rowStats(gv)
    @inline def rowSkip(r: Int): Boolean = {
      // quad row r spans point rows r, r+1: skip if all valid points above or all below
      val mn = math.min(rowMin(r), rowMin(r + 1))
      val mx = math.max(rowMax(r), rowMax(r + 1))
      mn > level || mx <= level
    }

    if (gv.mask == null) {
      // Fast path (no voids): boundary starts exist only on the grid
      // border, and interior loop detection scans row classification
      // bitmaps (2 boolean reads per quad instead of 4 float loads).
      scratch.ensureRows(cols)
      // Pass 1: border crossings. Top row (N edges), bottom row (S edges),
      // then left/right columns (W/E edges), mirroring the general path's
      // per-quad N,W,S,E order closely enough for deterministic output.
      if (!rowSkip(0)) {
        var c = 0
        while (c < cols - 1) {
          if (above(0, c) != above(0, c + 1)) {
            val e = hId(0, c)
            if (visited(e) != stamp) walk(e, 0, c)
          }
          c += 1
        }
      }
      val rb = rows - 2
      if (!rowSkip(rb)) {
        var c = 0
        while (c < cols - 1) {
          if (above(rb + 1, c) != above(rb + 1, c + 1)) {
            val e = hId(rb + 1, c)
            if (visited(e) != stamp) walk(e, rb, c)
          }
          c += 1
        }
      }
      var r = 0
      while (r < rows - 1) {
        if (!rowSkip(r)) {
          if (above(r, 0) != above(r + 1, 0)) {
            val e = vId(r, 0)
            if (visited(e) != stamp) walk(e, r, 0)
          }
          if (above(r, cols - 1) != above(r + 1, cols - 1)) {
            val e = vId(r, cols - 1)
            if (visited(e) != stamp) walk(e, r, cols - 2)
          }
        }
        r += 1
      }
      // Pass 2: interior loops via rolling row bitmaps.
      var aTop = scratch.aboveA
      var aBot = scratch.aboveB
      var lastRow = -2
      @inline def fill(row: Int, arr: Array[Boolean]): Unit = {
        var c = 0
        while (c < cols) { arr(c) = gv.z(row, c) > level; c += 1 }
      }
      r = 0
      while (r < rows - 1) {
        if (!rowSkip(r)) {
          if (lastRow == r - 1) {
            val t = aTop; aTop = aBot; aBot = t
            fill(r + 1, aBot)
          } else {
            fill(r, aTop)
            fill(r + 1, aBot)
          }
          lastRow = r
          var c = 0
          while (c < cols - 1) {
            val tl = aTop(c)
            if (tl != aTop(c + 1)) {
              val e = hId(r, c)
              if (visited(e) != stamp) walk(e, r, c)
            }
            if (tl != aBot(c)) {
              val e = vId(r, c)
              if (visited(e) != stamp) walk(e, r, c)
            }
            c += 1
          }
        }
        r += 1
      }
      return out
    }

    // General (masked) path.
    // Pass 1: boundary starts.
    var r = 0
    while (r < rows - 1) {
      if (!rowSkip(r)) {
        var c = 0
        while (c < cols - 1) {
          if (quadValid(r, c)) {
            val mc = if (gv.mask == null) -1 else maskedCorner(r, c)
            val aTL = above(r, c); val aTR = above(r, c + 1)
            val aBL = above(r + 1, c); val aBR = above(r + 1, c + 1)
            // candidate boundary edges of this quad's geometry, scan order N,W,S,E,D
            // N edge
            if (mc != 0 && mc != 1 && (aTL != aTR)) {
              val e = hId(r, c)
              if (visited(e) != stamp && !quadValid(r - 1, c)) walk(e, r, c)
            }
            // W edge
            if (mc != 0 && mc != 2 && (aTL != aBL)) {
              val e = vId(r, c)
              if (visited(e) != stamp && !quadValid(r, c - 1)) walk(e, r, c)
            }
            // S edge
            if (mc != 2 && mc != 3 && (aBL != aBR)) {
              val e = hId(r + 1, c)
              if (visited(e) != stamp && !quadValid(r + 1, c)) walk(e, r, c)
            }
            // E edge
            if (mc != 1 && mc != 3 && (aTR != aBR)) {
              val e = vId(r, c + 1)
              if (visited(e) != stamp && !quadValid(r, c + 1)) walk(e, r, c)
            }
            // D edge (always boundary)
            if (mc >= 0) {
              val cd = mc match {
                case 0 | 3 => aTR != aBL
                case _     => aTL != aBR
              }
              if (cd) {
                val e = dId(r, c)
                if (visited(e) != stamp) walk(e, r, c)
              }
            }
          }
          c += 1
        }
      }
      r += 1
    }

    // Pass 2: interior closed loops (any unvisited crossing is on a loop).
    r = 0
    while (r < rows - 1) {
      if (!rowSkip(r)) {
        var c = 0
        while (c < cols - 1) {
          if (quadValid(r, c)) {
            val mc = if (gv.mask == null) -1 else maskedCorner(r, c)
            if (mc != 0 && mc != 1 && above(r, c) != above(r, c + 1)) {
              val e = hId(r, c)
              if (visited(e) != stamp) walk(e, r, c)
            }
            if (mc != 0 && mc != 2 && above(r, c) != above(r + 1, c)) {
              val e = vId(r, c)
              if (visited(e) != stamp) walk(e, r, c)
            }
          }
          c += 1
        }
      }
      r += 1
    }

    out
  }
}
