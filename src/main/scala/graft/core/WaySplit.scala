package graft.core

/** Path splitting into OSM-way-sized chunks.
  *
  * Faithful port of the *semantics* of splitList
  * (/root/reference/pyhgtmap/hgt/contour.py:67-114):
  *  - maxNodesPerWay == 0 or len <= max: single chunk;
  *  - else chunks [i, i+max) for i in 0 until len-1 by max-1 (adjacent chunks
  *    share one boundary node);
  *  - a chunk whose first point equals its last (exact equality) is a closed
  *    loop; unique node count = sum(len) - numClosed.
  */
object WaySplit {

  final case class Split(paths: Seq[Array[Double]], nbNodes: Int, nbPaths: Int)

  def split(coords: Array[Double], maxNodesPerWay: Int): Split = {
    val n = coords.length / 2
    if (n < 2) return Split(Nil, 0, 0)
    val chunks: Seq[Array[Double]] =
      if (maxNodesPerWay == 0 || n <= maxNodesPerWay) Seq(coords)
      else {
        val len = maxNodesPerWay
        (0 until (n - 1) by (len - 1)).map { i =>
          val end = math.min(i + len, n)
          java.util.Arrays.copyOfRange(coords, 2 * i, 2 * end)
        }
      }
    var closed = 0
    chunks.foreach { p =>
      val m = p.length / 2
      if (m >= 2 && p(0) == p(2 * (m - 1)) && p(1) == p(2 * (m - 1) + 1)) closed += 1
    }
    val nodes = chunks.map(_.length / 2).sum - closed
    Split(chunks, nodes, chunks.size)
  }

  def isClosed(coords: Array[Double]): Boolean = {
    val n = coords.length / 2
    n >= 2 && coords(0) == coords(2 * (n - 1)) && coords(1) == coords(2 * (n - 1) + 1)
  }
}
