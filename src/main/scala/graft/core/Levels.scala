package graft.core

/** Elevation level enumeration and classification.
  * Reference: pyhgtmap/hgt/tile.py:128-147 (getContLimit + level range) and
  * pyhgtmap/output/__init__.py:47-60 (elevation classifier).
  */
object Levels {

  /** Snap an elevation up to the next multiple of step (Python % semantics:
    * result of `ele % step` is non-negative for positive step). */
  def contLimit(ele: Int, step: Int): Int = {
    val m = java.lang.Math.floorMod(ele, step)
    if (m == 0) ele else ele + step - m
  }

  /** Levels for a tile: range(minCont, maxCont, step), optionally dropping 0.
    * Note the reference uses an *exclusive* upper bound (Python range). */
  def levels(
      minEle: Int,
      maxEle: Int,
      step: Int,
      noZero: Boolean = false,
      minCont: Option[Int] = None,
      maxCont: Option[Int] = None): Seq[Int] = {
    val lo = minCont.getOrElse(contLimit(minEle, step))
    val hi = maxCont.getOrElse(contLimit(maxEle, step))
    val r = lo until hi by step
    if (noZero) r.filter(_ != 0) else r
  }

  /** "elevation_major" / "elevation_medium" / "elevation_minor" tagging. */
  def elevClassifier(majorDivisor: Int, mediumDivisor: Int)(height: Int): String =
    if (java.lang.Math.floorMod(height, majorDivisor) == 0) "elevation_major"
    else if (java.lang.Math.floorMod(height, mediumDivisor) == 0) "elevation_medium"
    else "elevation_minor"
}
