package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level geospatial helpers built from codegen'd built-ins only —
  * no UDFs — so plans stay inside whole-stage codegen and every expression
  * has an exact ANSI-SQL twin for the DuckDB oracle.
  */
object GeoCols {

  /** Deterministic synthetic geocode for a document id: maps ids into the
    * N43E006 1x1 degree tile (lon 6..7, lat 43..44) on a 1e-6 lattice.
    * Shared contract with the oracle SQL — keep both in sync. */
  def docLon(docId: Column): Column =
    lit(6.0) + (docId * lit(2654435761L) % lit(1000000L)).cast("double") / lit(1000000.0)
  def docLat(docId: Column): Column =
    lit(43.0) + ((docId * lit(40503L) + lit(17L)) % lit(1000000L)).cast("double") / lit(1000000.0)

  /** SQL fragments equivalent to docLon/docLat for the DuckDB oracle. */
  val docLonSql = "(6.0 + (doc_id * 2654435761 % 1000000) / 1000000.0)"
  val docLatSql = "(43.0 + ((doc_id * 40503 + 17) % 1000000) / 1000000.0)"

  /** Cell id at resolution r over the square lon/lat grid (graft.core.Cells
    * codec, kept pure-arithmetic so Catalyst codegens it). Domain-boundary
    * points (lat = 90, lon = 180) CLAMP into the last valid row/column —
    * see Cells.cellId; keep the SQL twin below in lockstep. */
  def cellId(lon: Column, lat: Column, res: Int): Column = {
    val scale = (1L << res).toDouble
    val w = 360L << res
    val maxLat = 180L << res
    val latIdx = least(greatest(floor((lat + lit(90.0)) * lit(scale)).cast("long"), lit(0L)), lit(maxLat - 1))
    val lonIdx = least(greatest(floor((lon + lit(180.0)) * lit(scale)).cast("long"), lit(0L)), lit(w - 1))
    latIdx * lit(w) + lonIdx
  }

  def cellIdSql(lonSql: String, latSql: String, res: Int): String = {
    val scale = (1L << res).toDouble
    val w = 360L << res
    val maxLat = 180L << res
    val latIdx = s"least(greatest(CAST(floor(($latSql + 90.0) * $scale) AS BIGINT), 0), ${maxLat - 1})"
    val lonIdx = s"least(greatest(CAST(floor(($lonSql + 180.0) * $scale) AS BIGINT), 0), ${w - 1})"
    s"($latIdx * $w + $lonIdx)"
  }

  /** Squared euclidean distance in degree space. */
  def sqDist(lon: Column, lat: Column, qLon: Double, qLat: Double): Column =
    (lon - lit(qLon)) * (lon - lit(qLon)) + (lat - lit(qLat)) * (lat - lit(qLat))

  def sqDistSql(lonSql: String, latSql: String, qLon: Double, qLat: Double): String =
    s"(($lonSql - $qLon) * ($lonSql - $qLon) + ($latSql - $qLat) * ($latSql - $qLat))"
}
