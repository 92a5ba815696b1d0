package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{BBox, Geometry, Hgt}

/** Tile-key enumeration + polygon prefilter + source-priority resolution:
  * the reference's download planning re-expressed relationally
  * (/root/reference/pyhgtmap/NASASRTMUtil.py:163-290, 742-769).
  */
object TileKeys {

  /** 1-degree keys intersecting the bbox, antimeridian wrap included, with
    * the coarse polygon prefilter (corner containment or border crossing),
    * i.e. the reference's makeFileNamePrefixes + areaNeeded semantics:
    * returns (key, checkPoly) — checkPoly false when the tile is entirely
    * inside the polygon (no per-cell PIP needed downstream). */
  def enumerate(
      bbox: (Int, Int, Int, Int),
      polygons: Seq[Array[Double]]): Seq[(String, Boolean)] = {
    val (minLon, minLat, maxLon, maxLat) = bbox
    val lonRange: Seq[Int] =
      if (minLon > maxLon) (minLon until 180) ++ (-180 until maxLon)
      else minLon until maxLon
    val keys = for {
      lon <- lonRange
      lat <- minLat until maxLat
    } yield (lon, lat)
    if (polygons.isEmpty) keys.map { case (lon, lat) => (Hgt.tileKey(lat, lon), false) }
    else keys.flatMap { case (lon, lat) =>
      // corner votes: all in -> inside (no check); some in -> border (check);
      // none in -> test whether the polygon crosses or sits inside the tile
      val corners = Seq(
        (lon.toDouble, lat.toDouble), (lon + 1.0, lat.toDouble),
        (lon.toDouble, lat + 1.0), (lon + 1.0, lat + 1.0))
      val ins = corners.map { case (x, y) => polygons.exists(p => Geometry.contains(p, x, y)) }
      if (ins.forall(identity)) Some((Hgt.tileKey(lat, lon), false))
      else if (ins.exists(identity)) Some((Hgt.tileKey(lat, lon), true))
      else {
        // polygon vertex inside the tile, or polygon edge crossing it
        val crosses = polygons.exists { p =>
          p.grouped(2).exists { q => q(0) >= lon && q(0) < lon + 1 && q(1) >= lat && q(1) < lat + 1 } ||
            Geometry.clipToRect(p, lon, lat, lon + 1.0, lat + 1.0).isDefined
        }
        if (crosses) Some((Hgt.tileKey(lat, lon), true)) else None
      }
    }
  }

  /** Priority-ordered first-match source resolution (reference J2,
    * NASASRTMUtil.py:759-768): for each wanted key, the available source
    * with the best user-preference rank wins. Window-based, shuffle-light:
    * availability is joined on key, ranked, rn=1 kept. */
  def resolveSources(
      spark: SparkSession,
      wanted: Seq[(String, Boolean)],
      availability: DataFrame, // (key, source)
      preference: Seq[String]): DataFrame = {
    import spark.implicits._
    val want = wanted.toDF("key", "check_poly")
    val prefDf = preference.zipWithIndex.toDF("source", "priority")
    val w = Window.partitionBy("key").orderBy(col("priority").asc)
    want
      .join(availability, Seq("key"), "inner")
      .join(broadcast(prefDf), Seq("source"), "inner")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("key", "source", "check_poly")
  }

  /** Area union over parsed file bboxes (reference calc_hgt_area,
    * file.py:259-271). */
  def areaUnion(bboxes: Seq[BBox]): BBox =
    BBox(
      bboxes.map(_.minLon).min, bboxes.map(_.minLat).min,
      bboxes.map(_.maxLon).max, bboxes.map(_.maxLat).max)
}
