package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** GeoTIFF input (S2/S4) + CRS transform (F10) against the reference's
  * own fixtures: N43E006.tiff (EPSG:4326, equivalent to the HGT fixture)
  * and N43E006_3857.tiff (web-Mercator reprojection of the same tile).
  * Reference: tests/hgt/test_tile.py:94-128 (tiff goldens equal hgt
  * goldens), pyhgtmap/hgt/file.py:169-242 (bbox math). */
class GeoTiffSpec extends AnyFunSuite {

  private val hgtPath = "/root/reference/tests/data/N43E006.hgt"
  private val tifPath = "/root/reference/tests/data/N43E006.tiff"
  private val mercPath = "/root/reference/tests/data/N43E006_3857.tiff"
  private def available = Files.exists(Paths.get(tifPath))

  test("4326 tiff decodes to the same grid as the hgt fixture") {
    assume(available)
    val t = Tiff.decode(Files.readAllBytes(Paths.get(tifPath)))
    val h = Hgt.decode(Files.readAllBytes(Paths.get(hgtPath)))
    assert(t.epsg == 4326)
    assert(t.grid.rows == 1201 && t.grid.cols == 1201)
    assert(t.nodata.contains(-32768.0))
    val b = t.bbox
    assert(math.abs(b.minLon - 6.0) < 1e-6 && math.abs(b.maxLon - 7.0) < 1e-6)
    assert(math.abs(b.minLat - 43.0) < 1e-6 && math.abs(b.maxLat - 44.0) < 1e-6)
    assert(t.grid.values.sameElements(h.values))
  }

  test("4326 tiff through the pipeline reproduces the Toulon goldens") {
    assume(available)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("tiff-golden")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import graft.engine.RasterPipeline
    val cfg = JobConfig(
      contourStepSize = 20, maxNodesPerWay = 0, rdpEpsilon = None, maxNodesPerTile = 0)
    val cs = RasterPipeline.contours(RasterPipeline.tiles(spark, Seq(tifPath), cfg), cfg)
    val rows = cs.collect()
    assert(rows.map(_.nbNodes.toLong).sum == 1264395L)
    assert(rows.length == 10798)
    assert(rows.count(_.elevation == 20) == 145)
    assert(rows.count(_.elevation == 1920) == 1)
  }

  test("3857 tiff: bbox reprojects onto the 1x1 degree tile") {
    assume(Files.exists(Paths.get(mercPath)))
    val t = Tiff.decode(Files.readAllBytes(Paths.get(mercPath)))
    assert(t.epsg == 3857)
    val b = t.bbox
    val (minLon, minLat) = Crs.mercatorToWgs84(b.minLon, b.minLat)
    val (maxLon, maxLat) = Crs.mercatorToWgs84(b.maxLon, b.maxLat)
    // reprojected pixel-center bbox lands on the tile within half a pixel
    assert(math.abs(minLon - 6.0) < 0.001 && math.abs(maxLon - 7.0) < 0.001)
    assert(math.abs(minLat - 43.0) < 0.001 && math.abs(maxLat - 44.0) < 0.001)
  }

  test("3857 tiff traces contours in WGS84 coordinates") {
    assume(Files.exists(Paths.get(mercPath)))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("tiff-3857")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import graft.engine.RasterPipeline
    // coarse step: this is a projection/plumbing check, not a volume test
    val cfg = JobConfig(
      contourStepSize = 500, maxNodesPerWay = 0, rdpEpsilon = None, maxNodesPerTile = 0)
    val cs = RasterPipeline.contours(RasterPipeline.tiles(spark, Seq(mercPath), cfg), cfg)
    val rows = cs.collect()
    assert(rows.nonEmpty)
    // every output coordinate must already be lon/lat, not meters
    rows.foreach { r =>
      assert(r.minLon > 5.9 && r.maxLon < 7.1 && r.minLat > 42.9 && r.maxLat < 44.1,
        s"row bbox not reprojected: ${(r.minLon, r.minLat, r.maxLon, r.maxLat)}")
      var i = 0
      while (i < r.coords.length) {
        assert(r.coords(i) > 5.9 && r.coords(i) < 7.1, s"lon ${r.coords(i)}")
        assert(r.coords(i + 1) > 42.9 && r.coords(i + 1) < 44.1, s"lat ${r.coords(i + 1)}")
        i += 2
      }
    }
    // the full landscape exists in this tile (elev range ~ -12..1923)
    assert(rows.map(_.elevation).distinct.sorted.toSeq == Seq(0, 500, 1000, 1500))
  }

  test("mercator transform round-trips") {
    val pts = Seq((6.0, 43.0), (7.0, 44.0), (-122.42, 37.77), (151.2, -33.87), (0.0, 0.0))
    pts.foreach { case (lon, lat) =>
      val (x, y) = Crs.wgs84ToMercator(lon, lat)
      val (lon2, lat2) = Crs.mercatorToWgs84(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
    assertThrows[IllegalArgumentException](Crs.toWgs84(27700))
  }
}
