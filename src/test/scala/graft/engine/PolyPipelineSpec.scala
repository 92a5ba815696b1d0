package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.core.JobConfig

/** Clip-polygon semantics through the distributed pipeline (reference
  * make_tiles polygon handling, file.py:732-768): outside tiles dropped,
  * border tiles cell-masked, inside tiles untouched. */
class PolyPipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("poly-pipeline-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val fixture = "/root/reference/tests/data/N43E006.hgt"
  private def available = java.nio.file.Files.exists(java.nio.file.Paths.get(fixture))

  // a polygon over the NE quarter of the tile (6.5..7.0 x 43.5..44.0),
  // slightly inset so it genuinely crosses chop borders
  private val NePoly = Array(6.55, 43.55, 6.95, 43.55, 6.95, 43.95, 6.55, 43.95)

  test("outside tiles dropped, border tiles masked, node volume shrinks") {
    assume(available)
    val base = JobConfig(contourStepSize = 20, maxNodesPerTile = 500000L,
      maxNodesPerWay = 0, rdpEpsilon = None)
    val cfgPoly = base.copy(polygons = Some(Seq(NePoly)))
    val plainTiles = RasterPipeline.tiles(spark, Seq(fixture), base).collect()
    val polyTiles = RasterPipeline.tiles(spark, Seq(fixture), cfgPoly).collect()
    // golden chop = 4 lat bands (43.0-43.5, 43.5-43.75, 43.75-43.875,
    // 43.875-44.0); the polygon starts at 43.55, so the bottom band is gone
    assert(plainTiles.length == 4)
    assert(polyTiles.length == 3)
    assert(polyTiles.forall(_.minLat >= 43.5))
    assert(polyTiles.forall(_.checkPoly)) // every survivor straddles the border
    val plain = RasterPipeline.contours(
      RasterPipeline.tiles(spark, Seq(fixture), base), base).collect()
    val masked = RasterPipeline.contours(
      RasterPipeline.tiles(spark, Seq(fixture), cfgPoly), cfgPoly).collect()
    val plainNodes = plain.map(_.nbNodes.toLong).sum
    val maskedNodes = masked.map(_.nbNodes.toLong).sum
    assert(maskedNodes > 0 && maskedNodes < plainNodes / 2,
      s"masked $maskedNodes vs plain $plainNodes")
    // every traced coordinate stays within one cell of the polygon bbox
    val tol = 2.0 / 1200.0
    masked.foreach { row =>
      var i = 0
      while (i < row.coords.length) {
        assert(row.coords(i) >= 6.55 - tol && row.coords(i) <= 6.95 + tol,
          s"lon ${row.coords(i)} escapes the clip polygon")
        assert(row.coords(i + 1) >= 43.55 - tol && row.coords(i + 1) <= 43.95 + tol,
          s"lat ${row.coords(i + 1)} escapes the clip polygon")
        i += 2
      }
    }
  }

  test("fully-masked input yields zero tiles (reference test_make_tiles_fully_masked)") {
    assume(available)
    // clip polygon entirely outside the tile: every cell masks away and
    // tile planning must emit nothing (plan-time drop, no trace work)
    val cfg = JobConfig(contourStepSize = 100, maxNodesPerTile = 0L,
      polygons = Some(Seq(Array(10.5, 50.5, 10.9, 50.5, 10.9, 50.9, 10.5, 50.9))))
    assert(RasterPipeline.tiles(spark, Seq(fixture), cfg).collect().isEmpty)
  }

  test("corrx/corry shift the tile bbox (reference --corrx/--corry)") {
    assume(available)
    val cfg = JobConfig(contourStepSize = 100, maxNodesPerTile = 0L,
      corrx = 0.0004, corry = -0.0004)
    val t = RasterPipeline.tiles(spark, Seq(fixture), cfg).collect().head
    assert(math.abs(t.minLon - 6.0004) < 1e-9 && math.abs(t.maxLon - 7.0004) < 1e-9)
    assert(math.abs(t.minLat - 42.9996) < 1e-9 && math.abs(t.maxLat - 43.9996) < 1e-9)
  }

  test("polygon fully containing the tile leaves output identical") {
    assume(available)
    val base = JobConfig(contourStepSize = 100, maxNodesPerTile = 0L,
      maxNodesPerWay = 0, rdpEpsilon = None)
    val big = Array(5.0, 42.0, 8.0, 42.0, 8.0, 45.0, 5.0, 45.0)
    val cfgPoly = base.copy(polygons = Some(Seq(big)))
    val tiles = RasterPipeline.tiles(spark, Seq(fixture), cfgPoly).collect()
    assert(tiles.length == 1 && !tiles.head.checkPoly)
    val plain = RasterPipeline.contours(
      RasterPipeline.tiles(spark, Seq(fixture), base), base)
      .collect().map(_.nbNodes.toLong).sum
    val withPoly = RasterPipeline.contours(
      RasterPipeline.tiles(spark, Seq(fixture), cfgPoly), cfgPoly)
      .collect().map(_.nbNodes.toLong).sum
    assert(plain == withPoly)
  }
}
