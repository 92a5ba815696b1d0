package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.core.JobConfig
import graft.engine.RasterPipeline

/** Output verification tool + XYZ dump, over real pipeline outputs. */
class OsmStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("stats-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val fixture = "/root/reference/tests/data/N43E006.hgt"
  private val cfg = JobConfig(area = Some("6.3:43.2:6.5:43.4"),
    maxNodesPerTile = 0L, maxNodesPerWay = 2000, rdpEpsilon = None)

  test("osm_stats counts agree between xml and o5m sinks and the contour counts") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(fixture)))
    val ts = RasterPipeline.tiles(spark, Seq(fixture), cfg)
    val cs = RasterPipeline.contours(ts, cfg).persist()
    val offs = RasterPipeline.idOffsets(cs, cfg)
    val expectedNodes = cs.groupBy().sum("nbNodes").collect()(0).getLong(0)
    val expectedWays = cs.count()
    val xmlDir = java.nio.file.Files.createTempDirectory("statsxml").toString
    val o5mDir = java.nio.file.Files.createTempDirectory("statso5m").toString
    val xmlFiles = RasterPipeline.writeOsmXml(cs, offs, xmlDir, cfg)
    val o5mFiles = RasterPipeline.writeOsmXml(cs, offs, o5mDir, cfg, format = TileSink.O5mFormat)
    cs.unpersist()
    val xmlStats = xmlFiles.map(OsmStats.count)
    val o5mStats = o5mFiles.map(OsmStats.count)
    assert(xmlStats.map(_.nodes).sum == expectedNodes)
    assert(xmlStats.map(_.ways).sum == expectedWays)
    assert(o5mStats.map(_.nodes).sum == expectedNodes)
    assert(o5mStats.map(_.ways).sum == expectedWays)
    // o5m is a fraction of the XML size (delta + varint + string table)
    val xmlBytes = xmlFiles.map(f => new java.io.File(f).length()).sum
    val o5mBytes = o5mFiles.map(f => new java.io.File(f).length()).sum
    assert(o5mBytes * 3 < xmlBytes, s"o5m $o5mBytes vs xml $xmlBytes")
  }

  test("xyz sink dumps one line per grid point") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(fixture)))
    val small = cfg.copy(area = Some("6.30:43.20:6.35:43.25"))
    val ts = RasterPipeline.tiles(spark, Seq(fixture), small)
    val dir = java.nio.file.Files.createTempDirectory("xyz").toString
    val files = RasterPipeline.writeXyz(ts, dir, small)
    assert(files.size == 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    val t = ts.collect().head
    assert(lines.size == t.rows * t.cols)
    assert(lines.head.matches("""-?\d+\.\d{7} -?\d+\.\d{7} -?\d+"""))
  }
}
