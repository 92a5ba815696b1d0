package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.core.PolyFile

class TileKeysSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("tilekeys-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("france.poly parses to the reference golden bbox and first vertices") {
    val path = "/root/reference/tests/data/france.poly"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    val parsed = PolyFile.parseFile(path)
    // golden from tests/test_main.py:53-64
    assert(parsed.areaString == "-6.9372070:41.2386600:9.9000000:51.4288000")
    val first5 = parsed.polygons.head.grouped(2).take(5).map(a => (a(0), a(1))).toSeq
    assert(first5 == Seq(
      (9.9, 42.43788), (9.9, 41.41346), (9.328765, 41.32062),
      (9.286847, 41.28319), (8.798805, 41.23866)))
  }

  test("tile key enumeration covers bbox, wraps the antimeridian") {
    val keys = TileKeys.enumerate((6, 43, 8, 45), Nil).map(_._1)
    assert(keys.toSet == Set("N43E006", "N43E007", "N44E006", "N44E007"))
    val wrapped = TileKeys.enumerate((179, 0, -179, 1), Nil).map(_._1)
    assert(wrapped.toSet == Set("N00E179", "N00W180"))
  }

  test("polygon prefilter: inside tiles need no check, border tiles do, outside dropped") {
    // polygon = big square covering (6..8, 43..45) exactly plus margin
    val poly = Array[Double](5.5, 42.5, 8.5, 42.5, 8.5, 44.5, 5.5, 44.5)
    val keys = TileKeys.enumerate((5, 42, 9, 46), Seq(poly)).toMap
    assert(keys("N43E006") == false) // fully inside
    assert(keys.contains("N44E006") && keys("N44E006") == true) // straddles 44.5
    assert(!keys.contains("N45E005")) // fully outside
  }

  test("priority first-match source resolution") {
    import spark.implicits._
    val avail = Seq(
      ("N43E006", "view3"), ("N43E006", "srtm3"),
      ("N43E007", "srtm3"),
      ("N44E006", "view1")).toDF("key", "source")
    val wanted = Seq(("N43E006", true), ("N43E007", false), ("N44E006", false), ("N44E007", false))
    val got = TileKeys.resolveSources(spark, wanted, avail, Seq("view1", "view3", "srtm3"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == Map(
      "N43E006" -> "view3", // view3 beats srtm3 in preference order
      "N43E007" -> "srtm3",
      "N44E006" -> "view1")) // N44E007 unavailable -> absent
  }

  test("area union") {
    import graft.core.BBox
    val u = TileKeys.areaUnion(Seq(BBox(6, 43, 7, 44), BBox(7, 43, 8, 44), BBox(5, 40, 6, 41)))
    assert(u == BBox(5, 40, 8, 44))
  }
}
