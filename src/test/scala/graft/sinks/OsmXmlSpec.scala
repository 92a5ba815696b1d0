package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import graft.core.Levels

/** Byte-oracle port of the reference XML sink test
  * (/root/reference/tests/test_output.py:164-231) and the int32-overflow
  * case (:272-298). */
class OsmXmlSpec extends AnyFunSuite {

  private def path(pts: (Double, Double)*): Array[Double] =
    pts.flatMap(p => Seq(p._1, p._2)).toArray

  // the reference's shared TileContours fixture (test_output.py:53-77)
  private val fixture: Seq[(Long, Seq[Array[Double]])] = Seq(
    0L -> Seq(
      path((1, 1), (1, 2), (2, 2), (2, 1), (1, 1)),
      path((3, 1), (3, 2))),
    50L -> Seq(path((4, 1), (4, 2))),
    100L -> Seq(),
    150L -> Seq(),
    -50L -> Seq(path((5, 5), (5, 7), (7, 7), (7, 5), (5, 5))))

  private def writeFixture(startNodeId: Long): (String, Long) = {
    val bos = new ByteArrayOutputStream()
    val w = new OsmXmlWriter(
      bos,
      boundsTag = """<bounds minlat="1" minlon="1" maxlat="2" maxlon="4"/>""",
      osmVersion = 0.6,
      generator = "pyhgtmap 123",
      nodeTimestampString = " time=\"some time\"")
    var nodeId = startNodeId
    val ways = scala.collection.mutable.ArrayBuffer.empty[PreparedWay]
    fixture.foreach { case (elev, paths) =>
      paths.foreach { p =>
        val (next, way) = w.writePath(p, nodeId, elev)
        nodeId = next
        ways += way
      }
    }
    w.writeWays(ways.toSeq, 2000L)
    w.done(e => Levels.elevClassifier(100, 50)(e.toInt))
    (bos.toString("UTF-8"), nodeId)
  }

  test("full-file byte oracle (reference test_produce_osm)") {
    val (contents, nextNodeId) = writeFixture(1000L)
    assert(nextNodeId == 1012L)
    val expected =
      """<?xml version="1.0" encoding="utf-8"?>
        |<osm version="0.6" generator="pyhgtmap 123">
        |<bounds minlat="1" minlon="1" maxlat="2" maxlon="4"/>
        |<node id="1000" lat="1.0000000" lon="1.0000000" version="1" time="some time"/>
        |<node id="1001" lat="2.0000000" lon="1.0000000" version="1" time="some time"/>
        |<node id="1002" lat="2.0000000" lon="2.0000000" version="1" time="some time"/>
        |<node id="1003" lat="1.0000000" lon="2.0000000" version="1" time="some time"/>
        |<node id="1004" lat="1.0000000" lon="3.0000000" version="1" time="some time"/>
        |<node id="1005" lat="2.0000000" lon="3.0000000" version="1" time="some time"/>
        |<node id="1006" lat="1.0000000" lon="4.0000000" version="1" time="some time"/>
        |<node id="1007" lat="2.0000000" lon="4.0000000" version="1" time="some time"/>
        |<node id="1008" lat="5.0000000" lon="5.0000000" version="1" time="some time"/>
        |<node id="1009" lat="7.0000000" lon="5.0000000" version="1" time="some time"/>
        |<node id="1010" lat="7.0000000" lon="7.0000000" version="1" time="some time"/>
        |<node id="1011" lat="5.0000000" lon="7.0000000" version="1" time="some time"/>
        |<way id="2000" version="1"><nd ref="1000"/>
        |<nd ref="1001"/>
        |<nd ref="1002"/>
        |<nd ref="1003"/>
        |<nd ref="1000"/>
        |<tag k="ele" v="0"/><tag k="contour" v="elevation"/><tag k="contour_ext" v="elevation_major"/></way>
        |<way id="2001" version="1"><nd ref="1004"/>
        |<nd ref="1005"/>
        |<tag k="ele" v="0"/><tag k="contour" v="elevation"/><tag k="contour_ext" v="elevation_major"/></way>
        |<way id="2002" version="1"><nd ref="1006"/>
        |<nd ref="1007"/>
        |<tag k="ele" v="50"/><tag k="contour" v="elevation"/><tag k="contour_ext" v="elevation_medium"/></way>
        |<way id="2003" version="1"><nd ref="1008"/>
        |<nd ref="1009"/>
        |<nd ref="1010"/>
        |<nd ref="1011"/>
        |<nd ref="1008"/>
        |<tag k="ele" v="-50"/><tag k="contour" v="elevation"/><tag k="contour_ext" v="elevation_medium"/></way>
        |</osm>
        |""".stripMargin
    assert(contents == expected)
  }

  test("node id crosses int32 boundary (reference test_node_id_overflow)") {
    val (_, nextNodeId) = writeFixture(2147483647L)
    assert(nextNodeId == 2147483659L)
  }

  test("tile file naming (reference make_osm_filename)") {
    assert(OsmXml.tileFileName(6.0, 43.0, 7.0, 43.5) == "lon6.00_7.00lat43.00_43.50.osm")
    assert(OsmXml.boundsTag(6, 43, 7, 44) ==
      """<bounds minlat="43.0000000" minlon="6.0000000" maxlat="44.0000000" maxlon="7.0000000"/>""")
  }

  test("byte-contract formatting is dot-decimal under a comma-decimal locale") {
    // regression for the f-interpolator locale bug: on de_DE JVMs the
    // default-locale formatter prints 43,0000000, corrupting OSM XML,
    // tile filenames, .poly area strings and the bench JSON
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.GERMANY)
    try {
      assert(OsmXml.boundsTag(6, 43, 7, 44).contains("minlat=\"43.0000000\""))
      assert(OsmXml.tileFileName(6.0, 43.0, 7.0, 43.5) == "lon6.00_7.00lat43.00_43.50.osm")
      assert(graft.core.Fmt("%.3f", 1.5) == "1.500")
      val poly = graft.core.PolyFile.parse("area\n1\n\t6.0 43.0\n\t7.0 43.0\n\t6.5 44.0\nEND\nEND\n")
      assert(poly.areaString == "6.0000000:43.0000000:7.0000000:44.0000000")
      // the area string must round-trip through toDouble (PipelineCli does)
      poly.areaString.split(':').foreach(_.toDouble)
    } finally java.util.Locale.setDefault(prev)
  }
}
