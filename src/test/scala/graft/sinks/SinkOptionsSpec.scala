package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import graft.core.{BBox, Levels}

/** Gzip output, osm-version/timestamp options, PBF way chunking, o5m
  * timestamp round-trip (reference --gzip output/factory.py:56-57,
  * --osm-version/--write-timestamp output/osmUtil.py:18-62). */
class SinkOptionsSpec extends AnyFunSuite {

  private def path(pts: (Double, Double)*): Array[Double] =
    pts.flatMap(p => Seq(p._1, p._2)).toArray

  private val bbox = BBox(1, 1, 4, 2)
  private val classifier: Long => String = e => Levels.elevClassifier(100, 50)(e.toInt)

  private def driveSink(sink: TileSink): Unit = {
    var nodeId = 1000L
    val ways = scala.collection.mutable.ArrayBuffer.empty[PreparedWay]
    Seq(
      0L -> path((1, 1), (1, 2), (2, 2), (2, 1), (1, 1)),
      50L -> path((3, 1), (3, 2))).foreach { case (elev, p) =>
      val (next, w) = sink.writePath(p, nodeId, elev)
      nodeId = next
      ways += w
    }
    sink.finish(ways.toSeq, 2000L, classifier)
  }

  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  test("gzip xml sink: decompressed bytes identical to the plain sink") {
    val dir = java.nio.file.Files.createTempDirectory("gz").toString
    val plainPath = s"$dir/${TileSink.fileName(bbox, "T", TileSink.OsmXmlFormat)}"
    val gzPath = s"$dir/${TileSink.fileName(bbox, "T", TileSink.OsmGzFormat)}"
    assert(gzPath.endsWith(".osm.gz"))
    driveSink(TileSink.open(plainPath, bbox, TileSink.OsmXmlFormat))
    driveSink(TileSink.open(gzPath, bbox, TileSink.OsmGzFormat))
    val plain = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(plainPath))
    val gz = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(gzPath))
    assert(gunzip(gz).sameElements(plain))
    assert(gz.length < plain.length)
    // stats tool reads the gz directly
    val s = OsmStats.count(gzPath)
    assert(s == OsmStats.count(plainPath))
    assert(s.nodes == 6 && s.ways == 2)
  }

  test("osm-version 0.5 drops the version attribute; timestamp attr is injected") {
    val bos = new ByteArrayOutputStream()
    // epoch 1600000000 = 2020-09-13T12:26:40Z
    val w = new OsmXmlWriter(bos, OsmXml.boundsTag(1, 1, 4, 2),
      osmVersion = 0.5,
      nodeTimestampString = " timestamp=\"2020-09-13T12:26:40Z\"",
      wayTimestampString = " timestamp=\"2020-09-13T12:26:40Z\"")
    val (_, way) = w.writePath(path((1, 1), (1, 2)), 10L, 0L)
    w.writeWays(Seq(way), 20L)
    w.done(classifier)
    val xml = bos.toString("UTF-8")
    assert(xml.contains("<osm version=\"0.5\""))
    assert(!xml.contains(" version=\"1\""))
    assert(xml.contains("<node id=\"10\" lat=\"1.0000000\" lon=\"1.0000000\" timestamp=\"2020-09-13T12:26:40Z\"/>"))
    assert(xml.contains("<way id=\"20\" timestamp=\"2020-09-13T12:26:40Z\">"))
  }

  test("TileSink.open stamps entities from the injected epoch") {
    val dir = java.nio.file.Files.createTempDirectory("tsattr").toString
    val p = s"$dir/t.osm"
    driveSink(TileSink.open(p, bbox, TileSink.OsmXmlFormat, 0.6, Some(1600000000L)))
    val xml = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
    // reference makeUtcTimestamp is naive isoformat: NO trailing 'Z'
    assert(xml.contains(" timestamp=\"2020-09-13T12:26:40\""))
    assert(!xml.contains(" timestamp=\"2020-09-13T12:26:40Z\""))
  }

  test("o5m writeTimestamp=true round-trips through the bundled reader") {
    def encode(writeTs: Boolean): Decoded2 = {
      val bos = new ByteArrayOutputStream()
      val sink = new O5mTileSink(bos, bbox, 1600000000L, writeTs)
      driveSink(sink)
      val d = O5mReader.decode(bos.toByteArray)
      Decoded2(d.nodes, d.ways)
    }
    val without = encode(false)
    val withTs = encode(true)
    assert(withTs.nodes == without.nodes)
    assert(withTs.ways == without.ways)
    assert(withTs.nodes.map(_._1) == Seq(1000L, 1001L, 1002L, 1003L, 1004L, 1005L))
  }
  private case class Decoded2(
      nodes: Seq[(Long, Long, Long)],
      ways: Seq[(Long, Seq[Long], Seq[(String, String)])])

  test("pbf ways are chunked into <=8000-entity blocks and still decode") {
    val bos = new ByteArrayOutputStream()
    val sink = new PbfTileSink(bos, bbox)
    var nodeId = 1L
    val ways = scala.collection.mutable.ArrayBuffer.empty[PreparedWay]
    var i = 0
    while (i < 17001) { // 3 blocks: 8000 + 8000 + 1001
      val lon = 1.0 + (i % 100) * 0.01
      val (next, w) = sink.writePath(path((lon, 1.0), (lon, 2.0)), nodeId, (i % 5) * 50L)
      nodeId = next
      ways += w
      i += 1
    }
    sink.finish(ways.toSeq, 100000L, classifier)
    val dec = PbfReader.decode(bos.toByteArray)
    assert(dec.ways.size == 17001)
    assert(dec.ways.map(_._1) == (100000L until 117001L))
    assert(dec.nodes.size == 34002)
    // every chunk carried a usable string table: spot-check tags at the
    // chunk boundaries (way 0, 7999, 8000, 16000, 17000)
    val byId = dec.ways.map(w => w._1 -> w._3.toMap).toMap
    Seq(100000L, 107999L, 108000L, 116000L, 117000L).foreach { id =>
      assert(byId(id)("contour") == "elevation", s"way $id")
      assert(byId(id).contains("ele"), s"way $id")
    }
  }
}
