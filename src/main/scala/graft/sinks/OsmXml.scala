package graft.sinks

import java.io.OutputStream
import java.nio.charset.StandardCharsets

/** OSM XML sink, byte-compatible with the reference writer
  * (/root/reference/pyhgtmap/output/osmUtil.py:25-198): preamble + bounds,
  * all nodes, then all ways (ways are buffered until done()), closed loops
  * re-using their first node id as the last way ref.
  */
final case class PreparedWay(firstNodeId: Long, nbNodes: Long, closed: Boolean, elevation: Long)

object OsmXml {
  import graft.core.Fmt
  /** `<bounds .../>` tag (reference output/factory.py:68-78). Locale.ROOT
    * via Fmt: coordinates must be dot-decimal on every host. */
  def boundsTag(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double): String =
    Fmt("""<bounds minlat="%.7f" minlon="%.7f" maxlat="%.7f" maxlon="%.7f"/>""",
      minLat, minLon, maxLat, maxLon)

  /** Tile output name (reference hgt/__init__.py:16-17, output/factory.py:18-62). */
  def tileFileName(
      minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
      prefix: String = "", suffix: String = ""): String =
    Fmt("%slon%.2f_%.2flat%.2f_%.2f%s.osm", prefix, minLon, maxLon, minLat, maxLat, suffix)
}

final class OsmXmlWriter(
    out: OutputStream,
    boundsTag: String,
    osmVersion: Double = 0.6,
    generator: String = "graft 0.1.0",
    nodeTimestampString: String = "",
    wayTimestampString: String = "") {

  private val versionString = if (osmVersion > 0.5) " version=\"1\"" else ""
  private val pendingWays = scala.collection.mutable.ArrayBuffer.empty[(Seq[PreparedWay], Long)]

  private def write(s: String): Unit = out.write(s.getBytes(StandardCharsets.UTF_8))

  // preamble (reference osmUtil.py:91-97)
  write("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n")
  write(graft.core.Fmt("""<osm version="%.1f" generator="%s">""", osmVersion, generator) + "\n")
  write(boundsTag + "\n")

  /** Write one path's nodes; returns (nextNodeId, way). Mirrors _makePoints
    * (osmUtil.py:118-138): a closed path's last point is not written, and
    * the way will close by re-using the first id. */
  def writePath(coords: Array[Double], startNodeId: Long, elevation: Long): (Long, PreparedWay) = {
    val n = coords.length / 2
    val closed = n >= 2 && coords(0) == coords(2 * (n - 1)) && coords(1) == coords(2 * (n - 1) + 1)
    val emitted = if (closed) n - 1 else n
    val sb = new java.lang.StringBuilder(emitted * 64)
    var i = 0
    var id = startNodeId
    while (i < emitted) {
      sb.append("<node id=\"").append(id)
        .append(graft.core.Fmt("""" lat="%.7f" lon="%.7f"""",
          coords(2 * i + 1), coords(2 * i)))
        .append(versionString).append(nodeTimestampString).append("/>")
      if (i < emitted - 1) sb.append('\n')
      id += 1
      i += 1
    }
    sb.append('\n')
    write(sb.toString)
    (id, PreparedWay(startNodeId, emitted.toLong, closed, elevation))
  }

  /** Queue ways for writing after all nodes (reference Output.write_ways). */
  def writeWays(ways: Seq[PreparedWay], startWayId: Long): Unit =
    pendingWays += ((ways, startWayId))

  private def flushWays(classifier: Long => String): Unit =
    pendingWays.foreach { case (ways, startWayId) =>
      var wayId = startWayId
      ways.foreach { w =>
        val refs = (w.firstNodeId until (w.firstNodeId + w.nbNodes)) ++
          (if (w.closed) Seq(w.firstNodeId) else Nil)
        val sb = new java.lang.StringBuilder(refs.length * 24 + 160)
        sb.append("<way id=\"").append(wayId).append('"').append(versionString)
          .append(wayTimestampString).append('>')
        refs.foreach(r => sb.append("<nd ref=\"").append(r).append("\"/>\n"))
        sb.append("<tag k=\"ele\" v=\"").append(w.elevation).append("\"/>")
          .append("<tag k=\"contour\" v=\"elevation\"/>")
          .append("<tag k=\"contour_ext\" v=\"").append(classifier(w.elevation)).append("\"/>")
          .append("</way>\n")
        write(sb.toString)
        wayId += 1
      }
    }

  def done(classifier: Long => String): Unit = {
    flushWays(classifier)
    write("</osm>\n")
    out.close()
  }
}
