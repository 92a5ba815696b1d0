package graft.sinks

/** Output verification tool: count nodes/ways of an OSM XML or o5m file
  * (the reference's tools/osm_stats.py:17-46). */
object OsmStats {

  final case class Stats(nodes: Long, ways: Long)

  def count(path: String): Stats = {
    if (path.endsWith(".o5m")) {
      val dec = O5mReader.decode(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      Stats(dec.nodes.size.toLong, dec.ways.size.toLong)
    } else {
      var nodes = 0L
      var ways = 0L
      val src = scala.io.Source.fromFile(path, "UTF-8")
      try src.getLines().foreach { line =>
        var i = line.indexOf("<node id=")
        while (i >= 0) { nodes += 1; i = line.indexOf("<node id=", i + 1) }
        i = line.indexOf("<way id=")
        while (i >= 0) { ways += 1; i = line.indexOf("<way id=", i + 1) }
      } finally src.close()
      Stats(nodes, ways)
    }
  }
}
