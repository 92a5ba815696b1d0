package graft.sinks

/** Output verification tool: count nodes/ways of an OSM XML (plain or
  * gzip), o5m, or PBF file (the reference's tools/osm_stats.py:17-46
  * counts any osmium-readable format). */
object OsmStats {

  final case class Stats(nodes: Long, ways: Long)

  def count(path: String): Stats = {
    if (path.endsWith(".o5m")) {
      val dec = O5mReader.decode(graft.core.Fs.readAllBytes(path))
      Stats(dec.nodes.size.toLong, dec.ways.size.toLong)
    } else if (path.endsWith(".pbf")) {
      val dec = PbfReader.decode(graft.core.Fs.readAllBytes(path))
      Stats(dec.nodes.size.toLong, dec.ways.size.toLong)
    } else {
      var nodes = 0L
      var ways = 0L
      val raw = graft.core.Fs.open(path)
      val in = if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw) else raw
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
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
