package graft

/** Stats CLI over output files, all formats (the reference's
  * tools/osm_stats.py): prints nodes/ways per file plus totals. */
object OsmStatsCli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: OsmStatsCli <file.osm|.osm.gz|.o5m|.osm.pbf>...")
      sys.exit(2)
    }
    var nodes = 0L
    var ways = 0L
    args.foreach { f =>
      val s = graft.sinks.OsmStats.count(f)
      println(s"$f: ${s.nodes} nodes, ${s.ways} ways")
      nodes += s.nodes
      ways += s.ways
    }
    if (args.length > 1) println(s"total: $nodes nodes, $ways ways")
  }
}
