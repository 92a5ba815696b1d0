package graft.sinks

import graft.core.BBox

/** Common per-tile sink contract: nodes streamed path-by-path, ways
  * buffered and written at finish (the reference's nodes-before-ways
  * ordering, pyhgtmap/output/__init__.py:83-106). */
trait TileSink {
  /** Write one path's nodes; returns (nextNodeId, prepared way). */
  def writePath(coords: Array[Double], startNodeId: Long, elevation: Long): (Long, PreparedWay)
  def finish(ways: Seq[PreparedWay], startWayId: Long, classifier: Long => String): Unit
}

object TileSink {
  val OsmXmlFormat = "osm"
  val O5mFormat = "o5m"
  val PbfFormat = "pbf"
  val XyzFormat = "xyz" // debug triples, reference HgtTile.plotData

  def fileName(bbox: BBox, key: String, format: String): String = {
    val base = OsmXml.tileFileName(bbox.minLon, bbox.minLat, bbox.maxLon, bbox.maxLat, suffix = s"_$key")
    format match {
      case O5mFormat => base.stripSuffix(".osm") + ".o5m"
      case PbfFormat => base + ".pbf"
      case XyzFormat => base.stripSuffix(".osm") + ".xyz"
      case _ => base
    }
  }

  def open(path: String, bbox: BBox, format: String): TileSink = {
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path), 1 << 20)
    format match {
      case O5mFormat => new O5mTileSink(out, bbox)
      case PbfFormat => new PbfTileSink(out, bbox)
      case _ => new OsmXmlTileSink(out, bbox)
    }
  }
}

/** PBF tile sink: dense-node blocks of <=8000 nodes (the reference chunks
  * via osmium the same way, pbfUtil.py:110-148), ways at finish. */
final class PbfTileSink(out: java.io.OutputStream, bbox: BBox) extends TileSink {
  private val w = new PbfWriter(out, bbox)
  private val pending = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
  private var chunkStartId = -1L
  private var nextId = -1L

  private def flushChunk(): Unit = if (pending.nonEmpty) {
    w.writeDenseNodes(chunkStartId, pending)
    pending.clear()
    chunkStartId = nextId
  }

  def writePath(coords: Array[Double], startNodeId: Long, elevation: Long): (Long, PreparedWay) = {
    if (chunkStartId < 0) { chunkStartId = startNodeId; nextId = startNodeId }
    val n = coords.length / 2
    val closed = n >= 2 && coords(0) == coords(2 * (n - 1)) && coords(1) == coords(2 * (n - 1) + 1)
    val emitted = if (closed) n - 1 else n
    var i = 0
    while (i < emitted) {
      pending += ((O5m.quantize(coords(2 * i)), O5m.quantize(coords(2 * i + 1))))
      i += 1
    }
    nextId += emitted
    if (pending.size > 8000) flushChunk()
    (nextId, PreparedWay(nextId - emitted, emitted.toLong, closed, elevation))
  }

  def finish(ways: Seq[PreparedWay], startWayId: Long, classifier: Long => String): Unit = {
    flushChunk()
    w.writeWays(ways, startWayId, classifier)
    w.done()
  }
}

final class OsmXmlTileSink(out: java.io.OutputStream, bbox: BBox) extends TileSink {
  private val w = new OsmXmlWriter(
    out, OsmXml.boundsTag(bbox.minLon, bbox.minLat, bbox.maxLon, bbox.maxLat))
  def writePath(coords: Array[Double], startNodeId: Long, elevation: Long): (Long, PreparedWay) =
    w.writePath(coords, startNodeId, elevation)
  def finish(ways: Seq[PreparedWay], startWayId: Long, classifier: Long => String): Unit = {
    w.writeWays(ways, startWayId)
    w.done(classifier)
  }
}

/** o5m tile sink: buffers quantized node coords into <=32000-node chunks
  * (reference o5mUtil writeNodes, :273-307). */
final class O5mTileSink(out: java.io.OutputStream, bbox: BBox) extends TileSink {
  private val w = new O5mWriter(out, bbox)
  private val pending = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
  private var chunkStartId = -1L
  private var nextId = -1L

  private def flushChunk(): Unit = if (pending.nonEmpty) {
    w.writeNodes(pending, chunkStartId)
    pending.clear()
    chunkStartId = nextId
  }

  def writePath(coords: Array[Double], startNodeId: Long, elevation: Long): (Long, PreparedWay) = {
    if (chunkStartId < 0) { chunkStartId = startNodeId; nextId = startNodeId }
    val n = coords.length / 2
    val closed = n >= 2 && coords(0) == coords(2 * (n - 1)) && coords(1) == coords(2 * (n - 1) + 1)
    val emitted = if (closed) n - 1 else n
    var i = 0
    while (i < emitted) {
      pending += ((O5m.quantize(coords(2 * i)), O5m.quantize(coords(2 * i + 1))))
      i += 1
    }
    nextId += emitted
    if (pending.size > 32000) flushChunk()
    (nextId, PreparedWay(nextId - emitted, emitted.toLong, closed, elevation))
  }

  def finish(ways: Seq[PreparedWay], startWayId: Long, classifier: Long => String): Unit = {
    flushChunk()
    w.writeWays(ways, startWayId, classifier)
    w.done()
  }
}
