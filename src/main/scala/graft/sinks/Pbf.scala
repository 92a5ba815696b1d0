package graft.sinks

import java.io.{ByteArrayOutputStream, OutputStream}
import java.util.zip.{Deflater, Inflater}
import graft.core.BBox

/** OSM PBF sink (the reference's pbfUtil delegates to the osmium C++
  * library; this is a from-scratch encoder of the public PBF format:
  * length-prefixed BlobHeader/Blob framing, zlib-compressed HeaderBlock and
  * PrimitiveBlocks, DenseNodes with delta-coded packed sint64, ways with
  * delta-coded refs and string-table tags). Content contract mirrors
  * /root/reference/tests/test_output.py:96-161 (decoded nodes/ways/tags,
  * header bbox, dense encoding efficiency). Granularity 100 => coordinate
  * unit = 1e-7 degree, same quantization as the o5m sink. */
object Pbf {

  // ---- minimal protobuf writer ----
  final class ProtoOut {
    val out = new ByteArrayOutputStream()
    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def key(field: Int, wire: Int): Unit = writeVarint((field << 3 | wire).toLong)
    def int64(field: Int, v: Long): Unit = { key(field, 0); writeVarint(v) }
    def sint64(field: Int, v: Long): Unit = { key(field, 0); writeVarint((v << 1) ^ (v >> 63)) }
    def bytes(field: Int, b: Array[Byte]): Unit = {
      key(field, 2); writeVarint(b.length.toLong); out.write(b)
    }
    def string(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def packedSint64(field: Int, vs: Iterable[Long]): Unit = {
      val p = new ProtoOut
      vs.foreach(v => p.writeVarint((v << 1) ^ (v >> 63)))
      bytes(field, p.toByteArray)
    }
    def packedUint32(field: Int, vs: Iterable[Int]): Unit = {
      val p = new ProtoOut
      vs.foreach(v => p.writeVarint(v.toLong))
      bytes(field, p.toByteArray)
    }
    def toByteArray: Array[Byte] = out.toByteArray
  }

  def zlib(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  def unzlib(data: Array[Byte], rawSize: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](rawSize)
    var off = 0
    while (!inf.finished() && off < rawSize) off += inf.inflate(out, off, rawSize - off)
    inf.end()
    out
  }

  /** One framed blob: 4-byte BE BlobHeader length, BlobHeader, Blob. */
  def writeBlob(out: OutputStream, blobType: String, payload: Array[Byte]): Unit = {
    val blob = new ProtoOut
    blob.int64(2, payload.length.toLong) // raw_size
    blob.bytes(3, zlib(payload)) // zlib_data
    val blobBytes = blob.toByteArray
    val header = new ProtoOut
    header.string(1, blobType)
    header.int64(3, blobBytes.length.toLong) // datasize
    val headerBytes = header.toByteArray
    out.write(Array[Byte](
      (headerBytes.length >>> 24).toByte, (headerBytes.length >>> 16).toByte,
      (headerBytes.length >>> 8).toByte, headerBytes.length.toByte))
    out.write(headerBytes)
    out.write(blobBytes)
  }
}

final class PbfWriter(out: OutputStream, bbox: BBox, generator: String = "graft 0.1.0") {
  import Pbf._

  locally {
    val hb = new ProtoOut
    val bb = new ProtoOut
    bb.sint64(1, (bbox.minLon * 1e9).toLong) // left, nanodegrees
    bb.sint64(2, (bbox.maxLon * 1e9).toLong) // right
    bb.sint64(3, (bbox.maxLat * 1e9).toLong) // top
    bb.sint64(4, (bbox.minLat * 1e9).toLong) // bottom
    hb.bytes(1, bb.toByteArray)
    hb.string(4, "OsmSchema-V0.6")
    hb.string(4, "DenseNodes")
    hb.string(16, generator)
    writeBlob(out, "OSMHeader", hb.toByteArray)
  }

  /** Dense nodes: ids contiguous from startId, coords in 1e-7 degrees. */
  def writeDenseNodes(startId: Long, coords: Iterable[(Long, Long)]): Unit = {
    if (coords.isEmpty) return
    val dense = new ProtoOut
    val n = coords.size
    val ids = new Array[Long](n)
    val lats = new Array[Long](n)
    val lons = new Array[Long](n)
    var lastLat = 0L
    var lastLon = 0L
    var i = 0
    coords.foreach { case (lon, lat) =>
      ids(i) = if (i == 0) startId else 1L
      lats(i) = lat - lastLat
      lons(i) = lon - lastLon
      lastLat = lat; lastLon = lon
      i += 1
    }
    dense.packedSint64(1, ids)
    dense.packedSint64(8, lats)
    dense.packedSint64(9, lons)
    val group = new ProtoOut
    group.bytes(2, dense.toByteArray)
    writePrimitiveBlock(group.toByteArray, Seq(""))
  }

  /** Ways with ele/contour tags via the block string table. */
  def writeWays(ways: Iterable[PreparedWay], startWayId: Long, classifier: Long => String): Unit = {
    if (ways.isEmpty) return
    // chunk ways into blocks of <=8000 entities (mirroring the dense-node
    // chunking): a single merged-output run can hold millions of ways, and
    // one unchunked PrimitiveBlock would blow the PBF spec's 16/32 MiB
    // uncompressed blob limit that osmium/osmosis readers enforce. Each
    // block carries its own string table.
    var wayId = startWayId
    ways.grouped(8000).foreach { chunk =>
      // string table: index 0 must be empty (dense keys_vals delimiter)
      val strings = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
      def sid(s: String): Int = strings.getOrElseUpdate(s, strings.size)
      val group = new ProtoOut
      chunk.foreach { w =>
        val way = new ProtoOut
        way.int64(1, wayId)
        val keys = Seq(sid("ele"), sid("contour"), sid("contour_ext"))
        val vals = Seq(sid(w.elevation.toString), sid("elevation"), sid(classifier(w.elevation)))
        way.packedUint32(2, keys)
        way.packedUint32(3, vals)
        val refs = (w.firstNodeId until (w.firstNodeId + w.nbNodes)) ++
          (if (w.closed) Seq(w.firstNodeId) else Nil)
        var last = 0L
        way.packedSint64(8, refs.map { r => val d = r - last; last = r; d })
        group.bytes(3, way.toByteArray)
        wayId += 1
      }
      writePrimitiveBlock(group.toByteArray, strings.keys.toSeq)
    }
  }

  private def writePrimitiveBlock(groupBytes: Array[Byte], strings: Seq[String]): Unit = {
    val block = new ProtoOut
    val st = new ProtoOut
    strings.foreach(s => st.bytes(1, s.getBytes("UTF-8")))
    block.bytes(1, st.toByteArray)
    block.key(2, 2); block.writeVarint(groupBytes.length.toLong); block.out.write(groupBytes)
    block.int64(17, 100L) // granularity: 100 nanodeg = 1e-7 deg
    writeBlob(out, "OSMData", block.toByteArray)
  }

  def done(): Unit = out.close()
}

/** Minimal PBF decoder for round-trip verification (plays the role of the
  * reference's osmium decode, tests/test_output.py:96-161). */
object PbfReader {
  import Pbf._

  final case class Decoded(
      bboxNano: Seq[Long], // left, right, top, bottom
      features: Seq[String],
      nodes: Seq[(Long, Long, Long)], // id, lon1e7, lat1e7
      ways: Seq[(Long, Seq[Long], Seq[(String, String)])])

  private final class ProtoIn(val buf: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < buf.length
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0L
      do { b = buf(pos) & 0xffL; v |= (b & 0x7f) << shift; shift += 7; pos += 1 } while ((b & 0x80) != 0)
      v
    }
    def zigzag(): Long = { val u = varint(); (u >>> 1) ^ -(u & 1) }
    def lenBytes(): Array[Byte] = {
      val n = varint().toInt
      val r = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 2 => lenBytes()
      case 5 => pos += 4
      case 1 => pos += 8
      case w => throw new IllegalStateException(s"wire $w")
    }
  }

  def decode(file: Array[Byte]): Decoded = {
    var pos = 0
    var bbox: Seq[Long] = Nil
    val features = scala.collection.mutable.ArrayBuffer.empty[String]
    val nodes = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val ways = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long], Seq[(String, String)])]
    while (pos + 4 <= file.length) {
      val hlen = ((file(pos) & 0xff) << 24) | ((file(pos + 1) & 0xff) << 16) |
        ((file(pos + 2) & 0xff) << 8) | (file(pos + 3) & 0xff)
      pos += 4
      val header = new ProtoIn(java.util.Arrays.copyOfRange(file, pos, pos + hlen))
      pos += hlen
      var blobType = ""
      var datasize = 0
      while (header.hasMore) {
        val k = header.varint()
        (k >> 3).toInt match {
          case 1 => blobType = new String(header.lenBytes(), "UTF-8")
          case 3 => datasize = header.varint().toInt
          case _ => header.skip((k & 7).toInt)
        }
      }
      val blob = new ProtoIn(java.util.Arrays.copyOfRange(file, pos, pos + datasize))
      pos += datasize
      var payload: Array[Byte] = null
      var rawSize = -1
      var zdata: Array[Byte] = null
      while (blob.hasMore) {
        val k = blob.varint()
        (k >> 3).toInt match {
          case 1 => payload = blob.lenBytes()
          case 2 => rawSize = blob.varint().toInt
          case 3 => zdata = blob.lenBytes()
          case _ => blob.skip((k & 7).toInt)
        }
      }
      if (payload == null) payload = unzlib(zdata, rawSize)
      if (blobType == "OSMHeader") {
        val hb = new ProtoIn(payload)
        while (hb.hasMore) {
          val k = hb.varint()
          (k >> 3).toInt match {
            case 1 =>
              val bb = new ProtoIn(hb.lenBytes())
              val vals = scala.collection.mutable.ArrayBuffer.empty[Long]
              while (bb.hasMore) { val kk = bb.varint(); vals += bb.zigzag() }
              bbox = vals.toSeq
            case 4 => features += new String(hb.lenBytes(), "UTF-8")
            case _ => hb.skip((k & 7).toInt)
          }
        }
      } else {
        decodeData(payload, nodes, ways)
      }
    }
    Decoded(bbox, features.toSeq, nodes.toSeq, ways.toSeq)
  }

  private def decodeData(
      payload: Array[Byte],
      nodes: scala.collection.mutable.ArrayBuffer[(Long, Long, Long)],
      ways: scala.collection.mutable.ArrayBuffer[(Long, Seq[Long], Seq[(String, String)])]): Unit = {
    val block = new ProtoIn(payload)
    var granularity = 100L
    val strings = scala.collection.mutable.ArrayBuffer.empty[String]
    val groups = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (block.hasMore) {
      val k = block.varint()
      (k >> 3).toInt match {
        case 1 =>
          val st = new ProtoIn(block.lenBytes())
          while (st.hasMore) { val kk = st.varint(); strings += new String(st.lenBytes(), "UTF-8") }
        case 2 => groups += block.lenBytes()
        case 17 => granularity = block.varint()
        case _ => block.skip((k & 7).toInt)
      }
    }
    val scale = granularity / 100L // -> 1e-7 degree units
    groups.foreach { g =>
      val group = new ProtoIn(g)
      while (group.hasMore) {
        val k = group.varint()
        (k >> 3).toInt match {
          case 2 => // dense
            val dense = new ProtoIn(group.lenBytes())
            var ids: Seq[Long] = Nil
            var lats: Seq[Long] = Nil
            var lons: Seq[Long] = Nil
            while (dense.hasMore) {
              val kk = dense.varint()
              (kk >> 3).toInt match {
                case 1 => ids = packed(dense.lenBytes())
                case 8 => lats = packed(dense.lenBytes())
                case 9 => lons = packed(dense.lenBytes())
                case _ => dense.skip((kk & 7).toInt)
              }
            }
            var id = 0L; var lat = 0L; var lon = 0L
            ids.indices.foreach { i =>
              id += ids(i); lat += lats(i); lon += lons(i)
              nodes += ((id, lon * scale, lat * scale))
            }
          case 3 => // way
            val way = new ProtoIn(group.lenBytes())
            var id = 0L
            var keys: Seq[Long] = Nil
            var vals: Seq[Long] = Nil
            var refs: Seq[Long] = Nil
            while (way.hasMore) {
              val kk = way.varint()
              (kk >> 3).toInt match {
                case 1 => id = way.varint()
                case 2 => keys = packedU(way.lenBytes())
                case 3 => vals = packedU(way.lenBytes())
                case 8 =>
                  var last = 0L
                  refs = packed(way.lenBytes()).map { d => last += d; last }
                case _ => way.skip((kk & 7).toInt)
              }
            }
            val tags = keys.zip(vals).map { case (ki, vi) => (strings(ki.toInt), strings(vi.toInt)) }
            ways += ((id, refs, tags))
          case _ => group.skip((k & 7).toInt)
        }
      }
    }
  }

  private def packed(b: Array[Byte]): Seq[Long] = {
    val in = new ProtoIn(b)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (in.hasMore) out += in.zigzag()
    out.toSeq
  }
  private def packedU(b: Array[Byte]): Seq[Long] = {
    val in = new ProtoIn(b)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (in.hasMore) out += in.varint()
    out.toSeq
  }
}
