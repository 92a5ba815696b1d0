package graft.core

/** Minimal GeoTIFF decoder for DEM rasters — no GDAL: strip-organized,
  * uncompressed, 16-bit signed samples (the layout GDAL itself writes for
  * SRTM-derived DEMs, and the layout of the reference's test fixtures).
  * Reads the geotransform (ModelPixelScale + ModelTiepoint) and the CRS
  * EPSG code from the GeoKey directory.
  *
  * Mirrors the semantics of the reference's GDAL-based loader
  * (/root/reference/pyhgtmap/hgt/file.py:500-555 init_as_geotiff,
  * file.py:169-242 parse_geotiff_bbox): pixel-center bbox, void mask from
  * `value <= voidMax`, row-major north-to-south grid.
  */
object Tiff {

  final case class GeoTiff(
      grid: Grid,
      originX: Double, // geotransform[0]: x of the OUTER corner of pixel (0,0)
      originY: Double, // geotransform[3]
      scaleX: Double, // pixel width (positive)
      scaleY: Double, // pixel height (positive; rows go north->south)
      epsg: Int,
      nodata: Option[Double]) {

    /** Pixel-center bbox in the file's native CRS (reference
      * parse_geotiff_bbox math, file.py:196-201). */
    def bbox: BBox = {
      val minLon = originX + 0.5 * scaleX
      val maxLat = originY - 0.5 * scaleY
      val maxLon = minLon + (grid.cols - 1) * scaleX
      val minLat = maxLat - (grid.rows - 1) * scaleY
      BBox(minLon, minLat, maxLon, maxLat)
    }
  }

  def isTiff(path: String): Boolean = {
    val p = path.toLowerCase
    p.endsWith(".tif") || p.endsWith(".tiff")
  }

  def decode(bytes: Array[Byte], voidMax: Int = -0x8000): GeoTiff = {
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    require(le || (bytes(0) == 'M' && bytes(1) == 'M'), "not a TIFF: bad byte-order mark")
    def u16(off: Int): Int =
      if (le) (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      else ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    def u32(off: Int): Long = {
      val a = bytes(off) & 0xffL; val b = bytes(off + 1) & 0xffL
      val c = bytes(off + 2) & 0xffL; val d = bytes(off + 3) & 0xffL
      if (le) a | (b << 8) | (c << 16) | (d << 24) else (a << 24) | (b << 16) | (c << 8) | d
    }
    def f64(off: Int): Double = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = bytes(off + (if (le) 7 - i else i)) & 0xffL
        v = (v << 8) | b
        i += 1
      }
      java.lang.Double.longBitsToDouble(v)
    }
    require(u16(2) == 42, "not a TIFF: bad magic")

    final case class Entry(typ: Int, count: Long, valOff: Int)
    val ifdOff = u32(4).toInt
    val nEntries = u16(ifdOff)
    val tags = scala.collection.mutable.Map.empty[Int, Entry]
    var i = 0
    while (i < nEntries) {
      val e = ifdOff + 2 + 12 * i
      tags(u16(e)) = Entry(u16(e + 2), u32(e + 4), e + 8)
      i += 1
    }
    def typeSize(t: Int): Int = t match {
      case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4; case 5 | 10 | 12 => 8
      case other => throw new IllegalArgumentException(s"TIFF type $other")
    }
    /** Values of a tag as Longs (SHORT/LONG) following the inline-vs-offset rule. */
    def longs(tag: Int): Array[Long] = tags.get(tag) match {
      case None => Array.empty
      case Some(Entry(t, c, vo)) =>
        val sz = typeSize(t)
        val base = if (sz * c <= 4) vo else u32(vo).toInt
        Array.tabulate(c.toInt) { k =>
          val off = base + k * sz
          if (sz == 2) u16(off).toLong else u32(off)
        }
    }
    def doubles(tag: Int): Array[Double] = tags.get(tag) match {
      case None => Array.empty
      case Some(Entry(t, c, vo)) =>
        require(t == 12, s"tag $tag: expected DOUBLE, got type $t")
        val base = u32(vo).toInt
        Array.tabulate(c.toInt)(k => f64(base + k * 8))
    }
    def ascii(tag: Int): String = tags.get(tag) match {
      case None => ""
      case Some(Entry(_, c, vo)) =>
        val base = if (c <= 4) vo else u32(vo).toInt
        new String(bytes, base, c.toInt, "US-ASCII").takeWhile(_ != 0)
    }
    def scalar(tag: Int, default: Long = -1L): Long = {
      val v = longs(tag); if (v.isEmpty) default else v(0)
    }

    val cols = scalar(256).toInt
    val rows = scalar(257).toInt
    val bits = scalar(258, 1L).toInt
    val compression = scalar(259, 1L).toInt
    val sampleFormat = scalar(339, 1L).toInt
    val samplesPerPixel = scalar(277, 1L).toInt
    require(compression == 1, s"unsupported TIFF compression $compression (only uncompressed)")
    require(bits == 16 && (sampleFormat == 1 || sampleFormat == 2),
      s"unsupported TIFF sample layout: $bits-bit format $sampleFormat (only int16)")
    require(samplesPerPixel == 1, s"unsupported samples/pixel $samplesPerPixel")
    require(!tags.contains(322), "tiled TIFFs unsupported (strip layout only)")

    // GDAL_NODATA (parsed below, needed during the strip decode): cells at
    // the declared nodata value mask like voids even when nodata > voidMax
    // (e.g. -9999 DEMs); reference parity is unaffected because its
    // fixtures declare nodata == voidMax == -32768
    val nodata = {
      val nd = ascii(42113).trim
      if (nd.isEmpty) None else Some(nd.toDouble)
    }
    val nodataF = nodata.map(_.toFloat)

    val stripOffsets = longs(273)
    val rowsPerStrip = scalar(278, rows.toLong).toInt
    val n = rows * cols
    val values = new Array[Float](n)
    var mask: Array[Boolean] = null
    var row = 0
    var s = 0
    while (s < stripOffsets.length) {
      val stripRows = math.min(rowsPerStrip, rows - row)
      var off = stripOffsets(s).toInt
      var k = row * cols
      val end = k + stripRows * cols
      while (k < end) {
        val v =
          (if (le) (bytes(off) & 0xff) | (bytes(off + 1) << 8)
           else (bytes(off) << 8) | (bytes(off + 1) & 0xff)).toShort
        values(k) = v.toFloat
        if (v <= voidMax || nodataF.exists(_ == v.toFloat)) {
          if (mask == null) mask = new Array[Boolean](n)
          mask(k) = true
        }
        off += 2
        k += 1
      }
      row += stripRows
      s += 1
    }

    val scale = doubles(33550)
    val tie = doubles(33922)
    require(scale.length >= 2 && tie.length >= 6,
      "GeoTIFF lacks ModelPixelScale/ModelTiepoint (non-axis-aligned transforms unsupported)")
    // geotransform[0/3] from tiepoint (raster point 0,0 -> model X,Y)
    val originX = tie(3) - tie(0) * scale(0)
    val originY = tie(4) + tie(1) * scale(1)

    // GeoKey directory: 4-short header then (keyId, tagLoc, count, value)
    val geokeys = longs(34735)
    var epsg = 0
    var gk = 4
    while (gk + 3 < geokeys.length) {
      val keyId = geokeys(gk).toInt
      val tagLoc = geokeys(gk + 1).toInt
      val value = geokeys(gk + 3).toInt
      // 3072 ProjectedCSType wins over 2048 GeographicType when both present
      if (tagLoc == 0 && keyId == 3072) epsg = value
      else if (tagLoc == 0 && keyId == 2048 && epsg == 0) epsg = value
      gk += 4
    }
    require(epsg > 0, "GeoTIFF lacks an EPSG code in its GeoKey directory")

    GeoTiff(Grid(rows, cols, values, mask), originX, originY, scale(0), scale(1), epsg, nodata)
  }
}
