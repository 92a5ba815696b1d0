package graft.sources

import graft.core.Fs

/** Viewfinder coverage-map index (reference S10, sources/viewfinder.py):
  * the provider publishes an HTML world-map page whose image-map `<area>`
  * tags link pixel rectangles to multi-tile ZIP archives; parsing it
  * yields the zone index (ZIP URL -> covered 1-degree area names) that
  * drives archive selection. The pixel->degree arithmetic (inner_areas,
  * viewfinder.py:23-53, including its +0.5 rounding and the hemisphere
  * letter taken from the zone's SOUTH edge) and the persisted index text
  * format (viewfinderHgtIndex_N.txt, viewfinder.py:103-135) are
  * reproduced exactly — the reference's own HTML fixture parses to the
  * same entries its tests pin. Only the map/zip network transport stays
  * excused by the zero-egress mandate: both arrive as Hadoop-FS paths.
  */
object Viewfinder {

  /** Coverage map is 1800x900 px for 360x180 degrees. */
  val MapWidth = 1800
  private val Ratio = MapWidth / 360.0

  /** Index file version per resolution (reference DESIRED_INDEX_VERSION). */
  val DesiredIndexVersion: Map[Int, Int] = Map(1 -> 2, 3 -> 4)

  /** 1-degree area names inside a map zone given its image-map pixel
    * coords "left,top,right,bottom". */
  def innerAreas(coordTag: String): Seq[String] = {
    val Array(left, top, right, bottom) = coordTag.split(",").map(_.trim.toInt)
    val west = (left / Ratio + 0.5).toInt - 180
    val east = (right / Ratio + 0.5).toInt - 180
    val south = 90 - (bottom / Ratio + 0.5).toInt
    val north = 90 - (top / Ratio + 0.5).toInt
    for {
      lon <- west until east
      lat <- south until north
    } yield {
      val lonName = if (lon < 0) f"W${-lon}%03d" else f"E$lon%03d"
      val latName = if (south < 0) f"S${-lat}%02d" else f"N$lat%02d"
      s"$latName$lonName"
    }
  }

  /** Parse a coverage-map HTML document's `<area ... coords=".."
    * href="..">` tags into zip-URL -> covered-area-names entries
    * (document order per URL; each tag's areas sorted, mirroring
    * init_from_web's `extend(sorted(...))`). */
  def parseCoverageMap(html: String): Map[String, Seq[String]] = {
    val areaTag = "(?is)<area\\b[^>]*>".r
    val coordsAttr = "(?is)coords\\s*=\\s*\"([^\"]*)\"".r
    val hrefAttr = "(?is)href\\s*=\\s*\"([^\"]*)\"".r
    val entries = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    areaTag.findAllIn(html).foreach { tag =>
      for {
        coords <- coordsAttr.findFirstMatchIn(tag).map(_.group(1))
        href <- hrefAttr.findFirstMatchIn(tag).map(_.group(1).trim)
      } {
        val names = innerAreas(coords).map(_.toUpperCase).sorted
        entries(href) = entries.getOrElse(href, Vector.empty) ++ names
      }
    }
    entries.toMap
  }

  /** Serialize in the reference's exact index file format. */
  def render(entries: Map[String, Seq[String]], resolution: Int): String = {
    val sb = new StringBuilder
    sb.append(s"# VIEW$resolution index file, VERSION=${DesiredIndexVersion(resolution)}\n")
    entries.keys.toSeq.sorted.foreach { url =>
      sb.append(s"[$url]\n")
      entries(url).foreach(a => sb.append(a).append('\n'))
    }
    sb.toString
  }

  /** Parse the reference's index file format ('#' comments, '[url]'
    * section headers, one area name per line). */
  def parseIndex(text: String): Map[String, Seq[String]] = {
    val entries = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    var current: String = null
    text.linesIterator.foreach { line =>
      if (line.startsWith("#")) ()
      else if (line.startsWith("[")) {
        current = line.trim.stripPrefix("[").stripSuffix("]")
        if (!entries.contains(current)) entries(current) = Vector.empty
      } else if (line.trim.nonEmpty) {
        require(current != null, "Invalid syntax, current_url expected")
        entries(current) = entries(current) :+ line.trim
      }
    }
    entries.toMap
  }
}

/** Persisted viewfinder zone index under a cache root (one file per
  * resolution, reference ViewFinderIndex). `coverageMap` is the local /
  * Hadoop-FS path of the coverage HTML used to (re)build the index when
  * the file is absent. */
final class ViewfinderIndex(cacheRoot: String, resolution: Int,
    coverageMap: Option[String]) {

  def indexFile: String = s"$cacheRoot/viewfinderHgtIndex_$resolution.txt"

  @volatile private var cached: Map[String, Seq[String]] = null

  def entries: Map[String, Seq[String]] = {
    val c = cached
    if (c != null) return c
    val loaded =
      if (Fs.exists(indexFile))
        try Some(Viewfinder.parseIndex(Fs.readString(indexFile)))
        catch { case _: Exception => None } // corrupt: rebuild below
      else None
    val e = loaded.getOrElse {
      val map = coverageMap.getOrElse(
        throw new java.io.FileNotFoundException(
          s"$indexFile absent and no coverage map configured"))
      val fresh = Viewfinder.parseCoverageMap(Fs.readString(map))
      save(fresh)
      fresh
    }
    cached = e
    e
  }

  private def save(e: Map[String, Seq[String]]): Unit = {
    Fs.mkdirs(cacheRoot)
    Fs.writeString(indexFile, Viewfinder.render(e, resolution))
  }

  /** Replace a zone's area list with what its archive actually contained
    * (coverage zones are optimistic: sea tiles don't exist), persisting
    * only on change — reference ViewFinderIndex.update. */
  def update(zipUrl: String, coveredAreas: Seq[String]): Unit = {
    val sortedCovered = coveredAreas.sorted
    if (entries.get(zipUrl).map(_.sorted).getOrElse(Nil) != sortedCovered) {
      val next = entries.updated(zipUrl, sortedCovered)
      save(next)
      cached = next
    }
  }

  /** ZIP URLs potentially containing an area (zones overlap), sorted. */
  def urlsForArea(areaName: String): Seq[String] =
    entries.collect { case (url, areas) if areas.contains(areaName) => url }.toSeq.sorted
}

/** Coverage-indexed archive source: resolves a tile key through the
  * viewfinder zone index (coverage HTML -> index file -> candidate ZIPs),
  * fetches each candidate from the mirror by its URL basename, extracts
  * all members (neighbouring fetches hit warm), and self-corrects the
  * index with the archive's ACTUAL contents. Falls back to the plain
  * archive-catalogue shape when no coverage map is configured, so the
  * existing `view` preference strings keep working unchanged. */
final class ViewfinderSource(
    mirrorBase: String,
    coverageMap: Option[String],
    val nickname: String = "view",
    resolutions: Seq[Int] = Seq(1, 3)) extends DemSource {
  override def supportedResolutions: Seq[Int] = resolutions

  private val fallback = new ArchiveSource(mirrorBase, nickname, resolutions)

  private def indexFor(cacheRoot: String, resolution: Int) =
    new ViewfinderIndex(cacheDir(cacheRoot, resolution), resolution, coverageMap)

  override def fetch(cacheRoot: String, key: String, resolution: Int): Option[String] = {
    if (!supportedResolutions.contains(resolution)) return None
    val dir = cacheDir(cacheRoot, resolution)
    val cached = s"$dir/$key.hgt"
    if (validCached(cached, resolution)) return Some(cached)
    if (coverageMap.isEmpty) return fallback.fetch(cacheRoot, key, resolution)
    val idx = indexFor(cacheRoot, resolution)
    val candidates = idx.urlsForArea(key.toUpperCase)
    candidates.foreach { url =>
      val archive = s"$mirrorBase/${url.split('/').last}"
      if (Fs.exists(archive)) {
        val seen = ZipHgt.extractAll(archive, dir, validCached(_, resolution))
        // zones are optimistic (sea tiles absent): record what the ZIP
        // actually held so the next resolution of a missing tile skips it
        idx.update(url, seen.map(_.toUpperCase))
        if (validCached(cached, resolution)) return Some(cached)
      }
    }
    fallback.fetch(cacheRoot, key, resolution)
  }

  override def index(cacheRoot: String, resolution: Int): Seq[String] = {
    val viaCoverage =
      if (coverageMap.isEmpty) Nil
      else indexFor(cacheRoot, resolution).entries.values.flatten.toSeq
    (super.index(cacheRoot, resolution) ++ viaCoverage ++
      fallback.index(cacheRoot, resolution)).distinct
  }

  override def refreshIndex(cacheRoot: String, resolution: Int): Unit = {
    Fs.delete(indexFor(cacheRoot, resolution).indexFile)
    fallback.refreshIndex(cacheRoot, resolution)
  }
}
