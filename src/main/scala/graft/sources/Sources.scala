package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DEM source plugin registry (SURVEY.md §2.1 S9), mirroring the
  * reference's Source base class + nickname registry + pool
  * (/root/reference/pyhgtmap/sources/__init__.py:24-130, sources/pool.py):
  *
  *  - a source has a 4-char nickname, supported resolutions (arc-seconds),
  *    and a per-resolution cache dir `{NICKNAME}{res}/{key}.hgt`;
  *  - cached files are validated by exact size (2*(3600/res+1)^2);
  *  - a preference list like "view1,view3,srtm1" resolves per key to the
  *    first source that can provide the file.
  *
  * Network downloaders (S10-S13) are excused by the zero-egress mandate;
  * the bundled sources are the deterministic synthesizer (`synt1`/`synt3`)
  * and a read-only local-directory source (`locl`) for pre-provisioned
  * caches. New sources register via `Sources.register`.
  */
trait DemSource extends Serializable {
  /** 4-char nickname (reference enforces exactly 4; we do too). */
  def nickname: String
  def supportedResolutions: Seq[Int] = Seq(1, 3)
  def fileExtension: String = "hgt"

  /** Produce (or locate) the file for `key` at `resolution` under
    * cacheRoot; None if this source cannot provide it. */
  def fetch(cacheRoot: String, key: String, resolution: Int): Option[String]

  /** Force-rebuild any persisted availability index (reference
    * --rewrite-indices, NASASRTMUtil.py:421). Default: nothing persisted. */
  def refreshIndex(cacheRoot: String, resolution: Int): Unit = ()

  /** Keys this source can currently provide WITHOUT fetching (the
    * reference's per-source index files, NASASRTMUtil.py:163-290). The
    * default indexes the local cache; sources with a remote catalogue
    * override. An empty index does not mean fetch() would fail — the
    * synthesizer can produce any key. */
  def index(cacheRoot: String, resolution: Int): Seq[String] =
    graft.core.Fs.listFiles(cacheDir(cacheRoot, resolution))
      .filter(p => p.endsWith(".hgt") && validCached(p, resolution))
      .map(_.split('/').last.stripSuffix(".hgt"))

  final def cacheDir(cacheRoot: String, resolution: Int): String =
    s"$cacheRoot/${nickname.toUpperCase}$resolution"

  /** Exact-size validation of a cached hgt (reference check_cached_file);
    * Hadoop-FS path so any scheme (and Fs.listFiles URIs) validate. */
  final def validCached(path: String, resolution: Int): Boolean = {
    val len = graft.core.Fs.fileLength(path)
    if (len < 0) return false
    if (!path.endsWith(".hgt")) return true
    val side = 3600 / resolution + 1
    len == 2L * side * side
  }
}

/** Deterministic synthesizer source (zero-egress stand-in for downloads). */
final class SynthSource extends DemSource {
  val nickname = "synt"
  override def fetch(cacheRoot: String, key: String, resolution: Int): Option[String] = {
    if (!supportedResolutions.contains(resolution)) return None
    val bbox = try graft.core.Hgt.parseHgtFilename(s"$key.hgt") catch { case _: Exception => return None }
    val dir = cacheDir(cacheRoot, resolution)
    val side = 3600 / resolution + 1
    val p = s"$dir/$key.hgt"
    if (validCached(p, resolution)) Some(p)
    else Some(graft.synth.SynthDem.writeHgt(dir, bbox.minLat.toInt, bbox.minLon.toInt, side))
  }
}

/** Read-only local cache source: serves whatever a previous provisioning
  * step placed under its cache dir; never creates files. Also the
  * zero-egress stand-in shape for the reference's per-tile download
  * sources (srtm/sonny), which differ only in WHERE the cache dir gets
  * provisioned from. */
final class LocalDirSource(val nickname: String = "locl") extends DemSource {
  override def fetch(cacheRoot: String, key: String, resolution: Int): Option[String] = {
    val p = s"${cacheDir(cacheRoot, resolution)}/$key.hgt"
    if (validCached(p, resolution)) Some(p) else None
  }
}

/** Shared multi-tile ZIP extraction: every .hgt member lands in `dir`
  * through the Hadoop FS (cache may live on any scheme) with a
  * per-attempt unique tmp + no-clobber publish. A shared tmp name would
  * let Fs.create truncate a concurrent task's in-progress extraction and
  * publish a zero-filled .hgt that still passes the size check; losing
  * the publish race is fine iff the winner's file validates. Returns the
  * member keys seen in the archive (cached-valid members included —
  * they're skipped, not re-extracted). */
private[sources] object ZipHgt {
  def extractAll(archive: String, dir: String, valid: String => Boolean): Seq[String] = {
    graft.core.Fs.mkdirs(dir)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val zin = new java.util.zip.ZipInputStream(
      new java.io.BufferedInputStream(graft.core.Fs.open(archive), 1 << 16))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        // case-insensitive extension + normalized (uppercase-stem) cache
        // name: the reference lowercases before the endswith test
        // (viewfinder archives ship N01W056.HGT / n01w056.hgt variants),
        // and the `$key.hgt` lookup side always asks in upper case — a
        // case-preserving extract would cache under a name never found
        val rawName = e.getName.split('/').last
        val isHgt = rawName.toLowerCase(java.util.Locale.ROOT).endsWith(".hgt")
        val name = if (isHgt) rawName.dropRight(4).toUpperCase(java.util.Locale.ROOT) + ".hgt"
                   else rawName
        val dst = s"$dir/$name"
        if (!e.isDirectory && isHgt) {
          seen += name.stripSuffix(".hgt")
          if (!valid(dst)) {
            val tmp = s"$dir/.$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp"
            val out = graft.core.Fs.create(tmp)
            try {
              val buf = new Array[Byte](1 << 16)
              var n = zin.read(buf)
              while (n >= 0) {
                if (n > 0) out.write(buf, 0, n)
                n = zin.read(buf)
              }
            } finally out.close()
            // no-clobber publish: local FS atomically replaces with
            // identical content; HDFS-style FSes fail when a concurrent
            // task already published. (A delete-then-rename here would
            // transiently delete the winner's live file under a reader.)
            try graft.core.Fs.renameNoClobber(tmp, dst)
            catch {
              case ex: java.io.IOException =>
                graft.core.Fs.delete(tmp)
                if (!valid(dst)) throw ex
            }
          }
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    seen.toSeq
  }
}

/** Archive-mirror source: the downloader shape of the reference's
  * viewfinder/ALOS sources (sources/viewfinder.py, sources/alos.py) minus
  * the network — tiles ship in multi-tile ZIP archives named by their
  * ALOS-style 5-degree group (`N040E005.zip` holds N43E006.hgt ...), the
  * archive is fetched from a mirror URI (any Hadoop-FS scheme; file:// in
  * this sandbox), unpacked, and every member tile lands in the cache so
  * neighbouring fetches hit warm. */
final class ArchiveSource(
    mirrorBase: String,
    val nickname: String = "arch",
    resolutions: Seq[Int] = Seq(1, 3)) extends DemSource {
  override def supportedResolutions: Seq[Int] = resolutions

  /** In-JVM catalogue cache; never serialized (each executor re-reads the
    * persisted index or rebuilds from the mirror). */
  @transient @volatile private var catCache: (String, Map[String, String]) = null

  private def indexPath(cacheRoot: String, resolution: Int): String =
    s"${cacheDir(cacheRoot, resolution)}/.index"

  /** Fingerprint of the mirror's archive listing (names + sizes): a member
    * added/removed/replaced changes it, which invalidates the index. */
  private def mirrorFingerprint(): String = {
    // one listStatus round trip: names + sizes together (a per-file stat
    // here would cost O(archives) RPCs on EVERY fetch's staleness check)
    val entries = graft.core.Fs.listFilesWithLen(mirrorBase)
      .filter(_._1.endsWith(".zip"))
      .map { case (p, len) => s"${p.split('/').last}:$len" }
      .sorted
    java.lang.Long.toHexString(
      entries.foldLeft(17L)((h, e) => graft.functions.SplitMix64.mix(h ^ e.hashCode.toLong)))
  }

  private def scanMirror(): Map[String, String] =
    graft.core.Fs.listFiles(mirrorBase)
      .filter(_.endsWith(".zip"))
      .flatMap { archive =>
        val zin = new java.util.zip.ZipInputStream(
          new java.io.BufferedInputStream(graft.core.Fs.open(archive), 1 << 16))
        try {
          val names = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          var e = zin.getNextEntry
          while (e != null) {
            // same case normalization as ZipHgt.extractAll: the lookup
            // side keys on the uppercase stem
            val name = e.getName.split('/').last
            if (!e.isDirectory && name.toLowerCase(java.util.Locale.ROOT).endsWith(".hgt"))
              names += ((name.dropRight(4).toUpperCase(java.util.Locale.ROOT), archive))
            zin.closeEntry()
            e = zin.getNextEntry
          }
          names.toSeq
        } finally zin.close()
      }.toMap

  /** Persisted key->archive catalogue with self-heal (the reference's
    * rebuild-on-corruption index story, sources/viewfinder.py:149-272):
    * the index file carries the mirror fingerprint on its first line; a
    * corrupt file, a fingerprint mismatch (archive added/removed), or a
    * vanished archive all trigger a transparent rescan + rewrite. */
  private def catalogue(cacheRoot: String, resolution: Int): Map[String, String] = {
    val fp = mirrorFingerprint()
    val cached = catCache
    if (cached != null && cached._1 == fp) return cached._2
    val path = indexPath(cacheRoot, resolution)
    val persisted: Option[Map[String, String]] =
      if (!graft.core.Fs.exists(path)) None
      else try {
        val lines = graft.core.Fs.readString(path).split('\n')
        if (lines.isEmpty || lines.head != fp) None // stale: mirror changed
        else Some(lines.tail.filter(_.nonEmpty).map { l =>
          val Array(k, a) = l.split('\t')
          k -> a
        }.toMap)
      } catch { case _: Exception => None } // corrupt: rebuild below
    val cat = persisted.getOrElse {
      val fresh = scanMirror()
      graft.core.Fs.mkdirs(cacheDir(cacheRoot, resolution))
      // unique tmp + rename: concurrent rebuilds are benign (same content)
      val tmp = s"$path.${java.util.UUID.randomUUID().toString.take(8)}.tmp"
      graft.core.Fs.writeString(tmp,
        (fp +: fresh.toSeq.sorted.map { case (k, a) => s"$k\t$a" }).mkString("\n"))
      // the index file DOES intend replace (a stale index sits at `path`)
      try graft.core.Fs.rename(tmp, path)
      catch { case _: java.io.IOException => graft.core.Fs.delete(tmp) }
      fresh
    }
    catCache = (fp, cat)
    cat
  }

  override def fetch(cacheRoot: String, key: String, resolution: Int): Option[String] = {
    if (!supportedResolutions.contains(resolution)) return None
    val dir = cacheDir(cacheRoot, resolution)
    val cached = s"$dir/$key.hgt"
    if (validCached(cached, resolution)) return Some(cached)
    val bbox = try graft.core.Hgt.parseHgtFilename(s"$key.hgt") catch { case _: Exception => return None }
    // locate the archive via the persisted catalogue (archives need not be
    // group-aligned); fall back to the ALOS 5-degree group-key arithmetic
    val group = graft.core.Hgt.alosGroupKey(bbox.minLat.toInt, bbox.minLon.toInt)
    def resolveArchive(cat: Map[String, String]): Option[String] =
      cat.get(key).orElse(Some(s"$mirrorBase/$group.zip")).filter(graft.core.Fs.exists)
    val archive = resolveArchive(catalogue(cacheRoot, resolution)).orElse {
      // self-heal: the catalogue pointed at a vanished archive (or missed
      // a new one) — force a rescan and retry once
      catCache = null
      graft.core.Fs.delete(indexPath(cacheRoot, resolution))
      resolveArchive(catalogue(cacheRoot, resolution))
    }.getOrElse(return None)
    ZipHgt.extractAll(archive, dir, validCached(_, resolution))
    if (validCached(cached, resolution)) Some(cached) else None
  }

  /** Mirror catalogue: every .hgt member of every group archive (persisted
    * index, self-healing) plus whatever is already cached. */
  override def index(cacheRoot: String, resolution: Int): Seq[String] = {
    val cachedKeys = super.index(cacheRoot, resolution)
    (cachedKeys ++ catalogue(cacheRoot, resolution).keys).distinct
  }

  /** Force-rebuild the persisted catalogue (reference --rewrite-indices). */
  override def refreshIndex(cacheRoot: String, resolution: Int): Unit = {
    catCache = null
    graft.core.Fs.delete(indexPath(cacheRoot, resolution))
    catalogue(cacheRoot, resolution)
  }
}

/** Per-tile remote source (S11, the srtm/sonny downloader shape): each
  * tile resolves through a URI TEMPLATE (`{key}`, `{res}`, `{group}`
  * placeholders) against any Hadoop-FS base — file:// in this sandbox,
  * http-backed FS / object store on a cluster; the network transport
  * itself is excused by the zero-egress mandate, everything around it is
  * real: template resolution, single-member .zip / .gz unwrapping
  * (NASA ships N43E006.SRTMGL1.hgt.zip), bounded retry, and the same
  * validated tmp+rename cache publish as ArchiveSource. */
final class UriTemplateSource(
    base: String,
    template: String, // e.g. "{res}/{key}.hgt.zip" or "{key}.hgt.gz"
    val nickname: String,
    resolutions: Seq[Int] = Seq(1, 3),
    retries: Int = 2) extends DemSource {
  override def supportedResolutions: Seq[Int] = resolutions

  private def resolve(key: String, res: Int): String = {
    val bbox = graft.core.Hgt.parseHgtFilename(s"$key.hgt")
    val group = graft.core.Hgt.alosGroupKey(bbox.minLat.toInt, bbox.minLon.toInt)
    s"$base/${template.replace("{key}", key).replace("{res}", res.toString).replace("{group}", group)}"
  }

  /** Unwrap the remote payload to raw .hgt bytes on the fly; never leaks
    * the underlying stream when unwrapping fails. */
  private def open(uri: String): java.io.InputStream = {
    val raw = new java.io.BufferedInputStream(graft.core.Fs.open(uri), 1 << 16)
    try {
      if (uri.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw, 1 << 16)
      else if (uri.endsWith(".zip")) {
        val zin = new java.util.zip.ZipInputStream(raw)
        var e = zin.getNextEntry
        while (e != null &&
            (e.isDirectory || !e.getName.toLowerCase(java.util.Locale.ROOT).endsWith(".hgt"))) {
          zin.closeEntry(); e = zin.getNextEntry
        }
        if (e == null) throw new java.io.IOException(s"no .hgt member in $uri")
        zin
      } else raw
    } catch { case t: Throwable => raw.close(); throw t }
  }

  override def fetch(cacheRoot: String, key: String, resolution: Int): Option[String] = {
    if (!supportedResolutions.contains(resolution)) return None
    val dir = cacheDir(cacheRoot, resolution)
    val dst = s"$dir/$key.hgt"
    if (validCached(dst, resolution)) return Some(dst)
    val uri = try resolve(key, resolution) catch { case _: Exception => return None }
    if (!graft.core.Fs.exists(uri)) return None
    graft.core.Fs.mkdirs(dir)
    var attempt = 0
    while (attempt <= retries) {
      attempt += 1
      val tmp = s"$dir/.$key.${java.util.UUID.randomUUID().toString.take(8)}.tmp"
      try {
        val in = open(uri)
        try {
          val out = graft.core.Fs.create(tmp)
          try {
            val buf = new Array[Byte](1 << 16)
            var n = in.read(buf)
            while (n >= 0) {
              if (n > 0) out.write(buf, 0, n)
              n = in.read(buf)
            }
          } finally out.close()
        } finally in.close()
        // validate BEFORE publish: a truncated transfer never enters the
        // cache (explicit size check — validCached only applies to .hgt)
        val side = 3600 / resolution + 1
        val len = graft.core.Fs.fileLength(tmp)
        if (len != 2L * side * side)
          throw new java.io.IOException(s"bad size for $key: $len")
        // no-clobber publish (see ArchiveSource): losing the race is fine
        // iff the winner's file validates
        try graft.core.Fs.renameNoClobber(tmp, dst)
        catch {
          case e: java.io.IOException =>
            graft.core.Fs.delete(tmp)
            if (!validCached(dst, resolution)) throw e
        }
        return Some(dst)
      } catch {
        case _: Exception if attempt <= retries => graft.core.Fs.delete(tmp)
        case e: Exception => graft.core.Fs.delete(tmp); throw e
      }
    }
    None // unreachable
  }
}

object Sources {
  private val registry = scala.collection.concurrent.TrieMap.empty[String, DemSource]

  def register(s: DemSource): Unit = {
    require(s.nickname.length == 4, "source nickname must be exactly 4 chars")
    registry.put(s.nickname.take(4).toLowerCase, s)
  }

  register(new SynthSource)
  register(new LocalDirSource)
  // archive mirror base resolves from the environment so spark-submit can
  // point it at the cluster's mirror; default matches the test layout
  private def mirror(env: String): String =
    sys.env.getOrElse(env,
      sys.env.getOrElse("SPARK_GRAFT_ARCHIVE_MIRROR", "/tmp/graft_mirror"))
  register(new ArchiveSource(mirror("SPARK_GRAFT_ARCHIVE_MIRROR")))
  // the reference's source nicknames (sources/*.py NICKNAME) so its
  // preference strings parse unchanged: viewfinder and ALOS ship
  // multi-tile zip archives (archive-mirror shape; ALOS is 1" only,
  // alos.py:63), srtm and sonny are per-tile downloads (read-only
  // provisioned-cache shape under the zero-egress mandate)
  // viewfinder resolves tiles through its coverage-map zone index when a
  // coverage HTML is provisioned (SPARK_GRAFT_VIEW_COVERAGE), falling
  // back to the plain archive catalogue otherwise
  register(new ViewfinderSource(mirror("SPARK_GRAFT_VIEW_MIRROR"),
    sys.env.get("SPARK_GRAFT_VIEW_COVERAGE")))
  register(new ArchiveSource(mirror("SPARK_GRAFT_ALOS_MIRROR"), "alos", Seq(1)))
  // per-tile sources: serve from cache first; fetch single tiles through
  // a URI template against any Hadoop-FS base when one is provisioned
  // (srtm ships zipped NASA-style names, sonny gzipped tiles)
  register(new UriTemplateSource(
    sys.env.getOrElse("SPARK_GRAFT_SRTM_BASE", "/tmp/graft_srtm"),
    "{key}.SRTMGL{res}.hgt.zip", "srtm"))
  register(new UriTemplateSource(
    sys.env.getOrElse("SPARK_GRAFT_SONN_BASE", "/tmp/graft_sonn"),
    "{res}/{key}.hgt.gz", "sonn"))

  def get(nickname: String): Option[DemSource] = registry.get(nickname.toLowerCase)

  /** Parse "view1,view3"-style preference strings into (source, resolution)
    * pairs (reference supported_source_options: nickname + resolution). */
  def parsePreference(prefs: Seq[String]): Seq[(DemSource, Int)] =
    prefs.map { p =>
      val (nick, resStr) = p.splitAt(4)
      val res = try resStr.toInt catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"bad source option '$p' (want <4-char nickname><resolution>, e.g. synt3)")
      }
      val src = get(nick).getOrElse(
        throw new IllegalArgumentException(s"unknown DEM source '$nick' (registered: ${registry.keys.mkString(",")})"))
      require(src.supportedResolutions.contains(res), s"$nick does not support ${res}s resolution")
      (src, res)
    }

  /** Force-rebuild every preference source's availability index
    * (reference --rewrite-indices semantics, cli.py:475-476). */
  def rewriteIndices(cacheRoot: String, prefs: Seq[String]): Unit =
    parsePreference(prefs).foreach { case (src, res) =>
      src.refreshIndex(cacheRoot, res)
    }

  /** Availability index across preference-ordered sources (S13): one
    * (key, source) row per providable tile — the exact input shape of
    * TileKeys.resolveSources' priority pick. */
  def buildIndex(
      spark: SparkSession,
      cacheRoot: String,
      prefs: Seq[String]): DataFrame = {
    import spark.implicits._
    parsePreference(prefs)
      .flatMap { case (src, res) =>
        src.index(cacheRoot, res).map(k => (k, s"${src.nickname}$res"))
      }
      .toDF("key", "source")
  }

  /** Distributed pool fetch: resolve every wanted key to the first
    * preference-ordered source that provides it (reference pool.py
    * semantics), fanned out over executors as a real download fleet would
    * be. Returns (key, source, path); keys nobody can provide are absent. */
  def fetchAll(
      spark: SparkSession,
      cacheRoot: String,
      keys: Seq[String],
      prefs: Seq[String]): DataFrame = {
    import spark.implicits._
    // resolve on the DRIVER and ship the DemSource instances in the closure:
    // executor JVMs only re-register the built-ins at object init, so a
    // plugin registered via Sources.register (or an ArchiveSource whose
    // mirror base came from the driver's env) must travel by value, not be
    // re-looked-up from each executor's registry/environment
    val resolved = parsePreference(prefs)
    if (keys.isEmpty) return Seq.empty[(String, String, String)].toDF("key", "source", "path")
    val root = cacheRoot
    keys.toDS()
      .repartition(math.min(keys.size, spark.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        it.flatMap { key =>
          resolved.iterator
            .flatMap { case (src, res) =>
              src.fetch(root, key, res).map(p => (key, s"${src.nickname}$res", p))
            }
            .take(1)
        }
      }
      .toDF("key", "source", "path")
  }
}
