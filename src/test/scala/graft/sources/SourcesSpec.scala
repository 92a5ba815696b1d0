package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Test plugin source (top-level so closure serialization ships no outer
  * test-suite reference): synthesizes like SynthSource, own cache dir. */
final class PluginSource extends DemSource {
  val nickname = "plug"
  override def fetch(cacheRoot: String, key: String, resolution: Int): Option[String] = {
    if (!supportedResolutions.contains(resolution)) return None
    val bbox = try graft.core.Hgt.parseHgtFilename(s"$key.hgt") catch { case _: Exception => return None }
    val side = 3600 / resolution + 1
    Some(graft.synth.SynthDem.writeHgt(
      cacheDir(cacheRoot, resolution), bbox.minLat.toInt, bbox.minLon.toInt, side))
  }
}

/** Source plugin registry + pool semantics (S9): nickname registry,
  * cache layout, size validation, preference-ordered resolution. */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("sources-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("registry rejects bad nicknames, parses preference strings") {
    assertThrows[IllegalArgumentException](
      Sources.register(new DemSource {
        val nickname = "toolong"
        def fetch(c: String, k: String, r: Int) = None
      }))
    val parsed = Sources.parsePreference(Seq("synt3", "locl1"))
    assert(parsed.map(_._2) == Seq(3, 1))
    assertThrows[IllegalArgumentException](Sources.parsePreference(Seq("nope3")))
  }

  test("synth source writes valid-size tiles into its cache dir; local source only reads") {
    val root = java.nio.file.Files.createTempDirectory("srcroot").toString
    val syn = new SynthSource
    val p = syn.fetch(root, "N10E010", 3).get
    assert(p == s"$root/SYNT3/N10E010.hgt")
    assert(new java.io.File(p).length == 2L * 1201 * 1201)
    assert(syn.validCached(p, 3))
    assert(!syn.validCached(p, 1)) // wrong size for 1s resolution
    val loc = new LocalDirSource
    assert(loc.fetch(root, "N10E010", 3).isEmpty) // different cache dir
    // provision the local cache by copying, then it serves
    val locDir = new java.io.File(loc.cacheDir(root, 3))
    locDir.mkdirs()
    java.nio.file.Files.copy(java.nio.file.Paths.get(p),
      java.nio.file.Paths.get(locDir.toString, "N10E010.hgt"))
    assert(loc.fetch(root, "N10E010", 3).isDefined)
  }

  test("archive source unpacks 5-degree group zips from a mirror") {
    val root = java.nio.file.Files.createTempDirectory("archroot").toString
    val mirror = java.nio.file.Files.createTempDirectory("mirror").toString
    // build N040E005.zip holding two member tiles of that ALOS group
    val syn = new SynthSource
    val members = Seq("N43E006", "N44E007")
    val zipPath = s"$mirror/N040E005.zip"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipPath))
    try members.foreach { k =>
      val p = syn.fetch(root, k, 3).get
      zos.putNextEntry(new java.util.zip.ZipEntry(s"$k.hgt"))
      zos.write(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
      zos.closeEntry()
    } finally zos.close()
    val arch = new ArchiveSource(mirror)
    val cacheRoot = java.nio.file.Files.createTempDirectory("archcache").toString
    // one fetch unpacks the whole group: the sibling is already cached
    val got = arch.fetch(cacheRoot, "N43E006", 3)
    assert(got.contains(s"$cacheRoot/ARCH3/N43E006.hgt"))
    assert(new java.io.File(s"$cacheRoot/ARCH3/N44E007.hgt").length == 2L * 1201 * 1201)
    assert(arch.fetch(cacheRoot, "N44E007", 3).isDefined)
    // a key whose group archive is absent falls through
    assert(arch.fetch(cacheRoot, "N10E110", 3).isEmpty)
    // preference order: archive mirror wins over synthesis when present
    val rows = Sources.fetchAll(spark, cacheRoot,
        Seq("N43E006", "N10E110"), Seq("arch3", "synt3"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("N10E110") == "synt3")
    // (mirror base for the registered instance comes from the env default;
    // this direct-instance test pins the unpack/caching contract)
  }

  test("archive members with .HGT / lowercase-stem names normalize to the cache key") {
    // the reference lowercases before its endswith('.hgt') test
    // (viewfinder archives ship mixed-case member names); a
    // case-preserving extract would cache n43e006.hgt under a name the
    // uppercase `$key.hgt` lookup never finds and the index self-heal
    // would then drop the area permanently
    val root = java.nio.file.Files.createTempDirectory("caseroot").toString
    val mirror = java.nio.file.Files.createTempDirectory("casemirror").toString
    val syn = new SynthSource
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$mirror/N040E005.zip"))
    try Seq("N43E006" -> "subdir/n43e006.hgt", "N44E007" -> "N44E007.HGT").foreach {
      case (k, member) =>
        val p = syn.fetch(root, k, 3).get
        zos.putNextEntry(new java.util.zip.ZipEntry(member))
        zos.write(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
        zos.closeEntry()
    } finally zos.close()
    val arch = new ArchiveSource(mirror)
    val cacheRoot = java.nio.file.Files.createTempDirectory("casecache").toString
    // both mixed-case members resolve under the canonical uppercase names
    assert(arch.fetch(cacheRoot, "N43E006", 3).contains(s"$cacheRoot/ARCH3/N43E006.hgt"))
    assert(arch.fetch(cacheRoot, "N44E007", 3).contains(s"$cacheRoot/ARCH3/N44E007.hgt"))
    assert(new java.io.File(s"$cacheRoot/ARCH3/N44E007.hgt").length == 2L * 1201 * 1201)
  }

  test("availability index feeds the priority pick (S13 -> J2)") {
    val root = java.nio.file.Files.createTempDirectory("idxroot").toString
    val syn = new SynthSource
    // cache holds N30E030 under LOCL3 and N31E030 under LOCL1
    Seq((3, "N30E030"), (1, "N31E030")).foreach { case (res, k) =>
      val side = 3600 / res + 1
      val d = s"$root/LOCL$res"
      new java.io.File(d).mkdirs()
      graft.synth.SynthDem.writeHgt(d, k.substring(1, 3).toInt, k.substring(4).toInt, side)
    }
    val idx = Sources.buildIndex(spark, root, Seq("locl1", "locl3"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(idx == Set(("N30E030", "locl3"), ("N31E030", "locl1")))
    // and the priority pick resolves per preference order
    val resolved = graft.engine.TileKeys.resolveSources(
        spark,
        Seq(("N30E030", false), ("N31E030", false), ("N99E099", false)),
        Sources.buildIndex(spark, root, Seq("locl1", "locl3")),
        Seq("locl1", "locl3"))
      .collect().map(r => (r.getString(1), r.getString(0))).toMap
    assert(resolved == Map("locl3" -> "N30E030", "locl1" -> "N31E030"))
  }

  test("reference nicknames parse: view/alos archive-shaped, srtm/sonn cache-shaped") {
    val parsed = Sources.parsePreference(Seq("view1", "view3", "srtm1", "sonn1", "alos1"))
    assert(parsed.map(_._1.nickname) == Seq("view", "view", "srtm", "sonn", "alos"))
    // ALOS is 1-arcsecond only (reference alos.py:63)
    assertThrows[IllegalArgumentException](Sources.parsePreference(Seq("alos3")))
    assert(Sources.get("view").get.isInstanceOf[ViewfinderSource])
    assert(Sources.get("alos").get.isInstanceOf[ArchiveSource])
    assert(Sources.get("srtm").get.isInstanceOf[UriTemplateSource])
    // a provisioned SRTM1 cache serves through the reference nickname
    val root = java.nio.file.Files.createTempDirectory("srtmroot").toString
    val side = 3601
    graft.synth.SynthDem.writeHgt(s"$root/SRTM1", 40, 8, side)
    assert(Sources.get("srtm").get.fetch(root, "N40E008", 1)
      .contains(s"$root/SRTM1/N40E008.hgt"))
  }

  test("per-tile URI-template source: zip + gz unwrap, size gate, cache publish") {
    val base = java.nio.file.Files.createTempDirectory("uribase").toString
    val cacheRoot = java.nio.file.Files.createTempDirectory("uricache").toString
    val scratch = java.nio.file.Files.createTempDirectory("uriscratch").toString
    val syn = new SynthSource
    val hgt = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(syn.fetch(scratch, "N41E009", 3).get))
    // NASA-style single-member zip
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$base/N41E009.SRTMGL3.hgt.zip"))
    zos.putNextEntry(new java.util.zip.ZipEntry("N41E009.hgt"))
    zos.write(hgt); zos.closeEntry(); zos.close()
    val srtm = new UriTemplateSource(base, "{key}.SRTMGL{res}.hgt.zip", "srtm")
    assert(srtm.fetch(cacheRoot, "N41E009", 3).contains(s"$cacheRoot/SRTM3/N41E009.hgt"))
    assert(new java.io.File(s"$cacheRoot/SRTM3/N41E009.hgt").length == 2L * 1201 * 1201)
    // second fetch is a cache hit (delete the remote: still served)
    new java.io.File(s"$base/N41E009.SRTMGL3.hgt.zip").delete()
    assert(srtm.fetch(cacheRoot, "N41E009", 3).isDefined)
    // gzipped variant
    val gzDir = new java.io.File(s"$base/3"); gzDir.mkdirs()
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$base/3/N42E009.hgt.gz"))
    gz.write(hgt); gz.close()
    val sonn = new UriTemplateSource(base, "{res}/{key}.hgt.gz", "sonn")
    assert(sonn.fetch(cacheRoot, "N42E009", 3).contains(s"$cacheRoot/SONN3/N42E009.hgt"))
    // truncated payload NEVER enters the cache (size gate before publish)
    val bad = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$base/3/N43E009.hgt.gz"))
    bad.write(hgt, 0, 1000); bad.close()
    assertThrows[java.io.IOException](sonn.fetch(cacheRoot, "N43E009", 3))
    assert(!new java.io.File(s"$cacheRoot/SONN3/N43E009.hgt").exists())
    // absent remote falls through quietly (preference order moves on)
    assert(sonn.fetch(cacheRoot, "N44E009", 3).isEmpty)
  }

  test("archive index persists, detects staleness/corruption, self-heals") {
    val mirror = java.nio.file.Files.createTempDirectory("mirror2").toString
    val cacheRoot = java.nio.file.Files.createTempDirectory("archcache2").toString
    val scratch = java.nio.file.Files.createTempDirectory("scratch2").toString
    val syn = new SynthSource
    def writeZip(name: String, members: Seq[String]): Unit = {
      val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(s"$mirror/$name"))
      try members.foreach { k =>
        val p = syn.fetch(scratch, k, 3).get
        zos.putNextEntry(new java.util.zip.ZipEntry(s"$k.hgt"))
        zos.write(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
        zos.closeEntry()
      } finally zos.close()
    }
    writeZip("N040E005.zip", Seq("N43E006"))
    writeZip("N040E010.zip", Seq("N43E011"))
    val arch = new ArchiveSource(mirror)
    assert(arch.index(cacheRoot, 3).toSet == Set("N43E006", "N43E011"))
    val idxFile = s"$cacheRoot/ARCH3/.index"
    assert(new java.io.File(idxFile).isFile) // catalogue persisted
    // corrupt the persisted index: lookups must rebuild, not fail
    java.nio.file.Files.writeString(java.nio.file.Paths.get(idxFile), "garbage\nnot\tvalid\tat all")
    val arch2 = new ArchiveSource(mirror) // fresh instance: no warm cache
    assert(arch2.fetch(cacheRoot, "N43E006", 3).isDefined)
    assert(arch2.index(cacheRoot, 3).contains("N43E011"))
    // mirror mutates (archive removed): fingerprint mismatch invalidates
    // the index; the vanished member disappears, the survivor still fetches
    new java.io.File(s"$mirror/N040E010.zip").delete()
    val arch3 = new ArchiveSource(mirror)
    assert(!arch3.index(cacheRoot, 3).contains("N43E011"))
    assert(arch3.fetch(cacheRoot, "N43E011", 3).isEmpty)
    val cached = s"$cacheRoot/ARCH3/N43E006.hgt"
    new java.io.File(cached).delete()
    assert(arch3.fetch(cacheRoot, "N43E006", 3).contains(cached))
  }

  test("viewfinder coverage map parses to the reference's own index expectations") {
    // the reference's HTML fixture + pinned assertions
    // (tests/sources/test_viewfinder.py: test_init_from_web, test_load)
    val htmlPath = "/root/reference/tests/data/coverage_map_viewfinderpanoramas_org3.htm"
    assume(new java.io.File(htmlPath).isFile)
    val entries = Viewfinder.parseCoverageMap(graft.core.Fs.readString(htmlPath))
    val rendered = Viewfinder.render(entries, 3)
    assert(rendered.contains(
      "# VIEW3 index file, VERSION=4\n[http://viewfinderpanoramas.org/A21.zip]\nN00W055\nN00W056\n"))
    assert(rendered.contains(
      "[http://viewfinderpanoramas.org/dem3/U47.zip]\nN80E096\nN80E097\nN80E098\nN80E099\nN80E100\n"))
    assert(entries("http://viewfinderpanoramas.org/A21.zip") == Seq(
      "N00W055", "N00W056", "N00W057", "N00W058", "N00W059", "N00W060",
      "N01W055", "N01W056", "N01W057", "N01W058", "N01W059", "N01W060",
      "N02W055", "N02W056", "N02W057", "N02W058", "N02W059", "N02W060",
      "N03W055", "N03W056", "N03W057", "N03W058", "N03W059", "N03W060"))
    // round-trips through the persisted text format
    assert(Viewfinder.parseIndex(rendered) == entries)
    // the reference's shipped index file loads in the same format
    val idxPath = "/root/reference/tests/data/viewfinderHgtIndex_3.txt"
    assume(new java.io.File(idxPath).isFile)
    val loaded = Viewfinder.parseIndex(graft.core.Fs.readString(idxPath))
    assert(loaded.size == 1127)
    assert(loaded.contains("http://viewfinderpanoramas.org/dem3/U21.zip"))
    assert(loaded("http://viewfinderpanoramas.org/A21.zip").startsWith(Seq("N00W055", "N00W056")))
  }

  test("viewfinder source resolves an area through the coverage index e2e") {
    val htmlPath = "/root/reference/tests/data/coverage_map_viewfinderpanoramas_org3.htm"
    assume(new java.io.File(htmlPath).isFile)
    val mirror = java.nio.file.Files.createTempDirectory("vfmirror").toString
    val cacheRoot = java.nio.file.Files.createTempDirectory("vfcache").toString
    val scratch = java.nio.file.Files.createTempDirectory("vfscratch").toString
    // provision the mirror with A21.zip (named by the coverage href's
    // basename) holding one real-shaped member of that zone
    val syn = new SynthSource
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(s"$mirror/A21.zip"))
    try {
      val p = syn.fetch(scratch, "N01W056", 3).get
      zos.putNextEntry(new java.util.zip.ZipEntry("N01W056.hgt"))
      zos.write(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
      zos.closeEntry()
    } finally zos.close()
    val vf = new ViewfinderSource(mirror, Some(htmlPath))
    // HTML -> persisted index -> candidate zips -> extract -> validate
    val got = vf.fetch(cacheRoot, "N01W056", 3)
    assert(got.contains(s"$cacheRoot/VIEW3/N01W056.hgt"))
    assert(new java.io.File(s"$cacheRoot/VIEW3/N01W056.hgt").length == 2L * 1201 * 1201)
    val idxFile = s"$cacheRoot/VIEW3/viewfinderHgtIndex_3.txt"
    assert(new java.io.File(idxFile).isFile, "index persisted in the reference format")
    // self-correction: the zone was optimistic (24 areas) but the archive
    // held one tile — the index now records the actual coverage
    val idx = Viewfinder.parseIndex(graft.core.Fs.readString(idxFile))
    assert(idx("http://viewfinderpanoramas.org/A21.zip") == Seq("N01W056"))
    // a sea tile of the same zone: candidate zip is consulted, found
    // lacking, and the fetch falls through without error
    assert(vf.fetch(cacheRoot, "N02W057", 3).isEmpty)
    // areas outside every zone fall through too
    assert(vf.fetch(cacheRoot, "N43E006", 3).isEmpty)
    // without a coverage map the source keeps the plain archive shape
    val plain = new ViewfinderSource(mirror, None)
    assert(plain.fetch(java.nio.file.Files.createTempDirectory("vfc2").toString,
      "N10E110", 3).isEmpty)
  }

  test("rewriteIndices force-rebuilds a corrupt persisted catalogue") {
    val mirror = java.nio.file.Files.createTempDirectory("mirror3").toString
    val cacheRoot = java.nio.file.Files.createTempDirectory("archcache3").toString
    val scratch = java.nio.file.Files.createTempDirectory("scratch3").toString
    val syn = new SynthSource
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$mirror/N040E005.zip"))
    zos.putNextEntry(new java.util.zip.ZipEntry("N43E006.hgt"))
    zos.write(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(syn.fetch(scratch, "N43E006", 3).get)))
    zos.closeEntry(); zos.close()
    val arch = new ArchiveSource(mirror)
    arch.index(cacheRoot, 3) // persist
    val idxFile = java.nio.file.Paths.get(s"$cacheRoot/ARCH3/.index")
    java.nio.file.Files.writeString(idxFile, "garbage")
    arch.refreshIndex(cacheRoot, 3) // the --rewrite-indices unit
    val rewritten = java.nio.file.Files.readString(idxFile)
    assert(rewritten.contains("N43E006\t"), rewritten)
    assert(arch.index(cacheRoot, 3).contains("N43E006"))
  }

  test("driver-registered plugin sources ship to executors by value") {
    // a source that exists ONLY in the driver's registry: fetchAll must
    // resolve it on the driver and serialize the instance into the closure
    // (executor JVMs re-register only the built-ins at object init)
    Sources.register(new PluginSource)
    val root = java.nio.file.Files.createTempDirectory("plugroot").toString
    val rows = Sources.fetchAll(spark, root, Seq("N15E015"), Seq("plug3"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("N15E015", "plug3", s"$root/PLUG3/N15E015.hgt")))
    assert(new java.io.File(rows(0)._3).length == 2L * 1201 * 1201)
  }

  test("pool resolves each key to the first providing source, distributed") {
    val root = java.nio.file.Files.createTempDirectory("poolroot").toString
    // provision locl3 with ONE key so preference order is observable
    val syn = new SynthSource
    val seeded = syn.fetch(root, "N20E020", 3).get
    val locDir = s"$root/LOCL3"
    new java.io.File(locDir).mkdirs()
    java.nio.file.Files.copy(java.nio.file.Paths.get(seeded),
      java.nio.file.Paths.get(locDir, "N20E020.hgt"))
    val rows = Sources.fetchAll(spark, root,
        Seq("N20E020", "N21E020", "N22E020"), Seq("locl3", "synt3"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("N20E020") == "locl3") // local cache preferred
    assert(rows("N21E020") == "synt3") // falls through to synth
    assert(rows("N22E020") == "synt3")
    // and every resolved path exists with the right size
    val paths = Sources.fetchAll(spark, root,
      Seq("N20E020", "N21E020"), Seq("locl3", "synt3")).collect().map(_.getString(2))
    paths.foreach(p => assert(new java.io.File(p).length == 2L * 1201 * 1201))
  }
}
