package graft

import org.scalatest.funsuite.AnyFunSuite

/** Config-file option layer (reference configargparse setup, cli.py:27 +
  * tests/test_configuration.py semantics: CLI args > config file): the
  * file contributes defaults, argv always wins, flags and valued options
  * both parse, comments/blank lines are ignored. */
class PipelineCliSpec extends AnyFunSuite {

  private def writeCfg(lines: String*): String = {
    val f = java.nio.file.Files.createTempFile("graftcfg", ".conf")
    java.nio.file.Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("config file supplies defaults: valued options, flags, comments") {
    val cfg = writeCfg(
      "# standing options",
      "step = 25",
      "rdp 0.00001",
      "",
      "pbf",
      "max-nodes-per-tile = 250000")
    val opts = PipelineCli.parseOptions(
      PipelineCli.expandConfig(Seq("--config", cfg, "a.hgt")))
    assert(opts.cfg.contourStepSize == 25)
    assert(opts.cfg.rdpEpsilon.contains(1e-5))
    assert(opts.cfg.maxNodesPerTile == 250000L)
    assert(opts.format == graft.sinks.TileSink.PbfFormat)
    assert(opts.files == Seq("a.hgt"))
  }

  test("explicit argv always beats the config file") {
    val cfg = writeCfg("step = 25", "pbf", "osm-version = 0.5")
    val (expanded, argvStart) = PipelineCli.expandConfigLayered(
      Seq("--config", cfg, "--step", "10", "--o5m", "b.hgt"))
    val opts = PipelineCli.parseOptions(expanded, argvStart)
    assert(opts.cfg.contourStepSize == 10) // argv wins
    assert(opts.format == graft.sinks.TileSink.O5mFormat) // argv wins
    assert(opts.cfg.osmVersion == 0.5) // file default survives
  }

  test("reference option surface: prefix/plot/download-only/rewrite-indices/log") {
    val o1 = PipelineCli.parseOptions(Seq("--output-prefix", "alps", "--download-only", "a.hgt"))
    assert(o1.cfg.outputPrefix.contains("alps") && o1.downloadOnly)
    val o2 = PipelineCli.parseOptions(Seq("--plot", "dbg", "--log", "info"))
    assert(o2.format == graft.sinks.TileSink.XyzFormat)
    assert(o2.cfg.outputPrefix.contains("dbg") && o2.logLevel == "INFO")
    val o3 = PipelineCli.parseOptions(Seq("--rewrite-indices", "--xyz"))
    assert(o3.rewriteIndices && o3.format == graft.sinks.TileSink.XyzFormat)
    // prefix lands in the tile file name as "<prefix>_" (factory.py:27)
    val n = graft.sinks.TileSink.fileName(
      graft.core.BBox(6, 43, 7, 44), "N43E006", graft.sinks.TileSink.PbfFormat, "alps")
    assert(n == "alps_lon6.00_7.00lat43.00_44.00_N43E006.osm.pbf")
  }

  test("reference-exact aliases and default-source derivation (cli.py:295-517)") {
    // exact reference spellings map onto the same options
    val o = PipelineCli.parseOptions(Seq(
      "--no-zero-contour", "--void-range-max", "-500", "--hgtdir", "/tmp/hgt",
      "--jobs", "6", "--polygon", "fr.poly", "--area", "6:43:7:44", "a.hgt"))
    assert(o.cfg.noZero && o.cfg.voidMax == -500)
    assert(o.cacheRoot == "/tmp/hgt" && o.cores == "6")
    assert(o.polyFile.contains("fr.poly"))
    // reference --polygon contract: --area is ignored when a polygon is given
    assert(o.cfg.area.isEmpty)
    // --data-source is --source
    val ds = PipelineCli.parseOptions(Seq("--data-source", "view3,srtm1", "--area", "6:43:7:44"))
    assert(ds.sourcePrefs == Seq("view3", "srtm1"))
    // no files + no explicit source: prefs derive from --srtm/--viewfinder-mask
    val d1 = PipelineCli.parseOptions(Seq("--area", "6:43:7:44"))
    assert(d1.sourcePrefs == Seq("srtm3"))
    val d2 = PipelineCli.parseOptions(Seq("--srtm", "1", "--viewfinder-mask", "3", "--area", "6:43:7:44"))
    assert(d2.sourcePrefs == Seq("view3", "srtm1"))
    // invalid values fall back like the reference (warn, not die);
    // 0 is the reference's valid disabled default for the mask
    val d3 = PipelineCli.parseOptions(Seq("--srtm", "2", "--viewfinder-mask", "5"))
    assert(d3.sourcePrefs == Seq("srtm3"))
    val d3b = PipelineCli.parseOptions(Seq("--viewfinder-mask", "0"))
    assert(d3b.sourcePrefs == Seq("srtm3"))
    // input files given: no download source derived (cli.py:518-520)
    val d4 = PipelineCli.parseOptions(Seq("--srtm", "1", "b.hgt"))
    assert(d4.sourcePrefs.isEmpty)
    // --rewrite-indices exits before derivation in the reference
    // (cli.py:475-477): no default source may be derived for it
    val d5 = PipelineCli.parseOptions(Seq("--rewrite-indices"))
    assert(d5.rewriteIndices && d5.sourcePrefs.isEmpty)
  }

  test("gzip/o5m/pbf are mutually exclusive on argv, but argv overrides config") {
    // reference argparse exclusion group (tests/test_cli.py:13-24)
    val e = intercept[IllegalArgumentException](
      PipelineCli.parseOptions(Seq("--o5m", "--gzip", "a.hgt")))
    assert(e.getMessage == "error: argument --gzip: not allowed with argument --o5m")
    assertThrows[IllegalArgumentException](
      PipelineCli.parseOptions(Seq("--pbf", "--o5m")))
    // a repeated IDENTICAL flag never conflicts (argparse groups only
    // conflict across members, never with themselves)
    val rep = PipelineCli.parseOptions(Seq("--pbf", "--pbf", "a.hgt"))
    assert(rep.format == graft.sinks.TileSink.PbfFormat)
    // layered: a config-file `pbf` overridden by argv --o5m is NOT an error
    val cfg = writeCfg("pbf")
    val (expanded, argvStart) = PipelineCli.expandConfigLayered(
      Seq("--config", cfg, "--o5m", "b.hgt"))
    val opts = PipelineCli.parseOptions(expanded, argvStart)
    assert(opts.format == graft.sinks.TileSink.O5mFormat)
    // ...but two DIFFERENT format flags inside the config file conflict
    // (the config file is a layer too)
    val bad = writeCfg("pbf", "gzip")
    val (e2, a2) = PipelineCli.expandConfigLayered(Seq("--config", bad, "c.hgt"))
    assertThrows[IllegalArgumentException](PipelineCli.parseOptions(e2, a2))
  }

  test("no config file: argv parses unchanged; missing --config fails loudly") {
    val opts = PipelineCli.parseOptions(
      PipelineCli.expandConfig(Seq("--step", "40", "c.hgt")))
    assert(opts.cfg.contourStepSize == 40 && opts.files == Seq("c.hgt"))
    assertThrows[IllegalArgumentException](
      PipelineCli.expandConfig(Seq("--config", "/nope/missing.conf")))
  }
}
