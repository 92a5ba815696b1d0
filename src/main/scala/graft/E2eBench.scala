package graft

import org.apache.spark.sql.SparkSession
import graft.core.JobConfig
import graft.engine.RasterPipeline

/** End-to-end throughput at the reference's published anchor workload
  * (README:128-139: PACA region, step 10, RDP eps=1e-5, PBF, -j16 ->
  * 104 tiles / 81 MB in < 60 s on an i5-13600K).
  *
  * The sandbox has two real SRTM fixtures; this bench replicates them
  * under distinct tile keys until the job writes ~104 PBF tiles of REAL
  * terrain (same per-tile complexity as the originals — synthetic DEMs
  * would be too smooth to compare). Copies are made once, outside the
  * measured window; the measured window is exactly what PipelineCli
  * measures: scan -> decode -> chop -> trace -> ids -> PBF sinks.
  *
  * Appends its result table to BENCH.md (run AFTER ScalingBench, which
  * rewrites the file).
  */
object E2eBench {

  private val Fixtures = Seq(
    "/root/reference/tests/data/N43E006.hgt",
    "/root/reference/tests/data/N43E007.hgt")

  /** Copy each fixture under `copies` distinct keys (N10..N{10+copies-1}),
    * e.g. N10E006, N11E006... Terrain content identical to the originals.
    * Staged through core/Fs like everything executors later read: the
    * bench fixture dir carries whatever scheme the deploy points it at. */
  private def replicate(dir: String, copies: Int): Seq[String] = {
    graft.core.Fs.mkdirs(dir)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    Fixtures.foreach { src =>
      val lonPart = src.split('/').last.substring(3, 7) // E006 / E007
      val bytes = graft.core.Fs.readAllBytes(src)
      (0 until copies).foreach { k =>
        val name = f"N${10 + k}%02d$lonPart%s.hgt"
        val p = s"$dir/$name"
        if (graft.core.Fs.fileLength(p) != bytes.length.toLong) {
          val o = graft.core.Fs.create(p)
          try o.write(bytes) finally o.close()
        }
        out += p
      }
    }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    // dot-decimal everywhere: diagnostics/tables are parsed downstream
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val copies = sys.env.getOrElse("SPARK_GRAFT_E2E_COPIES", "15").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_E2E_REPS", "2").toInt
    val files = replicate("/tmp/graft_e2e_dem", copies)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-e2e-bench")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // reference PACA parameters (README:128-133)
    val cfg = JobConfig(contourStepSize = 10, rdpEpsilon = Some(0.00001))
    val results = (1 to reps).map { rep =>
      val outDir = graft.core.Fs.createTempDir(s"e2e$rep")
      val t0 = System.nanoTime()
      val report = RasterPipeline.runResumable(
        spark, files, outDir, cfg, format = graft.sinks.TileSink.PbfFormat)
      val wall = (System.nanoTime() - t0) / 1e9
      val bytes = report.files.map(graft.core.Fs.fileLength).sum
      println(f"[e2e rep$rep] ${report.tilesWritten} pbf tiles, ${bytes / 1e6}%.0f MB " +
        f"in $wall%.1f s = ${wall / report.tilesWritten}%.3f s/tile " +
        f"(${Fixtures.size * copies} input files, $cores cores)")
      (report.tilesWritten, bytes, wall)
    }
    spark.stop()
    val (tiles, bytes, wall) = results.minBy(_._3)
    val perTile = wall / tiles
    val sb = new StringBuilder
    sb.append("\n## End-to-end vs reference anchor (PACA parameters: step 10, RDP 1e-5, PBF, 16 cores)\n\n")
    sb.append("| engine | tiles | output MB | wall (s) | s/tile | vs reference 0.58 s/tile |\n")
    sb.append("|---|---|---|---|---|---|\n")
    sb.append(f"| reference (published, i5-13600K) | 104 | 81 | <60 | 0.58 | 1.0x |\n")
    sb.append(f"| graft (this host, real-terrain replicas) | $tiles | ${bytes / 1e6}%.0f | $wall%.1f | $perTile%.3f | ${perTile / 0.58}%.2fx |\n")
    sb.append("\nBest of " + reps + " reps; tile content = replicas of the two real SRTM fixtures, " +
      "so per-tile terrain complexity matches the originals. Single shared JVM, warm JIT after rep 1 " +
      "(the reference's <60 s likewise amortizes startup over 104 tiles).\n")
    print(sb)
    // replace the existing e2e section in place (appending duplicates it)
    val p = "BENCH.md"
    if (graft.core.Fs.exists(p)) {
      val old = graft.core.Fs.readString(p)
      val marker = "## End-to-end vs reference anchor"
      val updated = old.indexOf(marker) match {
        case -1 => old + sb.toString
        case i =>
          val tail = old.substring(i).linesIterator.toSeq.drop(1)
            .dropWhile(l => !l.startsWith("## "))
          old.substring(0, i).stripTrailing() + "\n" + sb.toString + "\n" +
            tail.mkString("\n") + (if (tail.nonEmpty) "\n" else "")
      }
      graft.core.Fs.writeString(p, updated)
    }
  }
}
