package graft

import org.apache.spark.sql.SparkSession
import graft.core.JobConfig
import graft.engine.RasterPipeline

/** Phase-level profile of the flagship e2e path (trace vs ids vs sink) at
  * the reference's published parameters (README:128-133: step 10,
  * eps=1e-5, PBF, 16 workers). Used to target optimization work; not part
  * of the driver contract. */
object ProfileE2e {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val format = if (args.contains("--xml")) graft.sinks.TileSink.OsmXmlFormat
      else graft.sinks.TileSink.PbfFormat
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = JobConfig(contourStepSize = 10, rdpEpsilon = Some(0.00001))
    val files = Seq(
      "/root/reference/tests/data/N43E006.hgt",
      "/root/reference/tests/data/N43E007.hgt")
    val outDir = graft.core.Fs.createTempDir("profile")
    (1 to sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt).foreach { rep =>
      val t0 = System.nanoTime()
      val ts = RasterPipeline.tiles(spark, files, cfg)
      val cs = RasterPipeline.contours(ts, cfg).persist()
      val nodes = cs.groupBy().sum("nbNodes").collect()(0).getLong(0)
      val ways = cs.count()
      val t1 = System.nanoTime()
      val offs = RasterPipeline.idOffsets(cs, cfg)
      val t2 = System.nanoTime()
      val out = RasterPipeline.writeOsmXml(cs, offs, s"$outDir/$rep", cfg, format = format)
      val t3 = System.nanoTime()
      cs.unpersist()
      println(f"[profile rep$rep] trace ${(t1 - t0) / 1e9}%.2f s | ids ${(t2 - t1) / 1e9}%.2f s | " +
        f"sink ${(t3 - t2) / 1e9}%.2f s | total ${(t3 - t0) / 1e9}%.2f s | " +
        f"$nodes nodes $ways ways ${out.size} tiles")
    }
    spark.stop()
  }
}
