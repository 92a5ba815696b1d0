package graft

import org.apache.spark.sql.SparkSession

/** Round-7 optimization evidence: dumps `explain("formatted")` of named
  * gate queries to plans/r07/<name>_<suffix>.txt.
  *
  * Usage: sbt "runMain graft.PlanDumpR07 before q20_dedup_exact q27_jaccard_verify ..."
  * Plan SHAPE is scale-independent; dumps run at sf0.001 like PlanDump.
  */
object PlanDumpR07 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpR07 <suffix> <query> [query ...]")
    val suffix = args.head
    val names = args.tail.toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-dump-r07")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    graft.core.Fs.mkdirs("plans/r07")
    graft.engine.Queries.all.filter(q => names.contains(q.name)).foreach { q =>
      val df = q.impl(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      graft.core.Fs.writeString(s"plans/r07/${q.name}_$suffix.txt", txt)
      println(s"wrote plans/r07/${q.name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
