package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** AQE runtime skew handling: a join with one dominant key (the "hot
  * cell" shape Pages.scala bakes into the bench corpus) gets its skewed
  * partition SPLIT at runtime by adaptive execution — the automatic
  * complement to the engine's explicit salting (pipJoinSalted). */
class AqeSkewSpec extends AnyFunSuite {

  test("adaptive execution splits the hot-key partition at runtime") {
    // fresh session: AQE skew thresholds must be set before planning
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]").appName("aqe-skew-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      // 90% of left rows share cell 0 (hot cluster); right side small-ish
      val left = spark.range(0, 200000)
        .select(col("id"),
          when(pmod(col("id"), lit(10L)) < 9, 0L).otherwise(pmod(col("id"), lit(64L))).as("cell"),
          concat(lit("payload-"), col("id")).as("payload"))
      val right = spark.range(0, 64).select(col("id").as("cell"), (col("id") * 10).as("poly_id"))
        .union(spark.range(0, 2000).select(lit(0L).as("cell"), col("id").as("poly_id")))
      // a GLOBAL aggregate downstream: a per-key aggregate would require
      // the join's hash distribution and make AQE veto the skew split
      val joined = left.join(right, "cell")
        .agg(sum(length(col("payload"))).as("bytes"))
      val n = joined.collect().length // materialize THIS dataframe's own
      // QueryExecution so its adaptive plan finalizes (count() would spawn
      // a separate QueryExecution and leave this one unexecuted)
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not mark the skewed join:\n$plan")
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
