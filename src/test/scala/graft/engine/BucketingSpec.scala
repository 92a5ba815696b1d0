package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: both sides bucketed by the join key means
  * the join runs with NO exchange — the storage-layout lever for repeated
  * large-x-large joins at 100 TB (bucket once, join shuffle-free forever).
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("bucketing-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    .config("spark.ui.enabled", "false").getOrCreate()

  test("cell-bucketed pages x cover join plans without any Exchange") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("lon", graft.functions.GeoCols.docLon(col("doc_id")))
      .withColumn("lat", graft.functions.GeoCols.docLat(col("doc_id")))
      .withColumn("cell", graft.functions.GeoCols.cellId(col("lon"), col("lat"), 6))
      .select("doc_id", "cell", "lon", "lat")
    val cover = docs.select(col("cell")).distinct()
      .withColumn("poly_id", pmod(col("cell"), lit(7L)))
    val t1 = s"pages_b_${System.nanoTime()}"
    val t2 = s"cover_b_${System.nanoTime()}"
    try {
      docs.write.bucketBy(8, "cell").sortBy("cell").saveAsTable(t1)
      cover.write.bucketBy(8, "cell").sortBy("cell").saveAsTable(t2)
      val joined = spark.table(t1).join(spark.table(t2), "cell")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still exchanges:\n$plan")
      // and it computes the right thing
      val expected = docs.join(cover, "cell").count()
      assert(joined.count() == expected)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t1")
      spark.sql(s"DROP TABLE IF EXISTS $t2")
    }
  }
}
