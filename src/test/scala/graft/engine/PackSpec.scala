package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pack.chunkIds: the segmented two-pass prefix sum must equal the naive
  * global running sum under the SAME total order — including when the
  * order key repeats and a tie-breaker completes the order. */
class PackSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("pack-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("segmented prefix sum equals the global window on unique keys") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (i, 1L + (i * 131) % 700)).toDF("ord", "wt")
    val got = Pack.chunkIds(df, "ord", "wt", capacity = 4096L, bandWidth = 64L)
      .select("ord", "prefix_before", "chunk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val wG = Window.orderBy("ord").rowsBetween(Window.unboundedPreceding, -1)
    val oracle = df.withColumn("pre", coalesce(sum("wt").over(wG), lit(0L)))
      .select(col("ord"), col("pre"), expr("pre DIV 4096").as("chunk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == oracle.toSeq)
  }

  test("duplicate order keys with a tie-breaker are deterministic and oracle-exact") {
    import spark.implicits._
    // order key repeats 8x; id is the unique tie-breaker
    val df = (0L until 4000L).map(i => (i / 8, i, 1L + (i * 37) % 97)).toDF("ord", "id", "wt")
    def run() = Pack.chunkIds(df.repartition(7), "ord", "wt",
        capacity = 512L, bandWidth = 16L, tieBreak = Seq("id"))
      .select("id", "prefix_before", "chunk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val a = run()
    assert(a == run(), "repeated runs must agree exactly")
    val wG = Window.orderBy("ord", "id").rowsBetween(Window.unboundedPreceding, -1)
    val oracle = df.withColumn("pre", coalesce(sum("wt").over(wG), lit(0L)))
      .select(col("id"), col("pre"), expr("pre DIV 512").as("chunk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == oracle)
  }
}
