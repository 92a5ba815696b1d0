package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** as-of join semantics: backward inclusive match, unmatched rows drop,
  * equal-ts right rows resolve to the largest payload, and the plan holds
  * its one-exchange no-join-node shape. */
class AsOfSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("asof-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("backward inclusive as-of with drops, ties, and payload carry") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // matches right ts=10 (inclusive)
      (2L, 10L, 95L),  // right ts 90? -> latest <= 95 is 90
      (3L, 10L, 10L),  // before any right row -> dropped
      (4L, 20L, 50L)   // key with no right rows -> dropped
    ).toDF("id", "k", "ts")
    val right = Seq(
      (10L, 90L, "a"), (10L, 100L, "b"), (10L, 100L, "c"), // tie at 100
      (10L, 120L, "d")
    ).toDF("k", "ts", "tag")
    val out = AsOf.join(left, right, "k", "ts", "ts", Seq("tag"))
      .select("id", "asof_ts", "asof_tag").as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    // id 1: ts 100 tie -> largest payload ("c"); id 2: ts 90; 3 & 4 dropped
    assert(out == Seq((1L, 100L, "c"), (2L, 90L, "a")))
  }

  test("as-of plan: one keyed window, zero join nodes") {
    import spark.implicits._
    val left = (0 until 1000).map(i => (i.toLong, (i % 7).toLong, (i * 13 % 997).toLong))
      .toDF("id", "k", "ts")
    val right = (0 until 500).map(i => ((i % 7).toLong, (i * 11 % 997).toLong, i.toLong))
      .toDF("k", "ts", "v")
    val out = AsOf.join(left, right, "k", "ts", "ts", Seq("v"))
    out.collect()
    // AQE repeats the tree under "== Initial Plan =="; inspect the final one
    val p = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    // exactly one exchange feeds the window (the union is exchange-free)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("NULL keys and NULL timestamps never match (SQL join semantics)") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(10L), Some(100L)), // normal match
      (2L, None, Some(100L)),      // null key: no match even vs null-key right
      (3L, Some(10L), None)        // null ts: no match
    ).toDF("id", "k", "ts")
    val right = Seq(
      (Some(10L), Some(50L), "a"),
      (Option.empty[Long], Some(60L), "nullkey"), // must pair with nothing
      (Some(10L), Option.empty[Long], "nullts")   // must never be picked
    ).toDF("k", "ts", "tag")
    val out = AsOf.join(left, right, "k", "ts", "ts", Seq("tag"))
      .select("id", "asof_tag").as[(Long, String)].collect().toSeq.sorted
    assert(out == Seq((1L, "a")))
  }

  test("bucketed (skew-safe) as-of equals the single-window form exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // a deliberately HOT key (0 carries half the rows) + bucket-boundary
    // timestamps (multiples of the width) + ties
    val left = (0 until 600).map { i =>
      val k = if (rnd.nextBoolean()) 0L else rnd.nextInt(4).toLong
      (i.toLong, k, (rnd.nextInt(40) * 25).toLong) // ts multiples of 25
    }.toDF("id", "k", "ts")
    val right = (0 until 400).map { i =>
      val k = if (rnd.nextBoolean()) 0L else rnd.nextInt(4).toLong
      (k, (rnd.nextInt(40) * 25).toLong, i.toLong)
    }.toDF("k", "ts", "v")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "asof_ts", "asof_v").as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val plain = norm(AsOf.join(left, right, "k", "ts", "ts", Seq("v")))
    // width 100 = 4 ts values per bucket; also try a width that makes
    // every row its own bucket and one that makes a single bucket
    for (w <- Seq(100L, 1L, 1000000L))
      assert(norm(AsOf.joinBucketed(left, right, "k", "ts", "ts", Seq("v"), w)) == plain, s"width $w")
  }

  test("bucketed as-of on timestamp columns matches the q17 oracle shape") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view").select("user_id", "ts")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), unix_micros(col("asof_ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val a = norm(AsOf.join(purchases, views, "user_id", "ts", "ts"))
    val b = norm(AsOf.joinBucketed(purchases, views, "user_id", "ts", "ts", Nil, 86400L))
    assert(a == b && a.nonEmpty)
  }

  test("as-of equals the brute-force definition on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (0 until 400).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(200).toLong))
    val right = (0 until 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(200).toLong))
    val got = AsOf.join(left.toDF("id", "k", "ts"), right.toDF("k", "ts"), "k", "ts", "ts")
      .select("id", "asof_ts").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val byKey = right.groupBy(_._1)
    val expect = left.flatMap { case (id, k, ts) =>
      byKey.getOrElse(k, Nil).map(_._2).filter(_ <= ts)
        .reduceOption(_ max _).map(id -> _)
    }.sortBy(_._1)
    assert(got == expect)
  }
}
