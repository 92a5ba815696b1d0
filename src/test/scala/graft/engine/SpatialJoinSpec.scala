package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.synth.Pages
import graft.engine.SpatialJoin.Poly

class SpatialJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .appName("spatial-join-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Res = 7 // 1/128 degree cells
  private lazy val pages = {
    val df = Pages.geocoded(Pages.generate(spark, 4000).toDF(), Res).cache()
    df.count()
    df
  }

  private def poly(pts: (Double, Double)*): Array[Double] =
    pts.flatMap(p => Seq(p._1, p._2)).toArray

  private val polys = Seq(
    Poly(1L, poly((6.2, 43.2), (6.4, 43.2), (6.4, 43.4), (6.2, 43.4))), // hot cluster box
    Poly(2L, poly((6.5, 43.5), (6.9, 43.6), (6.7, 43.9))), // triangle
    Poly(3L, poly((6.05, 43.8), (6.15, 43.8), (6.15, 43.9), (6.05, 43.9))))

  test("synthetic pages are deterministic and text roundtrips byte-identically") {
    val a = Pages.pageOf(1234L)
    val b = Pages.pageOf(1234L)
    assert(a == b.copy(html = a.html) && java.util.Arrays.equals(a.html, b.html))
    // per-url byte-identical extracted text invariant
    (0L until 500L).foreach { i =>
      val p = Pages.pageOf(i)
      assert(Pages.extractText(p.html) == p.text, s"roundtrip failed for id $i")
    }
    // column-derived geocode matches the scala generator
    val rows = pages.select("page_id", "lon", "lat").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getDouble(1) == Pages.lonOf(id), s"lon mismatch id=$id")
      assert(r.getDouble(2) == Pages.latOf(id), s"lat mismatch id=$id")
    }
  }

  test("hot cluster exists (salting is justified)") {
    val top = pages.groupBy("cell").count().orderBy(col("count").desc).first()
    assert(top.getLong(1) > 400, s"expected a hot cell, got ${top.getLong(1)}")
  }

  test("cell-prejoin PIP join equals naive full scan") {
    val got = SpatialJoin.pipJoin(pages, polys, Res)
      .select("page_id", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive oracle: evaluate PIP on every page x polygon
    val all = pages.select("page_id", "lon", "lat").collect()
    val expected = (for {
      r <- all
      p <- polys
      if graft.core.Geometry.contains(p.coords, r.getDouble(1), r.getDouble(2))
    } yield (r.getLong(0), p.polyId)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("salted shuffle PIP join equals broadcast variant") {
    val a = SpatialJoin.pipJoin(pages, polys, Res)
      .select("page_id", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SpatialJoin.pipJoinSalted(pages, polys, Res, salts = 8)
      .select("page_id", "poly_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("ring-expansion kNN equals brute force") {
    val queries = Seq(
      (0L, 6.1, 43.2), (1L, 6.5, 43.5), (2L, 6.9, 43.8), (3L, 6.253, 43.253),
      (4L, 6.7, 43.1), (5L, 6.0001, 43.9999), (6L, 6.42, 43.66), (7L, 6.99, 43.01))
    val fast = SpatialJoin.knn(pages, queries, k = 5, res = Res)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val brute = SpatialJoin.knnBrute(pages, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(fast.toSeq == brute.toSeq)
  }

  test("batch-table kNN equals brute force on a query TABLE") {
    import spark.implicits._
    // query side is a table: 60 pages themselves plus off-lattice points
    // (incl. a query whose nearest neighbours straddle several rings)
    val fromPages = pages.select(col("page_id").as("q_id"),
      col("lon").as("q_lon"), col("lat").as("q_lat"))
      .filter(col("q_id") < 50)
    val extra = Seq(
      (1000L, 6.0001, 43.9999), (1001L, 6.99, 43.01), (1002L, 6.253, 43.253),
      (1003L, 6.42, 43.66)).toDF("q_id", "q_lon", "q_lat")
    val queries = fromPages.unionAll(extra)
    val got = SpatialJoin.knnBatch(pages, queries, k = 5, res = Res)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    val qSeq = queries.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val brute = SpatialJoin.knnBrute(pages, qSeq, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    assert(got == brute)
    // and it is a real batch operator: no driver loop means the plan is a
    // single DAG — just sanity-check it contains the candidate equi-join
    val plan = SpatialJoin.knnBatch(pages, queries, k = 5, res = Res)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
