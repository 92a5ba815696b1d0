package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Hilbert codec: exact inverse, the every-step-is-a-neighbour walk, and
  * the locality payoff — range-chunks of the curve cover compact areas,
  * unlike row-major ids. */
class HilbertSpec extends AnyFunSuite {

  test("xy2d and d2xy are exact inverses (levels 1..12)") {
    (1 to 12).foreach { level =>
      val n = 1L << level
      // exhaustive at small levels, strided beyond
      val stride = math.max(1L, n / 64)
      var x = 0L
      while (x < n) {
        var y = 0L
        while (y < n) {
          val d = Hilbert.xy2d(level, x, y)
          assert(d >= 0 && d < n * n)
          assert(Hilbert.d2xy(level, d) == ((x, y)), s"level $level ($x,$y)")
          y += stride
        }
        x += stride
      }
    }
  }

  test("consecutive curve positions are always grid neighbours") {
    val level = 6
    val n = 1L << level
    var d = 0L
    var (px, py) = Hilbert.d2xy(level, 0L)
    d = 1
    while (d < n * n) {
      val (x, y) = Hilbert.d2xy(level, d)
      assert(math.abs(x - px) + math.abs(y - py) == 1, s"jump at d=$d")
      px = x; py = y
      d += 1
    }
  }

  test("curve range-chunks are spatially compact vs row-major chunks") {
    // split the full id space into 64 equal range chunks; measure the mean
    // bbox DIAMETER (w+h) each chunk's cells span. Hilbert chunks are
    // 4x4 squares (diameter 8); row-major chunks are 16x1 stripes
    // (diameter 17) — same area, twice the spatial spread, which is what
    // decides how many neighbour partitions a local query touches.
    val level = 5
    val n = 1L << level // 32x32 grid, 1024 cells, chunks of 16
    val chunk = (n * n / 64).toInt
    def chunkDiameter(cellXY: Long => (Long, Long)): Double = {
      (0 until 64).map { c =>
        val pts = (c * chunk until (c + 1) * chunk).map(d => cellXY(d.toLong))
        val w = pts.map(_._1).max - pts.map(_._1).min + 1
        val h = pts.map(_._2).max - pts.map(_._2).min + 1
        (w + h).toDouble
      }.sum / 64
    }
    val hilbert = chunkDiameter(d => Hilbert.d2xy(level, d))
    val rowMajor = chunkDiameter(d => (d % n, d / n))
    assert(hilbert == 8.0, s"hilbert chunks should be exact 4x4 squares, got $hilbert")
    assert(rowMajor >= 2 * hilbert, s"row-major $rowMajor vs hilbert $hilbert")
  }

  test("lon/lat cell codec round-trips through the cell bbox") {
    val level = 12
    val pts = Seq((6.25, 43.25), (-122.42, 37.77), (151.2, -33.87), (0.0, 0.0), (179.99, 89.99))
    pts.foreach { case (lon, lat) =>
      val d = Hilbert.cellId(lon, lat, level)
      val b = Hilbert.cellBBox(d, level)
      assert(lon >= b.minLon && lon < b.maxLon + 1e-9, s"$lon not in $b")
      assert(lat >= b.minLat && lat < b.maxLat + 1e-9, s"$lat not in $b")
    }
  }

  test("clusterSpatially yields spatially compact partitions vs hash repartition") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("hilbert-cluster")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // deterministic points spread over the doc tile (lon 6..7, lat 43..44)
    val pts = spark.range(0, 20000)
      .select(col("id"),
        (lit(6.0) + pmod(call_function("xxhash64", col("id")), lit(1000000L)) / 1e6).as("lon"),
        (lit(43.0) + pmod(call_function("xxhash64", col("id") + 7), lit(1000000L)) / 1e6).as("lat"))
    def meanDiameter(df: org.apache.spark.sql.DataFrame): Double = {
      val spans = df.select(spark_partition_id().as("p"), col("lon"), col("lat"))
        .groupBy("p")
        .agg((max("lon") - min("lon") + max("lat") - min("lat")).as("diam"))
        .collect().map(_.getDouble(1))
      spans.sum / spans.length
    }
    val clustered = meanDiameter(
      graft.engine.SpatialJoin.clusterSpatially(pts, "lon", "lat", 12, 16))
    val hashed = meanDiameter(pts.repartition(16, col("id")))
    assert(clustered < hashed / 2,
      s"hilbert partitions span $clustered vs hash $hashed")
  }

  test("hilbert_cell expression: codegen matches interpreted and the core codec") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("hilbert-expr")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    graft.functions.HilbertCell.register(spark, "hilbert_cell_12", 12)
    val rows = spark.range(0, 500)
      .selectExpr("CAST(id AS DOUBLE) / 500 * 300 - 150 AS lon", "CAST(id AS DOUBLE) / 500 * 160 - 80 AS lat")
      .selectExpr("lon", "lat", "hilbert_cell_12(lon, lat) AS cell")
      .as[(Double, Double, Long)].collect()
    rows.foreach { case (lon, lat, cell) =>
      assert(cell == Hilbert.cellId(lon, lat, 12))
    }
  }
}
