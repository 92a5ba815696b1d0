package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate nearest neighbour over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: IVF — vectors
  * are partitioned into k coarse clusters (deterministic Lloyd iterations,
  * lowest-id seeding); queries probe only the `nprobe` nearest clusters.
  * With nprobe == k the IVF result equals brute force (tested); smaller
  * nprobe trades recall for a k/nprobe candidate-set reduction, which is
  * what makes 10^12-row cosine search feasible.
  *
  * All dot products run as codegen'd array expressions (zip_with +
  * aggregate) over array<double> — no UDFs.
  */
object Ann {

  /** Codegen'd cosine similarity between two array<double> columns. */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  private def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Exact brute-force cosine top-k: (q_id, rank, vec_id, cos). */
  def bruteTopK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val v = vectors.select(col("vec_id"), col("vec"))
    val q = queries.select(col("q_id"), col("qvec"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    v.crossJoin(broadcast(q))
      .withColumn("cos", cosine(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
  }

  /** Deterministic Lloyd k-means over array<double> vectors: seeds = the k
    * lowest vec_ids; returns (clusterId, centroid). */
  def trainCentroids(vectors: DataFrame, k: Int, iters: Int): Seq[(Int, Array[Double])] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    var centroids: Seq[(Int, Array[Double])] = vectors
      .orderBy("vec_id").limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getAs[Seq[Double]]("vec").toArray) }
      .toSeq
    (1 to iters).foreach { _ =>
      val cdf = broadcast(centroids.toDF("cluster", "centroid"))
      val assigned = vectors.crossJoin(cdf)
        .withColumn("d", sqDist(col("vec"), col("centroid")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("d").asc, col("cluster").asc)))
        .filter(col("rn") === 1)
      val dims = assigned
        .select(col("cluster"), posexplode(col("vec")).as(Seq("i", "x")))
        .groupBy("cluster", "i").agg(avg("x").as("cx"))
        .collect()
      val byCluster = dims.groupBy(_.getInt(0))
      centroids = centroids.map { case (c, old) =>
        byCluster.get(c) match {
          case Some(rows) =>
            val arr = new Array[Double](old.length)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            (c, arr)
          case None => (c, old) // empty cluster keeps its centroid
        }
      }
    }
    centroids
  }

  /** Assign vectors to their nearest centroid: (cluster, vec_id, vec). */
  def assign(vectors: DataFrame, centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val cdf = broadcast(centroids.toDF("cluster", "centroid"))
    vectors.crossJoin(cdf)
      .withColumn("d", sqDist(col("vec"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d").asc, col("cluster").asc)))
      .filter(col("rn") === 1)
      .select("cluster", "vec_id", "vec")
  }

  /** IVF query: probe the nprobe nearest clusters per query, exact cosine
    * within the probed candidate set. */
  def ivfTopK(
      index: DataFrame, // (cluster, vec_id, vec)
      centroids: Seq[(Int, Array[Double])],
      queries: DataFrame, // (q_id, qvec)
      k: Int,
      nprobe: Int): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val cdf = broadcast(centroids.toDF("cluster", "centroid"))
    val probes = queries.crossJoin(cdf)
      .withColumn("d", sqDist(col("qvec"), col("centroid")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d").asc, col("cluster").asc)))
      .filter(col("rn") <= nprobe)
      .select("q_id", "qvec", "cluster")
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    index.join(broadcast(probes), Seq("cluster"))
      .withColumn("cos", cosine(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
  }
}
