package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-7 A/B harness (guide §1.4): times competing formulations of one
  * query INSIDE one JVM, alternating variants, best-of-N warm, noop-style
  * count() action — so JIT/codegen warmup and host drift hit both sides
  * equally. Not part of the driver bench contract (Bench.scala is frozen);
  * numbers cited in OPTIMIZATION_r07.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchExtra q39 5"
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("q39")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")

    // scale-adaptive spread (the shipped Queries/Ann helper's shape)
    def spread(df: DataFrame): DataFrame = {
      val target = spark.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }

    // ----- q39 variants ---------------------------------------------------
    def q39base(classify: (DataFrame, DataFrame) => DataFrame,
        spreadDocs: Boolean = false): DataFrame = {
      val docs0 = t("documents").filter(length(col("text")) >= 3)
      val docs = if (spreadDocs) {
        val target = spark.sparkContext.defaultParallelism
        if (docs0.rdd.getNumPartitions < target) docs0.repartition(target) else docs0
      } else docs0
      val grams = docs
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(1), length(col("text")) - 2)).as("i"), col("text"))
        .select(col("doc_id"), col("lang"), expr("substring(text, i, 3)").as("gram"))
        .withColumn("ghash", xxhash64(col("gram")))
      val counts = grams.groupBy("lang", "ghash")
        .agg(count(lit(1)).as("n"), min("gram").as("gram"))
      val wp = Window.partitionBy("lang").orderBy(col("n").desc, col("gram").asc)
      val profile = counts.withColumn("r", row_number().over(wp)).filter(col("r") <= 20)
        .select(col("lang").as("profile_lang"), col("ghash"))
      val scored = classify(docs, profile)
        .groupBy("doc_id", "lang", "profile_lang")
        .agg(count(lit(1)).as("matches"))
      val wd = Window.partitionBy("doc_id").orderBy(col("matches").desc, col("profile_lang").asc)
      scored.withColumn("r", row_number().over(wd)).filter(col("r") === 1)
        .select(col("doc_id"), col("lang"), col("profile_lang").as("lang_pred"),
          col("matches"), (col("profile_lang") === col("lang")).as("correct"))
        .orderBy("doc_id")
    }
    val q39old = () => q39base { (docs, profile) =>
      val grams = docs
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(1), length(col("text")) - 2)).as("i"), col("text"))
        .select(col("doc_id"), col("lang"),
          xxhash64(expr("substring(text, i, 3)")).as("ghash"))
        .distinct()
      grams.join(broadcast(profile), Seq("ghash"))
    }
    val q39new = () => q39base { (docs, profile) =>
      graft.functions.TextSketch.registerDistinctGrams(spark, "distinct_gram_hashes_3", 3)
      docs.select(col("doc_id"), col("lang"),
        explode(call_function("distinct_gram_hashes_3", col("text"))).as("ghash"))
        .join(broadcast(profile), Seq("ghash"))
    }

    // ----- q36 signature variants ----------------------------------------
    def shingleRows(n: Int): DataFrame = {
      graft.functions.ShingleHashes.register(spark, s"shingle_hashes_$n", n)
      t("documents").filter(length(col("text")) >= n)
        .select(col("doc_id"), explode(call_function(s"shingle_hashes_$n", col("text"))).as("h"))
    }
    def shingleArr(n: Int): DataFrame = {
      graft.functions.ShingleHashes.register(spark, s"shingle_hashes_$n", n)
      t("documents").filter(length(col("text")) >= n)
        .select(col("doc_id"), call_function(s"shingle_hashes_$n", col("text")).as("hs"))
    }
    def q36tail(sig: DataFrame): DataFrame = {
      val banded = sig.select(col("doc_id"), col("sh32"),
        explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bucket", expr("(sh32 div shiftleft(CAST(1 AS BIGINT), band * 8)) % 256"))
      val cand = banded.toDF("doc_a", "sh_a", "band", "bucket")
        .join(banded.toDF("doc_b", "sh_b", "band", "bucket"), Seq("band", "bucket"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
      cand
        .withColumn("hamming", expr("bit_count(CAST(sh_a AS BIGINT) ^ CAST(sh_b AS BIGINT))"))
        .filter(col("hamming") <= 1)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("doc_a", "doc_b")
    }
    val q36old = () => {
      val votes = (0 until 32).map { b =>
        sum(when(expr(s"(h div shiftleft(CAST(1 AS BIGINT), $b)) % 2 = 1"), 1).otherwise(-1)).as(s"sw$b")
      }
      q36tail(shingleRows(8).groupBy("doc_id")
        .agg(votes.head, votes.tail: _*)
        .select(col("doc_id"),
          (0 until 32).map { b =>
            when(col(s"sw$b") > 0, lit(1L << b)).otherwise(lit(0L))
          }.reduce(_ + _).as("sh32")))
    }
    val q36new = () => {
      graft.functions.TextSketch.registerSimHash(spark, "simhash_pack_32", 32)
      q36tail(shingleArr(8)
        .select(col("doc_id"),
          coalesce(call_function("simhash_pack_32", col("hs")), lit(-1L)).as("sh32")))
    }

    // ----- q22 signature variants -----------------------------------------
    val MinhashParams = Seq((131L, 7L), (137L, 11L), (139L, 13L), (149L, 17L))
    val P = 1000003L
    def q22tail(sig: DataFrame): DataFrame = {
      val keys = Seq("mh0", "mh1", "mh2", "mh3")
      sig.toDF("doc_a" +: keys: _*)
        .join(sig.toDF("doc_b" +: keys: _*), keys)
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")
    }
    val q22old = () => {
      val aggs = MinhashParams.zipWithIndex.map { case ((a, b), j) =>
        min((col("h") * lit(a) + lit(b)) % lit(P)).as(s"mh$j")
      }
      q22tail(shingleRows(8).groupBy("doc_id").agg(aggs.head, aggs.tail: _*))
    }
    val q22new = () => {
      // the SHIPPED form: spread + kernel (see Queries.minhashSig)
      graft.functions.TextSketch.registerMinHash(spark, "minhash_sig_q8", MinhashParams, P, preMod = false)
      graft.functions.ShingleHashes.register(spark, "shingle_hashes_8", 8)
      q22tail(spread(t("documents").filter(length(col("text")) >= 8))
        .select(col("doc_id"), call_function("shingle_hashes_8", col("text")).as("hs"))
        .select(col("doc_id") +: MinhashParams.indices.map(j =>
          coalesce(element_at(call_function("minhash_sig_q8", col("hs")), j + 1),
            lit(-1L)).as(s"mh$j")): _*))
    }

    // ----- q44 stream-stream join: shuffle-partition cap sweep ------------
    def q44cap(n: Int): DataFrame = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", n.toString)
      val path = s"$sfDir/events.parquet"
      val schema = s2.read.parquet(path).schema
      val f = new java.io.File(path)
      val stream = s2.readStream.schema(schema)
        .option("pathGlobFilter", f.getName).parquet(f.getParent)
      val joined = graft.engine.Streaming.attributionJoin(stream)
      val qn = s"ab_attr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = joined.writeStream.format("memory").queryName(qn).outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
      s2.table(qn).orderBy("p_id", "view_us")
    }

    // ----- q18 predicate construction variants ----------------------------
    def q18with(pred: org.apache.spark.sql.Column): DataFrame = {
      val docs = t("documents")
        .withColumn("lon", graft.functions.GeoCols.docLon(col("doc_id")))
        .withColumn("lat", graft.functions.GeoCols.docLat(col("doc_id")))
        .select("doc_id", "lon", "lat", "n_chars")
      val tmp = s"${graft.engine.Queries.publishRoot(spark)}/graft_q18_cluster_" +
        graft.engine.Queries.tableFingerprint(sfDir, "documents")
      graft.core.Fs.publishOnce(tmp, spark.sparkContext.applicationId) { stage =>
        graft.engine.SpatialJoin.writeClusteredS2(docs, stage, "lon", "lat", partitions = 8)
      }
      spark.read.parquet(tmp)
        .filter(pred)
        .filter(col("lon").between(6.3, 6.7) && col("lat").between(43.3, 43.7))
        .agg(count(lit(1)).as("n_docs"), round(avg("n_chars"), 4).as("avg_chars"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    }
    def balancedOr(cs: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      if (cs.size == 1) cs.head
      else balancedOr(cs.grouped(2).map(g => g.reduce(_ || _)).toSeq)
    def rangesAt(level: Int): Seq[org.apache.spark.sql.Column] =
      graft.core.S2.coverRect(6.3, 43.3, 6.7, 43.7, level)
        .map(c => col("s2").between(graft.core.S2.rangeMin(c), graft.core.S2.rangeMax(c)))

    // ----- q01/q08: single-partition lineitem scan ------------------------
    def q01body(li: DataFrame): DataFrame = {
      val baseCents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
      val discCents =
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5).cast("long")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          (sum(baseCents) / 100.0).as("sum_base_price"),
          (sum(discCents) / 100.0).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }
    def q08body(li: DataFrame): DataFrame = {
      val sup = t("supplier"); val nation = t("nation"); val region = t("region")
      val cents = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
        .cast("long")
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nation), sup("s_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy("r_name")
        .agg((sum(cents) / 100.0).as("revenue"),
          countDistinct("s_suppkey").as("n_suppliers"),
          count(lit(1)).as("n_lines"))
        .orderBy("r_name")
    }

    // ----- q25: explode + partial agg inside the 1-partition scan stage ---
    def q25body(docs: DataFrame): DataFrame = {
      val grams = docs.filter(length(col("text")) >= 3)
        .select(col("lang"), explode(sequence(lit(1), length(col("text")) - 2)).as("i"), col("text"))
        .select(col("lang"), expr("substring(text, i, 3)").as("gram"))
      val counts = grams.groupBy("lang", "gram").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n").desc, col("gram").asc)
      counts.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy("lang", "rank")
    }

    // ----- q57 candidate-stage variants: array angles + p Generates (r6/early-r7)
    // vs scalar angles + single literal-combo Generate (shipped) ------------
    def q57vecs: DataFrame = {
      // the gate's corpus: embeddings plus the deterministically perturbed
      // twin of every vector (see Queries q57) — reproduced here to drive
      // the candidate-stage A/B (count of candidate pairs)
      val base = t("embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      val twins = base.select((col("vec_id") + lit(10000000L)).as("vec_id"),
        expr("transform(vec, x -> x * 0.999 + 0.0005)").as("vec"))
      base.unionByName(twins)
    }
    def q57oldCand(vectors: DataFrame, tau: Double, bandWidthDeg: Double): DataFrame = {
      graft.engine.Ann.register(spark)
      def sqNorm(v: org.apache.spark.sql.Column) =
        call_function("sq_dist_vec", v, array_repeat(lit(0.0), size(v)))
      val maxDeltaDeg = math.toDegrees(math.acos(tau))
      val m = math.ceil(maxDeltaDeg / bandWidthDeg).toLong
      val maxCombos = 81
      val perPivot = 2 * m + 1
      val pBudget = math.max(1, (math.log(maxCombos) / math.log(perPivot.toDouble)).toInt)
      val pvs = graft.engine.Ann.orthoPivots(vectors, math.min(3, pBudget))
      val p = pvs.length
      val nz = spread(vectors.filter(sqNorm(col("vec")) > 0))
        .select(col("vec_id") +: pvs.zipWithIndex.map { case (pv, i) =>
          degrees(acos(least(lit(1.0), greatest(lit(-1.0),
            graft.engine.Ann.cosine(col("vec"), typedLit(pv.toSeq)))))).as(s"th$i")
        }: _*)
      val bandCols = (0 until p).map(i => s"band$i")
      val left = nz.select(
        col("vec_id").as("a") +:
          array((0 until p).map(i => col(s"th$i")): _*).as("ta") +:
          (0 until p).map(i => floor(col(s"th$i") / lit(bandWidthDeg)).cast("long").as(s"band$i")): _*)
      var right = nz.select(
        col("vec_id").as("b") +:
          array((0 until p).map(i => col(s"th$i")): _*).as("tb") +:
          (0 until p).map(i => floor(col(s"th$i") / lit(bandWidthDeg)).cast("long").as(s"c$i")): _*)
      (0 until p).foreach { i =>
        right = right.withColumn(s"band$i",
          explode(sequence(col(s"c$i") - lit(m), col(s"c$i") + lit(m))))
      }
      left.join(right.drop((0 until p).map(i => s"c$i"): _*), bandCols)
        .filter(col("a") < col("b"))
        .filter((0 until p)
          .map(i => abs(col("ta")(i) - col("tb")(i)) <= lit(maxDeltaDeg))
          .reduce(_ && _))
        .select("a", "b", "ta", "tb")
    }

    // ----- q53 round shape: eager-checkpoint + separate sig job (r6) vs
    // lazy checkpoint fused into the sig job (shipped) ----------------------
    def q53edges: (DataFrame, DataFrame) = {
      // near-dup signature pairs at gate shape (see Queries q53): exact
      // minhash-equality edges over the document corpus
      graft.functions.TextSketch.registerMinHash(spark, "minhash_sig_q8", MinhashParams, P, preMod = false)
      graft.functions.ShingleHashes.register(spark, "shingle_hashes_8", 8)
      val sig = spread(t("documents").filter(length(col("text")) >= 8))
        .select(col("doc_id"), call_function("shingle_hashes_8", col("text")).as("hs"))
        .select(col("doc_id") +: MinhashParams.indices.map(j =>
          coalesce(element_at(call_function("minhash_sig_q8", col("hs")), j + 1),
            lit(-1L)).as(s"mh$j")): _*)
      val keys = Seq("mh0", "mh1", "mh2", "mh3")
      val edges = sig.toDF("src" +: keys: _*)
        .join(sig.toDF("dst" +: keys: _*), keys)
        .filter(col("src") < col("dst"))
        .select("src", "dst")
      val nodes = t("documents").select(col("doc_id").as("id"))
      (nodes, edges)
    }
    def ccStarEager(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 50): DataFrame = {
      var pairs = edges.select(col("src").as("u"), col("dst").as("v"))
        .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
        .unionByName(nodes.select(col("id").as("u"), col("id").as("v")))
        .distinct()
        .localCheckpoint(true)
      def sig(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).collect()(0)
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      var prevSig = sig(pairs)
      var round = 0
      var converged = false
      while (!converged && round < maxRounds) {
        val sym = pairs
          .unionByName(pairs.select(col("v").as("u"), col("u").as("v")))
        val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
          .select(col("u"), least(col("mv"), col("u")).as("m"))
        val large = sym.join(mins, "u")
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .unionByName(mins.select(col("u"), col("m").as("v")))
          .distinct()
        val oriented = large.select(
          greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        val mins2 = oriented.groupBy("u").agg(min(col("v")).as("mv"))
          .select(col("u"), least(col("mv"), col("u")).as("m"))
        val next = oriented.join(mins2, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .unionByName(mins2.select(col("u"), col("m").as("v")))
          .distinct()
          .localCheckpoint(true)
        val nextSig = sig(next)
        converged = nextSig == prevSig
        prevSig = nextSig
        pairs = next
        round += 1
      }
      require(converged, s"ccStarEager did not converge in $maxRounds rounds")
      pairs.groupBy("u").agg(min("v").as("component"))
        .select(col("u").as("id"), col("component"))
    }

    val variants: Seq[(String, () => DataFrame)] = which match {
      case "q25" => Seq(
        "scan-1part" -> (() => q25body(t("documents"))),
        "scan-spread" -> (() => q25body(spread(t("documents")))))
      case "q01" => Seq(
        "scan-1part" -> (() => q01body(t("lineitem"))),
        "scan-spread" -> (() => q01body(spread(t("lineitem")))))
      case "q08" => Seq(
        "scan-1part" -> (() => q08body(t("lineitem"))),
        "scan-spread" -> (() => q08body(spread(t("lineitem")))))
      case "q44" => Seq(
        "cap8" -> (() => q44cap(8)),
        "cap4" -> (() => q44cap(4)),
        "cap2" -> (() => q44cap(2)),
        "cap1" -> (() => q44cap(1)))
      case "q18" => Seq(
        "lvl11-leftdeep" -> (() => q18with(
          graft.engine.SpatialJoin.s2RangePredicate(6.3, 43.3, 6.7, 43.7, level = 11))),
        "lvl11-balanced" -> (() => q18with(balancedOr(rangesAt(11)))),
        "lvl9-leftdeep" -> (() => q18with(rangesAt(9).reduce(_ || _))),
        "lvl8-leftdeep" -> (() => q18with(rangesAt(8).reduce(_ || _))))
      case "q39" => Seq("old-distinct" -> q39old, "new-kernel" -> q39new,
        "old-distinct-spread" -> (() => q39base({ (docs, profile) =>
          val grams = docs
            .select(col("doc_id"), col("lang"),
              explode(sequence(lit(1), length(col("text")) - 2)).as("i"), col("text"))
            .select(col("doc_id"), col("lang"),
              xxhash64(expr("substring(text, i, 3)")).as("ghash"))
            .distinct()
          grams.join(broadcast(profile), Seq("ghash"))
        }, spreadDocs = true)))
      case "q36" => Seq("old-votesum" -> q36old, "new-pack" -> q36new,
        "new-pack-repart" -> (() => {
          graft.functions.TextSketch.registerSimHash(spark, "simhash_pack_32", 32)
          q36tail(t("documents").filter(length(col("text")) >= 8)
            .repartition(cpus.toInt)
            .select(col("doc_id"), call_function("shingle_hashes_8", col("text")).as("hs"))
            .select(col("doc_id"),
              coalesce(call_function("simhash_pack_32", col("hs")), lit(-1L)).as("sh32")))
        }),
        "new-pack-ckpt" -> (() => {
          graft.functions.TextSketch.registerSimHash(spark, "simhash_pack_32", 32)
          val sig = t("documents").filter(length(col("text")) >= 8)
            .repartition(cpus.toInt)
            .select(col("doc_id"), call_function("shingle_hashes_8", col("text")).as("hs"))
            .select(col("doc_id"),
              coalesce(call_function("simhash_pack_32", col("hs")), lit(-1L)).as("sh32"))
            .localCheckpoint(true)
          q36tail(sig)
        }))
      case "q22" => Seq("old-agg" -> q22old, "new-kernel" -> q22new)
      case "q57" => Seq(
        "old-arrays-pGen" -> (() => q57oldCand(q57vecs, 0.98 - 5e-7, 11.5)),
        "new-scalars-1Gen" -> (() => graft.engine.Ann.angleBandCandidates(
          q57vecs, 0.98 - 5e-7, bandWidthDeg = 11.5)))
      case "q57p" => Seq(
        "pivots3" -> (() => graft.engine.Ann.angleBandCandidates(
          q57vecs, 0.98 - 5e-7, bandWidthDeg = 11.5, numPivots = 3)),
        "pivots4" -> (() => graft.engine.Ann.angleBandCandidates(
          q57vecs, 0.98 - 5e-7, bandWidthDeg = 11.5, numPivots = 4)))
      case "q57full" => Seq(
        "pivots3" -> (() => graft.engine.Ann.pairsAngleBanded(
          q57vecs, 0.98 - 5e-7, bandWidthDeg = 11.5, numPivots = 3)),
        "pivots4" -> (() => graft.engine.Ann.pairsAngleBanded(
          q57vecs, 0.98 - 5e-7, bandWidthDeg = 11.5, numPivots = 4)))
      case "q34" => {
        // old (plain planner-choice cluster join) vs shipped (fetchSide on
        // idx) — full q34 body either way
        graft.engine.Ann.register(spark)
        val vecs = t("embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
        val centroids = graft.engine.Ann.trainCentroids(vecs, k = 8, iters = 2)
        def q34tail(pairs: DataFrame): DataFrame = pairs
          .select(col("a"), col("b"),
            round(graft.engine.Ann.cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")), 6).as("r_cos"))
          .filter(col("r_cos") >= 0.44)
          .orderBy("a", "b")
        def oldIvfPairs(nprobe: Int): DataFrame = {
          // reproduce the pre-fetchSide shape via assign + plain join
          val spreadVecs = spread(vecs)
          val assigned = graft.engine.Ann.assign(spreadVecs, centroids).toDF("cluster", "a", "va")
            .withColumn("na", graft.engine.Ann.norm(col("va")))
          val sorted = array_sort(transform(
            array(centroids.map { case (c, arr) =>
              struct(lit(c).as("cluster"), typedLit(arr.toSeq).as("centroid"))
            }: _*),
            c => struct(call_function("sq_dist_vec", col("vb"), c.getField("centroid")).as("d"),
              c.getField("cluster").as("cluster"))))
          val probeClusters = transform(slice(sorted, 1, nprobe), s => s.getField("cluster"))
          val probes = spreadVecs.toDF("b", "vb")
            .withColumn("nb", graft.engine.Ann.norm(col("vb")))
            .withColumn("cluster", explode(probeClusters))
          assigned.join(probes, Seq("cluster"))
            .filter(col("a") < col("b"))
            .select("a", "va", "na", "b", "vb", "nb")
        }
        Seq(
          "old-planner-join" -> (() => q34tail(oldIvfPairs(8))),
          "new-fetchSide" -> (() => q34tail(graft.engine.Ann.ivfPairs(vecs, centroids, nprobe = 8))))
      }
      case "q53" => Seq(
        "old-eager-ckpt" -> (() => { val (n, e) = q53edges; ccStarEager(n, e) }),
        "new-fused-sig" -> (() => { val (n, e) = q53edges; graft.engine.Graph.connectedComponentsStar(n, e) }))
      case other => sys.error(s"unknown A/B: $other")
    }

    // warm both once, then alternate reps
    variants.foreach { case (_, f) => f().count() }
    val times = variants.map { case (n, _) => n -> scala.collection.mutable.ArrayBuffer.empty[Double] }.toMap
    (1 to reps).foreach { _ =>
      variants.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f().count()
        times(n) += (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (n, _) =>
      val ts = times(n).toSeq
      println(f"$which $n%-14s best=${ts.min}%.3f median=${ts.sorted.apply(ts.size / 2)}%.3f all=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
