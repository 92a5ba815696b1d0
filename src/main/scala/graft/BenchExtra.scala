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
