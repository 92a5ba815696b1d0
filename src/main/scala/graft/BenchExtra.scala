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

    // ----- q39 variants ---------------------------------------------------
    def q39base(classify: (DataFrame, DataFrame) => DataFrame): DataFrame = {
      val docs = t("documents").filter(length(col("text")) >= 3)
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
      graft.functions.TextSketch.registerMinHash(spark, "minhash_sig_q8", MinhashParams, P, preMod = false)
      q22tail(shingleArr(8)
        .select(col("doc_id") +: MinhashParams.indices.map(j =>
          coalesce(element_at(call_function("minhash_sig_q8", col("hs")), j + 1),
            lit(-1L)).as(s"mh$j")): _*))
    }

    val variants: Seq[(String, () => DataFrame)] = which match {
      case "q39" => Seq("old-distinct" -> q39old, "new-kernel" -> q39new)
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
