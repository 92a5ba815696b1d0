package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Banded MinHash-LSH: recall grows with band count exactly as
  * 1-(1-J^r)^b predicts, and candidates verify against exact Jaccard. */
class LshSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("lsh-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  /** Deterministic corpus: 40 base docs; every third doc gets a near-dup
    * copy with one word changed, every fifth an exact dup. */
  private def corpus = {
    import spark.implicits._
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    def text(seed: Long, n: Int): String =
      (0 until n).map { k =>
        words((math.abs(graft.synth.Pages.mix(seed * 31 + k)) % words.size).toInt)
      }.mkString(" ")
    val base = (0L until 40L).map(i => (i, text(i, 30)))
    val nearDups = base.collect { case (i, t) if i % 3 == 0 =>
      (1000L + i, t.replaceFirst(t.split(" ").head, "zulu"))
    }
    val exactDups = base.collect { case (i, t) if i % 5 == 0 => (2000L + i, t) }
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  private def exactJaccard(n: Int) = {
    import spark.implicits._
    val docs = corpus
    val sh = docs.select(col("doc_id"),
      explode(expr(s"transform(sequence(1, length(text) - ${n - 1}), i -> substring(text, i, $n))")).as("g"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    sh.toDF("a", "g").join(sh.toDF("b", "g"), Seq("g"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("a", "sza"), Seq("a"))
      .join(sizes.toDF("b", "szb"), Seq("b"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("sza") + col("szb") - col("inter"))).as("j"))
  }

  test("more bands = higher recall on true near-dups; exact dups always caught") {
    val docs = corpus
    val sig = Lsh.signatures(docs, "doc_id", "text", n = 8, numHashes = 16).cache()
    val oneBand = Lsh.candidatePairs(sig, "doc_id", 16, bands = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fourBands = Lsh.candidatePairs(sig, "doc_id", 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val eightBands = Lsh.candidatePairs(sig, "doc_id", 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // band-containment: a 16-row band match implies the 4-row bands match
    assert(oneBand.subsetOf(fourBands) && fourBands.subsetOf(eightBands))
    // exact duplicates share every band at any banding
    val exactPairs = (0L until 40L by 5L).map(i => (i, 2000L + i)).toSet
    assert(exactPairs.subsetOf(oneBand))
    // true near-dups (J >= 0.5 on 8-gram sets) recall improves with bands
    val truth = exactJaccard(8).filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(c: Set[(Long, Long)]) = truth.count(c.contains).toDouble / truth.size
    assert(truth.nonEmpty)
    assert(recall(eightBands) >= recall(fourBands))
    assert(recall(fourBands) >= recall(oneBand))
    assert(recall(eightBands) >= 0.9, s"8-band recall ${recall(eightBands)} over ${truth.size} true pairs")
  }
}
