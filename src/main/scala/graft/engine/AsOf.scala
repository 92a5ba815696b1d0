package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — the time-series operator Spark's built-in
  * joins lack (and a range join would solve with an O(matches) row
  * explosion): for every left row, the LATEST right row with the same key
  * and right.ts <= left.ts (backward, inclusive — DuckDB ASOF JOIN
  * semantics, which the q17 oracle uses directly).
  *
  * Plan shape: tag both sides, `unionByName`, then ONE hash exchange on
  * the key with a running `last(..., ignoreNulls)` window over
  * (ts, side) order — no join node at all, no per-row range probe, state
  * bounded by one carried struct per row. At 10^12 rows this is a single
  * shuffle whose partitions stream in sorted order; the window never
  * buffers more than the running frame's carried value.
  */
object AsOf {

  /** @param rightValCols right-side payload columns carried to the output
    *   (each emitted as `asof_<name>`); the right timestamp always comes
    *   along as `asof_<rightTsCol>`. Rows with no match are dropped
    *   (inner as-of, like DuckDB's ASOF JOIN). Among right rows that tie
    *   on (key, ts) the largest payload tuple wins — deterministic on
    *   both engines only for ts-derived outputs, so oracle-checked
    *   queries should emit ts-derived columns unless (key, ts) is unique.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTsCol: String,
      rightTsCol: String,
      rightValCols: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightTsCol +: rightValCols
    // SQL join semantics: NULL keys/timestamps never match (a window
    // partition would happily group NULL keys together; DuckDB's
    // `ON p.k = v.k AND v.ts <= p.ts` would not)
    val l = left
      .filter(col(key).isNotNull && col(leftTsCol).isNotNull)
      .withColumn("__k", col(key))
      .withColumn("__t", col(leftTsCol))
      .withColumn("__side", lit(1))
    val r = right
      .filter(col(key).isNotNull && col(rightTsCol).isNotNull)
      .select(
      col(key).as("__k"),
      col(rightTsCol).as("__t"),
      lit(0).as("__side"),
      struct(carried.map(col): _*).as("__rv"))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal ts (inclusive <=); __rv
    // breaks right-side ties deterministically (nulls — left rows — only
    // tie with each other, harmlessly: last() ignores them anyway)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(leftCols.map(col) ++
        carried.map(c => col("__m").getField(c).as(s"asof_$c")): _*)
  }

  /** Skew-safe as-of join — identical semantics to `join`, but a HOT KEY
    * no longer serializes on one reducer: rows are windowed per
    * (key, time-bucket) so a key's work spreads over its buckets, and a
    * second, far smaller pass over per-bucket summaries carries the
    * latest right value across bucket boundaries (segmented prefix scan).
    * Costs one extra small shuffle plus a column-pruned (key, ts)-only
    * second pass over the left side; the per-bucket summary table is
    * persisted so the right side is scanned exactly once. Use when a key
    * can hold ~10^8+ rows (the same reasoning as pipJoinSalted for dense
    * cells).
    *
    * @param bucketWidth bucket size in the timestamp's units (seconds for
    *   timestamp columns, raw units for numeric ts columns). */
  def joinBucketed(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTsCol: String,
      rightTsCol: String,
      rightValCols: Seq[String] = Nil,
      bucketWidth: Long = 3600L): DataFrame = {
    require(bucketWidth > 0)
    val leftCols = left.columns.toSeq
    val carried = rightTsCol +: rightValCols
    val tsIsTime = left.schema(leftTsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => true
      case org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    def bucketOf(t: org.apache.spark.sql.Column) = {
      val numeric = if (tsIsTime) unix_timestamp(t.cast("timestamp")) else t.cast("long")
      floor(numeric / lit(bucketWidth)).cast("long")
    }
    val l = left
      .filter(col(key).isNotNull && col(leftTsCol).isNotNull)
      .withColumn("__k", col(key))
      .withColumn("__t", col(leftTsCol))
      .withColumn("__side", lit(1))
    val r = right
      .filter(col(key).isNotNull && col(rightTsCol).isNotNull)
      .select(
        col(key).as("__k"),
        col(rightTsCol).as("__t"),
        lit(0).as("__side"),
        struct(carried.map(col): _*).as("__rv"))
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__b", bucketOf(col("__t")))
    // pass 1: running last WITHIN each (key, bucket) — the wide stage, now
    // parallel across a hot key's buckets
    val wLocal = Window.partitionBy("__k", "__b")
      .orderBy(col("__t"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = u.withColumn("__local", last(col("__rv"), ignoreNulls = true).over(wLocal))
    // pass 2 input: ONE row per (key, bucket) — latest right value of the
    // bucket (max (t, rv) = the same tie-break as the window order).
    // Persisted: it is the SMALL summary table (|keys|x|buckets| rows) and
    // is referenced twice below; without the persist each reference would
    // re-scan the right input in full.
    val carryOuts = u.filter(col("__side") === 0)
      .groupBy("__k", "__b")
      .agg(max(struct(col("__t"), col("__rv"))).as("__co"))
      .persist()
    // every bucket holding a LEFT row needs a carry-in from strictly
    // earlier buckets of the same key. The bucket list comes from a
    // COLUMN-PRUNED second pass over the left side's (key, ts) only —
    // cheap next to the full-width window scan — unioned with the right
    // summaries so intermediate right-only buckets propagate the carry.
    val leftBuckets = l.select(col("__k"), bucketOf(col("__t")).as("__b")).distinct()
    val wCarry = Window.partitionBy("__k").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIns = leftBuckets
      .unionByName(carryOuts.select("__k", "__b"))
      .distinct()
      .join(carryOuts, Seq("__k", "__b"), "left")
      .withColumn("__ci", last(col("__co"), ignoreNulls = true).over(wCarry))
      .select(col("__k"), col("__b"), col("__ci.__rv").as("__carry"))
    staged
      .filter(col("__side") === 1)
      .join(carryIns, Seq("__k", "__b"))
      .withColumn("__m", coalesce(col("__local"), col("__carry")))
      .filter(col("__m").isNotNull)
      .select(leftCols.map(col) ++
        carried.map(c => col("__m").getField(c).as(s"asof_$c")): _*)
  }
}
