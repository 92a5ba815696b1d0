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
}
