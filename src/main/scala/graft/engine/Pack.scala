package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step of LLM training-data
  * prep: documents are laid out in a deterministic order, their token
  * counts concatenated, and the stream is cut every `capacity` tokens;
  * a document's chunk id is floor(tokens-before-it / capacity).
  *
  * The naive formulation is a GLOBAL running sum — `Window.orderBy` with
  * no partition key, which Spark executes on a single task and is the
  * classic 10^12-row scale trap. This operator computes the identical
  * prefix sum in two passes (the same segmented-prefix-scan shape as
  * AsOf.joinBucketed): rows band by their order key, each band computes
  * its local running sum in parallel, and a tiny per-band-totals window
  * (|bands| rows) supplies each band's global offset.
  */
object Pack {

  /** Adds `prefix_before` (tokens before this row in order) and `chunk`
    * (= prefix_before / capacity) to `df`.
    *
    * DETERMINISM CONTRACT: `(orderCol, tieBreak...)` must order rows
    * uniquely. With duplicate order keys and no tie-breaker, which of the
    * tied rows "comes first" — and therefore their chunk assignment —
    * varies across runs/engines (window ordering is only a partial
    * order), silently breaking oracle exactness. Pass `tieBreak` columns
    * (e.g. a unique id) whenever orderCol alone can tie; ties always
    * share a band (banding is a function of orderCol), so the tie-breaker
    * composes with the segmented two-pass shape unchanged.
    *
    * @param orderCol  numeric column defining the global layout order
    *                  (ids need not be dense — only ordered)
    * @param weightCol integer token/weight count per row
    * @param bandWidth order-key span per band: parallelism knob; each
    *                  band's rows sort locally, so bands should hold
    *                  ~10^5-10^7 rows at scale
    * @param tieBreak  columns completing the total order when orderCol
    *                  values can repeat */
  def chunkIds(
      df: DataFrame,
      orderCol: String,
      weightCol: String,
      capacity: Long,
      bandWidth: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(capacity > 0 && bandWidth > 0)
    val banded = df.withColumn("__band", floor(col(orderCol) / lit(bandWidth)).cast("long"))
    // pass 1: running sum WITHIN each band (parallel across bands)
    val wLocal = Window.partitionBy("__band").orderBy((orderCol +: tieBreak).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = banded.withColumn("__local_before",
      coalesce(sum(col(weightCol)).over(wLocal), lit(0L)))
    // pass 2: per-band totals -> running offsets. ONE row per band; the
    // unpartitioned window is over this tiny summary, never the data.
    val wOffset = Window.orderBy("__band").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = banded.groupBy("__band")
      .agg(sum(col(weightCol)).as("__band_total"))
      .withColumn("__offset", coalesce(sum(col("__band_total")).over(wOffset), lit(0L)))
      .select("__band", "__offset")
    local
      .join(broadcast(offsets), Seq("__band"))
      .withColumn("prefix_before", col("__offset") + col("__local_before"))
      // integer division (SQL DIV): `/` on longs is DOUBLE division and
      // loses exactness past 2^53 total tokens — reachable at 10^12 docs
      .withColumn("chunk", expr(s"prefix_before DIV ${capacity}L"))
      .drop("__band", "__local_before", "__offset")
  }
}
