package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators over DataFrames — the capability class a
  * webtext pipeline needs for domain ranking (PageRank over the link
  * graph) and duplicate clustering (connected components over near-dup
  * candidate pairs).
  *
  * Both run in EXACT INTEGER arithmetic: floating-point power iteration
  * sums contributions in nondeterministic order, so cross-engine (and
  * cross-run) bit-equality would be unattainable; integer micro-units
  * with explicit DIV rounding make every iteration order-independent and
  * oracle-exact. Iteration counts are fixed (bounded plans, checkpoint-
  * friendly); each round is one equi-join + one aggregation, the shape
  * AQE re-plans freely.
  */
object Graph {

  /** Integer PageRank: ranks in micro-units (total mass ~10^12), uniform
    * teleport, fixed `iters` power iterations. `edges` must have columns
    * (src, dst); every src's out-degree is taken from the edge table.
    * Returns (id, rank). Nodes come from `nodes` (single `id` column) so
    * sinks with no in-edges keep their teleport share. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val spark = nodes.sparkSession
    val n = nodes.count()
    val base = 1000000000000L / n // initial/teleport mass per node
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // out-degree rides along with the rank table so the per-iteration
    // join is rank-table x edges only
    var ranks = nodes
      .join(outDeg, nodes("id") === outDeg("src"), "left")
      .select(col("id"), lit(base).as("rank"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
    (1 to iters).foreach { _ =>
      val contribs = edges
        .join(ranks, edges("src") === ranks("id"))
        .select(col("dst"), expr("rank DIV outdeg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      ranks = ranks
        .join(contribs, ranks("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(15L * base / 100L) + expr("85 * coalesce(s, 0L) DIV 100")).as("rank"),
          col("outdeg"))
    }
    ranks.select("id", "rank")
  }

  /** Connected components by min-label propagation: labels start as the
    * node id; each round every node takes the min of its own label and
    * its neighbours' (edges treated as undirected). A fixed `iters`
    * bounds the plan; components with diameter < iters converge to their
    * minimum member id. Returns (id, component). */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    // undirected: propagate along both directions of every edge
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
    var labels = nodes.select(col("id"), col("id").as("component"))
    (1 to iters).foreach { _ =>
      val neighborMin = und
        .join(labels, und("b") === labels("id"))
        .groupBy("a").agg(min("component").as("nmin"))
      labels = labels
        .join(neighborMin, labels("id") === neighborMin("a"), "left")
        .select(col("id"), least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))
    }
    labels
  }
}
