package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step that turns a
  * near-duplicate PAIR list (minhash/simhash/cosine candidates) into
  * dedup CLUSTERS with one canonical keeper per cluster.
  *
  * Algorithm: min-label propagation with a POINTER-DOUBLING shortcut.
  * Every node starts labeled with itself; each round every node takes
  * the minimum label in its closed neighborhood, then compresses one
  * pointer hop (component := component's component — valid because a
  * label is always itself a node id). The neighborhood step alone moves
  * labels one hop per round (a duplicate group chained as a path of n
  * needs n rounds — a data-size-dependent failure); the doubling step
  * halves the remaining pointer depth each round, giving O(log n)
  * convergence on any topology — the same shortcutting idea as the
  * large-star rewiring of Kiveris et al., "Connected Components in
  * MapReduce and Beyond" (SoCC 2014), expressed as one extra self-join
  * per round instead of edge rewrites. One round = two shuffle joins +
  * one aggregate — all-scalable primitives, no driver-side graph.
  *
  * Each round ends in `localCheckpoint` — iterative plans otherwise
  * accumulate lineage and replan the whole history every action.
  */
object ConnectedComponents {

  /** Labels every node of `edges` (cols `src`, `dst`; direction
    * ignored) plus every node of `nodes` with its component's minimum
    * node id. Returns (node, component). */
  def labels(
      nodes: DataFrame, // single long col "node" (includes isolated nodes)
      edges: DataFrame, // long cols "src", "dst"
      maxIter: Int = 64): DataFrame = {
    // symmetric closure once, checkpointed: reused every round
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = nodes.select(col("node"), col("node").as("component"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // min label over the closed neighborhood (self + neighbors)
      val fromNeighbors = sym
        .join(labels, sym("src") === labels("node"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("component")).as("nc"))
      val hop = labels
        .join(fromNeighbors, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nc"), col("component")))
            .as("component"))
      // pointer doubling: follow the label one more hop (labels are node
      // ids, monotonically decreasing, so the lookup always resolves and
      // only ever lowers the label further)
      val next = hop
        .join(hop.select(col("node").as("component"),
          col("component").as("cc")), Seq("component"))
        .select(col("node"), col("cc").as("component"))
        .localCheckpoint()
      // converged when no label moved this round (labels only decrease)
      converged = next.join(labels.withColumnRenamed("component", "prev"), "node")
        .filter(col("component") < col("prev"))
        .isEmpty
      labels = next
      iter += 1
    }
    require(converged, s"not converged after $maxIter rounds (pointer " +
      "doubling bounds this at O(log n) — a graph needing more is a bug)")
    labels
  }
}
