package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step that turns a
  * near-duplicate PAIR list (minhash/simhash/cosine candidates) into
  * dedup CLUSTERS with one canonical keeper per cluster.
  *
  * Algorithm: iterated min-label propagation. Every node starts
  * labeled with itself; each round every node takes the minimum label
  * in its closed neighborhood; at fixpoint each component carries its
  * minimum node id. One round = one shuffle join + one aggregate —
  * all-scalable primitives, no driver-side graph. Rounds needed =
  * graph diameter; near-dup graphs are shallow (tight clusters), and
  * the published large-star/small-star rewiring (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) is the
  * drop-in upgrade that collapses diameter to O(log n) rounds with the
  * same per-round shape if deep chains ever dominate.
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
      maxIter: Int = 32): DataFrame = {
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
      val next = labels
        .join(fromNeighbors, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("nc"), col("component")))
            .as("component"))
        .localCheckpoint()
      // converged when no label moved this round (labels only decrease)
      converged = next.join(labels.withColumnRenamed("component", "prev"), "node")
        .filter(col("component") < col("prev"))
        .isEmpty
      labels = next
      iter += 1
    }
    require(converged, s"not converged after $maxIter rounds — deep chain; " +
      "switch to large-star/small-star")
    labels
  }
}
