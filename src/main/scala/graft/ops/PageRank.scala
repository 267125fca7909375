package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration (Brin/Page 1998) in exact fixed-point
  * arithmetic: ranks are BIGINT units of 1e-12, the 0.85 damping is
  * `(m * 85) div 100`, and per-edge contributions are integer
  * divisions — every step is exact integer math, so a SQL engine
  * replays the iteration bit-for-bit and the result hash-matches
  * (floating PageRank never does: the inflow sum order differs per
  * shuffle).
  *
  * Shape at 100TB: each iteration is one hash shuffle of the edge
  * list joined to the current ranks plus one aggregation with
  * map-side partial sums — the classic Pregel-as-joins pattern. The
  * edge list with out-degrees is computed once and reused; at cluster
  * scale you persist it partitioned by src so every iteration's join
  * co-locates (only the rank table, |V| not |E|, moves per round).
  * Iteration count is fixed (power iteration converges geometrically;
  * rank ORDER stabilizes long before values).
  */
object PageRank {

  /** `edges`: directed (srcCol, dstCol) pairs, any integral node ids.
    * Returns (node, rank) with rank in fixed-point `scale` units.
    * Nodes with no out-edges contribute nothing (dangling mass is
    * dropped, the common simplification); nodes with no in-edges keep
    * the teleport base. */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // Hash-partitioned by src once: every iteration's rank join carries
    // an IDENTICAL repartition subtree, so the planner materializes the
    // exchange once and every round reads it back (ReusedExchange) —
    // only the |V|-sized rank table shuffles per round; the |E|-sized
    // edge list never moves or recomputes. (An explicit .persist here
    // was tried and REVERTED twice: it leaks storage memory past the
    // call unless eagerly checkpointed, and the eager checkpoint broke
    // lazy cache fill — 1.5s -> 8.3s at sf0.1.)
    val withDeg = e.join(deg, "src")
      .repartition(col("src"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val consts = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(consts))
      .select(col("node"),
        expr(s"${scale}L div n_nodes").as("rank"),
        expr(s"(${scale}L div n_nodes) * 15 div 100").as("base"))
    for (_ <- 1 to iters) {
      val inflow = withDeg
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      ranks = ranks.select("node", "base")
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (col("base") + expr("(coalesce(m, 0L) * 85) div 100")).as("rank"),
          col("base"))
    }
    ranks.select("node", "rank")
  }

  /** The identical iteration as DuckDB SQL over the lineitem bipartite
    * part/supplier graph (parts = even node ids, suppliers = odd) —
    * generated so the oracle and the engine can never drift on
    * iteration count. */
  def bipartiteOracleSql(iters: Int, scale: Long = 1000000000000L): String = {
    val head =
      s"""WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
         |edges AS (SELECT p*2 AS src, s*2+1 AS dst FROM e
         |          UNION ALL SELECT s*2+1, p*2 FROM e),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |nodes AS (SELECT src AS node FROM edges
         |          UNION SELECT dst FROM edges),
         |c AS (SELECT COUNT(*) AS n FROM nodes),
         |r0 AS (SELECT node, CAST($scale // n AS BIGINT) AS rank,
         |         CAST(($scale // n) * 15 // 100 AS BIGINT) AS base
         |       FROM nodes, c)""".stripMargin
    val its = (1 to iters).map { k =>
      s"""r$k AS (SELECT n.node, CAST(n.base + (COALESCE(s.m, 0) * 85) // 100 AS BIGINT) AS rank,
         |  n.base
         |  FROM r${k - 1} n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r.rank // d.outdeg) AS m
         |    FROM edges e JOIN r${k - 1} r ON e.src = r.node
         |    JOIN deg d ON e.src = d.src
         |    GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
    }
    (Seq(head) ++ its).mkString(",\n") +
      s"\nSELECT node, rank FROM r$iters ORDER BY node"
  }
}
