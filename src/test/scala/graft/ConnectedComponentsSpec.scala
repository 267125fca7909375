package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ConnectedComponents

/** The operator must agree with a driver-side union-find on arbitrary
  * graphs — including deep chains (multi-hop propagation), isolated
  * nodes, and cycles. */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** Reference union-find with path compression. */
  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonicalize to component minimum
    val members = nodes.groupBy(find)
    nodes.map(n => n -> members(find(n)).min).toMap
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.labels(
      nodes.toDF("node"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, cycle, isolated node, and a star agree with union-find") {
    val nodes = (1L to 14L)
    // chain 1-2-3-4-5, cycle 6-7-8-6, star 10<-{11,12,13}, isolated 9 + 14
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L,
      6L -> 7L, 7L -> 8L, 8L -> 6L,
      11L -> 10L, 12L -> 10L, 13L -> 10L)
    val expected = unionFind(nodes, edges)
    assert(run(nodes, edges) == expected)
    assert(expected(5L) == 1L && expected(9L) == 9L && expected(13L) == 10L)
  }

  test("random graphs agree with union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val nodes = (1L to n.toLong)
      val edges = Seq.fill(n / 2)(
        (rnd.nextInt(n) + 1).toLong -> (rnd.nextInt(n) + 1).toLong)
      assert(run(nodes, edges) == unionFind(nodes, edges), s"trial $trial")
    }
  }

  test("a deep chain needs (and gets) many propagation rounds") {
    val nodes = (1L to 20L)
    val edges = (1L until 20L).map(i => i -> (i + 1))
    assert(run(nodes, edges) == nodes.map(_ -> 1L).toMap)
  }

  test("pointer doubling converges a 200-node path well inside maxIter " +
    "(one-hop propagation alone would need 200 rounds)") {
    val nodes = (1L to 200L)
    val edges = (1L until 200L).map(i => i -> (i + 1))
    assert(run(nodes, edges) == nodes.map(_ -> 1L).toMap)
  }
}
