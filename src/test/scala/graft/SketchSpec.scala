package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Error-bound tests for the sketch-family queries that cannot have a
  * cross-engine oracle (algorithm-specific layouts): count-min sketch
  * point estimates and t-digest approximate percentiles.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("count-min sketch never undercounts, overcounts by at most eps*N slack") {
    val out = graft.queries.Udfs.sketchCms
      .run(spark, SharedSpark.sf001).collect()
    assert(out.nonEmpty && out.length <= 20)
    val n = Tables.load(spark, SharedSpark.sf001, "events").count()
    val slack = math.max(1L, (3 * 0.0001 * n).toLong) // 3x eps*N head-room
    out.foreach { r =>
      val (t, e) = (r.getLong(1), r.getLong(2))
      assert(e >= t, s"CMS undercounted: true=$t est=$e")
      assert(e <= t + slack, s"CMS overcounted past bound: true=$t est=$e")
    }
  }

  test("approx percentiles fall inside the +-1% rank band of the exact values") {
    val cents = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sorted }
    val approx = graft.queries.Relational.aggApproxPercentile
      .run(spark, SharedSpark.sf001).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val xs = cents(r.getString(0))
      def atRank(q: Double): Long =
        xs(math.max(0, math.min(xs.length - 1, (q * (xs.length - 1)).round.toInt)))
      Seq(0.25 -> r.getLong(1), 0.5 -> r.getLong(2), 0.75 -> r.getLong(3))
        .foreach { case (q, got) =>
          assert(got >= atRank(q - 0.01) && got <= atRank(q + 0.01),
            s"flag=${r.getString(0)} q=$q got=$got band=[${atRank(q - 0.01)}, ${atRank(q + 0.01)}]")
        }
    }
  }

  test("KMV mergeability: the day->month merged sketch estimate equals " +
    "a direct month-level bottom-k (sketch of union = union of sketches)") {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
    // Direct month sketch: bottom-64 per month straight off the corpus,
    // no day stage — if merging day sketches lost information, the
    // query's estimates would diverge from these.
    val mh = li.select(
        trunc(to_date(col("l_shipdate")), "month").as("month"),
        md5(col("l_orderkey").cast("string")).as("h"))
      .distinct()
    val direct = graft.ops.TopK.perGroup(mh,
      partitionBy = Seq(col("month")), orderBy = Seq(col("h").asc),
      k = 64, rankCol = "__rn")
      .groupBy("month").agg(count(lit(1)).as("k"), max(col("h")).as("hk"))
      .collect()
      .map(r => r.getDate(0).toString -> {
        val k = r.getLong(1)
        if (k < 64) k
        else 17732923532771328L /
          math.max(java.lang.Long.parseLong(r.getString(2).take(12), 16), 1L)
      }).toMap
    val merged = graft.queries.Analytics.kmvDistinct
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (m, est) =>
      assert(est == direct(m), s"month $m: merged est $est != direct ${direct(m)}")
    }
  }

  test("KMV set-op estimates land within the k=64 error band of the " +
    "exact union/intersection carried in the same row") {
    val r = graft.queries.Analytics.kmvSetOps
      .run(spark, SharedSpark.sf001).collect()
    assert(r.length == 1)
    val row = r.head
    val (unionEst, interEst) = (row.getLong(1), row.getLong(3))
    val (exactU, exactI) = (row.getLong(4), row.getLong(5))
    assert(exactI > 0, "test sets must overlap or the estimator is vacuous")
    // KMV std error ~ 1/sqrt(k) = 12.5%; allow 4 sigma for the small SF
    assert(math.abs(unionEst - exactU) <= 0.5 * exactU,
      s"union est $unionEst vs exact $exactU")
    assert(math.abs(interEst - exactI) <= 0.5 * exactI,
      s"inter est $interEst vs exact $exactI")
  }
}
