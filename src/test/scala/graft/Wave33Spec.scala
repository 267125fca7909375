package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 33 invariants: the TPC-H shapes against sequential
  * recomputes. */
class Wave33Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val cutMs =
    java.sql.Timestamp.valueOf("1998-06-01 00:00:00").getTime

  test("q_tpch_q3_priority equals a sequential recompute") {
    val seg = Tables.load(spark, SharedSpark.sf001, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .filter(_.getString(1) == "BUILDING").map(_.getLong(0)).toSet
    val ord = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      .collect()
      .filter(r => seg(r.getLong(1)) && r.getTimestamp(2).getTime < cutMs)
      .map(r => r.getLong(0) -> ((r.getTimestamp(2).getTime,
        r.getString(3)))).toMap
    val rev = scala.collection.mutable.Map.empty[Long, Long]
    Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
      .collect()
      .foreach { r =>
        val ok = r.getLong(0)
        if (ord.contains(ok) && r.getTimestamp(1).getTime > cutMs) {
          val m = math.round(r.getDouble(2) * 100) *
            (10000L - math.round(r.getDouble(3) * 10000))
          rev(ok) = rev.getOrElse(ok, 0L) + m
        }
      }
    val want = rev.toSeq
      .map { case (ok, rv) => (ok, rv, ord(ok)._1, ord(ok)._2) }
      .sortBy { case (ok, rv, dt, _) => (-rv, dt, ok) }.take(10)
    val got = graft.queries.Wave33.tpchQ3
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("q_tpch_q5_local equals a sequential recompute") {
    val asiaNations = Tables.load(spark, SharedSpark.sf001, "nation")
      .join(Tables.load(spark, SharedSpark.sf001, "region")
        .filter(org.apache.spark.sql.functions.col("r_name") === "ASIA")
        .withColumnRenamed("r_regionkey", "n_regionkey"), "n_regionkey")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val cust = Tables.load(spark, SharedSpark.sf001, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val ord = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate").collect()
      .filter(_.getTimestamp(2).toLocalDateTime.getYear == 1997)
      .map(r => r.getLong(0) -> cust(r.getLong(1)))
      .filter(e => asiaNations.contains(e._2)).toMap
    val supp = Tables.load(spark, SharedSpark.sf001, "supplier")
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val agg = scala.collection.mutable.Map.empty[String, (Long, Long)]
    Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .collect()
      .foreach { r =>
        val ok = r.getLong(0)
        ord.get(ok).foreach { cnat =>
          if (supp(r.getLong(1)) == cnat) {
            val nm = asiaNations(cnat)
            val m = math.round(r.getDouble(2) * 100) *
              (10000L - math.round(r.getDouble(3) * 10000))
            val (a, b) = agg.getOrElse(nm, (0L, 0L))
            agg(nm) = (a + m, b + 1)
          }
        }
      }
    val got = graft.queries.Wave33.tpchQ5
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == agg.size && got.nonEmpty)
    got.foreach { case (n, rv, nl) => assert((rv, nl) == agg(n), s"nation $n") }
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted.reverse)
  }
}
