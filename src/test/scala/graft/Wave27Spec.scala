package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 27 invariants: each query against a sequential recompute. */
class Wave27Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_prefix_autocomplete equals a sequential recompute") {
    val names = Tables.load(spark, SharedSpark.sf001, "part")
      .select("p_partkey", "p_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rev = scala.collection.mutable.Map.empty[String, Long]
    Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_partkey", "l_extendedprice").collect()
      .foreach { r =>
        val nm = names(r.getLong(0))
        rev(nm) = rev.getOrElse(nm, 0L) + math.round(r.getDouble(1) * 100)
      }
    val want = scala.collection.mutable
      .Map.empty[(String, Long), (String, Long)]
    val byPrefix = scala.collection.mutable
      .Map.empty[String, scala.collection.mutable.ArrayBuffer[(String, Long)]]
    rev.foreach { case (nm, rc) =>
      (1 to 6).foreach { k =>
        if (nm.length >= k)
          byPrefix.getOrElseUpdate(nm.take(k),
            scala.collection.mutable.ArrayBuffer()) += ((nm, rc))
      }
    }
    byPrefix.foreach { case (p, cands) =>
      cands.sortBy { case (nm, rc) => (-rc, nm) }.take(3).zipWithIndex
        .foreach { case ((nm, rc), i) => want((p, i + 1L)) = (nm, rc) }
    }
    val got = graft.queries.Wave27.prefixAutocomplete
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong) ->
        ((r.getString(2), r.getLong(3))))
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (k, v) => assert(v == want(k), s"prefix $k") }
  }

  test("q_outlier_density equals a naive all-pairs recompute") {
    val pts = Tables.load(spark, SharedSpark.sf001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        (r.getLong(0),
          math.floor(e(0).toDouble * 1000).toLong,
          math.floor(e(1).toDouble * 1000).toLong)
      }
    val nbrs = pts.map { case (id, x, y) =>
      id -> pts.filter { case (id2, x2, y2) =>
        id2 != id && (x - x2) * (x - x2) + (y - y2) * (y - y2) <= 10000L
      }.map(_._1).toSeq
    }.toMap
    val n = nbrs.map { case (id, ns) => id -> ns.length.toLong }
    val got = graft.queries.Wave27.outlierDensity
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == pts.length)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == n(id), s"n $id")
      if (n(id) > 0) {
        val mean = nbrs(id).map(n).sum / n(id)
        assert(r.getLong(2) == mean, s"mean $id")
        if (mean > 0) assert(r.getLong(3) == n(id) * 1000000L / mean)
      } else {
        assert(r.isNullAt(2) && r.isNullAt(3))
      }
    }
  }

  test("q_conversion_lag_deciles equals exact order statistics") {
    val ev = Tables.load(spark, SharedSpark.sf001, "events")
      .selectExpr("user_id", "event_type", "unix_millis(ts) AS ms")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val lags = ev.groupBy(_._1).flatMap { case (_, g) =>
      val v = g.collect { case (_, "view", m) => m }
      val p = g.collect { case (_, "purchase", m) => m }
      if (v.nonEmpty && p.nonEmpty && p.min >= v.min)
        Some((p.min - v.min) / 86400000L)
      else None
    }.toSeq.sorted
    val n = lags.length.toLong
    val got = graft.queries.Wave27.conversionLagDeciles
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 9 && n > 0)
    got.foreach { case (d, idx, lagDays, gn) =>
      assert(gn == n)
      val wantIdx = (n - 1) * d / 10 + 1
      assert(idx == wantIdx)
      assert(lagDays == lags((wantIdx - 1).toInt), s"decile $d")
    }
  }
}
