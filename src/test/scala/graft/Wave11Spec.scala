package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave 11 invariants: integer HITS against an in-memory reference,
  * modularity identities from a reference LPA, and the audio-frame
  * byte walk. */
class Wave11Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** Reference LPA labels (same contract as Wave10Spec's). */
  private def referenceLpa(): (Set[(Long, Long)], Map[Long, Seq[Long]], Map[Long, Long]) = {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rs =>
      val ps = rs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    val adj = (edges ++ edges.map(p => (p._2, p._1))).toSeq
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(u => u -> u).toMap
    (1 to graft.queries.Wave10.LpaRounds).foreach { _ =>
      val prev = lbl
      lbl = adj.map { case (u, vs) =>
        val counts = vs.groupBy(prev).map { case (l, g) => (l, g.size) }
        u -> counts.toSeq.minBy { case (l, n) => (-n, l) }._1
      }
    }
    (edges, adj, lbl)
  }

  test("q_hits_scores equals an in-memory integer HITS") {
    val ed = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_orderkey", "o_custkey")
      .join(Tables.load(spark, SharedSpark.sf001, "lineitem")
        .select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = ed.groupBy(_._2)
    val byCust = ed.groupBy(_._1)
    var h: Map[Long, Long] = byCust.keys.map(_ -> 1000000L).toMap
    var a: Map[Long, Long] = Map.empty
    (1 to graft.queries.Wave11.HitsRounds).foreach { _ =>
      val araw = bySupp.map { case (s, es) => s -> es.map(e => h(e._1)).sum }
      val amx = araw.values.max
      a = araw.map { case (s, r) =>
        s -> (BigInt(r) * 1000000 / amx).toLong
      }
      val hraw = byCust.map { case (c, es) => c -> es.map(e => a(e._2)).sum }
      val hmx = hraw.values.max
      h = hraw.map { case (c, r) =>
        c -> (BigInt(r) * 1000000 / hmx).toLong
      }
    }
    val rows = graft.queries.Wave11.hitsScores
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.length == a.size + h.size)
    rows.foreach { r =>
      val expect = if (r.getString(0) == "auth") a(r.getLong(1)) else h(r.getLong(1))
      assert(r.getLong(2) == expect, s"${r.getString(0)} ${r.getLong(1)}")
    }
    assert(rows.exists(_.getLong(2) == 1000000L), "max nodes score 1e6")
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 1000000L))
  }

  test("q_graph_modularity equals the reference-LPA Newman formula") {
    val (edges, adj, lbl) = referenceLpa()
    val m = edges.size.toLong
    val eIn: Map[Long, Long] = edges.toSeq
      .filter { case (u, v) => lbl(u) == lbl(v) }
      .groupBy(p => lbl(p._1))
      .map { case (c, g) => c -> g.size.toLong }
    val dSum: Map[Long, Long] = adj.toSeq.groupBy(p => lbl(p._1))
      .map { case (c, g) => c -> g.map(_._2.size.toLong).sum }
    val rows = graft.queries.Wave11.graphModularity
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.length == lbl.values.toSet.size)
    var contribSum = BigInt(0)
    rows.foreach { r =>
      val c = r.getLong(0)
      assert(r.getLong(1) == lbl.count(_._2 == c))
      assert(r.getLong(2) == eIn.getOrElse(c, 0L), s"e_in of $c")
      assert(r.getLong(3) == dSum(c))
      val contrib = BigInt(4) * BigInt(m) * BigInt(eIn.getOrElse(c, 0L)) -
        BigInt(dSum(c)) * BigInt(dSum(c))
      assert(BigInt(r.getLong(4)) == contrib)
      contribSum += contrib
    }
    // degree sums over all communities account for both edge endpoints
    assert(rows.map(_.getLong(3)).sum == 2 * m)
    val qPpm = (contribSum * 1000000 / (BigInt(4) * m * m)).toLong
    assert(rows.forall(_.getLong(5) == qPpm))
    // a flooded single community scores 0 (e_in = m, d = 2m): any other
    // partition is a real measurement — just pin the range
    assert(qPpm >= -1000000L && qPpm <= 1000000L)
  }

  test("q_audio_energy_vad equals the byte-walk energy recompute") {
    val docs = Tables.load(spark, SharedSpark.sf001, "documents")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, text) =>
      text.getBytes("UTF-8").grouped(160).zipWithIndex.map { case (chunk, i) =>
        val e = chunk.map { b => val v = (b & 0xff) - 128; v.toLong * v }.sum
        ((id, i.toLong), (chunk.length.toLong, e))
      }
    }.toMap
    val rows = graft.queries.Wave11.audioEnergyVad
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.length == expected.size && expected.nonEmpty)
    rows.foreach { r =>
      val (n, e) = expected((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) == n && r.getLong(3) == e)
      assert(r.getBoolean(4) == (e > n * 2000L))
    }
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "VAD must fire on some frames and not others")
  }

  test("q_ts_acf equals a BigInt recompute of the centered lag products") {
    val daily = Tables.load(spark, SharedSpark.sf001, "orders")
      .groupBy(graft.functions.Exact.bucket(
        graft.functions.Exact.ms(col("o_orderdate")), 86400000L).as("day"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = daily.size.toLong
    val tot = daily.values.sum
    def c(day: Long) = BigInt(daily(day)) * n - tot
    val d2 = daily.keys.map(d => c(d) * c(d)).sum
    val rows = graft.queries.Wave13.tsAcf
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val lag = r.getLong(0)
      val pairs = daily.keys.filter(d => daily.contains(d + lag)).toSeq
      assert(r.getLong(1) == pairs.length.toLong)
      val num = pairs.map(d => c(d) * c(d + lag)).sum
      assert(BigInt(r.getLong(2)) == num * 1000000 / d2, s"lag $lag")
      assert(math.abs(r.getLong(2)) <= 1000000L)
    }
  }

  test("q_graph_assortativity equals BigInt moments over reference degrees") {
    val (edges, adj, _) = referenceLpa()
    val deg = adj.map { case (u, vs) => u -> vs.size.toLong }
    val xy = (edges ++ edges.map(p => (p._2, p._1))).toSeq
      .map { case (u, v) => (deg(u), deg(v)) }
    val n = BigInt(xy.size)
    val sx = BigInt(xy.map(_._1).sum); val sy = BigInt(xy.map(_._2).sum)
    val sxy = xy.map { case (x, y) => BigInt(x) * y }.sum
    val sxx = xy.map { case (x, _) => BigInt(x) * x }.sum
    val syy = xy.map { case (_, y) => BigInt(y) * y }.sum
    val num = n * sxy - sx * sy
    val r = graft.queries.Wave13.graphAssortativity
      .run(spark, SharedSpark.sf001).collect().head
    assert(r.getLong(0) == xy.size.toLong)
    assert(r.getInt(3) == num.signum)
    assert(BigInt(r.getLong(4)) ==
      num * num * 1000000 / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
    // symmetric edge treatment: sx == sy by construction
    assert(sx == sy)
  }

  test("q_text_sentiment equals per-doc lexicon counting") {
    val pos = Set("good", "great", "best", "fast", "clean", "right", "new")
    val neg = Set("bad", "slow", "wrong", "dup", "error", "old", "broken")
    val docs = Tables.load(spark, SharedSpark.sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    val rows = graft.queries.Wave13.textSentiment
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.length == docs.length)
    val byId = docs.toMap
    var seenPos = false; var seenNeg = false
    rows.foreach { r =>
      val toks = byId(r.getLong(0)).toLowerCase.split(" ").filter(_.nonEmpty)
      val np = toks.count(pos); val nn = toks.count(neg)
      assert(r.getLong(1) == toks.length.toLong && r.getLong(2) == np &&
        r.getLong(3) == nn)
      if (toks.nonEmpty)
        assert(r.getLong(4) == (np - nn).toLong * 1000000L / toks.length)
      if (np > nn) seenPos = true
      if (nn > np) seenNeg = true
    }
    assert(seenPos && seenNeg, "lexicon must discriminate on this corpus")
  }

  test("q_forecast_eval equals the sequential Holt one-step errors") {
    val series = graft.queries.Wave10.holtSeries(spark, SharedSpark.sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val rows = graft.queries.Wave14.forecastEval
      .run(spark, SharedSpark.sf001).collect().sortBy(_.getLong(0))
    assert(rows.length == series.length - 1)
    // MAPE mirrors the engine's COUNT(ape_ppm) semantics: ape is NULL
    // for a zero-revenue month, so only non-null rows enter the sum
    // AND the divisor — an unconditional getLong(4)/rows.length would
    // fail spuriously on a zero month instead of flagging a real bug.
    var sumAbsErr = BigInt(0); var sumNaive = BigInt(0)
    var sumApe = 0L; var nApe = 0L
    rows.zipWithIndex.foreach { case (r, i) =>
      val (pt, px, pl, pb) = series(i)        // step t-1
      val (t, x, _, _) = series(i + 1)        // step t
      assert(r.getLong(0) == t && pt == t - 1)
      val f = pl + pb
      assert(r.getLong(2) == f && r.getLong(3) == x - f)
      if (x > 0) {
        assert(!r.isNullAt(4) && r.getLong(4) == math.abs(x - f) * 1000000L / x)
        sumApe += r.getLong(4); nApe += 1
      } else assert(r.isNullAt(4))
      sumAbsErr += (x - f).abs; sumNaive += (x - px).abs
    }
    assert(nApe > 0, "corpus must have at least one revenue month")
    assert(rows.head.getLong(5) == sumApe / nApe)
    assert(BigInt(rows.head.getLong(6)) == sumAbsErr * 1000000 / sumNaive)
    // the smoother must actually beat or track persistence-scale errors
    assert(rows.head.getLong(6) > 0)
  }

  test("q_markov_entropy equals a fxlog2 recompute from transition counts") {
    import graft.plans.FxLog2.fxlog2
    val ev = Tables.load(spark, SharedSpark.sf001, "events")
      .select(col("user_id"), col("event_type"),
        graft.functions.Exact.ms(col("ts")).as("ms"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).values.flatMap { rs =>
      val s = rs.sortBy(e => (e._3, e._4)).map(_._2)
      s.zip(s.drop(1))
    }.toSeq
    val c = trans.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rows = graft.queries.Wave14.markovEntropy
      .run(spark, SharedSpark.sf001).collect()
    val byFrom = c.groupBy(_._1._1)
    assert(rows.length == byFrom.size)
    rows.foreach { r =>
      val from = r.getString(0)
      val cells = byFrom(from)
      val total = cells.values.sum
      val k = cells.size.toLong
      assert(r.getLong(1) == total && r.getLong(2) == k)
      val hFx = cells.values.map(n => n * (fxlog2(total) - fxlog2(n))).sum
      assert(r.getLong(3) == hFx, s"state $from")
      if (k > 1)
        assert(BigInt(r.getLong(4)) ==
          BigInt(hFx) * 1000000 / (BigInt(total) * fxlog2(k)))
      // entropy ratio lives in [0, ~1e6] (fx truncation can nick the top)
      if (k > 1) assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000100L)
    }
  }

  test("q_price_elasticity equals BigInt moments over fxlog2 pairs") {
    import graft.plans.FxLog2.fxlog2
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") / col("l_quantity")
          * (lit(1) - col("l_discount")) * 100, 0).cast("long").as("pc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPart = li.groupBy(_._1)
    val rows = graft.queries.Wave14.priceElasticity
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    var sawNegative = false
    rows.foreach { r =>
      val lines = byPart(r.getLong(0))
      assert(r.getLong(1) == lines.length.toLong && lines.length >= 8)
      val xy = lines.map { case (_, q, p) => (fxlog2(p), fxlog2(q)) }
      val n = BigInt(xy.length)
      val sx = xy.map(p => BigInt(p._1)).sum
      val sy = xy.map(p => BigInt(p._2)).sum
      val sxy = xy.map(p => BigInt(p._1) * p._2).sum
      val sxx = xy.map(p => BigInt(p._1) * p._1).sum
      val den = n * sxx - sx * sx
      assert(den > 0)
      assert(BigInt(r.getLong(2)) == (n * sxy - sx * sy) * 1000000 / den)
      if (r.getLong(2) < 0) sawNegative = true
    }
    assert(sawNegative, "demand curves must slope down somewhere")
  }
}
