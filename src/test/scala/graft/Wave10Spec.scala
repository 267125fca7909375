package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the round-8 fifth wave: table profiling, U-shaped
  * attribution, Kneser-Ney smoothing, Kaplan-Meier survival, the
  * grid-blocked spatial join, dHash image dedup, and label
  * propagation. The DuckDB hash gate covers cross-engine equality;
  * these tests recompute the algebra independently (naive joins,
  * sequential chains, in-memory reference implementations).
  */
class Wave10Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_profile_table stats are internally consistent") {
    val rows = graft.queries.Wave10.profileTable
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.length == 6)
    val n = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == n, "n_rows must be the table row count")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= n)
      assert(r.getLong(3) >= 1 && r.getLong(3) <= n - r.getLong(2))
      val isNum = !r.isNullAt(4)
      if (isNum) assert(r.getLong(4) <= r.getLong(5) && r.isNullAt(6))
      else assert(r.getString(6) <= r.getString(7) && r.getLong(8) >= 0)
    }
    val key = rows.find(_.getString(0) == "o_orderkey").get
    assert(key.getLong(3) == n - key.getLong(2), "orderkey must be unique")
  }

  test("q_attribution_position credits are an exact 1e6 split") {
    val rows = graft.queries.Wave10.attributionPosition
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getLong(3) >= 3), "need a multi-touch purchase")
    rows.foreach { r =>
      val n = r.getLong(3)
      val (cf, cm, cl) = (r.getLong(6), r.getLong(7), r.getLong(8))
      if (n == 0) {
        assert(r.isNullAt(4) && r.isNullAt(5) && cf == 0 && cm == 0 && cl == 0)
      } else {
        assert(!r.isNullAt(4) && !r.isNullAt(5))
        val total = if (n == 1) cf else cf + cl + (n - 2) * cm
        assert(total == 1000000L, s"purchase=${r.getLong(0)} n=$n")
        if (n >= 3) assert(cf >= 400000 && cl == 400000 && cm > 0)
      }
    }
  }

  test("q_attribution_position first/last agree with a naive scan") {
    val ev = Tables.load(spark, SharedSpark.sf001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        graft.functions.Exact.ms(col("ts")).as("ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val rows = graft.queries.Wave10.attributionPosition
      .run(spark, SharedSpark.sf001).collect()
    rows.foreach { r =>
      val (pid, uid, pms, n) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val clicks = byUser(uid).filter(e => e._3 == "click" &&
        e._4 < pms && e._4 >= pms - 604800000L)
      assert(clicks.length.toLong == n, s"purchase=$pid")
      if (n > 0) {
        // packed-key order = (ms, event_id) lexicographic
        val sorted = clicks.sortBy(e => (e._4, e._2))
        assert(r.getLong(4) == sorted.head._2, s"first of $pid")
        assert(r.getLong(5) == sorted.last._2, s"last of $pid")
      }
    }
  }

  test("q_lm_kneserney equals a BigInt recompute from raw bigrams") {
    val toks = Tables.load(spark, SharedSpark.sf001, "documents")
      .select(col("text")).collect().map(_.getString(0))
      .filter(_ != null)
      .map(_.toLowerCase.split(" ").filter(_.nonEmpty).toSeq)
    val bigrams = toks.flatMap(ts => ts.zip(ts.drop(1)))
    val c2 = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val nw1 = c2.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val nw2 = c2.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val t = c2.size.toLong
    val rows = graft.queries.Wave10.lmKneserNey
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == c2((w1, w2)) && r.getLong(3) == c1(w1))
      assert(r.getLong(4) == nw1(w1) && r.getLong(5) == nw2(w2))
      assert(r.getLong(6) == t)
      val num = (BigInt((4 * c2((w1, w2)) - 3).max(0)) * t +
        3 * BigInt(nw1(w1)) * nw2(w2)) * 1000000
      val den = 4 * BigInt(t) * c1(w1)
      assert(BigInt(r.getLong(7)) == num / den, s"($w1,$w2)")
      assert(r.getLong(7) > 0 && r.getLong(7) <= 1000000)
    }
    // the discounted mass never exceeds the raw MLE for frequent bigrams,
    // and interpolation keeps unseen-context mass positive: spot-check the
    // distribution property sum_w2 P(w2|w1) == 1 on the full (unfiltered)
    // estimator for the heaviest w1
    val heavyW1 = c1.maxBy(_._2)._1
    val full = c2.keys.filter(_._1 == heavyW1).map { case (w1k, w2k) =>
      val num = (BigInt((4 * c2((w1k, w2k)) - 3).max(0)) * t +
        3 * BigInt(nw1(w1k)) * nw2(w2k))
      num
    }.sum
    // sum over SEEN w2 of the numerator = (4*c1-3*nw1)*T + 3*nw1*sum(nw2)
    // <= full denominator 4*T*c1; equality holds when every w2 is seen
    // after w1 (the backoff mass goes to unseen continuations)
    assert(full <= 4 * BigInt(t) * c1(heavyW1))
  }

  test("q_survival_km equals the sequential product-limit chain") {
    val o = Tables.load(spark, SharedSpark.sf001, "orders")
      .select(col("o_custkey"),
        graft.functions.Exact.bucket(
          graft.functions.Exact.ms(col("o_orderdate")), 86400000L).as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mx = o.map(_._2).max
    val perCust = o.groupBy(_._1).values.map { rs =>
      val days = rs.map(_._2)
      val (f, l) = (days.min, days.max)
      (math.min((l - f) / 91, 7L), mx - l > 91)
    }.toSeq
    val d = (0 to 7).map(k => perCust.count { case (q, ch) => ch && q == k })
    val c = (0 to 7).map(k => perCust.count { case (q, ch) => !ch && q == k })
    val rows = graft.queries.Wave10.survivalKm
      .run(spark, SharedSpark.sf001).collect().sortBy(_.getLong(0))
    assert(rows.length == 8)
    var s = 1000000L
    (0 to 7).foreach { k =>
      val nk = (k to 7).map(j => d(j) + c(j)).sum.toLong
      if (nk > 0) s = s * (nk - d(k)) / nk
      val r = rows(k)
      assert(r.getLong(1) == nk && r.getLong(2) == d(k) && r.getLong(3) == c(k))
      assert(r.getLong(4) == s, s"step $k")
    }
    // survival is non-increasing and deaths actually occur
    val sp = rows.map(_.getLong(4))
    assert(sp.zip(sp.drop(1)).forall { case (a, b) => b <= a })
    assert(rows.map(_.getLong(2)).sum > 0, "need real churn events")
  }

  test("q_spatial_join equals the naive all-pairs distance join") {
    def u32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      BigInt(1, md.digest(s.getBytes("UTF-8")).take(4)).toLong
    }
    val cust = Tables.load(spark, SharedSpark.sf001, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
      .map(k => (k, u32(s"cx:$k") % 10000, u32(s"cy:$k") % 10000))
    val supp = Tables.load(spark, SharedSpark.sf001, "supplier")
      .select("s_suppkey").collect().map(_.getLong(0))
      .map(k => (k, u32(s"sx:$k") % 10000, u32(s"sy:$k") % 10000))
    val expected = (for {
      (ck, cx, cy) <- cust
      (sk, sx, sy) <- supp
      d2 = (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)
      if d2 <= 360000L
    } yield (ck, sk, d2)).toSet
    val got = graft.queries.Wave10.spatialJoin
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(6))).toSet
    assert(expected.nonEmpty && got == expected)
  }

  test("q_image_dhash_dedup blocking equals brute-force hamming") {
    import graft.multimodal.Multimodal
    val decoded = Multimodal.decode(spark,
      Multimodal.ppmAssetsFromDocuments(spark, SharedSpark.sf001)).collect()
    val sigs = decoded.map { a =>
      assert(a.error == null)
      a.asset_id -> Multimodal.dhash64(a.meta, a.pixels)
    }.sortBy(_._1)
    val expected = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      hm = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if hm <= 3
    } yield (sigs(i)._1, sigs(j)._1, hm.toLong)).toSet
    val got = graft.queries.Wave10.imageDhashDedup
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty && got == expected)
    assert(expected.exists(_._3 == 0L), "exact-payload dups should hash equal")
  }

  test("q_image_dhash_dedup dhash64 matches the 9x8 byte-walk definition") {
    import graft.multimodal.Multimodal
    // independent recompute straight from the PADDED TEXT bytes (the
    // oracle's view), bypassing the codec entirely
    val docs = Tables.load(spark, SharedSpark.sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    val decoded = Multimodal.decode(spark,
      Multimodal.ppmAssetsFromDocuments(spark, SharedSpark.sf001))
      .collect().map(a => a.asset_id -> a).toMap
    docs.foreach { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val h = math.max(1, (b.length + 23) / 24)
      def px(p: Int): Int = if (p < b.length) b(p) & 0xff else 0
      def gray(gy: Int, gx: Int): Int = {
        val base = ((gy * h / 8) * 8 + gx * 8 / 9) * 3
        px(base) + px(base + 1) + px(base + 2)
      }
      var sig = 0L
      for (gy <- 0 until 8; gx <- 0 until 8)
        if (gray(gy, gx) < gray(gy, gx + 1)) sig |= 1L << (gy * 8 + gx)
      val a = decoded(id)
      assert(Multimodal.dhash64(a.meta, a.pixels) == sig, s"doc $id")
    }
  }

  test("q_graph_labelprop equals an in-memory reference LPA") {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { rs =>
      val ps = rs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(u => u -> u).toMap
    var prev = lbl
    (1 to graft.queries.Wave10.LpaRounds).foreach { _ =>
      prev = lbl
      lbl = adj.map { case (u, vs) =>
        val counts = vs.groupBy(prev).map { case (l, g) => (l, g.size) }
        u -> counts.toSeq.minBy { case (l, n) => (-n, l) }._1
      }
    }
    val nChanged = lbl.count { case (u, l) => prev(u) != l }.toLong
    val sizes = lbl.values.groupBy(identity).map { case (l, g) => l -> g.size.toLong }
    val rows = graft.queries.Wave10.graphLabelprop
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.length == lbl.size)
    rows.foreach { r =>
      val node = r.getLong(0)
      assert(r.getLong(1) == lbl(node), s"node $node")
      assert(r.getLong(2) == sizes(lbl(node)))
      assert(r.getLong(3) == nChanged)
    }
    // the sf0.001 co-purchase graph is dense (≈12 edges/node), so sync
    // LPA legally floods it into ONE community — assert labels moved,
    // not a particular community count
    assert(sizes.exists(_._2 > 1), "expected label propagation to merge nodes")
    assert(lbl.exists { case (u, l) => u != l }, "labels must propagate")
  }

  test("q_entropy_mi equals a recompute from raw contingency counts") {
    import graft.plans.FxLog2.fxlog2
    val cust = Tables.load(spark, SharedSpark.sf001, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cells = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (cust(r.getLong(0)), r.getString(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nS = cells.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val nP = cells.groupBy(_._1._2).map { case (p, m) => p -> m.values.sum }
    val n = cells.values.sum
    val rows = graft.queries.Wave10.entropyMi
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.length == cells.size)
    val expMi = cells.map { case ((s, p), nsp) =>
      nsp * (fxlog2(nsp * n) - fxlog2(nS(s) * nP(p)))
    }.sum
    val expHs = nS.values.map(ns => ns * (fxlog2(n) - fxlog2(ns))).sum
    val expHp = nP.values.map(np => np * (fxlog2(n) - fxlog2(np))).sum
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == cells(key) && r.getLong(3) == nS(key._1) &&
        r.getLong(4) == nP(key._2))
      assert(r.getLong(5) ==
        cells(key) * (fxlog2(cells(key) * n) - fxlog2(nS(key._1) * nP(key._2))))
      assert(r.getLong(6) == expMi && r.getLong(7) == expHs &&
        r.getLong(8) == expHp)
    }
    // MI <= min(H) up to the fx truncation error bound (2^-29 per log,
    // two logs per term, n rows of weight): information inequality
    val slack = 4L * n
    assert(expMi <= math.min(expHs, expHp) + slack)
  }

  test("q_graph_linkpred equals naive common-neighbor sets") {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rs =>
      val ps = rs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    val adj = (edges ++ edges.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val expected = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      u = nodes(i); w = nodes(j)
      if !edges.contains((u, w))
      cn = (adj(u) & adj(w)).size.toLong
      if cn >= 2
    } yield ((u, w), cn)).toMap
    val rows = graft.queries.Wave10.graphLinkpred
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.length == expected.size && expected.nonEmpty)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(expected(key) == r.getLong(2), s"cn of $key")
      assert(r.getLong(3) == adj(key._1).size && r.getLong(4) == adj(key._2).size)
      assert(r.getLong(5) ==
        r.getLong(2) * 1000000L / (r.getLong(3) + r.getLong(4) - r.getLong(2)))
    }
  }

  test("q_holt_linear equals the sequential dyadic recursion") {
    val o = Tables.load(spark, SharedSpark.sf001, "orders")
      .select(col("o_orderdate"), round(col("o_totalprice") * 100, 0)
        .cast("long").as("cents")).collect()
      .map { r =>
        val d = r.getTimestamp(0).toLocalDateTime
        (d.getYear * 12 + d.getMonthValue - 1, r.getLong(1))
      }
    val base = o.map(_._1).min
    val monthly = o.groupBy(_._1).map { case (m, rs) =>
      (m - base) -> rs.map(_._2).sum
    }
    val x = (0 until 24).map(t => monthly.getOrElse(t, 0L))
    var l = x(0); var b = 0L
    val expect = (0 until 24).map { t =>
      if (t > 0) {
        val lNew = (x(t) + l + b) / 2
        b = (lNew - l + 3 * b) / 4
        l = lNew
      }
      (t.toLong, x(t), l, b)
    }
    val rows = graft.queries.Wave10.holtLinear
      .run(spark, SharedSpark.sf001).collect().sortBy(_.getLong(0))
    assert(rows.length == 24)
    rows.zip(expect).foreach { case (r, (t, xt, lt, bt)) =>
      assert(r.getLong(0) == t && r.getLong(1) == xt)
      assert(r.getLong(2) == lt, s"level at $t")
      assert(r.getLong(3) == bt, s"trend at $t")
      assert(r.getLong(4) == lt + bt)
    }
    assert(expect.exists(_._4 != 0L), "trend must move")
  }
}
