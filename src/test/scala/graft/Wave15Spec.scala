package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave 15 invariants: bounded Bellman-Ford against an in-memory
  * min-plus reference, item-CF ranking properties, the JL projection
  * against a no-Spark recompute (plus the norm-concentration bound),
  * and record-linkage ground-truth checks.
  */
class Wave15Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Co-purchase weighted edges at sf0.001, same contract as the query:
    * distinct (order, part), pair support >= 2, w = 1000000 / n. */
  private def edges(): Seq[(Long, Long, Long)] = {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { rs =>
      val ps = rs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).collect {
      case ((u, v), g) if g.size >= 2 => (u, v, 1000000L / g.size)
    }.toSeq
  }

  test("q_graph_sssp equals an in-memory 4-round min-plus relaxation") {
    val e = edges()
    val adj = (e ++ e.map { case (u, v, w) => (v, u, w) })
      .groupBy(_._1).map { case (u, es) => u -> es.map(t => (t._2, t._3)) }
    val deg = adj.map { case (u, es) => u -> es.size }
    val src = deg.toSeq.minBy { case (u, d) => (-d, u) }._1
    var dist = Map(src -> 0L)
    (1 to 4).foreach { _ =>
      val relaxed = dist.toSeq.flatMap { case (u, du) =>
        adj.getOrElse(u, Nil).map { case (v, w) => (v, du + w) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    val got = graft.queries.Wave15.graphSssp
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist)
  }

  test("q_itemcf_recs: <=3 recs per item, rank-ordered, symmetric support") {
    val rows = graft.queries.Wave15.itemcfRecs
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byItem = rows.groupBy(_._1)
    byItem.foreach { case (item, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq,
        s"item $item ranks not contiguous")
      assert(sorted.length <= 3)
      // rank order must follow (sim2 desc, rec asc)
      sorted.sliding(2).foreach {
        case Array((_, _, r1, _, s1), (_, _, r2, _, s2)) =>
          assert(s1 > s2 || (s1 == s2 && r1 < r2),
            s"item $item rank order violated")
        case _ => ()
      }
    }
    // co-occurrence is symmetric: if (i -> j) emitted with support n,
    // the reverse pair exists in the underlying pair set with the same
    // support (it may not be emitted if j's top-3 is stronger)
    val pairSupport = rows.map { case (i, _, j, n, _) => ((i, j), n) }.toMap
    pairSupport.foreach { case ((i, j), n) =>
      pairSupport.get((j, i)).foreach(m => assert(m == n))
    }
  }

  test("q_random_projection equals a no-Spark recompute and concentrates") {
    val emb = Tables.load(spark, SharedSpark.sf001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val signs = Array.tabulate(64, 8) { (i, j) =>
      if (md5hex(s"rp:$i:$j").charAt(0) < '8') 1L else -1L
    }
    val want = emb.flatMap { case (id, xs) =>
      val fx = xs.map(x => math.floor(x.toDouble * 1e12).toLong)
      (0 until 8).map { j =>
        (id, j.toLong) -> fx.indices.map(i => signs(i)(j) * fx(i)).sum
      }
    }.toMap
    val rows = graft.queries.Wave15.randomProjection
      .run(spark, SharedSpark.sf001).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
    // JL concentration: the mean norm-preservation ratio over the table
    // sits near 1e6 (per-vector spread is wide at K=8 — bound loosely)
    val ratios = rows.map(_.getLong(3))
    val mean = ratios.sum / ratios.length
    assert(mean > 300000L && mean < 3000000L, s"mean ratio_ppm $mean")
  }

  test("q_ts_stl equals a sequential in-memory decomposition") {
    val daily = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_orderdate", "o_totalprice").collect()
      .map(r => (r.getTimestamp(0).getTime / 86400000L,
        math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).sum }
    val days = daily.keys.toSeq.sorted
    val full = days.flatMap { d =>
      val win = days.filter(x => x >= d - 3 && x <= d + 3)
      if (win.length == 7) {
        val s7 = win.map(daily).sum
        Some((d, daily(d), s7, 7 * daily(d) - s7, d % 7))
      } else None
    }
    val seas = full.groupBy(_._5).map { case (dow, rs) =>
      val sorted = rs.map(r => (r._4, r._1)).sortBy(identity)
      dow -> sorted((sorted.length + 1) / 2 - 1)._1
    }
    val want = full.map { case (d, c, s7, det, dow) =>
      (d, c, s7, det, seas(dow), det - seas(dow))
    }.sortBy(_._1)
    val got = graft.queries.Wave15.tsStl
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // trend + seasonal + remainder reassembles the (x7) series exactly
    got.foreach { case (_, c, s7, det, se, re) =>
      assert(det == 7 * c - s7); assert(re == det - se)
    }
  }

  test("q_attribution_markov equals an independent sequential recompute") {
    val ev = Tables.load(spark, SharedSpark.sf001, "events")
      .select(col("user_id"), col("event_type"),
        graft.functions.Exact.ms(col("ts")).as("ms"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // journeys: each user's events ordered by (ts, event_id) up to and
    // including the first purchase (whole journey if none)
    val trans = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { rs =>
      val path0 = rs.sortBy(r => (r._3, r._4)).map(_._2)
      val cut = path0.indexOf("purchase")
      val path = if (cut >= 0) path0.take(cut + 1) else path0
      val states: List[String] = ("start" +: path).map(t =>
        if (t == "purchase") "conv" else t).toList :+
        (if (cut >= 0) "SKIP" else "null")
      states.sliding(2).foreach {
        case List(f, t) if f != "conv" && t != "SKIP" =>
          trans((f, t)) = trans((f, t)) + 1L
        case _ => ()
      }
    }
    val froms = trans.keys.map(_._1).toSeq.distinct
    val total = froms.map(f =>
      f -> trans.collect { case ((`f`, _), n) => n }.sum).toMap
    val nConv = froms.map(f => f -> trans.getOrElse((f, "conv"), 0L)).toMap
    def horizon(removed: Option[String]): Long = {
      var p: Map[String, Long] = froms.map(_ -> 0L).toMap
      (1 to 6).foreach { _ =>
        p = froms.map { f =>
          val flow: BigInt = trans.toSeq.collect {
            case ((`f`, t), n)
                if t != "conv" && t != "null" && !removed.contains(t) =>
              BigInt(n) * BigInt(p.getOrElse(t, 0L))
          }.sum
          f -> ((BigInt(nConv(f)) * 1000000 + flow) / total(f)).toLong
        }.toMap
      }
      p.getOrElse("start", 0L)
    }
    val pFull = horizon(None)
    val chans = Seq("click", "error", "signup", "view")
    val re = chans.map(c => (c, pFull - horizon(Some(c))))
    val tot = re.map(_._2).sum
    val got = graft.queries.Wave15.attributionMarkov
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(t => (t._1, t._4)).toSeq == re)
    got.foreach { case (_, pf, pr, e) =>
      assert(pf == pFull)
      assert(e == pf - pr && e >= 0, "removal effect must be non-negative")
    }
    assert(tot > 0 && re.map(_._2 * 1000000L / tot).sum <= 1000000L)
  }

  test("q_record_linkage: links are the intact-name diagonals, scored right") {
    val cust = Tables.load(spark, SharedSpark.sf001, "customer")
      .select("c_custkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.round(r.getDouble(2) * 100)))
    val rows = graft.queries.Wave15.recordLinkage
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getString(6)))
    // every emitted pair is a true link (names are unique per custkey,
    // so nothing off-diagonal can reach the >= 40 band)
    rows.foreach { case (a, b, _, _, _, _, _) =>
      assert(b - 1000000L == a, s"off-diagonal pair ($a, $b) emitted")
    }
    val emitted = rows.map(_._1).toSet
    cust.foreach { case (key, _, _) =>
      // emitted iff the diagonal score reaches the band: intact name
      // (40) plus seg (10 unless nulled at %5) plus bal (+-5 by the %7
      // cent drift) — a name-only pair with adverse balance lands at
      // 35 and is correctly suppressed
      val score = (if (key % 11 != 0) 40 else -15) +
        (if (key % 5 == 0) 0 else 10) +
        (if (key % 7 <= 3) 5 else -5)
      assert(emitted.contains(key) == (score >= 40), s"custkey $key")
    }
    // scores recompute: name 40 (intact), seg 10/0 (null at %5), bal
    // +-5 by the %7 cent drift
    val byKey = rows.map(r => r._1 -> r).toMap
    cust.filter(c => emitted.contains(c._1)).foreach { case (key, _, _) =>
      val (_, _, namePts, segPts, balPts, score, verdict) = byKey(key)
      assert(namePts == 40)
      assert(segPts == (if (key % 5 == 0) 0 else 10))
      assert(balPts == (if (key % 7 <= 3) 5 else -5))
      assert(score == namePts + segPts + balPts)
      assert(verdict == (if (score >= 50) "match" else "possible"))
    }
  }
}
