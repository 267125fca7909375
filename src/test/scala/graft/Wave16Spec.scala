package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave 16 invariants: stump split search against an exhaustive
  * in-memory scorer, kNN against a no-Spark brute-force recompute,
  * Zipf slope sanity + fxlog2 recompute, SAX motif replay, and the
  * conformal q-hat / coverage identities.
  */
class Wave16Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_tree_split equals an exhaustive in-memory split scorer") {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_returnflag")
      .collect()
      .map(r => (r.getDouble(0).toLong,
        math.round(r.getDouble(1) * 100), math.round(r.getDouble(2) * 100),
        if (r.getString(3) == "R") 1L else 0L))
    val feats = Map(
      "qty" -> li.map(t => (t._1, t._4)),
      "price" -> li.map(t => (t._2, t._4)),
      "disc" -> li.map(t => (t._3, t._4)))
    val want = feats.toSeq.flatMap { case (f, vy) =>
      val mn = vy.map(_._1).min; val mx = vy.map(_._1).max
      val binned = vy.map { case (v, y) => ((v - mn) * 32 / (mx - mn + 1), y) }
      val bins = binned.map(_._1).distinct.sorted
      val nt = binned.length.toLong; val post = binned.map(_._2).sum
      val cands = bins.map { b =>
        val left = binned.filter(_._1 <= b)
        val nl = left.length.toLong; val posl = left.map(_._2).sum
        val (nr, posr) = (nt - nl, post - posl)
        val score =
          if (nr == 0) None
          else Some(((BigInt(posl) * posl + BigInt(nl - posl) * (nl - posl))
              * 1000000 / nl
            + (BigInt(posr) * posr + BigInt(nr - posr) * (nr - posr))
              * 1000000 / nr).toLong)
        (b, nl, posl, nr, posr, score)
      }.collect { case (b, nl, posl, nr, posr, Some(s)) =>
        (f, b, mn + (b + 1) * (mx - mn + 1) / 32, nl, posl, nr, posr, s)
      }
      val bestScore = cands.map(_._8).max
      val bestBin = cands.filter(_._8 == bestScore).map(_._2).min
      cands.map(c => (c._1, c._2, c._3, c._4, c._5, c._6, c._7, c._8,
        if (c._2 == bestBin) 1L else 0L))
    }.toSet
    val got = graft.queries.Wave16.treeSplit
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))).toSet
    assert(got == want)
    // exactly one best split per feature
    assert(got.groupBy(_._1).forall(_._2.count(_._9 == 1L) == 1))
  }

  test("q_knn_classify equals a no-Spark brute-force majority vote") {
    val emb = Tables.load(spark, SharedSpark.sf001, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def fxdot(a: Array[Float], b: Array[Float]): Long =
      a.indices.map(i =>
        math.floor(a(i).toDouble * b(i).toDouble * 1e15).toLong).sum
    val norm = emb.map(e => e._1 -> math.sqrt(fxdot(e._3, e._3) / 1e15)).toMap
    val (probes, train) = emb.partition(_._1 % 20 == 7)
    val want = probes.map { case (pid, tl, pe) =>
      val top = train
        .map(t => (t._1, t._2,
          fxdot(t._3, pe) / 1e15 / (norm(t._1) * norm(pid))))
        .sortBy { case (id, _, c) => (-c, id) }.take(5)
      val (pl, v) = top.groupBy(_._2).map { case (l, g) => (l, g.size.toLong) }
        .toSeq.sortBy { case (l, n) => (-n, l) }.head
      (pid, tl, pl, v, if (pl == tl) 1L else 0L)
    }.sortBy(_._1).toSeq
    val got = graft.queries.Wave16.knnClassify
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
  }

  test("q_text_zipf slopes are negative and match a fxlog2 recompute") {
    import graft.plans.FxLog2.fxlog2
    val docs = Tables.load(spark, SharedSpark.sf001, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("")))
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val counts = ds.flatMap(_._2.toLowerCase.split(" ").filter(_.nonEmpty))
        .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
        .toSeq.sortBy { case (w, n) => (-n, w) }.take(256)
      val xy = counts.zipWithIndex.map { case ((_, n), i) =>
        (fxlog2(i + 1L) >> 18, fxlog2(n) >> 18)
      }
      val nr = BigInt(xy.length)
      val sx = xy.map(t => BigInt(t._1)).sum
      val sy = xy.map(t => BigInt(t._2)).sum
      val sxy = xy.map(t => BigInt(t._1) * t._2).sum
      val sxx = xy.map(t => BigInt(t._1) * t._1).sum
      val syy = xy.map(t => BigInt(t._2) * t._2).sum
      val num = nr * sxy - sx * sy
      val den = nr * sxx - sx * sx
      val dy = nr * syy - sy * sy
      src -> (xy.length.toLong, (num * 1000000 / den).toLong,
        if (dy > 0) Some((num * num * 1000000 / (den * dy)).toLong) else None)
    }
    val got = graft.queries.Wave16.textZipf
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == want)
    // the synthetic corpus's 31-type vocabulary is nearly flat, so the
    // fit is real but weak (r2 ~ 0.1-0.25 ppm-scale) — assert the
    // directional contract only: rank up, frequency down, r2 non-trivial
    got.values.foreach { case (_, slope, r2) =>
      assert(slope < 0, "Zipf slope must be negative")
      r2.foreach(v => assert(v > 0L, s"rank-frequency r2 degenerate: $v"))
    }
  }

  test("q_ts_motif equals a sequential SAX replay") {
    val daily = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_orderdate", "o_totalprice").collect()
      .map(r => (r.getTimestamp(0).getTime / 86400000L,
        math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    val paa = daily.map(_._2).grouped(2).toSeq.zipWithIndex
      .collect { case (g, i) if g.length == 2 => (i.toLong, g.sum) }
    val sorted = paa.map(p => (p._2, p._1)).sorted
    val np = sorted.length
    val q1 = sorted((np + 1) / 4 - 1)._1
    val q2 = sorted((np + 1) / 2 - 1)._1
    val q3 = sorted(3 * (np + 1) / 4 - 1)._1
    val sym = paa.map { case (g, v) =>
      (g, if (v <= q1) "a" else if (v <= q2) "b"
          else if (v <= q3) "c" else "d")
    }
    val words = sym.sliding(4).collect {
      case s if s.length == 4 => (s.head._1, s.map(_._2).mkString)
    }.toSeq
    val want = words.groupBy(_._2).collect {
      case (w, g) if g.size >= 2 =>
        (w, g.size.toLong, g.map(_._1).min, g.map(_._1).max)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.Wave16.tsMotif
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
  }

  test("q_conformal_interval: q-hat is the right order statistic and " +
    "coverage folds exactly") {
    val daily = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_orderdate", "o_totalprice").collect()
      .map(r => (r.getTimestamp(0).getTime / 86400000L,
        math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    val resid = daily.sliding(2).collect {
      case Seq((_, p), (d, x)) => (d, x, p, math.abs(x - p))
    }.toSeq
    val nRes = resid.length.toLong
    val ncal = 7 * nRes / 10
    val cal = resid.take(ncal.toInt)
    val k = math.min(ncal, (9 * (ncal + 1) + 9) / 10).toInt
    val qHat = cal.map(c => (c._4, c._1)).sorted.apply(k - 1)._1
    val test0 = resid.drop(ncal.toInt)
    val covPpm = test0.count(_._4 <= qHat).toLong * 1000000L / test0.length
    val got = graft.queries.Wave16.conformalInterval
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got.length == test0.length)
    got.zip(test0).foreach { case ((d, x, fc, ar, qh, cov, cp), (wd, wx, wf, war)) =>
      assert(d == wd && x == wx && fc == wf && ar == war)
      assert(qh == qHat)
      assert(cov == (if (ar <= qHat) 1L else 0L))
      assert(cp == covPpm)
    }
  }
}
