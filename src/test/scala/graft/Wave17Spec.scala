package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave 17 invariants: Naive Bayes against a sequential recompute,
  * PPR mass accounting + min-plus-style reference iteration, AUC via
  * a per-pair O(n²) definition check, and MI non-negativity plus a
  * fxlog2 recompute.
  */
class Wave17Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def docs(): Array[(Long, String, String, String, Long)] =
    Tables.load(spark, SharedSpark.sf001, "documents")
      .select("doc_id", "lang", "source", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)).getOrElse(""), r.getLong(4)))

  test("q_naive_bayes equals a sequential fxlog2 recompute") {
    import graft.plans.FxLog2.fxlog2
    val ds = docs()
    def toks(t: String): Seq[String] =
      t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    val (train, test0) = ds.partition(d => md5hex(d._1.toString) < "cc")
    val cw = train.flatMap(d => toks(d._4).map(w => (d._2, w)))
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val nC = cw.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val v = cw.keys.map(_._2).toSet.size.toLong
    val nDc = train.groupBy(_._2).map { case (l, g) => l -> g.size.toLong }
    val nd = train.length.toLong
    val classes = nDc.keys.toSeq.sorted
    val want = test0.sortBy(_._1).map { case (id, tl, _, txt, _) =>
      val scored = classes.map { c =>
        val tok = toks(txt).map(w =>
          fxlog2(cw.getOrElse((c, w), 0L) + 1) - fxlog2(nC(c) + v)).sum
        c -> (tok + fxlog2(nDc(c)) - fxlog2(nd))
      }
      val (pl, sc) = scored.sortBy { case (c, s) => (-s, c) }.head
      (id, tl, pl, sc, if (pl == tl) 1L else 0L)
    }.toSeq
    val got = graft.queries.Wave17.naiveBayes
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // the classifier must beat the majority-class prior on held-out docs
    val acc = got.count(_._5 == 1L).toDouble / got.length
    val prior = test0.groupBy(_._2).values.map(_.length).max.toDouble /
      test0.length
    assert(acc >= prior, s"NB accuracy $acc below majority prior $prior")
  }

  test("q_graph_ppr equals a sequential iteration and conserves mass") {
    // same co-purchase contract as the query: distinct (order, part),
    // support >= 2, symmetric
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // NB: .toSeq BEFORE collect — Map.collect with a 2-tuple result
    // rebuilds a Map keyed on u and silently keeps ONE v per u
    val pairs = li.groupBy(_._1).values.flatMap { rs =>
      val ps = rs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).toSeq.collect {
      case (p, g) if g.size >= 2 => p
    }
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2) }
    val deg = adj.map { case (u, es) => u -> es.size.toLong }
    val seed = deg.toSeq.minBy { case (u, dg) => (-dg, u) }._1
    val S = 1000000000000L
    var pr = Map(seed -> S)
    (1 to 6).foreach { _ =>
      val flow = pr.toSeq.flatMap { case (u, p) =>
        adj.getOrElse(u, Nil).map(v => (v, p / deg(u)))
      }.groupBy(_._1).map { case (v, fs) =>
        v -> 85L * fs.map(_._2).sum / 100L
      }
      pr = (flow.toSeq :+ (seed -> 15L * S / 100L)).groupBy(_._1)
        .map { case (n, ps) => n -> ps.map(_._2).sum }
        .filter(_._2 > 0)
    }
    val got = graft.queries.Wave17.graphPpr
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mism = (got.keySet ++ pr.keySet).toSeq.sorted
      .filter(k => got.get(k) != pr.get(k))
      .map(k => s"$k: got=${got.get(k)} want=${pr.get(k)}")
    assert(mism.isEmpty, s"${mism.length} mismatches: ${mism.take(5)}")
    assert(got == pr)
    // truncating divisions only shed mass: total <= S, seed holds the
    // teleport floor
    assert(got.values.sum <= S)
    assert(got(seed) >= 15L * S / 100L)
  }

  test("q_auc_calibration matches the O(n^2) pairwise AUC definition") {
    val ds = docs()
    val scored = ds.map(d =>
      (d._5 / 32, if (Set("src0", "src1", "src2")(d._3)) 1 else 0))
    val pos = scored.filter(_._2 == 1).map(_._1)
    val neg = scored.filter(_._2 == 0).map(_._1)
    var num2 = 0L // 2 * (wins + ties/2)
    for (p <- pos; n <- neg)
      num2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val wantAuc = num2 * 1000000L / (2L * pos.length * neg.length)
    val rows = graft.queries.Wave17.aucCalibration
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.map(_.getLong(6)).distinct.toSeq == Seq(wantAuc))
    // per-bucket counts and rates recompute
    val byB = scored.groupBy(_._1)
    rows.foreach { r =>
      val (b, np, nn) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val g = byB(b)
      assert(np == g.count(_._2 == 1) && nn == g.count(_._2 == 0))
      assert(r.getLong(3) == np * 1000000L / (np + nn))
    }
    // contrib2 identity: sum of contribs equals num2
    assert(rows.map(_.getLong(5)).sum == num2)
  }

  test("q_feature_select_mi equals a fxlog2 recompute and is >= 0") {
    import graft.plans.FxLog2.fxlog2
    val ds = docs().filter(d => md5hex(d._1.toString) < "cc")
    val lab = ds.map(d =>
      (d._1, if (Set("src0", "src1", "src2")(d._3)) 1L else 0L, d._4))
    val p = lab.count(_._2 == 1L).toLong
    val nn = lab.length.toLong - p
    val n = p + nn
    val pres = lab.flatMap { case (id, y, t) =>
      t.toLowerCase.split(" ").filter(_.nonEmpty).distinct
        .map(w => (w, id, y))
    }
    val want = pres.groupBy(_._1).map { case (w, g) =>
      val a = g.count(_._3 == 1L).toLong
      val b = g.length.toLong - a
      def term(c: Long, row: Long, colv: Long): Long =
        if (c > 0) c * (fxlog2(c) + fxlog2(n) - fxlog2(row) - fxlog2(colv))
        else 0L
      val mi = term(a, a + b, p) + term(b, a + b, nn) +
        term(p - a, n - a - b, p) + term(nn - b, n - a - b, nn)
      w -> (a, b, mi)
    }
    val got = graft.queries.Wave17.featureSelectMi
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4).toLong))
    assert(got.map(g => g._1 -> (g._2._1, g._2._2, g._2._3)).toMap == want)
    // ranks are a permutation ordered by (mi desc, w)
    val ranked = got.sortBy { case (w, (_, _, mi, _)) => (-mi, w) }
    assert(ranked.map(_._2._4).toSeq == (1L to got.length).toSeq)
    // fixed-point MI of a 2x2 table stays non-negative within one
    // truncation ulp per cell (4 cells x max count factor)
    got.foreach { case (w, (_, _, mi, _)) =>
      assert(mi >= -4L * n, s"token $w MI $mi below truncation floor")
    }
  }
}
