package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the round-8 third wave: dyadic EMA, CUSUM change
  * detection, target encoding, winsorization, vocabulary growth, the
  * histogram quantile sketch, and URL canonicalization. The DuckDB
  * hash gate covers cross-engine value equality; these tests recompute
  * the algebra independently (BigInt / sequential recursions) and pin
  * the canonicalizer's contract with golden vectors.
  */
class Wave9Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_ts_ema equals a BigInt recompute of the dyadic window") {
    val daily = Tables.load(spark, SharedSpark.sf001, "orders")
      .groupBy(graft.functions.Exact.bucket(
        graft.functions.Exact.ms(col("o_orderdate")), 86400000L).as("day"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = graft.queries.Wave9.tsEma.run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (day, wsum, ema) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var num = BigInt(0); var den = BigInt(0)
      (0 to 15).foreach { lag =>
        daily.get(day - lag).foreach { c =>
          val w = BigInt(1) << (15 - lag)
          num += w * c; den += w
        }
      }
      assert(den == BigInt(wsum), s"day=$day")
      assert(num / den == BigInt(ema), s"day=$day")
    }
  }

  test("q_anomaly_cusum equals the sequential max(0, S+c) recursion") {
    val out = graft.queries.Wave9.anomalyCusum
      .run(spark, SharedSpark.sf001).collect()
    assert(out.nonEmpty)
    assert(out.exists(_.getBoolean(5)), "expected at least one alarm")
    out.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val n = sorted.length.toLong
      val tot = sorted.map(_.getLong(2)).sum
      var s = 0L
      sorted.foreach { r =>
        val c = r.getLong(2) * n - tot
        s = math.max(0L, s + c)
        assert(s == r.getLong(4), s"type=${r.getString(0)} hr=${r.getLong(1)}")
        assert(r.getBoolean(5) == (s > 4 * tot))
      }
    }
  }

  test("q_feature_target_encode equals per-row BigInt LOO means") {
    val rows = graft.queries.Wave9.targetEncode
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    val bySeg = rows.groupBy(_.getString(1))
      .map { case (seg, rs) =>
        seg -> (BigInt(rs.map(r => BigInt(r.getLong(2))).sum.toString), rs.length)
      }
    val gsum = rows.map(r => BigInt(r.getLong(2))).sum
    val gn = BigInt(rows.length)
    rows.foreach { r =>
      val (ssum, sn) = bySeg(r.getString(1))
      val x = BigInt(r.getLong(2))
      assert((ssum - x) / BigInt(sn - 1) == BigInt(r.getLong(3)))
      val sm = (gn * (ssum - x) + 100 * gsum) / (gn * BigInt(sn - 1 + 100))
      assert(sm == BigInt(r.getLong(4)), s"key=${r.getLong(0)}")
    }
  }

  test("q_feature_winsorize: clipped is the fence projection and the " +
    "flag marks exactly the out-of-fence rows (some exist)") {
    val rows = graft.queries.Wave9.winsorize
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getBoolean(6)), "expected at least one outlier")
    rows.foreach { r =>
      val (cents, lo, hi, clipped, flag) =
        (r.getLong(2).toDouble, r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getBoolean(6))
      assert(lo <= hi)
      assert(clipped == math.min(math.max(cents, lo), hi))
      assert(flag == (cents < lo || cents > hi))
    }
  }

  test("q_vocab_growth: cumulative columns are running sums and the " +
    "final type count is the corpus's distinct bigram count") {
    val rows = graft.queries.Wave9.vocabGrowth
      .run(spark, SharedSpark.sf001).collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    var toks = 0L; var types = 0L
    rows.foreach { r =>
      toks += r.getLong(2); types += r.getLong(3)
      assert(r.getLong(4) == toks && r.getLong(5) == types)
    }
    val distinctBigrams = Tables.load(spark, SharedSpark.sf001, "documents")
      .select(explode(graft.text.Text.shingleListUdf(2)(col("text"))).as("bg"))
      .distinct().count()
    assert(rows.last.getLong(5) == distinctBigrams)
    assert(rows.head.getLong(3) > 0, "first bucket must introduce types")
  }

  test("q_sketch_quantile_fx: every estimate is inside its bucket-width " +
    "bound and per-year counts match the raw table") {
    val rows = graft.queries.Wave9.sketchQuantileFx
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(6), s"yr=${r.getInt(0)} estimate out of bound")
      assert(math.abs(r.getLong(3) - r.getDouble(4)) <= r.getLong(5).toDouble)
    }
    val counts = Tables.load(spark, SharedSpark.sf001, "orders")
      .groupBy(year(col("o_orderdate")).as("yr")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(counts(r.getInt(0)) == r.getLong(1)))
  }

  test("q_graph_kcore: converged output IS the true 3-core fixpoint " +
    "(in-test peel to convergence) and every core degree is >= 3") {
    val rows = graft.queries.Wave9.graphKcore
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "sf0.001 must converge")
    assert(rows.forall(_.getLong(1) >= graft.queries.Wave9.KcoreK))
    // independent in-memory peel of the same support>=2 edge set, run
    // to the TRUE fixpoint (not a round cap)
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCount = scala.collection.mutable.Map[(Long, Long), Int]()
    li.groupBy(_._1).values.foreach { xs =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) {
        val p = (ps(i), ps(j))
        pairCount(p) = pairCount.getOrElse(p, 0) + 1
      }
    }
    val edges: Set[(Long, Long)] = pairCount.iterator
      .collect { case (p, c) if c >= 2 => p }
      .flatMap(p => Iterator(p, p.swap)).toSet
    var alive = edges.map(_._1)
    var changed = true
    while (changed) {
      val deg = edges.toSeq.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (n, es) => n -> es.size }
      val next = alive.filter(n => deg.getOrElse(n, 0) >= 3)
      changed = next != alive
      alive = next
    }
    val expected = edges.toSeq.filter(e => alive(e._1) && alive(e._2))
      .groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == expected)
  }

  test("q_theilsen_trend equals an in-test median of pairwise slopes") {
    val rows = graft.queries.Wave9.theilsenTrend
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    val monthly = Tables.load(spark, SharedSpark.sf001, "orders")
      .join(Tables.load(spark, SharedSpark.sf001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("mo"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val ms = monthly(r.getInt(0)).map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = (for {
        i <- ms.indices; j <- i + 1 until ms.length
      } yield ((ms(j)._2 - ms(i)._2).toDouble / (ms(j)._1 - ms(i)._1),
        ms(i)._1, ms(j)._1)).sortBy(t => (t._1, t._2, t._3)).map(_._1)
      val n = slopes.length
      assert(r.getLong(1) == n.toLong)
      val mid = Seq(slopes((n + 1) / 2 - 1), slopes((n + 2) / 2 - 1))
      assert(r.getDouble(2) == mid.sum / mid.length)
    }
  }

  test("q_abc_classify: shares are monotone, the last row closes at " +
    "100%, and classes partition the share axis") {
    val rows = graft.queries.Wave9.abcClassify
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    var prevShare = -1L
    rows.foreach { r =>
      val share = r.getLong(4)
      assert(share >= prevShare); prevShare = share
      val abc = r.getString(5)
      assert(abc == (if (share <= 800000) "A"
                     else if (share <= 950000) "B" else "C"))
    }
    assert(rows.last.getLong(4) == 1000000L)
    assert(Set("A", "B", "C").subsetOf(rows.map(_.getString(5)).toSet))
  }

  test("q_skew_report matches an in-test recompute of the group-size " +
    "order statistics") {
    val rows = graft.queries.Wave9.skewReport
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.length == 5)
    val sizes = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .groupBy("l_partkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val asc = sizes.sortBy(t => (t._2, t._1)).map(_._2)
    val n = asc.length
    val p50 = asc((n + 1) / 2 - 1)
    val p99 = asc((99 * n + 99) / 100 - 1)
    val heavy = sizes.sortBy(t => (-t._2, t._1)).take(5)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert((r.getLong(0), r.getLong(1)) == heavy(i))
      assert(r.getLong(3) == n.toLong)
      assert(r.getLong(5) == asc.max)
      assert(r.getLong(6) == p50 && r.getLong(7) == p99)
      assert(r.getLong(9) == asc.max * 1000000L / p50)
    }
  }

  test("q_rolling_corr equals a BigInt recompute of the windowed " +
    "moments, with NULL gates exactly on zero-variance windows") {
    val rows = graft.queries.Wave9.rollingCorr
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    val series = rows.map(r => (r.getLong(1), r.getLong(2)))
    rows.zipWithIndex.foreach { case (r, i) =>
      val win = series.slice(math.max(0, i - 6), i + 1)
      val n = BigInt(win.length)
      val sx = win.map(t => BigInt(t._1)).sum
      val sy = win.map(t => BigInt(t._2)).sum
      val sxy = win.map(t => BigInt(t._1) * t._2).sum
      val sxx = win.map(t => BigInt(t._1) * t._1).sum
      val syy = win.map(t => BigInt(t._2) * t._2).sum
      val num = n * sxy - sx * sy
      val d1 = n * sxx - sx * sx
      val d2 = n * syy - sy * sy
      assert(BigInt(r.getLong(4)) == num)
      if (d1 > 0 && d2 > 0) {
        assert(BigInt(r.getLong(5)) == num * num * 1000000 / (d1 * d2))
        assert(r.getLong(6) == num.signum.toLong)
      } else {
        assert(r.isNullAt(5) && r.isNullAt(6))
      }
    }
  }

  test("q_curation_pipeline: verdicts are total, exact dups point at a " +
    "same-text keeper, and injected re-crawl copies collapse") {
    val rows = graft.queries.Wave9.curationPipeline
      .run(spark, SharedSpark.sf001).collect()
    val verdicts = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = Tables.load(spark, SharedSpark.sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nDocs = docs.size + docs.keys.count(_ % 83 == 5)
    assert(rows.length == nDocs)
    assert(Set("kept", "low_quality", "near_dup", "eval")
      .subsetOf(verdicts.values.toSet))
    rows.filter(_.getString(1) == "exact_dup").foreach { r =>
      val keeper = r.getLong(2)
      assert(keeper < r.getLong(0))
      // keeper and dup carry the same text (copies are re-keyed +100000)
      def textOf(id: Long) = docs.getOrElse(id, docs(id - 100000L))
      assert(textOf(keeper) == textOf(r.getLong(0)))
    }
    // every quality-passing, non-eval re-crawl copy whose original also
    // survived must collapse onto it
    rows.filter(r => r.getLong(0) >= 100000L).foreach { r =>
      val orig = r.getLong(0) - 100000L
      if (r.getString(1) == "exact_dup" && verdicts.get(orig).exists(
        v => v != "eval" && v != "low_quality"))
        assert(r.getLong(2) == orig)
    }
  }

  test("q_bootstrap_ci: ordered bounds, 200 replicas, CI brackets the " +
    "exact sample mean") {
    val r = graft.queries.Wave9.bootstrapCi
      .run(spark, SharedSpark.sf001).collect().head
    val (lo, med, hi, nb) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nb == 200L)
    assert(lo <= med && med <= hi && lo < hi)
    val cents = Tables.load(spark, SharedSpark.sf001, "orders")
      .select(round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .collect().map(_.getLong(0))
    val mean = cents.map(BigInt(_)).sum / cents.length
    assert(BigInt(lo) <= mean && mean <= BigInt(hi),
      s"CI [$lo,$hi] misses mean $mean")
  }

  test("q_json_schema_audit: count identities hold and the malformed " +
    "fraction matches the injection") {
    val rows = graft.queries.Wave9.jsonSchemaAudit
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.map(_.getString(0)).toSeq.sorted == Seq("id", "lang", "score"))
    val ids = Tables.load(spark, SharedSpark.sf001, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val nMalformed = ids.count(_ % 7 == 6).toLong
    rows.foreach { r =>
      val (n, nValid, nPresent, nRuleOk, nMissing) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n == ids.length.toLong)
      assert(nValid == n - nMalformed)
      assert(nPresent == nValid - nMissing)
      assert(nRuleOk <= nPresent)
      assert(r.getLong(6) == nPresent * 1000000L / n)
      assert(r.getLong(7) == nRuleOk * 1000000L / n)
    }
    // rule violations are real: id has the "x<d>" class, score the "abc"
    val byKey = rows.map(r => r.getString(0) -> r).toMap
    assert(byKey("id").getLong(4) < byKey("id").getLong(3))
    assert(byKey("score").getLong(4) < byKey("score").getLong(3))
  }

  test("Url.canonicalize golden vectors") {
    import graft.functions.Url.canonicalize
    assert(canonicalize("HTTP://WWW.Example.COM:80/A/b/?z=1&utm_source=x&a=2#f")
      == "http://example.com/A/b?a=2&z=1")
    assert(canonicalize("http://example.com/") == "http://example.com")
    assert(canonicalize("https://Host:80/p") == "https://host/p")
    assert(canonicalize("ftp://Host/P?gclid=1&fbclid=2&x=1") == "ftp://host/P?x=1")
    assert(canonicalize("http://a.com/x?utm_a=1&utm_b=2") == "http://a.com/x")
    assert(canonicalize("http://a.com#frag") == "http://a.com")
    assert(canonicalize("notaurl") == "notaurl")
    assert(canonicalize("ht2tp://x/y") == "ht2tp://x/y")
    assert(canonicalize(null) == null)
    // path case preserved; params sorted bytewise; empty params dropped
    assert(canonicalize("http://a.com/CaseSensitive?b=2&&a=1")
      == "http://a.com/CaseSensitive?a=1&b=2")
  }
}
