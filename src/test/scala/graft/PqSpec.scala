package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Pq

/** Product quantization ([[graft.ml.Pq]]) against an independent
  * in-memory reference of the same fixed-point Lloyd iteration —
  * pins the PQ-specific wiring (1-based subspace slicing, per-subspace
  * code columns, error summation) that the q_embed_pq oracle replays
  * at corpus scale.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val Off = 2000000L

  /** Reference fx-Lloyd over one subspace: floor(x*1e6) scaling, seeds
    * = ids < k, (dist, cid) tie-break, ((s + Off·n) div n) − Off
    * centroid update — the same arithmetic KMeansFx declares, written
    * as a driver-side loop with no Spark involved. Returns assignments
    * and the codebook the FINAL assignment was measured against. */
  private def refKmeansFull(
      pts: Map[Long, Seq[Double]], k: Int, iters: Int)
      : (Map[Long, (Long, Long)], Map[Long, Seq[Long]]) = {
    // Through FLOAT first: the embedding column is float, so the engine
    // scales the float-rounded value (0.9f = 0.89999997… → 899999).
    refKmeansFx(pts.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toFloat.toDouble * 1e6).toLong)
    }, k, iters)
  }

  /** The same loop over ALREADY-SCALED fx points — residual
    * quantization (ivfAdcTopK) fits codebooks on integer residuals
    * that never pass through the float boundary. */
  private def refKmeansFx(
      fx: Map[Long, Seq[Long]], k: Int, iters: Int)
      : (Map[Long, (Long, Long)], Map[Long, Seq[Long]]) = {
    var cents: Map[Long, Seq[Long]] =
      fx.filter(_._1 < k).map { case (id, v) => id -> v }
    var assign: Map[Long, (Long, Long)] = Map.empty
    var centsUsed: Map[Long, Seq[Long]] = cents
    for (_ <- 1 to iters) {
      centsUsed = cents
      assign = fx.map { case (id, v) =>
        val best = cents.toSeq.map { case (cid, cv) =>
          val d = v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, cid)
        }.min
        id -> (best._2, best._1)
      }
      cents = assign.groupBy(_._2._1).map { case (cid, members) =>
        val vs = members.keys.toSeq.map(fx)
        val n = vs.size.toLong
        cid -> vs.transpose.map(col => (col.sum + Off * n) / n - Off)
      }
    }
    (assign, centsUsed)
  }

  private def refKmeans(
      pts: Map[Long, Seq[Double]], k: Int, iters: Int): Map[Long, (Long, Long)] =
    refKmeansFull(pts, k, iters)._1

  test("PQ codes and error match the in-memory reference on a " +
    "hand-checkable fixture") {
    val m = 2; val subDim = 2; val k = 2; val iters = 2
    // Six dim-4 vectors; subspace halves cluster differently on purpose
    // (vector 5's first half sits near seed 0, second half near seed 1).
    val vecs: Map[Long, Seq[Double]] = Map(
      0L -> Seq(0.1, 0.1, 0.9, 0.9),
      1L -> Seq(0.9, 0.9, 0.1, 0.1),
      2L -> Seq(0.12, 0.08, 0.88, 0.91),
      3L -> Seq(0.88, 0.93, 0.09, 0.12),
      4L -> Seq(0.11, 0.13, 0.13, 0.09),
      5L -> Seq(0.09, 0.12, 0.14, 0.11))
    val df = vecs.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")

    val expected = (0 until m).map { j =>
      refKmeans(vecs.map { case (id, v) =>
        id -> v.slice(j * subDim, (j + 1) * subDim)
      }, k, iters)
    }

    val got = Pq.encode(df, "vec_id", "embedding", m, subDim, k, iters)
      .collect().map(r => r.getLong(0) ->
        ((0 until m).map(j => r.getLong(1 + j)), r.getLong(1 + m))).toMap

    assert(got.keySet == vecs.keySet)
    for (id <- vecs.keys) {
      val wantCodes = (0 until m).map(j => expected(j)(id)._1)
      val wantErr = (0 until m).map(j => expected(j)(id)._2).sum
      assert(got(id)._1 == wantCodes,
        s"vec $id codes ${got(id)._1} != reference $wantCodes")
      assert(got(id)._2 == wantErr,
        s"vec $id err ${got(id)._2} != reference $wantErr")
    }
    // the fixture must actually exercise divergent subspace codes
    assert(got(5L)._1.distinct.size > 1,
      "fixture degenerate: vector 5 coded identically in every subspace")
  }

  test("ADC top-k matches the in-memory reference: LUT lookups equal " +
    "the distance to the reconstructed vector") {
    val m = 2; val subDim = 2; val k = 2; val iters = 2
    val probeMod = 3L // probes: vectors 0 and 3
    val vecs: Map[Long, Seq[Double]] = Map(
      0L -> Seq(0.1, 0.1, 0.9, 0.9),
      1L -> Seq(0.9, 0.9, 0.1, 0.1),
      2L -> Seq(0.12, 0.08, 0.88, 0.91),
      3L -> Seq(0.88, 0.93, 0.09, 0.12),
      4L -> Seq(0.11, 0.13, 0.13, 0.09),
      5L -> Seq(0.09, 0.12, 0.14, 0.11))
    val df = vecs.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")

    val fitted = (0 until m).map { j =>
      refKmeansFull(vecs.map { case (id, v) =>
        id -> v.slice(j * subDim, (j + 1) * subDim)
      }, k, iters)
    }
    val fx = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toFloat.toDouble * 1e6).toLong)
    }
    def sq(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = vecs.keys.filter(_ % probeMod == 0).toSeq.sorted.flatMap { p =>
      val scored = vecs.keys.filter(_ != p).toSeq.map { v =>
        val adc = (0 until m).map { j =>
          val code = fitted(j)._1(v)._1
          val qSub = fx(p).slice(j * subDim, (j + 1) * subDim)
          sq(qSub, fitted(j)._2(code))
        }.sum
        (v, adc)
      }.sortBy { case (v, adc) => (adc, v) }
      scored.zipWithIndex.map { case ((v, adc), i) => (p, i + 1L, v, adc) }
    }

    val got = graft.ml.Pq.adcTopK(df, "vec_id", "embedding",
      m, subDim, k, iters, probeMod, topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"\nengine:    $got\nreference: $expected")
    // the fixture must exercise a non-degenerate ranking (different
    // probes prefer different neighbors)
    val top1 = got.filter(_._2 == 1L).map(_._3)
    assert(top1.distinct.size > 1, "fixture degenerate: same top-1 everywhere")
  }

  test("IVF-ADC top-k matches the in-memory reference: residual codes, " +
    "per-(probe, cell) LUTs, inverted-list pruning") {
    val kc = 2; val nprobe = 2; val m = 2; val subDim = 2
    val k = 2; val iters = 2; val probeMod = 3L; val topK = 10
    val vecs: Map[Long, Seq[Double]] = Map(
      0L -> Seq(0.1, 0.1, 0.9, 0.9),
      1L -> Seq(0.9, 0.9, 0.1, 0.1),
      2L -> Seq(0.12, 0.08, 0.88, 0.91),
      3L -> Seq(0.88, 0.93, 0.09, 0.12),
      4L -> Seq(0.11, 0.13, 0.13, 0.09),
      5L -> Seq(0.09, 0.12, 0.14, 0.11))
    val df = vecs.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    def sq(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

    val fx = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toFloat.toDouble * 1e6).toLong)
    }
    val (cAssign, cCb) = refKmeansFull(vecs, kc, iters)
    val resid = fx.map { case (id, v) =>
      id -> v.zip(cCb(cAssign(id)._1)).map { case (a, b) => a - b }
    }
    val subFits = (0 until m).map { j =>
      refKmeansFx(resid.map { case (id, v) =>
        id -> v.slice(j * subDim, (j + 1) * subDim)
      }, k, iters)
    }
    val probes = vecs.keys.filter(_ % probeMod == 0).toSeq.sorted
    val expected = probes.flatMap { p =>
      val cells = cCb.toSeq.map { case (cid, cv) => (sq(fx(p), cv), cid) }
        .sorted.take(nprobe).map(_._2)
      val cand = vecs.keys.filter(v => v != p && cells.contains(cAssign(v)._1))
      val scored = cand.toSeq.map { v =>
        val cell = cAssign(v)._1
        val qr = fx(p).zip(cCb(cell)).map { case (a, b) => a - b }
        val adc = (0 until m).map { j =>
          val code = subFits(j)._1(v)._1
          sq(qr.slice(j * subDim, (j + 1) * subDim), subFits(j)._2(code))
        }.sum
        (v, adc)
      }.sortBy { case (v, adc) => (adc, v) }.take(topK)
      scored.zipWithIndex.map { case ((v, adc), i) => (p, i + 1L, v, adc) }
    }

    val got = Pq.ivfAdcTopK(df, "vec_id", "embedding",
      kc, nprobe, m, subDim, k, iters, probeMod, topK)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"\nengine:    $got\nreference: $expected")
    // with nprobe = kc every vector is a candidate, so the fixture
    // must exercise LUTs for BOTH cells per probe (candidates from the
    // probe's non-home cell score against a different query residual)
    assert(expected.map(_._3).map(cAssign(_)._1).toSet.size > 1,
      "fixture degenerate: all candidates share one cell")
  }

  test("IVFADC-R re-rank matches the in-memory reference: ADC top-R " +
    "candidates re-ordered by EXACT fx distance, cut to top-k") {
    val kc = 2; val nprobe = 2; val m = 2; val subDim = 2
    val k = 2; val iters = 2; val probeMod = 3L
    val rerankR = 4; val topK = 2
    val vecs: Map[Long, Seq[Double]] = Map(
      0L -> Seq(0.1, 0.1, 0.9, 0.9),
      1L -> Seq(0.9, 0.9, 0.1, 0.1),
      2L -> Seq(0.12, 0.08, 0.88, 0.91),
      3L -> Seq(0.88, 0.93, 0.09, 0.12),
      4L -> Seq(0.11, 0.13, 0.13, 0.09),
      5L -> Seq(0.09, 0.12, 0.14, 0.11))
    val df = vecs.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    def sq(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val fx = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toFloat.toDouble * 1e6).toLong)
    }
    val (cAssign, cCb) = refKmeansFull(vecs, kc, iters)
    val resid = fx.map { case (id, v) =>
      id -> v.zip(cCb(cAssign(id)._1)).map { case (a, b) => a - b }
    }
    val subFits = (0 until m).map { j =>
      refKmeansFx(resid.map { case (id, v) =>
        id -> v.slice(j * subDim, (j + 1) * subDim)
      }, k, iters)
    }
    val probes = vecs.keys.filter(_ % probeMod == 0).toSeq.sorted
    val expected = probes.flatMap { p =>
      val cells = cCb.toSeq.map { case (cid, cv) => (sq(fx(p), cv), cid) }
        .sorted.take(nprobe).map(_._2)
      val cand = vecs.keys.filter(v => v != p && cells.contains(cAssign(v)._1))
      val adcTop = cand.toSeq.map { v =>
        val cell = cAssign(v)._1
        val qr = fx(p).zip(cCb(cell)).map { case (a, b) => a - b }
        val adc = (0 until m).map { j =>
          val code = subFits(j)._1(v)._1
          sq(qr.slice(j * subDim, (j + 1) * subDim), subFits(j)._2(code))
        }.sum
        (v, adc)
      }.sortBy { case (v, adc) => (adc, v) }.take(rerankR).map(_._1)
      val reranked = adcTop.map(v => (v, sq(fx(p), fx(v))))
        .sortBy { case (v, e) => (e, v) }.take(topK)
      reranked.zipWithIndex.map { case ((v, e), i) => (p, i + 1L, v, e) }
    }
    val got = Pq.ivfAdcRerankTopK(df, "vec_id", "embedding",
      kc, nprobe, m, subDim, k, iters, probeMod, rerankR, topK)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"\nengine:    $got\nreference: $expected")
    // the fixture must actually exercise the re-rank: some probe's
    // exact-distance order must differ from its ADC order
    val adcOrder = Pq.ivfAdcTopK(df, "vec_id", "embedding",
      kc, nprobe, m, subDim, k, iters, probeMod, rerankR)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val rerankPairs = expected.map { case (p, _, v, _) => (p, v) }
    assert(adcOrder.take(rerankPairs.size) != rerankPairs ||
      adcOrder.size > rerankPairs.size,
      "fixture degenerate: rerank is the identity on the full list")
  }

  test("IVF-PQ index round-trip: search from the persisted parquet " +
    "index is bit-identical to train-and-search over the same corpus") {
    val emb = Tables.load(spark, SharedSpark.sf001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Pq.writeIvfPqIndex(emb, "vec_id", "embedding",
      kc = 8, m = 4, subDim = 16, k = 16, iters = 2, dir)
    val probes = emb.filter(col("vec_id") % 100 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val fromIdx = rows(Pq.searchIvfPqIndex(probes, "vec_id", "embedding",
      dir, nprobe = 2, m = 4, subDim = 16, topK = 10))
    val fresh = rows(Pq.ivfAdcTopK(emb, "vec_id", "embedding",
      kc = 8, nprobe = 2, m = 4, subDim = 16, k = 16, iters = 2,
      probeMod = 100, topK = 10))
    assert(fromIdx.nonEmpty && fromIdx == fresh,
      s"index search drifted from fresh search " +
        s"(${fromIdx.take(3)} vs ${fresh.take(3)})")
    // the on-disk inverted list: codes must be partitioned by cell
    val cellDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "codes not partitioned by cell")
  }

  test("PQ on the sf0.001 corpus: one row per vector, codes within " +
    "[0, k), error no worse than single-codebook quantization") {
    val emb = Tables.load(spark, SharedSpark.sf001, "embeddings")
    val n = emb.count()
    val pq = Pq.encode(emb, "vec_id", "embedding",
      m = 4, subDim = 16, k = 16, iters = 2).cache()
    assert(pq.count() == n)
    val codeCols = (0 until 4).map(j => col(s"code_$j"))
    val bad = pq.filter(codeCols.map(c => c < 0 || c >= 16).reduce(_ || _))
    assert(bad.count() == 0, "code outside [0, k)")
    // Four independent 16-dim codebooks can never do worse in total
    // fx-squared error than assigning the full 64-dim vector to the
    // single best of the same 16 seeds (PQ's whole premise: the
    // product space refines the single codebook).
    val pqErr = pq.agg(sum(col("err_fx"))).head.getLong(0)
    val fullErr = graft.ml.KMeansFx
      .fit(emb, "vec_id", "embedding", k = 16, iters = 2)
      .agg(sum(col("dist"))).head.getLong(0)
    assert(pqErr <= fullErr,
      s"PQ error $pqErr exceeds single-codebook error $fullErr")
    pq.unpersist()
  }
}
