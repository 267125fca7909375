package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): split each embedding
  * into M contiguous subspaces and vector-quantize each subspace with
  * its own small codebook, compressing a float vector to M small
  * integer codes (here 4×16-way = 4 codes ≈ 2 bytes per 64-float
  * vector). The per-subspace codebooks come from [[KMeansFx]], so the
  * whole construction — Lloyd iterations, assignment tie-breaks,
  * quantization error — is exact fixed-point integer arithmetic and
  * replays bit-for-bit in the DuckDB oracle (one [[KMeansFx
  * .oracleCtesSlice]] chain per subspace in a single WITH).
  *
  * Shape at 100TB: M independent k-means runs over dim/M-wide slices
  * (each the textbook broadcast-centroid mapReduce shape), then an
  * M-way equi-join on the vector id reassembles the code rows —
  * centroids never exceed M·k·subDim longs, and the corpus is never
  * shuffled on anything but the vector id.
  */
object Pq {

  /** Per-vector PQ codes and total quantization error:
    * (idCol, code_0..code_{m-1}, err_fx) where code_j is the
    * subspace-j centroid id and err_fx = Σ_j fx-squared-distance to
    * that centroid (the assignment distances, summed). */
  def encode(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      subDim: Int,
      k: Int,
      iters: Int): DataFrame = {
    val parts = (0 until m).map { j =>
      KMeansFx.fit(
        emb.select(col(idCol),
          slice(col(vecCol), j * subDim + 1, subDim).as("sub")),
        idCol, "sub", k, iters)
        .select(col(idCol),
          col("cluster").as(s"code_$j"), col("dist").as(s"dist_$j"))
    }
    val joined = parts.reduce(_.join(_, idCol))
    val cols = col(idCol) +:
      (0 until m).map(j => joined(s"code_$j")) :+
      (0 until m).map(j => joined(s"dist_$j")).reduce(_ + _).as("err_fx")
    joined.select(cols: _*)
  }

  /** ADC (asymmetric distance computation) top-k search over the PQ
    * index — the query path of an IVF-PQ engine: each probe vector
    * precomputes an M×k lookup table of exact fx squared distances to
    * every subspace centroid, and a corpus vector's distance is the
    * sum of M table lookups on its codes — the corpus is scanned as
    * 2-byte codes, never as floats. Probes are `idCol % probeMod = 0`
    * (the q_ann_topk convention); the probe itself is excluded.
    *
    * Shape at 100TB: the M per-probe LUTs are Q·k rows each and
    * broadcast, so scoring is M broadcast hash joins over the code
    * table (no corpus shuffle); `rank <= k` over the probe window is
    * rewritten to a map-side group limit ([[graft.ops.TopK]]), so only
    * k·Q rows survive to the final exchange.
    *
    * Output: (probe_id, rank, vec_id, adc_fx), exact integers. ADC
    * equals the true fx distance from the probe to the RECONSTRUCTED
    * corpus vector (concatenated subspace centroids) — the PQ paper's
    * eq. (12)/(13) identity, pinned by PqSpec.
    */
  def adcTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      subDim: Int,
      k: Int,
      iters: Int,
      probeMod: Long,
      topK: Int): DataFrame = {
    val fitted = (0 until m).map { j =>
      KMeansFx.fitWithCodebook(
        emb.select(col(idCol),
          slice(col(vecCol), j * subDim + 1, subDim).as("sub")),
        idCol, "sub", k, iters)
    }
    val codes = fitted.zipWithIndex.map { case ((assign, _), j) =>
      assign.select(col(idCol), col("cluster").as(s"code_$j"))
    }.reduce(_.join(_, idCol))
    val probes = emb.filter(col(idCol) % probeMod === 0)
    var scored = codes
    for (j <- 0 until m) {
      val sub = KMeansFx.fxPoints(
        probes.select(col(idCol),
          slice(col(vecCol), j * subDim + 1, subDim).as("sub")),
        idCol, "sub")
      val lut = sub.crossJoin(broadcast(fitted(j)._2))
        .select(col("pid").as(s"p_$j"), col("cid").as(s"c_$j"),
          KMeansFx.fxSqDist(col("v"), col("cv")).as(s"d_$j"))
      val cond: Column =
        if (j == 0) col("code_0") === col("c_0")
        else col(s"code_$j") === col(s"c_$j") && col("p_0") === col(s"p_$j")
      scored = scored.join(broadcast(lut), cond)
    }
    val adc = (0 until m).map(j => col(s"d_$j")).reduce(_ + _)
    graft.ops.TopK.perGroup(
      scored.filter(col(idCol) =!= col("p_0"))
        .select(col("p_0").as("probe_id"), col(idCol), adc.as("adc_fx")),
      partitionBy = Seq(col("probe_id")),
      orderBy = Seq(col("adc_fx").asc, col(idCol).asc),
      k = topK, rankCol = "rank")
      .select("probe_id", "rank", idCol, "adc_fx")
      .orderBy("probe_id", "rank")
  }

  /** The DuckDB replay of [[adcTopK]]: the same suffixed Lloyd chains,
    * per-probe LUTs measured against the codebook CTE `c{iters-1}_j`
    * (the centroids the final codes refer to), M equi-joined lookups,
    * rank per probe. */
  def adcOracleSql(
      m: Int, subDim: Int, k: Int, iters: Int,
      probeMod: Long, topK: Int): String = {
    val ctes = (0 until m)
      .map(j => KMeansFx.oracleCtesSlice(
        k.toString, iters, subDim, offset = j * subDim, sfx = s"_$j"))
      .mkString(",\n")
    val luts = (0 until m).map { j =>
      s"""lut_$j AS (SELECT q.vec_id AS probe_id, c.cid,
         |    SUM((q.v - c.v) * (q.v - c.v)) AS d
         |  FROM pts_$j q JOIN c${iters - 1}_$j c ON q.i = c.i
         |  WHERE q.vec_id % $probeMod = 0 GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val codeJoins = (1 until m)
      .map(j => s"JOIN s${iters}_$j s$j ON s0.vec_id = s$j.vec_id")
      .mkString("\n")
    val lutJoins = (0 until m).map { j =>
      if (j == 0) s"JOIN lut_0 l0 ON l0.cid = s0.cid"
      else s"JOIN lut_$j l$j ON l$j.probe_id = l0.probe_id AND l$j.cid = s$j.cid"
    }.mkString("\n")
    val adcSum = (0 until m).map(j => s"l$j.d").mkString(" + ")
    s"""WITH $ctes,
       |$luts,
       |adc AS (SELECT l0.probe_id, s0.vec_id, CAST($adcSum AS BIGINT) AS adc_fx
       |  FROM s${iters}_0 s0
       |$codeJoins
       |$lutJoins
       |  WHERE s0.vec_id <> l0.probe_id),
       |ranked AS (SELECT probe_id, vec_id, adc_fx,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id
       |                       ORDER BY adc_fx, vec_id) AS rank
       |  FROM adc)
       |SELECT probe_id, rank, vec_id, adc_fx FROM ranked
       |WHERE rank <= $topK ORDER BY probe_id, rank""".stripMargin
  }

  /** The DuckDB replay of [[encode]] over the embeddings table. */
  def oracleSql(m: Int, subDim: Int, k: Int, iters: Int): String = {
    val ctes = (0 until m)
      .map(j => KMeansFx.oracleCtesSlice(
        k.toString, iters, subDim, offset = j * subDim, sfx = s"_$j"))
      .mkString(",\n")
    val codeCols = (0 until m)
      .map(j => s"CAST(q$j.cid AS BIGINT) AS code_$j").mkString(", ")
    val errSum = (0 until m).map(j => s"q$j.dist").mkString(" + ")
    val joins = (1 until m)
      .map(j => s"JOIN s${iters}_$j q$j ON q0.vec_id = q$j.vec_id")
      .mkString("\n")
    s"""WITH $ctes
       |SELECT q0.vec_id, $codeCols,
       |  CAST($errSum AS BIGINT) AS err_fx
       |FROM s${iters}_0 q0
       |$joins
       |ORDER BY q0.vec_id""".stripMargin
  }
}
