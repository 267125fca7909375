package graft.ml

import org.apache.spark.sql.DataFrame
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
