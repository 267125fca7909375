package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means in exact fixed-point arithmetic, engine-replayable
  * bit-for-bit: coordinates become `floor(x * 1e6)` BIGINTs (the
  * IEEE-exact float→double→multiply→floor chain shared with the
  * fxdot kernels), squared distances are integer sums, and centroid
  * updates divide with a positive offset so truncating (Spark `div`)
  * and flooring (DuckDB `//`) integer division agree on negative
  * coordinate sums. Floating k-means can never hash-match across
  * engines — the per-dimension mean's summation order differs per
  * shuffle.
  *
  * Shape at 100TB: the k centroids broadcast every iteration (k*dim
  * longs); the corpus is probed in place by a compiled
  * squared-distance UDF and only (point, cluster) assignments plus
  * k*dim partial sums shuffle — the textbook mapReduce k-means.
  * Deterministic seeding (lowest k ids) replaces rand() init: at
  * scale use a hash-sampled seed set, still rand()-free.
  */
object KMeansFx {

  private val Scale = 1e6
  private val Off = 2000000L // > max |scaled coordinate|, keeps dividends positive

  private val toFx = udf { v: Seq[Float] =>
    if (v == null) null
    else v.map { x =>
      val s = math.floor(x.toDouble * Scale).toLong
      // The +Off trick only keeps dividends positive while every scaled
      // coordinate stays inside (-Off, Off); an out-of-range vector
      // would silently reintroduce the truncating-div vs floor-div
      // divergence on negative centroid sums — fail loudly instead.
      require(math.abs(s) < Off,
        s"embedding coordinate $x out of range: |floor(x*1e6)| = ${math.abs(s)} " +
          s">= $Off — raise Off to cover the data's coordinate range")
      s
    }.toArray
  }

  /** Squared distance via the codegen [[graft.plans.FxSqDist]] kernel —
    * the Lloyd loop probes every (point, centroid) pair with it, and
    * the fused array loop avoids the per-pair Seq boxing of a Scala
    * UDF (requires GraftExtensions, like the fxdot kernels). */
  private def sqDist(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function("graft_fxsqdist", a, b)

  /** Final assignments (idCol, cluster, dist) after `iters` Lloyd
    * iterations with centroids seeded from the `k` lowest ids. */
  def fit(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame =
    fitSeeded(emb, idCol, vecCol, lit(k.toLong), iters)._1

  /** [[fit]] plus the CODEBOOK the final assignment was measured
    * against — the centroids after `iters - 1` Lloyd updates (`c{iters-1}`
    * in the oracle chain), i.e. exactly the table a quantization code
    * refers to. Product-quantization ADC search ([[Pq.adcTopK]]) needs
    * both halves consistent: a code is only meaningful together with
    * the codebook that produced it. Returns
    * ((idCol, cluster, dist), (cid, cv)); both frames share one
    * persisted scaled-points relation. */
  def fitWithCodebook(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): (DataFrame, DataFrame) =
    fitSeeded(emb, idCol, vecCol, lit(k.toLong), iters)

  /** Scaled fx points (pid, v: Array[Long]) — the shared quantization
    * of [[fit]] exposed so ADC query vectors go through the identical
    * float→double→floor chain as the indexed corpus. */
  private[ml] def fxPoints(
      emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("pid"), toFx(col(vecCol)).as("v"))

  private[ml] def fxSqDist(a: Column, b: Column): Column = sqDist(a, b)

  /** [[fit]] with k DERIVED from the corpus size, k = max(minK,
    * n / targetClusterSize) — the SemDeDup posture "k grows with the
    * corpus so n/k stays bounded" made executable instead of a comment.
    * The count is an in-plan single-row aggregate cross-joined under
    * the seed filter (no driver action), so the identical expression
    * replays in the SQL oracle via a scalar subquery. */
  def fitDerivedK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      minK: Int,
      targetClusterSize: Long,
      iters: Int): DataFrame =
    fitSeeded(emb, idCol, vecCol,
      greatest(lit(minK.toLong), expr(s"__n div $targetClusterSize")), iters,
      withCount = true)._1

  /** The SQL expression for the derived k, shared with oracle builders
    * so engine and oracle can never drift. */
  def derivedKSql(minK: Int, targetClusterSize: Long): String =
    s"(SELECT GREATEST($minK, COUNT(*) // $targetClusterSize) FROM embeddings)"

  private def fitSeeded(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      kCol: Column,
      iters: Int,
      withCount: Boolean = false): (DataFrame, DataFrame) = {
    val out = fitFx(
      emb.select(col(idCol).as("pid"), toFx(col(vecCol)).as("v")),
      kCol, iters, withCount)
    (out._1.withColumnRenamed("pid", idCol), out._2)
  }

  /** The Lloyd loop over ALREADY-SCALED points (pid, v: Array[Long])
    * — shared core of [[fit]]/[[fitWithCodebook]]; for points that
    * are integer-born (e.g. PQ residuals) the float→fx boundary is
    * skipped entirely. Returns ((pid, cluster, dist), (cid, cv)). */
  private[ml] def fitFx(
      ptsRaw: DataFrame,
      kCol: Column,
      iters: Int,
      withCount: Boolean = false): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // One materialization of the scaled points, hash-partitioned on the
    // POINT ID so every iteration's per-point argmin window reuses the
    // partitioning instead of re-exchanging the assignment frame each
    // round (ids unique -> spread as even as round-robin; a 1-partition
    // cache would serialize the distance scans — CLAUDE.md perf lore).
    // The persist is LOAD-BEARING and deliberate: exchange reuse alone
    // recomputes the toFx scan across the nested iteration plans
    // (measured 1.6s -> 2.0-3.2s at sf0.1), and an eager localCheckpoint
    // + unpersist split the job and cost ~50%. The cache is released by
    // the ContextCleaner when the result frame is dropped; on a shared
    // cluster wrap fit() calls with your own lifecycle if that matters.
    val pts = ptsRaw
      .repartition(ptsRaw.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "32").toInt, col("pid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seedSrc =
      if (withCount)
        pts.crossJoin(broadcast(pts.agg(count(lit(1)).as("__n"))))
      else pts
    var cents = seedSrc.filter(col("pid") < kCol)
      .select(col("pid").as("cid"), col("v").as("cv"))
    var assign: DataFrame = null
    var centsUsed: DataFrame = null
    for (_ <- 1 to iters) {
      centsUsed = cents
      assign = pts.crossJoin(broadcast(cents))
        .withColumn("dist", sqDist(col("v"), col("cv")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("pid").orderBy(col("dist"), col("cid"))))
        .filter(col("rn") === 1)
        .select(col("pid"), col("cid"), col("dist"), col("v"))
      cents = assign
        .select(col("cid"), posexplode(col("v")).as(Seq("i", "vi")))
        .groupBy("cid", "i")
        .agg(sum(col("vi")).as("s"), count(lit(1)).as("n"))
        .withColumn("ci", expr(s"((s + $Off * n) div n) - $Off"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("ci")))),
          s => s("ci")).as("cv"))
    }
    (assign.select(col("pid"), col("cid").as("cluster"),
      col("dist")), centsUsed)
  }

  /** Batched Lloyd over GROUPED pre-scaled points (g, pid, v): every
    * group trains its own independent codebook with the exact
    * [[fitFx]] arithmetic (same seeds pid < k per group, same
    * (dist, cid) tie-break, same offset division), but all groups
    * share ONE cached relation, one broadcast per iteration, and one
    * argmin window — M subspace fits for the price of one plan.
    * Product quantization over M subspaces runs through this: M
    * separate [[fitFx]] calls cost M caches and an M×-size physical
    * plan (measured 18.5s for the sf0.1 IVF-ADC query; batched form
    * below 5s, identical output). Returns ((g, pid, cluster, dist),
    * (g, cid, cv)). */
  private[ml] def fitFxGrouped(
      ptsRaw: DataFrame,
      kCol: Column,
      iters: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val pts = ptsRaw
      .repartition(ptsRaw.sparkSession.conf
        .get("spark.sql.shuffle.partitions", "32").toInt, col("pid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = pts.filter(col("pid") < kCol)
      .select(col("g"), col("pid").as("cid"), col("v").as("cv"))
    var assign: DataFrame = null
    var centsUsed: DataFrame = null
    for (_ <- 1 to iters) {
      centsUsed = cents
      // Equi-join on the group id (broadcast hash, not a cross
      // product): a point only ever meets its own group's centroids.
      assign = pts.join(broadcast(cents), Seq("g"))
        .withColumn("dist", sqDist(col("v"), col("cv")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("g", "pid").orderBy(col("dist"), col("cid"))))
        .filter(col("rn") === 1)
        .select(col("g"), col("pid"), col("cid"), col("dist"), col("v"))
      cents = assign
        .select(col("g"), col("cid"), posexplode(col("v")).as(Seq("i", "vi")))
        .groupBy("g", "cid", "i")
        .agg(sum(col("vi")).as("s"), count(lit(1)).as("n"))
        .withColumn("ci", expr(s"((s + $Off * n) div n) - $Off"))
        .groupBy("g", "cid")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("ci")))),
          s => s("ci")).as("cv"))
    }
    (assign.select(col("g"), col("pid"), col("cid").as("cluster"),
      col("dist")), centsUsed)
  }

  /** The identical iteration as DuckDB SQL over the embeddings table —
    * generated alongside [[fit]] so oracle and engine can never drift
    * on k/iteration count/scale constants. */
  def oracleSql(k: Int, iters: Int, dim: Int): String =
    s"WITH ${oracleCtes(k, iters, dim)}" +
      s"\nSELECT vec_id, cid AS cluster, CAST(dist AS BIGINT) AS dist" +
      s"\nFROM ${assignCte(iters)} ORDER BY vec_id"

  /** Name of the final-assignment CTE produced by [[oracleCtes]]. */
  def assignCte(iters: Int): String = s"s$iters"

  /** The Lloyd-iteration CTE chain (no `WITH`, no final SELECT) so
    * downstream oracles — semantic dedup, IVF — can compose on the
    * bit-exact cluster assignments. */
  def oracleCtes(k: Int, iters: Int, dim: Int): String =
    oracleCtesKExpr(k.toString, iters, dim)

  /** [[oracleCtes]] with the seed count as an arbitrary SQL expression
    * (e.g. [[derivedKSql]]'s corpus-size-derived scalar subquery). */
  def oracleCtesKExpr(kExpr: String, iters: Int, dim: Int): String =
    oracleCtesSlice(kExpr, iters, dim, offset = 0, sfx = "")

  /** The same chain over a SUBSPACE slice `embedding[offset+1 ..
    * offset+dim]` with every CTE name suffixed — product quantization
    * ([[Pq]]) runs one chain per subspace in a single WITH. Emits
    * byte-identical SQL to the historical generator when offset=0 and
    * sfx="" (the q_kmeans_fx / q_dedup_semantic / q_ann_ivf oracles
    * are unchanged). */
  def oracleCtesSlice(
      kExpr: String, iters: Int, dim: Int, offset: Int, sfx: String): String = {
    val idx = if (offset == 0) "i" else s"i + $offset"
    oracleCtesFromSrc(
      s"""SELECT vec_id, i,
         |    CAST(floor(CAST(embedding[$idx] AS DOUBLE) * 1000000) AS BIGINT) AS v
         |  FROM embeddings, (SELECT unnest(range(1, ${dim + 1})) AS i) p""".stripMargin,
      kExpr, iters, sfx)
  }

  /** The same chain over an ARBITRARY (vec_id, i, v) source select —
    * residual quantization ([[Pq.ivfAdcTopK]]'s oracle) runs
    * per-subspace chains over integer residuals rather than embedding
    * slices. `srcSql` must yield one row per (vec_id, i in 1..dim)
    * with v already in fx longs. */
  def oracleCtesFromSrc(
      srcSql: String, kExpr: String, iters: Int, sfx: String): String = {
    val head =
      s"""pts$sfx AS ($srcSql),
         |c0$sfx AS (SELECT vec_id AS cid, i, v FROM pts$sfx WHERE vec_id < $kExpr)""".stripMargin
    val its = (1 to iters).map { j =>
      s"""a$j$sfx AS (SELECT p.vec_id, c.cid, SUM((p.v - c.v) * (p.v - c.v)) AS dist
         |  FROM pts$sfx p JOIN c${j - 1}$sfx c ON p.i = c.i GROUP BY p.vec_id, c.cid),
         |s$j$sfx AS (SELECT vec_id, cid, dist FROM (
         |    SELECT vec_id, cid, dist,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM a$j$sfx) WHERE rn = 1),
         |c$j$sfx AS (SELECT s.cid, p.i,
         |    CAST(((SUM(p.v) + 2000000 * COUNT(*)) // COUNT(*)) - 2000000 AS BIGINT) AS v
         |  FROM s$j$sfx s JOIN pts$sfx p ON s.vec_id = p.vec_id GROUP BY s.cid, p.i)""".stripMargin
    }
    (Seq(head) ++ its).mkString(",\n")
  }
}
