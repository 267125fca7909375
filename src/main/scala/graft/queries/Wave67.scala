package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Wave 67 — pass@k estimation (Chen et al. arXiv 2107.03374 §2.1,
  * the HumanEval estimator): the LLM-eval aggregation primitive.
  * Given n sampled attempts per task with c successes, the unbiased
  * estimator is pass@k = 1 − C(n−c, k)/C(n, k), numerically evaluated
  * as the falling-factorial ratio Π_{i<k}(n−c−i) / Π_{i<k}(n−i) —
  * here EXACT integer products and one truncating ppm division, so
  * the whole report hash-matches (the combinatorics never see a
  * float). Tasks are parts, attempts are their lineitems, success is
  * a returned line ('R') — the corpus stand-in for (task, sample,
  * pass) triples.
  */
object Wave67 {

  /** k for the deep reading; tasks need n >= KDeep attempts. */
  private val KDeep = 5

  /** One generator emits the falling-factorial pass@k ppm expression
    * for BOTH engines (identical integer SQL — the compSql idiom), so
    * estimator and oracle cannot drift. `1e6 − Πfail·1e6 div Πall`,
    * with the product zeroed when fewer than k failures exist
    * (pass@k = 1 exactly). The products run in the 38-digit lane
    * (Spark DECIMAL(38,0) ↔ DuckDB HUGEINT, the Wave66 alpha_micro
    * pattern): a BIGINT product of k=5 factors times 1e6 overflows
    * Long once a task has n ≈ 970 attempts, and Spark (ansi off)
    * would wrap silently while DuckDB raises — the engines diverging
    * instead of failing together (r12 ADVICE). Headroom now ~1e6
    * attempts per task (5 factors ≈ 1e30, ×1e6 ≈ 1e36 < both engines'
    * 38-digit ceilings). */
  private def passkSql(k: Int, big: String = "DECIMAL(38,0)"): String = {
    val failProd = (s"CAST((n - c) AS $big)" +:
      (1 until k).map(i => s"(n - c - $i)")).mkString(" * ")
    val allProd = (s"CAST(n AS $big)" +:
      (1 until k).map(i => s"(n - $i)")).mkString(" * ")
    s"""CASE WHEN n - c < $k THEN 1000000
       |  ELSE 1000000 - ($failProd) * 1000000 div ($allProd) END"""
      .stripMargin
  }

  /** q_eval_passk: per-brand pass@1 / pass@KDeep report over per-part
    * attempt groups. Per task the estimator is exact; per brand the
    * report carries the task count, total attempts/successes, and the
    * truncating mean of the per-task ppm estimates.
    *
    * Shape at 100TB: one map-side-combined aggregate to task grain
    * (part-keyed), one more to the brand dictionary — the estimator
    * arithmetic runs between the two aggregates on task-grain rows.
    */
  val evalPassk: Q = Q(
    "q_eval_passk",
    s"""WITH t AS (SELECT p.p_brand AS brand, l.l_partkey,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c
       |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       |  GROUP BY 1, 2),
       |e AS (SELECT brand, n, c,
       |    ${passkSql(1, "HUGEINT").replace("div", "//")} AS p1_ppm,
       |    ${passkSql(KDeep, "HUGEINT").replace("div", "//")} AS p5_ppm
       |  FROM t WHERE n >= $KDeep)
       |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_tasks,
       |  CAST(SUM(n) AS BIGINT) AS n_attempts,
       |  CAST(SUM(c) AS BIGINT) AS n_pass,
       |  CAST(SUM(p1_ppm) // COUNT(*) AS BIGINT) AS avg_pass1_ppm,
       |  CAST(SUM(p5_ppm) // COUNT(*) AS BIGINT) AS avg_pass5_ppm
       |FROM e GROUP BY brand ORDER BY brand""".stripMargin) { (s, d) =>
    val t = Tables.load(s, d, "lineitem")
      .join(Tables.load(s, d, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand").as("brand")),
        "l_partkey")
      .groupBy("brand", "l_partkey")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("c"))
    t.filter(col("n") >= KDeep)
      .withColumn("p1_ppm", expr(passkSql(1)))
      .withColumn("p5_ppm", expr(passkSql(KDeep)))
      .groupBy("brand")
      .agg(count(lit(1)).as("n_tasks"), sum(col("n")).as("n_attempts"),
        sum(col("c")).as("n_pass"),
        expr("SUM(p1_ppm) div COUNT(1)").as("avg_pass1_ppm"),
        expr("SUM(p5_ppm) div COUNT(1)").as("avg_pass5_ppm"))
      .orderBy("brand")
  }

  val all: Seq[Q] = Seq(evalPassk)
}
