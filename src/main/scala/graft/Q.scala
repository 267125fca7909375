package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a Spark-first implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle formulation the
  * driver hash-matches against (SURVEY.md §2.B, §5.2).
  *
  * Oracle discipline (SURVEY.md §7.3): total ORDER BY with a unique
  * tiebreaker, explicit NULLS FIRST, exact-decimal aggregation
  * ([[graft.functions.Exact]]), epoch-ms for all timestamp arithmetic.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
