package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2: versioned dimension history + point-in-time joins.
  *
  * The reference keeps only current-state tables (SCD-1 `--replace`
  * semantics, `etl.sh:35-40`, `ingest_prices.sh:32`); a training-data
  * warehouse additionally needs the type-2 form — "what did this
  * dimension row look like WHEN the fact happened" — for leakage-free
  * feature joins (joining *today's* user state onto *last year's*
  * purchase is label leakage).
  *
  * Scale shape: [[buildHistory]] is one shuffle on the entity key (the
  * lead() window); [[pointInTime]] is an equi-join on the same key with
  * the interval containment as a residual filter, so it sort-merge-joins
  * on the key and never expands beyond (facts-per-key x versions-per-key)
  * within a partition. Versions per key are bounded by the change feed,
  * not the fact volume, so the residual stays cheap at 100TB.
  */
object Scd2 {

  /** Open-ended version sentinel: the last version of each key is valid
    * to the end of time. Both engines compare against the same literal.
    */
  val OpenEndMs: Long = Long.MaxValue

  /** Turn a change feed (one row per observed state change) into a
    * type-2 history: each row gains `[validFromCol, validToCol)` with
    * valid_to = the next change's timestamp (exclusive) and the newest
    * version open-ended. `tiebreak` must make (key, tsMs, tiebreak)
    * unique so version order — and therefore the zero-width-interval
    * behavior of simultaneous changes — is deterministic.
    */
  def buildHistory(
      changes: DataFrame,
      key: String,
      tsMs: String,
      tiebreak: String,
      validFromCol: String = "valid_from_ms",
      validToCol: String = "valid_to_ms"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsMs), col(tiebreak))
    changes
      .withColumn(validFromCol, col(tsMs))
      .withColumn(
        validToCol,
        coalesce(lead(col(tsMs), 1).over(w), lit(OpenEndMs)))
  }

  /** Join each fact to the dimension version valid at the fact's
    * timestamp: `valid_from <= fact_ts < valid_to`. Inner join — facts
    * before a key's first version (or on a zero-width interval edge)
    * drop out, matching the SQL formulation exactly.
    */
  def pointInTime(
      facts: DataFrame,
      history: DataFrame,
      key: String,
      factTsMs: String,
      validFromCol: String = "valid_from_ms",
      validToCol: String = "valid_to_ms"): DataFrame = {
    // Facts and history often share lineage (both carved from the same
    // source), so rename the history key instead of relying on
    // dataset-id disambiguation of two same-named columns.
    val hk = s"__scd2_$key"
    val h = history.withColumnRenamed(key, hk)
    val cond: Column =
      facts(key) === h(hk) &&
        facts(factTsMs) >= h(validFromCol) &&
        facts(factTsMs) < h(validToCol)
    facts.join(h, cond, "inner").drop(hk)
  }
}
