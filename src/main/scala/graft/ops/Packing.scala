package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token packing for LLM pretraining: every document's tokens land at a
  * global running offset, and fixed-size context windows are cut across
  * the concatenated stream ("concat-then-chunk").
  *
  * The naive formulation is a running sum over ONE global window — a
  * single-partition sort that serializes the whole corpus through one
  * task at 100TB. This implementation is the two-phase prefix-sum:
  *
  *   1. bucket docs into CONTIGUOUS id ranges; per-bucket token totals
  *      are one tiny aggregate (P rows, P = bucket count);
  *   2. prefix-sum the P totals driver-side (P is partitions, not rows
  *      — collecting it is scale-safe by construction) and broadcast
  *      the bucket base offsets back;
  *   3. each bucket computes its LOCAL running sum in parallel and
  *      shifts by its base offset.
  *
  * Same rows as the global window, no single-partition stage.
  */
object Packing {

  /** Adds `start_tok` (global token offset, exclusive-end convention)
    * to `docs`. `idCol` must be unique and define the pack order;
    * `nTokens` is the per-doc token count (already a column of docs). */
  def withGlobalOffsets(
      docs: DataFrame,
      idCol: String,
      nTokensCol: String,
      bucketSize: Long): DataFrame = {
    val bucketed = docs.withColumn("__bucket", expr(s"$idCol div $bucketSize"))
    // phase 1: per-bucket totals (P rows)
    val totals = bucketed.groupBy("__bucket")
      .agg(sum(col(nTokensCol)).as("__btotal"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    // phase 2: driver prefix sum over P values
    var acc = 0L
    val bases = totals.map { case (b, t) => val base = acc; acc += t; (b, base) }
    val spark = docs.sparkSession
    import spark.implicits._
    val baseDf = spark.createDataset(bases.toSeq).toDF("__bucket", "__base")
    // phase 3: parallel local cumsum per bucket + shift
    val w = Window.partitionBy("__bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(baseDf), "__bucket")
      .withColumn("start_tok",
        col("__base") + sum(col(nTokensCol)).over(w) - col(nTokensCol))
      .drop("__bucket", "__base")
  }

}
