package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global rank / running sum WITHOUT a global-window single partition.
  *
  * `ROW_NUMBER() OVER (ORDER BY ...)` / `SUM() OVER (ORDER BY ...)`
  * with no PARTITION BY serialize the whole frame through one task —
  * fine on a bounded frame, fatal on a key- or data-sized one at
  * cluster scale. This is the two-phase prefix-sum form (the same
  * shape as [[Packing.withGlobalOffsets]], generalized to any total
  * order and any number of running sums):
  *
  *   1. every row gets a bucket that is MONOTONE in the sort order
  *      (so bucket boundaries are rank boundaries);
  *   2. per-bucket counts/sums are one tiny aggregate — P rows, with
  *      P bounded by the bucket expression, not by the data;
  *   3. the P bucket subtotals prefix-sum on the driver (scale-safe by
  *      construction) and broadcast back as per-bucket base offsets;
  *   4. each bucket computes its LOCAL rank / running sum in parallel
  *      and shifts by its base.
  *
  * Output is invariant to the bucketing (any monotone bucket yields
  * the same ranks), so bucket choice is purely a balance decision.
  */
object RankedPrefix {

  /** Log-scale monotone bucket of a non-negative numeric column:
    * `floor(log2(v + 1) * 2^subBits)` — 2^subBits sub-buckets per
    * power of two, ≤ 64·2^subBits buckets total for any long input.
    * Monotone non-decreasing in the value, so it is a valid rank
    * bucket for orders led by that value (asc or desc). Balanced for
    * value distributions that spread over several binades (revenue,
    * sizes); a single massively-tied value still lands in one bucket —
    * use a distinct-value histogram upstream when ties dominate
    * (see q_skew_report). */
  def logBucket(c: Column, subBits: Int = 5): Column =
    floor(log2(c.cast("double") + lit(1.0)) * lit(1 << subBits)).cast("long")

  /** Fixed-width range bucket for dense, roughly uniform keys (ids,
    * sequence numbers): `c div width`. Caller picks width from a
    * driver-scalar max so P stays bounded. */
  def rangeBucket(c: Column, width: Long): Column =
    floor(c.cast("long") / lit(width)).cast("long")

  /** The result frame plus the phase-1 grand totals (row count and the
    * full sum of every requested running-sum column) — totals fall out
    * of the driver prefix for free, saving the `SUM() OVER ()` global
    * window callers otherwise reach for. */
  final case class RankedResult(
      df: DataFrame, nRows: Long, totals: Map[String, Long])

  /** Adds a global-rank column and/or inclusive running-sum columns to
    * `df`, ordered by `order` (which must be a TOTAL order).
    *
    * @param bucket     monotone-in-`order` bucket expression over df's
    *                   columns (see [[logBucket]]/[[rangeBucket]])
    * @param bucketDesc true when `order` is descending in the value
    *                   the bucket is monotone in (bucket ids then
    *                   prefix in descending order)
    * @param sums       (inputCol, outputCumCol) pairs; inputs must be
    *                   non-null integral columns
    * @param rankCol    name for the 1-based global rank column
    *
    * Runs one aggregate job at build time (the P-row phase-1 collect).
    */
  def rankedCumsum(
      df: DataFrame,
      bucket: Column,
      bucketDesc: Boolean,
      order: Seq[Column],
      sums: Seq[(String, String)] = Seq.empty,
      rankCol: Option[String] = Some("rk")): RankedResult = {
    val spark = df.sparkSession
    val b = df.withColumn("__rpb", bucket)
    // phase 1: per-bucket counts + sums (P rows)
    val aggExprs = count(lit(1L)).as("__cnt") +:
      sums.map { case (in, _) => sum(col(in).cast("long")).as(s"__s_$in") }
    val perBucket = b.groupBy(col("__rpb"))
      .agg(aggExprs.head, aggExprs.tail: _*)
      .collect()
    val ordered = {
      val s = perBucket.sortBy(_.getLong(0))
      if (bucketDesc) s.reverse else s
    }
    // phase 2: driver prefix over the P bucket subtotals
    var accCnt = 0L
    val accSums = Array.fill(sums.size)(0L)
    val bases = ordered.map { r =>
      val base = (r.getLong(0), accCnt, accSums.clone())
      accCnt += r.getLong(1)
      var i = 0
      while (i < sums.size) { accSums(i) += r.getLong(2 + i); i += 1 }
      base
    }
    val totals = sums.map(_._1).zipWithIndex
      .map { case (in, i) => in -> accSums(i) }.toMap
    import spark.implicits._
    val baseRows = bases.toSeq.map { case (bk, cnt, ss) => (bk, cnt, ss.toSeq) }
    val baseDf = spark.createDataset(baseRows)
      .toDF("__rpb", "__bcnt", "__bsums")
    // phase 3: per-bucket local window, shifted by the broadcast base
    val w = Window.partitionBy(col("__rpb")).orderBy(order: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = b.join(broadcast(baseDf), Seq("__rpb"))
    val withRank = rankCol.fold(joined)(rc =>
      joined.withColumn(rc, (col("__bcnt") + row_number().over(w)).cast("long")))
    val withSums = sums.zipWithIndex.foldLeft(withRank) {
      case (acc, ((in, out), i)) =>
        acc.withColumn(out,
          element_at(col("__bsums"), i + 1) + sum(col(in).cast("long")).over(cum))
    }
    RankedResult(withSums.drop("__rpb", "__bcnt", "__bsums"), accCnt, totals)
  }
}
