package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row
  * with the same key and right_ts <= left_ts.
  *
  * The reference's pricing tables exist precisely for this join shape
  * (`bitcoin_pricing/ingest_prices.sh:10` — per-exchange (timestamp,
  * price) series to be matched against transaction times).
  *
  * Implementation is the scale-safe union+last_value pattern: tag both
  * sides, union, ONE shuffle on the key, and a running `last(ignoreNulls)`
  * over (ts, tag) order. No range cross-product, no per-key blowup —
  * cost is O(|L|+|R|) rows through a single window, vs the naive
  * range-join + rank which is O(|L| * matches).
  */
object AsOf {

  /** Left rows from `left` gain the latest-at-or-before values of
    * `rightVals` (columns of `right`). `tsMs` columns must be epoch-ms.
    *
    * Right-side ties on ts are broken by `rightTiebreak` (largest wins).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTsMs: String,
      rightTsMs: String,
      rightVals: Seq[String],
      rightTiebreak: String): DataFrame = {
    val lTagged = left
      .withColumn("__ts", col(leftTsMs))
      .withColumn("__tag", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
    val rTagged = right
      .select((Seq(key, rightTsMs, rightTiebreak) ++ rightVals).distinct.map(col): _*)
      .withColumn("__ts", col(rightTsMs))
      .withColumn("__tag", lit(0))
      .withColumn("__tb", col(rightTiebreak).cast("long"))
    // Right values travel as ONE struct so a single last(ignoreNulls)
    // carries them atomically — per-column fills could mix values from
    // different right rows when a right column is null.
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c)))
    val lAll = lTagged.select(
      (left.columns.map(col) ++ Seq(col("__ts"), col("__tag"), col("__tb")) :+
        lit(null).cast(rvType).as("__rv")): _*)
    val rAll = rTagged.select(
      (left.columns.map(c =>
        if (c == key) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__ts"), col("__tag"), col("__tb")) :+
        struct(rightVals.map(col): _*).as("__rv")): _*)

    // rights sort before lefts at equal ts (__tag 0 < 1) => "<=" semantics;
    // among equal-ts rights the largest tiebreak is seen last => wins.
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__tag").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lAll.unionByName(rAll)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    rightVals.foldLeft(filled.filter(col("__tag") === 1)) { (df, c) =>
      df.withColumn(c, col(s"__rv.$c"))
    }.drop("__ts", "__tag", "__tb", "__rv")
  }
}
