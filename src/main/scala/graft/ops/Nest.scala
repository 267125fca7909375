package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nesting (collect children under parents) and flattening (explode),
  * the inverse pair at the heart of the reference's data model:
  * block -> transactions[] built per-block (`BitcoinBlockHandler.java:103-109`)
  * and re-flattened by `JOIN UNNEST(transactions)` (`etl.sh:32-33`).
  *
  * `collect_list` order is shuffle-dependent, so nested arrays are always
  * `array_sort`-ed; callers must put a unique key first in the struct.
  */
object Nest {

  /** Group `child` rows into a sorted array-of-struct column on `parent`.
    *
    * A left join keeps childless parents with an EMPTY array, never null
    * — the reference's exact convention for blocks with no transactions
    * (`BitcoinBlockHandler.java:103-104`).
    */
  def nest(
      parent: DataFrame,
      child: DataFrame,
      parentKey: Column,
      childKey: Column,
      childStruct: Column,
      as: String): DataFrame = {
    val grouped = child
      .groupBy(childKey.as("__ck"))
      .agg(array_sort(collect_list(childStruct)).as(as))
    parent
      .join(grouped, parentKey === col("__ck"), "left")
      .drop("__ck")
      .withColumn(as, coalesce(col(as), array().cast(grouped.schema(as).dataType)))
  }

  /** Inner flatten: parents with empty arrays vanish (etl.sh:32-33). */
  def flattenInner(df: DataFrame, arrayCol: String, as: String): DataFrame =
    df.withColumn(as, explode(col(arrayCol))).drop(arrayCol)

  /** Outer flatten: childless parents survive with a null child row. */
  def flattenOuter(df: DataFrame, arrayCol: String, as: String): DataFrame =
    df.withColumn(as, explode_outer(col(arrayCol))).drop(arrayCol)
}
