package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows per group via ranking window + filter.
  *
  * Scale note: Spark >= 3.5 rewrites `rank <= k` over a window into a
  * per-partition group-limit (`InferWindowGroupLimit`), so only k rows
  * per key survive the map side before the shuffle — safe at 100TB.
  */
object TopK {
  def perGroup(
      df: DataFrame,
      partitionBy: Seq[Column],
      orderBy: Seq[Column],
      k: Int,
      rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
