package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Gap-based sessionization (islands): a new session starts when the
  * gap to the previous event of the same entity exceeds `gapMs`.
  *
  * Single shuffle on the entity key; session ids are a running sum of
  * new-session flags inside each entity partition — no driver state,
  * scales with the number of entities.
  */
object Sessionize {

  /** Adds `session_id` (1-based per entity) to `df`.
    * `tsMs` must be epoch-millis (LongType) for engine-portable math. */
  def withSessionId(
      df: DataFrame,
      entity: Column,
      tsMs: Column,
      tiebreak: Column,
      gapMs: Long): DataFrame = {
    val order = Window.partitionBy(entity).orderBy(tsMs.asc, tiebreak.asc)
    val isNew = when(
      lag(tsMs, 1).over(order).isNull ||
        tsMs - lag(tsMs, 1).over(order) > gapMs, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isNew).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast(LongType))
  }
}
