package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, TimestampType}

/** Deterministic-numerics helpers.
  *
  * Floating aggregation is order-dependent: `sum(double)` over shuffled
  * partitions gives different low bits run-to-run and engine-to-engine.
  * Every monetary/metric column in the testdata has <= 2 decimal places,
  * so we aggregate in exact DECIMAL space (order-free) and cast the exact
  * result to DOUBLE at the end — bit-identical in Spark and DuckDB.
  *
  * Mirrors the reference's exact-integer stance: satoshis are kept as
  * `long` end-to-end (`BQRow.avsc:19`), and chain work is computed in
  * `BigInteger` then narrowed (`BitcoinBlockHandler.java:95-101`).
  */
object Exact {
  val Money: DecimalType = DecimalType(18, 2)

  /** Exact 2-dp decimal view of a double column. */
  def dec(c: Column): Column = c.cast(Money)

  /** Order-independent sum of a <=2dp double column, as DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count, double division. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Epoch milliseconds of a timestamp column (ns/us precision agnostic:
    * both Spark (us) and DuckDB (ns) truncate toward zero to ms).
    * The cast makes this total over TIMESTAMP_NTZ too — a session
    * without our NTZ-off config (e.g. the driver's own smoke session)
    * reads the millis-precision parquet columns as NTZ, and
    * unix_millis rejects NTZ directly. No-op for plain TIMESTAMP. */
  def ms(c: Column): Column = unix_millis(c.cast(TimestampType))

  /** Integer floor-division bucket id (non-negative inputs).
    * `(x - x % w) / w`: the numerator is exactly divisible, so the
    * double division is exact — no float rounding at bucket edges.
    * Spark analog of the reference's rotation-window id
    * `epochSec / rotationTime` (`AvroWriter.java:45-49`). */
  def bucket(msCol: Column, widthMs: Long): Column = {
    val m = msCol.cast(LongType)
    ((m - (m % lit(widthMs))) / lit(widthMs)).cast(LongType)
  }
}
