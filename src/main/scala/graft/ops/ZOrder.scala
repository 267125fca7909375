package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping. The reference lays its warehouse out one-dimensionally by
  * rotation time (`AvroWriter.java:45-49`); at 100TB a table queried by
  * BOTH time and key needs a layout where file-level min/max stats
  * prune on either dimension. Interleaving the bits of the two
  * dimensions gives every range-partitioned file a bounded span in
  * each dimension — a linear sort gives full-table spans on the second
  * dimension and prunes nothing.
  *
  * The interleave is exact integer arithmetic (bit extract, multiply
  * by a power of two, add), so a DuckDB oracle can replay it
  * bit-for-bit ([[zvalueSql]] renders the same arithmetic in portable
  * SQL).
  */
object ZOrder {

  /** Morton code of the low `bits` bits of two non-negative long
    * columns: x occupies even bit positions, y odd. Codegen-friendly
    * (shift/and/add only; 2*bits terms inside whole-stage codegen). */
  def zvalue2(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The identical interleave as engine-portable SQL (no shift
    * operators — multiply by power-of-two constants): for the oracle
    * side of z-value queries. */
  def zvalueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(
        s"(($x // ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"(($y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")

  /** Cluster `df` into `numFiles` range partitions of the z-value,
    * sorted within each — the write-side layout whose per-file min/max
    * spans bound BOTH dimensions. */
  def clusterByZ(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.withColumn("zval", z)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
}
