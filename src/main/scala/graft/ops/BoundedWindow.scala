package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.{hash, lit, pmod}

/** Global window over a frame that is BOUNDED BY CONSTRUCTION —
  * vocabulary terms, bootstrap replicas, recursion steps, calendar
  * days: cardinalities fixed by a dictionary / parameter / time span,
  * not by the data volume. A single partition IS the right plan for
  * these, but `Window.orderBy(...)` with no partition spec emits
  * Spark's "No Partition Defined ... serious performance degradation"
  * warning, which is indistinguishable in logs from a genuinely
  * data-sized global window (the 100TB foot-gun [[RankedPrefix]]
  * exists for).
  *
  * `single` pins an explicit constant partition key instead: same
  * single-partition execution, but the plan carries a partition spec —
  * so every surviving unpartitioned `WindowExec` in the registry is a
  * real defect, and PlanShapeSpec can assert there are none. Call
  * sites using this helper are asserting "this frame is bounded";
  * data-sized frames must use [[RankedPrefix]] / [[Packing]].
  *
  * The key is `pmod(hash(ref), 1)` — 0 for every row (hash is
  * non-nullable, pmod-by-1 is identically zero) but NON-FOLDABLE,
  * because Spark 4's `EliminateWindowPartitions` optimizer rule strips
  * foldable partition keys (a plain `lit(0)` lands right back in the
  * warning path). `ref` is the first order column, so the key adds no
  * new column dependency.
  */
object BoundedWindow {
  private def zeroKey(ref: Column): Column = pmod(hash(ref), lit(1))

  /** `ref` must be a PLAIN column reference (not a `.desc`/`.asc`
    * sort order — SortOrder is not evaluable inside hash). */
  def singleRef(ref: Column, order: Column*): WindowSpec =
    Window.partitionBy(zeroKey(ref)).orderBy(order: _*)

  /** Convenience for all-ascending specs: derives the key from the
    * first order column (which must then be a plain reference). */
  def single(order: Column*): WindowSpec =
    Window.partitionBy(zeroKey(order.head)).orderBy(order: _*)

  /** Unordered whole-frame spec (`COUNT(*) OVER ()` style) for bounded
    * frames; `ref` is any existing column (only its hash's pmod-1 —
    * identically zero — enters the partition spec). */
  def all(ref: Column): WindowSpec = Window.partitionBy(zeroKey(ref))
}
