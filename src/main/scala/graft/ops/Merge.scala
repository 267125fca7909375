package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD-1 merge (MERGE INTO semantics) for the warehouse the reference
  * maintains by blind append-then-repair (`Main.java:204-259` append,
  * `etl.sh:6-17` dedup) or full replace (`etl.sh:35-40`,
  * `ingest_prices.sh:32`): apply a batch of full-row changes — upserts
  * and deletes — in one pass, keyed by the warehouse key.
  *
  * Shape at 100TB: only the DISTINCT change KEYS probe the warehouse
  * anti-join, and the broadcast decision is left to planner stats/AQE
  * rather than forced — a cadence-bounded CDC batch (a day's changes
  * against a years-deep table) broadcasts and the warehouse never
  * shuffles, while a batch that has grown comparable to the warehouse
  * degrades to a shuffled anti-join instead of hard-failing Spark's
  * 8GB broadcast limit. The classic full-outer-join formulation would
  * hash-shuffle the entire warehouse on every merge regardless.
  */
object Merge {

  /** `changes` must carry the full target schema plus an `opCol` in
    * {"upsert","delete"}. Returns target rows whose key has no change,
    * plus the upsert rows (delete rows simply vanish).
    *
    * `broadcastKeys = true` pins the broadcast for callers that KNOW
    * the batch is bounded; the default lets stats/AQE decide (they
    * pick broadcast whenever the key set is actually small, and a
    * warehouse-sized batch degrades to a shuffled anti-join instead
    * of hard-failing the broadcast size limit).
    */
  def upsert(
      target: DataFrame,
      changes: DataFrame,
      key: String,
      opCol: String = "op",
      broadcastKeys: Boolean = false): DataFrame = {
    val keys0 = changes.select(key).distinct()
    val keys = if (broadcastKeys) broadcast(keys0) else keys0
    target
      .join(keys, Seq(key), "left_anti")
      .unionByName(changes.filter(col(opCol) === "upsert").drop(opCol))
  }
}
