package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD-1 merge (MERGE INTO semantics) for the warehouse the reference
  * maintains by blind append-then-repair (`Main.java:204-259` append,
  * `etl.sh:6-17` dedup) or full replace (`etl.sh:35-40`,
  * `ingest_prices.sh:32`): apply a batch of full-row changes — upserts
  * and deletes — in one pass, keyed by the warehouse key.
  *
  * Shape at 100TB: the changes batch is tiny next to the warehouse (a
  * day's CDC against a years-deep table), so only the DISTINCT change
  * KEYS are broadcast for the anti-join — the warehouse side never
  * shuffles and untouched rows stream straight through. The classic
  * full-outer-join formulation would hash-shuffle the entire warehouse
  * on every merge; this one scans it once with a broadcast probe.
  */
object Merge {

  /** `changes` must carry the full target schema plus an `opCol` in
    * {"upsert","delete"}. Returns target rows whose key has no change,
    * plus the upsert rows (delete rows simply vanish).
    *
    * `broadcastKeys = false` for the rare changes-batch-comparable-to-
    * warehouse case, where a shuffled anti-join is the right plan (AQE
    * still picks broadcast back up if the key set turns out small).
    */
  def upsert(
      target: DataFrame,
      changes: DataFrame,
      key: String,
      opCol: String = "op",
      broadcastKeys: Boolean = true): DataFrame = {
    val keys0 = changes.select(key).distinct()
    val keys = if (broadcastKeys) broadcast(keys0) else keys0
    target
      .join(keys, Seq(key), "left_anti")
      .unionByName(changes.filter(col(opCol) === "upsert").drop(opCol))
  }
}
