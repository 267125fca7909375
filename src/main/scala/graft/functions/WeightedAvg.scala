package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: volume-weighted average (the natural aggregate over the
  * reference's price tables — (timestamp, priceUSD, volumeBTC),
  * `bitcoin_pricing/ingest_prices.sh:10`).
  *
  * Accumulates in scaled longs (inputs have <= 2dp), so partial
  * aggregation is exact and merge order-free — the same determinism
  * stance as [[Exact]], but demonstrated through the Aggregator API.
  */
object WeightedAvg extends Aggregator[(Double, Double), (Long, Long), Double] {
  private def cents(x: Double): Long = math.round(x * 100)

  def zero: (Long, Long) = (0L, 0L)
  def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
    val (vSum, wSum) = b
    val (v, w) = in
    (vSum + cents(v) * cents(w), wSum + cents(w))
  }
  def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  def finish(b: (Long, Long)): Double =
    if (b._2 == 0) Double.NaN else (b._1.toDouble / 100.0) / b._2.toDouble
  def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
