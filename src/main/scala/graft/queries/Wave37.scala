package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 37 — the pricing lane's analytic consumer: a cross-exchange
  * end-of-day as-of spread (arbitrage) report over the reference's
  * five price feeds (`bitcoin_pricing/ingest_prices.sh:12-17` names
  * the exchanges; `:10` declares the (timestamp, priceUSD) series this
  * join shape exists for). The r9 verdict flagged this as the one
  * reference-anchored gap left: the reference ingests five exchange
  * series side by side but delegates every cross-series question to
  * the warehouse.
  *
  * The quote streams are derived DETERMINISTICALLY from `orders` (the
  * driver ships no prices parquet): each order is a quote on exchange
  * `o_orderkey % 5` at `epoch_ms(o_orderdate) + (o_orderkey * 104729)
  * % 86400000` — a fixed intra-day spreading hash — priced at the
  * order's exact cents. Both engines build the same streams from the
  * same rows, so the whole report hash-matches.
  */
object Wave37 {

  /** `ingest_prices.sh:12-17` exchange names; the engine CASE and the
    * oracle CASE are generated from this one list so they cannot
    * drift. */
  private val exchanges = graft.ingest.Prices.exchanges

  private def caseSql(col: String) =
    s"CASE $col " + exchanges.zipWithIndex
      .map { case (n, i) => s"WHEN $i THEN '$n'" }.mkString(" ") + " END"

  /** Daily cross-exchange spread: per exchange the END-OF-DAY as-of
    * price (last quote at or before the day's close, carried forward
    * over quoteless days — LOCF), then for each day where all five
    * exchanges are priced, the widest/narrowest exchange and the
    * spread in cents; top-20 widest-spread days.
    *
    * Shape at 100TB: the only data-sized work is ONE (exchange, day)
    * keyed rank that collapses each exchange-day to its closing quote
    * — map-side partial, perfectly keyed. Everything after runs on the
    * (days x 5) calendar dictionary: the LOCF window partitions by
    * exchange over day rows (dictionary-sized), the hi/lo argmax
    * windows partition by day over <= 5 rows. The as-of semantics ride
    * the day grid exactly like [[graft.ops.AsOf]] rides the row grid.
    */
  val priceSpreadAsof: Q = Q(
    "q_price_spread_asof",
    s"""WITH q AS (SELECT CAST(o_orderkey % 5 AS BIGINT) AS ei,
       |    epoch_ms(o_orderdate) AS day_ms, o_orderkey AS okey,
       |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
       |    epoch_ms(o_orderdate) + (o_orderkey * 104729) % 86400000 AS q_ms
       |  FROM orders),
       |eod AS (SELECT ei, day_ms, cents FROM (
       |    SELECT ei, day_ms, cents, ROW_NUMBER() OVER (
       |        PARTITION BY ei, day_ms ORDER BY q_ms DESC, okey DESC) AS rn
       |    FROM q) t WHERE rn = 1),
       |grid AS (SELECT d.day_ms, e.ei
       |  FROM (SELECT DISTINCT day_ms FROM q) d,
       |       (SELECT unnest(range(0, 5)) AS ei) e),
       |fill AS (SELECT g.day_ms, g.ei,
       |    last_value(eod.cents IGNORE NULLS) OVER (
       |      PARTITION BY g.ei ORDER BY g.day_ms
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px
       |  FROM grid g LEFT JOIN eod ON eod.ei = g.ei AND eod.day_ms = g.day_ms),
       |f AS (SELECT day_ms, ei, px,
       |    COUNT(*) OVER (PARTITION BY day_ms) AS n_priced,
       |    ROW_NUMBER() OVER (PARTITION BY day_ms ORDER BY px DESC, ei) AS rhi,
       |    ROW_NUMBER() OVER (PARTITION BY day_ms ORDER BY px ASC, ei) AS rlo
       |  FROM fill WHERE px IS NOT NULL)
       |SELECT h.day_ms // 86400000 AS day,
       |  ${caseSql("l.ei")} AS lo_exch, l.px AS lo_cents,
       |  ${caseSql("h.ei")} AS hi_exch, h.px AS hi_cents,
       |  h.px - l.px AS spread_cents
       |FROM f h JOIN f l ON l.day_ms = h.day_ms AND l.rlo = 1
       |WHERE h.rhi = 1 AND h.n_priced = 5
       |ORDER BY spread_cents DESC, day LIMIT 20""".stripMargin) { (s, d) =>
    val np = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val q = Tables.load(s, d, "orders").repartition(np)
      .select((col("o_orderkey") % 5).cast("long").as("ei"),
        graft.functions.Exact.ms(col("o_orderdate")).as("day_ms"),
        col("o_orderkey").as("okey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .withColumn("q_ms",
        col("day_ms") + (col("okey") * lit(104729L)) % lit(86400000L))
    // closing quote per (exchange, day): the one data-sized rank,
    // keyed by (ei, day_ms)
    val eod = q
      .withColumn("rn", row_number().over(
        Window.partitionBy("ei", "day_ms")
          .orderBy(col("q_ms").desc, col("okey").desc)))
      .filter(col("rn") === 1)
      .select("ei", "day_ms", "cents")
    val grid = q.select("day_ms").distinct()
      .select(col("day_ms"), explode(sequence(lit(0L), lit(4L))).as("ei"))
    val fill = grid.join(eod, Seq("ei", "day_ms"), "left")
      .select(col("day_ms"), col("ei"),
        last(col("cents"), ignoreNulls = true).over(
          Window.partitionBy("ei").orderBy("day_ms")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("px"))
    val f = fill.filter(col("px").isNotNull)
      .withColumn("n_priced",
        count(lit(1)).over(Window.partitionBy("day_ms")))
      .withColumn("rhi", row_number().over(
        Window.partitionBy("day_ms").orderBy(col("px").desc, col("ei"))))
      .withColumn("rlo", row_number().over(
        Window.partitionBy("day_ms").orderBy(col("px").asc, col("ei"))))
    val hi = f.filter(col("rhi") === 1 && col("n_priced") === 5)
      .select(col("day_ms"), col("ei").as("hi_ei"), col("px").as("hi_cents"))
    val lo = f.filter(col("rlo") === 1)
      .select(col("day_ms"), col("ei").as("lo_ei"), col("px").as("lo_cents"))
    hi.join(lo, "day_ms")
      .select(expr("day_ms div 86400000").as("day"),
        expr(caseSql("lo_ei")).as("lo_exch"), col("lo_cents"),
        expr(caseSql("hi_ei")).as("hi_exch"), col("hi_cents"),
        (col("hi_cents") - col("lo_cents")).as("spread_cents"))
      .orderBy(col("spread_cents").desc, col("day"))
      .limit(20)
  }

  val all: Seq[Q] = Seq(priceSpreadAsof)
}
