package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.{Q, Tables}
import graft.functions.Exact._
import graft.ops.{AsOf, Sessionize}

/** Wave 2b — window functions, time bucketing, sessionization, and the
  * time-oriented joins (range, as-of). All timestamp arithmetic is done
  * in epoch-ms longs so Spark (us) and DuckDB (ns) agree exactly.
  */
object Windows {

  val rank_ : Q = Q(
    "q_window_rank",
    """SELECT o_custkey, o_orderkey, o_orderpriority,
      |  RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rnk,
      |  DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drnk,
      |  ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                     ORDER BY o_orderpriority, o_orderkey) AS rn
      |FROM orders ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val byPrio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    val full = Window.partitionBy("o_custkey").orderBy("o_orderpriority", "o_orderkey")
    Tables.load(s, d, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
        rank().over(byPrio).as("rnk"),
        dense_rank().over(byPrio).as("drnk"),
        row_number().over(full).as("rn"))
      .orderBy("o_custkey", "rn")
  }

  val lagLead: Q = Q(
    "q_window_lag_lead",
    """SELECT event_id, user_id,
      |  LAG(event_id) OVER w AS prev_id,
      |  LEAD(event_id) OVER w AS next_id,
      |  epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w AS gap_ms
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = Tables.load(s, d, "events").withColumn("__ms", ms(col("ts")))
    val w = Window.partitionBy("user_id").orderBy("__ms", "event_id")
    ev.select(
      col("event_id"), col("user_id"),
      lag(col("event_id"), 1).over(w).as("prev_id"),
      lead(col("event_id"), 1).over(w).as("next_id"),
      (col("__ms") - lag(col("__ms"), 1).over(w)).as("gap_ms"))
      .orderBy("event_id")
  }

  /** Running (cumulative) revenue per customer — the sum runs in exact
    * decimal so the running values are order-of-evaluation independent
    * (DuckDB uses segment trees for window aggs; double would drift). */
  val rowsFrame: Q = Q(
    "q_window_frame",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate), o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders ORDER BY o_custkey, epoch_ms(o_orderdate), o_orderkey""".stripMargin) {
    (s, d) =>
      val o = Tables.load(s, d, "orders").withColumn("__ms", ms(col("o_orderdate")))
      val w = Window.partitionBy("o_custkey").orderBy("__ms", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(
        col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast(DoubleType).as("running_spend"),
        col("__ms"))
        .orderBy("o_custkey", "__ms", "o_orderkey")
        .drop("__ms")
  }

  /** Sliding 7-day window per user via a RANGE frame on epoch-ms. */
  val rangeFrame: Q = Q(
    "q_window_range_frame",
    """SELECT event_id, user_id,
      |  COUNT(*) OVER w AS n_7d,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |             RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = Tables.load(s, d, "events").withColumn("__ms", ms(col("ts")))
    val w = Window.partitionBy("user_id").orderBy(col("__ms"))
      .rangeBetween(-604800000L, Window.currentRow)
    ev.select(
      col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("n_7d"),
      sum(dec(col("value"))).over(w).cast(DoubleType).as("sum_7d"))
      .orderBy("event_id")
  }

  /** Tumbling 10-minute buckets — batch semantics of the reference's
    * rotation-window id `epochSec / rotationTime` (`AvroWriter.java:45-49`). */
  val tumblingBatch: Q = Q(
    "q_tumbling_batch",
    """SELECT epoch_ms(ts) // 600000 AS bucket_id,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
      |FROM events GROUP BY bucket_id ORDER BY bucket_id""".stripMargin) { (s, d) =>
    Tables.load(s, d, "events")
      .groupBy(graft.functions.Exact.bucket(ms(col("ts")), 600000L).as("bucket_id"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .orderBy("bucket_id")
  }

  /** Gap-based sessions (30-min inactivity) over the events stream. */
  val sessionize: Q = Q(
    "q_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |    CASE WHEN LAG(epoch_ms(ts)) OVER w IS NULL
      |           OR epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 1800000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
      |s AS (
      |  SELECT user_id, event_id, ms,
      |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM e)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |       MIN(ms) AS start_ms, MAX(ms) AS end_ms
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    val ev = Tables.load(s, d, "events").withColumn("__ms", ms(col("ts")))
    Sessionize.withSessionId(ev, col("user_id"), col("__ms"), col("event_id"),
      gapMs = 1800000L)
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__ms")).as("start_ms"),
        max(col("__ms")).as("end_ms"))
      .orderBy("user_id", "session_id")
  }

  /** Band (theta) join, equi-key-bounded so it scales: pairs are bounded
    * per nation, the pattern for making range joins 100TB-safe. */
  val joinRange: Q = Q(
    "q_join_range",
    """SELECT s_nationkey AS nationkey, COUNT(*) AS n_pairs,
      |  MIN(s_suppkey) AS min_supp, MAX(c_custkey) AS max_cust
      |FROM supplier JOIN customer
      |  ON s_nationkey = c_nationkey
      | AND c_acctbal BETWEEN s_acctbal - 10 AND s_acctbal + 10
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, d) =>
    val sup = Tables.load(s, d, "supplier")
    val cust = Tables.load(s, d, "customer")
    sup.join(cust,
      col("s_nationkey") === col("c_nationkey") &&
        col("c_acctbal").between(col("s_acctbal") - 10, col("s_acctbal") + 10))
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(
        count(lit(1)).as("n_pairs"),
        min(col("s_suppkey")).as("min_supp"),
        max(col("c_custkey")).as("max_cust"))
      .orderBy("nationkey")
  }

  /** As-of join: each purchase matched to the user's latest signup at or
    * before it (the reference's pricing-join shape, `ingest_prices.sh:10`).
    * Oracle uses the naive range-join+rank form; the engine uses the
    * single-shuffle union+last_value pattern ([[graft.ops.AsOf]]). */
  val joinAsOf: Q = Q(
    "q_join_asof",
    """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS p_ms
      |           FROM events WHERE event_type = 'purchase'),
      |     l AS (SELECT event_id AS signup_id, user_id, epoch_ms(ts) AS s_ms
      |           FROM events WHERE event_type = 'signup')
      |SELECT event_id, user_id, signup_id, p_ms - s_ms AS gap_ms FROM (
      |  SELECT p.event_id, p.user_id, l.signup_id, p.p_ms, l.s_ms,
      |    ROW_NUMBER() OVER (PARTITION BY p.event_id
      |                       ORDER BY l.s_ms DESC, l.signup_id DESC) AS rn
      |  FROM p JOIN l ON p.user_id = l.user_id AND l.s_ms <= p.p_ms)
      |WHERE rn = 1 ORDER BY event_id""".stripMargin) { (s, d) =>
    val ev = Tables.load(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), ms(col("ts")).as("p_ms"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"), ms(col("ts")).as("s_ms"))
    AsOf.join(purchases, signups,
      key = "user_id", leftTsMs = "p_ms", rightTsMs = "s_ms",
      rightVals = Seq("signup_id", "s_ms"), rightTiebreak = "signup_id")
      .filter(col("signup_id").isNotNull) // inner as-of: drop unmatched
      .select(
        col("event_id"), col("user_id"), col("signup_id"),
        (col("p_ms") - col("s_ms")).cast(LongType).as("gap_ms"))
      .orderBy("event_id")
  }

  /** Distribution ranks (ntile / percent_rank / cume_dist) for
    * quantile bucketing — the dataset-split primitive that assigns
    * stable quartiles per segment. The window orders by a UNIQUE key
    * pair so tie semantics never differ between engines; the two
    * fractional ranks are single IEEE divisions of exact integers, so
    * they are bit-identical cross-engine. */
  val distRanks: Q = Q(
    "q_window_ntile",
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |  NTILE(4) OVER w AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    Tables.load(s, d, "customer")
      .select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("c_custkey")
  }

  /** Time-series gap filling: a generated hourly calendar spine per
    * event type, empty hours zero-filled, and the last observed hourly
    * max id carried forward (LOCF) — the resample/fill step every
    * time-series feature pipeline needs (the reference's rotation
    * buckets, `AvroWriter.java:45-49`, simply skip empty windows).
    * Integer epoch-hour buckets only; the spine is (types x hours), a
    * broadcast-stats explode, so nothing but the per-hour aggregate
    * ever shuffles. */
  val tsGapfill: Q = Q(
    "q_ts_gapfill",
    """WITH d AS (SELECT event_type, epoch_ms(ts) // 3600000 AS hr, event_id
      |  FROM events),
      |a AS (SELECT event_type, hr, COUNT(*) AS n, MAX(event_id) AS max_id
      |      FROM d GROUP BY event_type, hr),
      |st AS (SELECT MIN(hr) AS mn, MAX(hr) AS mx FROM d),
      |spine AS (SELECT t.event_type, s.hr
      |          FROM (SELECT DISTINCT event_type FROM d) t,
      |               (SELECT unnest(range(mn, mx + 1)) AS hr FROM st) s)
      |SELECT sp.event_type, sp.hr, COALESCE(a.n, 0) AS n,
      |  last_value(a.max_id IGNORE NULLS) OVER (
      |    PARTITION BY sp.event_type ORDER BY sp.hr
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_seen_id
      |FROM spine sp LEFT JOIN a
      |  ON sp.event_type = a.event_type AND sp.hr = a.hr
      |ORDER BY sp.event_type, sp.hr""".stripMargin) { (s, d) =>
    val ev = Tables.load(s, d, "events")
      .select(col("event_type"),
        graft.functions.Exact.bucket(ms(col("ts")), 3600000L).as("hr"),
        col("event_id"))
    val agg = ev.groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_id"))
    val st = ev.agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
    val spine = ev.select("event_type").distinct()
      .crossJoin(broadcast(st))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"))).as("hr"))
    spine.join(agg, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("max_id"), ignoreNulls = true).over(
          Window.partitionBy("event_type").orderBy("hr")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("last_seen_id"))
      .orderBy("event_type", "hr")
  }

  /** SCD2 point-in-time join ([[graft.ops.Scd2]]): `view` events are a
    * user's versioned state (value = the state payload), versioned with
    * `[valid_from, valid_to)` intervals via one lead() window; each
    * `purchase` fact joins the version valid at its timestamp. Distinct
    * from q_join_asof in that the HISTORY is materialized (reusable
    * across many fact tables) and the join is interval containment, not
    * latest-at-or-before — a fact before the first version drops out.
    */
  val joinScd2: Q = Q(
    "q_join_scd2",
    """WITH dim AS (
      |  SELECT user_id, event_id AS dim_event_id, value AS state_value,
      |    epoch_ms(ts) AS valid_from_ms,
      |    COALESCE(LEAD(epoch_ms(ts)) OVER (PARTITION BY user_id
      |        ORDER BY epoch_ms(ts), event_id), 9223372036854775807) AS valid_to_ms
      |  FROM events WHERE event_type = 'view'),
      |f AS (SELECT event_id, user_id, epoch_ms(ts) AS f_ms
      |      FROM events WHERE event_type = 'purchase')
      |SELECT f.event_id, f.user_id, dim.dim_event_id, dim.state_value,
      |       dim.valid_from_ms, f.f_ms - dim.valid_from_ms AS state_age_ms
      |FROM f JOIN dim
      |  ON f.user_id = dim.user_id
      | AND f.f_ms >= dim.valid_from_ms AND f.f_ms < dim.valid_to_ms
      |ORDER BY f.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.load(s, d, "events")
    val changes = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("dim_event_id"),
        col("value").as("state_value"), ms(col("ts")).as("__ms"))
    val hist = graft.ops.Scd2.buildHistory(
      changes, key = "user_id", tsMs = "__ms", tiebreak = "dim_event_id")
      .drop("__ms")
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), ms(col("ts")).as("f_ms"))
    graft.ops.Scd2.pointInTime(facts, hist, key = "user_id", factTsMs = "f_ms")
      .select(col("event_id"), col("user_id"), col("dim_event_id"),
        col("state_value"), col("valid_from_ms"),
        (col("f_ms") - col("valid_from_ms")).cast(LongType).as("state_age_ms"))
      .orderBy("event_id")
  }

  /** Interval-overlap join: each 2h click window matched to the same
    * user's overlapping 2h error windows (half-open [s, e),
    * `a_s < b_e AND b_s < a_e`). Spark has no native interval join, and
    * the naive theta join is quadratic per user — so the engine BINS
    * each interval into the fixed-width buckets it spans (bin width =
    * interval width, so each interval lands in at most 2 bins), equi-
    * joins on (user, bin), dedups the two-bin double-matches, and only
    * then applies the exact overlap predicate — the standard trick for
    * making interval joins shuffle-partitionable at 100TB. The oracle
    * is the naive theta join; results must agree exactly. */
  val joinIntervalOverlap: Q = {
    val D = 7200000L // 2h windows; also the bin width
    Q(
      "q_join_interval_overlap",
      s"""WITH a AS (SELECT event_id AS a_id, user_id, epoch_ms(ts) AS a_s,
         |             epoch_ms(ts) + $D AS a_e
         |           FROM events WHERE event_type = 'click'),
         |     b AS (SELECT event_id AS b_id, user_id, epoch_ms(ts) AS b_s,
         |             epoch_ms(ts) + $D AS b_e
         |           FROM events WHERE event_type = 'error')
         |SELECT a_id, b_id, a.user_id,
         |       LEAST(a_e, b_e) - GREATEST(a_s, b_s) AS overlap_ms
         |FROM a JOIN b ON a.user_id = b.user_id
         |  AND a.a_s < b.b_e AND b.b_s < a.a_e
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      val ev = Tables.load(s, d, "events")
      def side(t: String, p: String) = ev.filter(col("event_type") === t)
        .select(col("event_id").as(s"${p}_id"),
          col("user_id").as(s"${p}_uid"),
          ms(col("ts")).as(s"${p}_s"),
          (ms(col("ts")) + D).as(s"${p}_e"))
        .withColumn(s"${p}_bin", explode(sequence(
          graft.functions.Exact.bucket(col(s"${p}_s"), D),
          graft.functions.Exact.bucket(col(s"${p}_e") - 1, D))))
      side("click", "a")
        .join(side("error", "b"),
          col("a_uid") === col("b_uid") && col("a_bin") === col("b_bin"))
        .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
        .select(col("a_id"), col("b_id"), col("a_uid").as("user_id"),
          (least(col("a_e"), col("b_e")) -
            greatest(col("a_s"), col("b_s"))).as("overlap_ms"))
        .distinct() // a pair can meet in both of its two bins
        .orderBy("a_id", "b_id")
    }
  }

  /** Last-touch marketing attribution: every purchase is credited to
    * the user's most recent STRICTLY-PRIOR click, or left unattributed
    * — the self-as-of join every attribution pipeline runs, expressed
    * as one running MAX over a packed (ms, event_id) sort key (base
    * 2024-01-01, ·10⁷ + event_id: room for a year of millis and 10M
    * events before BIGINT pressure). Packing makes the "latest prior
    * click" a scalar window max that both engines compute identically;
    * the strictly-prior frame (UNBOUNDED PRECEDING .. 1 PRECEDING)
    * excludes same-row self-attribution by construction.
    *
    * Shape at 100TB: ONE shuffle on the user key, one sort, one
    * running max — the event stream never joins itself. */
  val attributionLastTouch: Q = {
    val base = 1704067200000L
    Q(
      "q_attribution_last_touch",
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |    (epoch_ms(ts) - $base) * 10000000 + event_id AS k,
         |    epoch_ms(ts) AS ms
         |  FROM events),
         |w AS (SELECT user_id, event_id, event_type, ms,
         |    MAX(CASE WHEN event_type = 'click' THEN k END)
         |      OVER (PARTITION BY user_id ORDER BY k
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS ck
         |  FROM e)
         |SELECT event_id AS purchase_id, user_id, ms AS purchase_ms,
         |  ck % 10000000 AS click_id,
         |  ck // 10000000 + $base AS click_ms,
         |  ms - (ck // 10000000 + $base) AS gap_ms
         |FROM w WHERE event_type = 'purchase'
         |ORDER BY purchase_id""".stripMargin) { (s, d) =>
      val byUser = Window.partitionBy("user_id").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          ((ms(col("ts")) - base) * 10000000L + col("event_id")).as("k"),
          ms(col("ts")).as("ms"))
        .withColumn("ck",
          max(when(col("event_type") === "click", col("k"))).over(byUser))
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ms").as("purchase_ms"),
          (col("ck") % 10000000L).as("click_id"),
          expr(s"ck div 10000000 + $base").as("click_ms"),
          (col("ms") - expr(s"ck div 10000000 + $base")).as("gap_ms"))
        .orderBy("purchase_id")
    }
  }

  /** OHLC time-series resampling: per (event_type, hour) the open /
    * high / low / close of the event value in exact integer cents —
    * the financial-downsampling primitive. Open and close come from
    * ONE struct-ordered min/max over the unique (ms, event_id, cents)
    * triple (lexicographic struct ordering = the time order, cents
    * riding along), so no window pass and no self-join; the oracle
    * replays the same selection with rank-1 windows, proving the
    * struct-min/max formulation picks the identical rows.
    *
    * Shape at 100TB: one partial-aggregated shuffle to (type, hour)
    * cells — O-H-L-C state is 4 mergeable scalars per cell. */
  val tsOhlc: Q = Q(
    "q_ts_ohlc",
    """WITH e AS (SELECT event_type, epoch_ms(ts) // 3600000 AS hr,
      |    epoch_ms(ts) AS ms, event_id,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |r AS (SELECT event_type, hr, cents,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, hr
      |                       ORDER BY ms, event_id) AS rf,
      |    ROW_NUMBER() OVER (PARTITION BY event_type, hr
      |                       ORDER BY ms DESC, event_id DESC) AS rl
      |  FROM e),
      |agg AS (SELECT event_type, hr, COUNT(*) AS n,
      |          MAX(cents) AS high, MIN(cents) AS low
      |        FROM e GROUP BY 1, 2)
      |SELECT a.event_type, a.hr, a.n,
      |  f.cents AS open, a.high, a.low, l.cents AS close
      |FROM agg a
      |JOIN r f ON f.event_type = a.event_type AND f.hr = a.hr AND f.rf = 1
      |JOIN r l ON l.event_type = a.event_type AND l.hr = a.hr AND l.rl = 1
      |ORDER BY a.event_type, a.hr""".stripMargin) { (s, d) =>
    Tables.load(s, d, "events")
      .select(col("event_type"),
        graft.functions.Exact.bucket(ms(col("ts")), 3600000L).as("hr"),
        ms(col("ts")).as("ms"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n"),
        min(struct(col("ms"), col("event_id"), col("cents")))
          .getField("cents").as("open"),
        max(col("cents")).as("high"),
        min(col("cents")).as("low"),
        max(struct(col("ms"), col("event_id"), col("cents")))
          .getField("cents").as("close"))
      .select("event_type", "hr", "n", "open", "high", "low", "close")
      .orderBy("event_type", "hr")
  }

  val all: Seq[Q] = Seq(
    rank_, lagLead, rowsFrame, rangeFrame,
    tumblingBatch, sessionize, joinRange, joinAsOf, distRanks, tsGapfill,
    joinScd2, joinIntervalOverlap, attributionLastTouch, tsOhlc)
}
