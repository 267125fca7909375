package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}
import graft.functions.Exact._

/** Wave 3 — scalar function library: string / date / math / decimal /
  * array / map / json, and the reference's (value, error) column-pair
  * convention (SURVEY.md §1.2, `BitcoinBlockHandler.java:95-101,136-153`).
  *
  * Determinism rules: no transcendental libm calls except sqrt (IEEE
  * requires correct rounding for sqrt only); round-via-floor; decimal
  * for anything aggregated.
  */
object Scalars {

  val strFuncs: Q = Q(
    "q_str_funcs",
    """SELECT p_partkey,
      |  UPPER(p_name) AS name_u, LOWER(p_brand) AS brand_l,
      |  SUBSTRING(p_name, 1, 6) AS name6,
      |  LENGTH(p_name) AS name_len,
      |  CONCAT(p_brand, ':', p_type) AS brand_type,
      |  TRIM(CONCAT(' ', p_name, ' ')) AS name_trim,
      |  REPLACE(p_name, ' ', '_') AS name_us,
      |  regexp_extract(p_name, '[a-z]+', 0) AS first_word,
      |  LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) AS n_spaces,
      |  CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END AS is_widget,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.load(s, d, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("name_u"),
      lower(col("p_brand")).as("brand_l"),
      substring(col("p_name"), 1, 6).as("name6"),
      length(col("p_name")).cast(LongType).as("name_len"),
      concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
      trim(concat(lit(" "), col("p_name"), lit(" "))).as("name_trim"),
      regexp_replace(col("p_name"), " ", "_").as("name_us"),
      regexp_extract(col("p_name"), "[a-z]+", 0).as("first_word"),
      (length(col("p_name")) - length(regexp_replace(col("p_name"), " ", "")))
        .cast(LongType).as("n_spaces"),
      when(col("p_name").like("%widget%"), 1L).otherwise(0L).as("is_widget"),
      lpad(col("p_size").cast(StringType), 4, "0").as("size_pad"))
      .orderBy("p_partkey")
  }

  val dateFuncs: Q = Q(
    "q_date_funcs",
    """SELECT o_orderkey,
      |  epoch_ms(o_orderdate) AS ts_ms,
      |  CAST(o_orderdate AS DATE) AS d,
      |  EXTRACT(year FROM o_orderdate) AS y,
      |  EXTRACT(month FROM o_orderdate) AS m,
      |  EXTRACT(day FROM o_orderdate) AS dom,
      |  isodow(CAST(o_orderdate AS DATE)) AS dow_iso,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  CAST(o_orderdate AS DATE) + 30 AS d_plus30,
      |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val o = Tables.load(s, d, "orders")
    o.select(
      col("o_orderkey"),
      ms(col("o_orderdate")).as("ts_ms"),
      to_date(col("o_orderdate")).as("d"),
      year(col("o_orderdate")).cast(LongType).as("y"),
      month(col("o_orderdate")).cast(LongType).as("m"),
      dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
      (weekday(to_date(col("o_orderdate"))) + 1).cast(LongType).as("dow_iso"),
      date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
      date_add(to_date(col("o_orderdate")), 30).as("d_plus30"),
      datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast(DateType))
        .cast(LongType).as("days_since_95"))
      .orderBy("o_orderkey")
  }

  val mathFuncs: Q = Q(
    "q_math_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  ABS(l_quantity - 25) AS abs_dev,
      |  CAST(FLOOR(l_extendedprice / 100) AS BIGINT) AS price_h,
      |  CAST(CEIL(l_quantity / 7) AS BIGINT) AS qty_c,
      |  l_partkey % 7 AS pk_mod,
      |  SQRT(l_extendedprice) AS price_sqrt,
      |  l_quantity * l_quantity AS qty_sq,
      |  GREATEST(l_quantity, l_discount * 100) AS g,
      |  LEAST(l_tax, l_discount) AS l,
      |  CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents_floor,
      |  CAST(SIGN(l_quantity - 25) AS BIGINT) AS sgn
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, abs_dev, price_h, pk_mod, price_sqrt, g, l""".stripMargin) {
    (s, d) =>
    Tables.load(s, d, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_quantity") - 25).as("abs_dev"),
      floor(col("l_extendedprice") / 100).cast(LongType).as("price_h"),
      ceil(col("l_quantity") / 7).cast(LongType).as("qty_c"),
      (col("l_partkey") % 7).as("pk_mod"),
      sqrt(col("l_extendedprice")).as("price_sqrt"),
      (col("l_quantity") * col("l_quantity")).as("qty_sq"),
      greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
      least(col("l_tax"), col("l_discount")).as("l"),
      floor(col("l_extendedprice") * 100).cast(LongType).as("cents_floor"),
      signum(col("l_quantity") - 25).cast(LongType).as("sgn"))
      .orderBy("l_orderkey", "l_linenumber", "abs_dev", "price_h", "pk_mod",
        "price_sqrt", "g", "l")
  }

  /** Satoshi-style exact money: 2dp double -> integer cents (satoshis) ->
    * DECIMAL(16,8)-exact BTC-like value (analog of `output_satoshis`
    * long, `BQRow.avsc:19`, and the DECIMAL(16,8) mapping SURVEY §1.3). */
  val decimalBtc: Q = Q(
    "q_decimal_btc",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS satoshis,
      |  CAST(CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS DECIMAL(30,8))
      |       / 100000000 AS DOUBLE) AS btc_value
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, satoshis""".stripMargin) { (s, d) =>
    val sat = round(col("l_extendedprice") * 100, 0).cast(LongType)
    Tables.load(s, d, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      sat.as("satoshis"),
      (sat.cast(DecimalType(30, 8)) / lit(100000000L)).cast(DoubleType).as("btc_value"))
      .orderBy("l_orderkey", "l_linenumber", "satoshis")
  }

  val arrayFuncs: Q = Q(
    "q_array_funcs",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  len(toks) AS n_tokens,
      |  len(list_distinct(toks)) AS n_distinct,
      |  array_to_string(list_slice(toks, 1, 3), '|') AS first3,
      |  list_contains(toks, 'spark') AS has_spark,
      |  array_to_string(list_sort(list_slice(toks, 1, 5)), '|') AS first5_sorted,
      |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_len
      |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = split(col("text"), " ")
    Tables.load(s, d, "documents").select(
      col("doc_id"),
      size(toks).cast(LongType).as("n_tokens"),
      size(array_distinct(toks)).cast(LongType).as("n_distinct"),
      concat_ws("|", slice(toks, 1, 3)).as("first3"),
      array_contains(toks, "spark").as("has_spark"),
      concat_ws("|", array_sort(slice(toks, 1, 5))).as("first5_sorted"),
      aggregate(transform(toks, x => length(x)), lit(0), (acc, x) => acc + x)
        .cast(LongType).as("total_len"))
      .orderBy("doc_id")
  }

  /** Map build + lookup. DuckDB map extraction yields a LIST, hence the
    * `[1]` unwrap on the oracle side only. */
  val mapFuncs: Q = Q(
    "q_map_funcs",
    """WITH t AS (SELECT l_orderkey, l_linenumber,
      |  map(['qty', 'disc_pct'],
      |      [CAST(l_quantity AS BIGINT), CAST(l_discount * 100 AS BIGINT)]) AS m
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber,
      |  m['qty'][1] AS qty_from_map,
      |  m['disc_pct'][1] AS disc_from_map,
      |  CAST(cardinality(m) AS BIGINT) AS m_size,
      |  array_to_string(list_sort(map_keys(m)), '|') AS keys_sorted
      |FROM t ORDER BY l_orderkey, l_linenumber, qty_from_map, disc_from_map""".stripMargin) {
    (s, d) =>
    val m = map(
      lit("qty"), col("l_quantity").cast(LongType),
      lit("disc_pct"), (col("l_discount") * 100).cast(LongType))
    Tables.load(s, d, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      element_at(m, "qty").as("qty_from_map"),
      element_at(m, "disc_pct").as("disc_from_map"),
      size(m).cast(LongType).as("m_size"),
      concat_ws("|", array_sort(map_keys(m))).as("keys_sorted"))
      .orderBy("l_orderkey", "l_linenumber", "qty_from_map", "disc_from_map")
  }

  val jsonFuncs: Q = Q(
    "q_json_funcs",
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
      |  json_extract_string(props, '$.missing') AS missing
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.load(s, d, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast(LongType).as("k_int"),
      get_json_object(col("props"), "$.missing").as("missing"))
      .orderBy("event_id")
  }

  /** The reference's (value, error) pair convention: every fallible
    * computation yields value XOR sibling error string; rows are never
    * dropped (R6, `BitcoinBlockHandler.java:95-101`). Here: a "work"
    * division that can overflow a threshold, and a strict parse. */
  val caseErrorCols: Q = Q(
    "q_case_error_cols",
    """SELECT event_id,
      |  CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) <> 0
      |       THEN CAST(FLOOR(value * 100 / CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
      |       ELSE NULL END AS work_value,
      |  CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) <> 0
      |       THEN NULL
      |       ELSE 'division by zero: k=0' END AS work_error,
      |  CASE WHEN value <= 500 THEN value ELSE NULL END AS bounded_value,
      |  CASE WHEN value <= 500 THEN NULL
      |       ELSE CONCAT('out of range: ', CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR))
      |       END AS bounded_error
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    Tables.load(s, d, "events").select(
      col("event_id"),
      when(k =!= 0, floor(col("value") * 100 / k).cast(LongType))
        .otherwise(lit(null)).as("work_value"),
      when(k =!= 0, lit(null).cast(StringType))
        .otherwise(lit("division by zero: k=0")).as("work_error"),
      when(col("value") <= 500, col("value")).otherwise(lit(null)).as("bounded_value"),
      when(col("value") <= 500, lit(null).cast(StringType))
        .otherwise(concat(lit("out of range: "),
          floor(col("value")).cast(LongType).cast(StringType))).as("bounded_error"))
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(
    strFuncs, dateFuncs, mathFuncs, decimalBtc,
    arrayFuncs, mapFuncs, jsonFuncs, caseErrorCols)
}
