package graft.queries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.{Base58, WeightedAvg}

/** Wave 4c — user-defined function surface: typed UDAF and the base58
  * address UDF (SURVEY.md §2.B `u_udaf_weighted` / `u_udf_base58`).
  */
object Udfs {

  /** Volume-weighted average via the [[WeightedAvg]] Aggregator. The
    * oracle is the algebraic equivalent in exact integer cents:
    * sum(vc*wc)/100/sum(wc) — the same arithmetic the Aggregator does. */
  val udafWeighted: Q = Q(
    "q_udaf_weighted",
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
      |           * CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
      |    / 100 / CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
      |    AS wavg_price,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
      implicit val inEnc: Encoder[(Double, Double)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
      val wavg = udaf(WeightedAvg)
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
  }

  /** Base58Check address derivation from deterministic pseudo-hash160
    * payloads (md5(text) 16 bytes, zero-padded to 20). DuckDB has no
    * base58, so correctness is golden-vector ScalaTest (Base58Spec);
    * the query itself is the driver-visible rows-only entry. */
  val udfBase58: Q = Q.noOracle("q_udf_base58") { (s, d) =>
    val b58 = udf((bytes: Array[Byte]) =>
      Base58.encodeChecked(0x00.toByte, bytes.padTo(20, 0x00.toByte)))
    Tables.load(s, d, "documents")
      .select(col("doc_id"), to_binary(md5(col("text")), lit("hex")).as("h"))
      .select(col("doc_id"), b58(col("h")).as("address"))
      .orderBy("doc_id")
  }

  /** Multimodal binary-column pipeline (decode-stub -> features) over
    * synthetic payloads; plumbing is real, codec is stubbed
    * ([[graft.multimodal.Multimodal]]). Rows-only check (no oracle).
    * The driver-visible projection is scalar-only: the float feature
    * vector is serialized as fixed-point longs (floor(x*1e6)) so the
    * checker never sees an array column and the string is
    * float-formatting-independent. */
  val multimodalDecode: Q = Q.noOracle("q_multimodal_decode") { (s, d) =>
    import graft.multimodal.Multimodal
    val decoded = Multimodal.decode(s, Multimodal.assetsFromDocuments(s, d))
    Multimodal.extractFeatures(s, decoded)
      .select(
        col("asset_id"),
        concat_ws("|",
          transform(col("features"),
            x => floor(x.cast("double") * 1e6).cast("long").cast("string")))
          .as("features_fx"),
        col("width"), col("height"))
      .orderBy("asset_id")
  }

  /** The reference's etl.sh on the golden BQRow fixture — reference-
    * fidelity surface (schema + quirks), rows-only check: the fixture
    * is hand-built, not driver data, so no DuckDB oracle. Expected
    * output is hand-verified in BitcoinSpec. */
  val bitcoinEtlGolden: Q = Q.noOracle("q_bitcoin_etl_golden") { (s, _) =>
    // Driver-visible projection is scalar-only: the nested input/output
    // struct arrays are serialized via to_json (binary -> base64 inside).
    graft.ingest.Bitcoin.etl(graft.ingest.Bitcoin.goldenBlocks(s))
      .withColumn("inputs", to_json(col("inputs")))
      .withColumn("outputs", to_json(col("outputs")))
      .orderBy("block_id", "transaction_id")
  }

  val all: Seq[Q] = Seq(udafWeighted, udfBase58, multimodalDecode, bitcoinEtlGolden)
}
