package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's canonical data model and ETL, verbatim semantics.
  *
  * Schema: `BQRow.avsc:1-51` / `BigquerySchema.java:12-72` via
  * FIXTURES.md §1 — including the deliberate quirks we preserve:
  *  - `timestamp` is epoch-millis as a plain BIGINT (`BQRow.avsc:43`);
  *  - `difficultyTarget` stays camelCase (`BQRow.avsc:44`);
  *  - `work_terahash` divides chain work by 1e11, NOT 1e12
  *    (`BitcoinBlockHandler.java:39` — `10.0E+10`), overflow lands in
  *    `work_error` (`:95-101`);
  *  - coinbase inputs get pubkey "" (empty string), never null
  *    (`:144-145`);
  *  - `transactions` is [] for empty blocks, never null (`:103-104`);
  *  - `output_satoshis` is the one nullable-long money field
  *    (`BQRow.avsc:19`).
  */
object Bitcoin {

  val inputSchema: StructType = StructType(Seq(
    StructField("input_script_bytes", BinaryType, nullable = true),
    StructField("input_script_string", StringType, nullable = true),
    StructField("input_script_string_error", StringType, nullable = true),
    StructField("input_sequence_number", LongType, nullable = false),
    StructField("input_pubkey_base58", StringType, nullable = true),
    StructField("input_pubkey_base58_error", StringType, nullable = true)))

  val outputSchema: StructType = StructType(Seq(
    StructField("output_satoshis", LongType, nullable = true),
    StructField("output_script_bytes", BinaryType, nullable = true),
    StructField("output_script_string", StringType, nullable = true),
    StructField("output_script_string_error", StringType, nullable = true),
    StructField("output_pubkey_base58", StringType, nullable = true),
    StructField("output_pubkey_base58_error", StringType, nullable = true)))

  val transactionSchema: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("inputs", ArrayType(inputSchema, containsNull = false), nullable = false),
    StructField("outputs", ArrayType(outputSchema, containsNull = false), nullable = false)))

  val blockSchema: StructType = StructType(Seq(
    StructField("block_id", StringType, nullable = false),
    StructField("previous_block", StringType, nullable = false),
    StructField("merkle_root", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("difficultyTarget", LongType, nullable = false),
    StructField("nonce", LongType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("work_terahash", LongType, nullable = true),
    StructField("work_error", StringType, nullable = true),
    StructField("transactions", ArrayType(transactionSchema, containsNull = false),
      nullable = false)))

  /** `BitcoinBlockHandler.java:39` — deliberately 1e11, not 1e12. */
  val TerahashDivisor: BigInt = BigInt("100000000000")

  /** Chain work -> (work_terahash, work_error), the R4 value/error pair
    * (`BitcoinBlockHandler.java:95-101`): BigInteger division then
    * longValueExact, ArithmeticException message into the error column. */
  def workTerahash(chainWork: BigInt): (Option[Long], Option[String]) = {
    val divided = chainWork / TerahashDivisor
    try Some(divided.bigInteger.longValueExact()) -> None
    catch {
      case e: ArithmeticException => (None, Some(e.getMessage))
    }
  }

  // -- golden fixture (FIXTURES.md §1: ~6 blocks, every quirk) -----------
  // The fixture carries only RAW script bytes; every derived column
  // (script string, error, address) is computed by the real decoder
  // ([[graft.functions.BtcScript]]) exactly as the reference's
  // per-record converter does (`BitcoinBlockHandler.java:130-187`).

  import graft.functions.BtcScript

  /** Input row from raw scriptSig bytes (`BitcoinBlockHandler.java:130-157`):
    * script string + error from the decoder; coinbase pubkey is "" never
    * null (`:144-145`), others derive the P2PKH sender address. */
  private def in(script: Array[Byte], seq: Long, coinbase: Boolean = false): Row = {
    val (s, serr) = BtcScript.decodeToString(script)
    val (pk, pkerr) =
      if (coinbase) ("", null) else BtcScript.inputAddress(script)
    Row(script, s, serr, seq, pk, pkerr)
  }

  /** Output row from raw scriptPubKey bytes (`BitcoinBlockHandler.java:159-187`). */
  private def out(sat: java.lang.Long, script: Array[Byte]): Row = {
    val (s, serr) = BtcScript.decodeToString(script)
    val (pk, pkerr) = BtcScript.outputAddress(script)
    Row(sat, script, s, serr, pk, pkerr)
  }

  private def tx(id: String, inputs: Seq[Row], outputs: Seq[Row]): Row =
    Row(id, inputs, outputs)

  private def hexBytes(h: String): Array[Byte] = graft.functions.Hex.hexToBytes(h)

  /** secp256k1 generator-point compressed pubkey (the classic public
    * test vector; its P2PKH address is 1BgGZ9tcN4rm9KBzDn7KprQz87SZ26SAMH). */
  private[graft] val VectorPubkeyHex =
    "0279be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798"

  /** Raw fixture scripts, parsed (never pre-decoded):
    *  CoinbaseSig: push of 2 arbitrary bytes (coinbase scripts are free-form)
    *  SpendSig:    P2PKH scriptSig = sig push + pubkey push
    *  TruncatedSig: push claims more bytes than remain -> decode error
    *  P2pkhPubkey: DUP HASH160 push20 EQUALVERIFY CHECKSIG (20 zero bytes
    *               -> the well-known address 1111111111111111111114oLvT2)
    *  P2shPubkey:  HASH160 push20 EQUAL -> a version-5 "3..." address
    */
  private[graft] val CoinbaseSig = Array[Byte](0x02, 0x01, 0x02)
  private[graft] val SpendSig: Array[Byte] =
    Array[Byte](0x08, 1, 2, 3, 4, 5, 6, 7, 8) ++
      (hexBytes("21") ++ hexBytes(VectorPubkeyHex))
  private[graft] val TruncatedSig = Array[Byte](0x05, 0x01)
  private[graft] val P2pkhPubkey: Array[Byte] =
    hexBytes("76a914" + "00" * 20 + "88ac")
  private[graft] val P2shPubkey: Array[Byte] =
    hexBytes("a914" + "00" * 20 + "87")

  /** Hand-built golden blocks:
    *  b1: normal block, coinbase "" input + one P2PKH output
    *  b1 again: full duplicate (at-least-once append, `Main.java:189-202`)
    *  b2: transactions = [] (vanishes under the inner unnest)
    *  b3: script-decode error (value null, *_error set) + null satoshis
    *  b4: work overflow -> work_error
    *  b5: two transactions (explode multiplicity; P2SH output)
    */
  def goldenBlocks(spark: SparkSession): DataFrame = {
    val coinbase = in(CoinbaseSig, 4294967295L, coinbase = true)
    val spend = in(SpendSig, 0L)
    val badScript = in(TruncatedSig, 1L)
    val pay = out(5000000000L, P2pkhPubkey)
    val nullSat = out(null, TruncatedSig)
    val payP2sh = out(1200000000L, P2shPubkey)

    val (b1wt, b1we) = workTerahash(BigInt("4295032833"))
    val b1 = Row("b1", "b0", "m1", 1230000000000L, 486604799L, 2083236893L, 1L,
      b1wt.map(Long.box).orNull, b1we.orNull,
      Seq(tx("t1", Seq(coinbase), Seq(pay))))
    val b2 = Row("b2", "b1", "m2", 1230000600000L, 486604799L, 42L, 1L,
      0L, null, Seq.empty[Row])
    val b3 = Row("b3", "b2", "m3", 1230001200000L, 486604799L, 43L, 1L,
      0L, null, Seq(tx("t3", Seq(badScript), Seq(nullSat))))
    val (owt, owe) = workTerahash(BigInt(2).pow(100))
    val b4 = Row("b4", "b3", "m4", 1230001800000L, 486604799L, 44L, 1L,
      owt.map(Long.box).orNull, owe.orNull, Seq(tx("t4", Seq(spend), Seq(pay))))
    val b5 = Row("b5", "b4", "m5", 1230002400000L, 486604799L, 45L, 1L,
      0L, null, Seq(
        tx("t5a", Seq(spend), Seq(pay)),
        tx("t5b", Seq(spend), Seq(payP2sh, nullSat))))

    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(b1, b1, b2, b3, b4, b5)), // b1 duplicated
      blockSchema)
  }

  /** The `etl.sh:5-33` query, verbatim semantics on Spark:
    * WITH dedup AS (ROW_NUMBER() OVER (PARTITION BY block_id)) ...
    * WHERE row_number = 1, JOIN UNNEST(transactions) (INNER — empty
    * blocks vanish), star-projection in the exact etl.sh:20-29 column
    * order, silently dropping `difficultyTarget` AND `row_number`. */
  def etl(blocks: DataFrame): DataFrame = {
    val w = Window.partitionBy("block_id").orderBy(lit(1)) // no ORDER BY in etl.sh:12
    blocks
      .withColumn("row_number", row_number().over(w))
      .filter(col("row_number") === 1)
      .withColumn("transactions", explode(col("transactions"))) // inner
      .select(
        col("timestamp"),
        col("transactions.transaction_id"),
        col("transactions.inputs"),
        col("transactions.outputs"),
        col("block_id"),
        col("previous_block"),
        col("merkle_root"),
        col("nonce"),
        col("version"),
        col("work_terahash"),
        col("work_error"))
  }
}
