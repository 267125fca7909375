package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.ingest.{AvroSink, Bitcoin}

/** Golden-fixture spec (FIXTURES.md §1): every reference quirk on the
  * exact BQRow schema, flagship ETL output checked by hand. */
class BitcoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private lazy val blocks = Bitcoin.goldenBlocks(spark).cache()
  private lazy val etl = Bitcoin.etl(blocks).cache()

  test("schema is the BQRow schema, quirks included") {
    val f = Bitcoin.blockSchema.fieldNames.toSeq
    assert(f.contains("difficultyTarget")) // camelCase preserved (BQRow.avsc:44)
    assert(Bitcoin.blockSchema("timestamp").dataType.typeName == "long") // ms as long
    assert(!Bitcoin.blockSchema("transactions").nullable) // [] never null
    assert(Bitcoin.outputSchema("output_satoshis").nullable) // BQRow.avsc:19
  }

  test("work_terahash divides by 1e11 (not 1e12) and overflows to work_error") {
    assert(Bitcoin.TerahashDivisor == BigInt("100000000000"))
    assert(Bitcoin.workTerahash(BigInt("200000000000")) == (Some(2L), None))
    val (v, e) = Bitcoin.workTerahash(BigInt(2).pow(100))
    assert(v.isEmpty && e.nonEmpty) // ArithmeticException message captured
  }

  test("etl output: dedup keeps one b1; empty-tx b2 VANISHES under inner unnest") {
    val ids = etl.select("block_id").collect().map(_.getString(0))
    assert(ids.count(_ == "b1") == 1) // duplicate removed (etl.sh:12-17)
    assert(!ids.contains("b2")) // inner unnest row loss (etl.sh:32-33)
    assert(ids.sorted.toSeq == Seq("b1", "b3", "b4", "b5", "b5")) // b5 has 2 txs
  }

  test("etl projection: exact etl.sh:20-29 column order, difficultyTarget dropped") {
    assert(etl.columns.toSeq == Seq(
      "timestamp", "transaction_id", "inputs", "outputs",
      "block_id", "previous_block", "merkle_root",
      "nonce", "version", "work_terahash", "work_error"))
    assert(!etl.columns.contains("difficultyTarget"))
    assert(!etl.columns.contains("row_number"))
  }

  test("coinbase input carries empty-string pubkey, not null") {
    val b1 = etl.filter(etl("block_id") === "b1").head
    val inputs = b1.getSeq[Row](b1.fieldIndex("inputs"))
    assert(inputs.head.getAs[String]("input_pubkey_base58") == "")
  }

  test("script error rows keep value null + error populated; null satoshis survive") {
    val b3 = etl.filter(etl("block_id") === "b3").head
    val in0 = b3.getSeq[Row](b3.fieldIndex("inputs")).head
    assert(in0.getAs[String]("input_script_string") == null)
    assert(in0.getAs[String]("input_script_string_error") ==
      "Push of data element that is larger than remaining data")
    val out0 = b3.getSeq[Row](b3.fieldIndex("outputs")).head
    assert(out0.isNullAt(out0.fieldIndex("output_satoshis")))
  }

  test("work overflow block lands in etl with null value + error") {
    val b4 = etl.filter(etl("block_id") === "b4").head
    assert(b4.isNullAt(b4.fieldIndex("work_terahash")))
    assert(b4.getAs[String]("work_error") != null)
  }

  test("BlockEtl pipeline: re-running appends duplicates, the dedup ETL repairs them") {
    val work = java.nio.file.Files.createTempDirectory("blocketl").toString
    val r1 = graft.ingest.BlockEtl.run(spark, blocks.toDF(), work, rotationSeconds = 600)
    assert(r1.avroFiles > 0)
    assert(r1.warehouseRows == 6) // 5 blocks + the duplicated b1
    assert(r1.etlRows == 5) // dedup keeps one b1; empty b2 vanishes
    // the at-least-once append: a re-run doubles the warehouse but the
    // REPLACE'd ETL output is unchanged — etl.sh's whole reason to exist
    val r2 = graft.ingest.BlockEtl.run(spark, blocks.toDF(), work, rotationSeconds = 600)
    assert(r2.warehouseRows == 12)
    assert(r2.etlRows == 5)
  }

  test("nested blocks round-trip through the rotated Avro sink") {
    val dir = java.nio.file.Files.createTempDirectory("btcavro").toString
    AvroSink.write(blocks.toDF(), "timestamp", rotationSeconds = 86400, outDir = dir)
    val rows = AvroSink.readAll(dir)
    assert(rows.size == 6) // 5 distinct blocks + the duplicated b1 (sink is pre-dedup)
    assert(rows.map(_("block_id").toString).toSet ==
      Set("b1", "b2", "b3", "b4", "b5"))
    val b5 = rows.find(_("block_id").toString == "b5").get
    val txs = b5("transactions").asInstanceOf[java.util.List[_]]
    assert(txs.size == 2) // nested array survived the avro round-trip
  }
}
