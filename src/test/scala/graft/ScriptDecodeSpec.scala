package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Base58, BtcScript, Ripemd160}
import graft.ingest.Bitcoin

/** Script decoder golden vectors: the strings/addresses are DERIVED from
  * raw script bytes by the real parser (reference semantics:
  * `BitcoinBlockHandler.java:136-141,144-153,171-184`), checked against
  * published public test vectors. */
class ScriptDecodeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("RIPEMD-160 published test vectors") {
    assert(hex(Ripemd160.digest(Array.empty[Byte])) ==
      "9c1185a5c5e9fc54612808977ee8f548b2258d31")
    assert(hex(Ripemd160.digest("abc".getBytes("UTF-8"))) ==
      "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc")
    assert(hex(Ripemd160.digest("message digest".getBytes("UTF-8"))) ==
      "5d0689ef49d2fae572b881b123a85ffa21595f36")
    // >1 block (56+ bytes) exercises multi-block padding
    assert(hex(Ripemd160.digest(
      "abcdbcdecdefdefgefghfghighijhijkijkljklmklmnlmnomnopnopq".getBytes("UTF-8"))) ==
      "12a053384a9c0c88e405a06c27dcf49ada62eb2b")
  }

  test("P2PKH scriptPubKey decodes to the bitcoinj-style display string") {
    val (s, err) = BtcScript.decodeToString(Bitcoin.P2pkhPubkey)
    assert(err == null)
    assert(s == s"DUP HASH160 PUSHDATA(20)[${"00" * 20}] EQUALVERIFY CHECKSIG")
  }

  test("P2PKH output address: 20 zero bytes -> the well-known burn address") {
    assert(BtcScript.outputAddress(Bitcoin.P2pkhPubkey) ==
      ("1111111111111111111114oLvT2", null))
  }

  test("P2SH output address is version 0x05 (leading '3')") {
    val (addr, err) = BtcScript.outputAddress(Bitcoin.P2shPubkey)
    assert(err == null && addr.startsWith("3"))
  }

  test("P2PKH scriptSig sender address from the secp256k1 generator pubkey") {
    // hash160(compressed generator pubkey) -> the classic k=1 address
    assert(hex(Ripemd160.hash160(hexBytes(Bitcoin.VectorPubkeyHex))) ==
      "751e76e8199196d454941c45d1b3a323f1433bd6")
    assert(BtcScript.inputAddress(Bitcoin.SpendSig) ==
      ("1BgGZ9tcN4rm9KBzDn7KprQz87SZ26SAMH", null))
  }

  test("non-payment scripts produce the reference's cast error") {
    // P2PK (push pubkey + CHECKSIG) has no base58 form in the reference
    val p2pk = hexBytes("21" + Bitcoin.VectorPubkeyHex + "ac")
    assert(BtcScript.outputAddress(p2pk) ==
      (null, "Cannot cast this script to a pay-to-address type"))
  }

  test("P2PKH output matches structurally, not by push encoding (bitcoinj isSentToAddress)") {
    // PUSHDATA1-wrapped 20-byte hash: same template, explicit push opcode
    val wrapped = hexBytes("76a9" + "4c14" + "00" * 20 + "88ac")
    assert(BtcScript.outputAddress(wrapped) ==
      ("1111111111111111111114oLvT2", null))
    // but P2SH stays byte-exact (bitcoinj isPayToScriptHash): a
    // PUSHDATA1-wrapped hash is NOT a P2SH output there
    val wrappedSh = hexBytes("a9" + "4c14" + "00" * 20 + "87")
    assert(BtcScript.outputAddress(wrappedSh)._1 == null)
  }

  test("scriptSig pubkey extraction follows bitcoinj getPubKey guards") {
    val pubPush = "21" + Bitcoin.VectorPubkeyHex
    // push+CHECKSIG form: the pubkey is the first (only) push
    assert(BtcScript.inputAddress(hexBytes(pubPush + "ac")) ==
      ("1BgGZ9tcN4rm9KBzDn7KprQz87SZ26SAMH", null))
    // degenerate 2-push spend (a 1-byte 'pubkey') errors instead of
    // deriving an address from garbage
    val (a, err) = BtcScript.inputAddress(hexBytes("0102" + "0103"))
    assert(a == null)
    assert(err != null && err.startsWith("Script did not match expected form"))
  }

  test("truncated pushes throw the decoder error into the (value,error) pair") {
    val (s, err) = BtcScript.decodeToString(Bitcoin.TruncatedSig)
    assert(s == null)
    assert(err == "Push of data element that is larger than remaining data")
    val (s2, err2) = BtcScript.decodeToString(Array[Byte](0x4c)) // PUSHDATA1, no len
    assert(s2 == null && err2 == "Unexpected end of script")
  }

  test("PUSHDATA1/2, small ints, named and unknown opcodes") {
    val script = hexBytes("4c020a0b") ++ hexBytes("4d0100ff") ++
      Array[Byte](0x51.toByte, 0x60.toByte, 0x76.toByte, 0xba.toByte)
    val ops = BtcScript.parse(script)
    assert(BtcScript.display(ops) ==
      "PUSHDATA1[0a0b] PUSHDATA2[ff] 1 16 DUP NON_OP(186)")
  }

  test("golden fixture strings are DERIVED from bytes, not literals") {
    val blocks = Bitcoin.goldenBlocks(spark)
    val b1 = blocks.filter(blocks("block_id") === "b1").head
    val tx0 = b1.getSeq[org.apache.spark.sql.Row](b1.fieldIndex("transactions")).head
    val in0 = tx0.getSeq[org.apache.spark.sql.Row](tx0.fieldIndex("inputs")).head
    assert(in0.getAs[String]("input_script_string") == "PUSHDATA(2)[0102]")
    assert(in0.getAs[String]("input_pubkey_base58") == "") // coinbase quirk
    val out0 = tx0.getSeq[org.apache.spark.sql.Row](tx0.fieldIndex("outputs")).head
    assert(out0.getAs[String]("output_pubkey_base58") == "1111111111111111111114oLvT2")
  }

  test("q_udtf_explode_scripts: tx rows explode into script-op rows") {
    val df = graft.queries.Udfs.udtfExplodeScripts.run(spark, "")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // b1 coinbase input is a single push op (x2: the fixture's b1 is
    // duplicated pre-dedup, the at-least-once append quirk)
    val b1in = rows.filter(r => r.getString(0) == "b1" && r.getString(2) == "input")
    assert(b1in.map(r => (r.getString(5), r.getString(6))).toSeq ==
      Seq.fill(2)(("PUSHDATA(2)", "0102")))
    // P2PKH output decodes to the canonical 5-op sequence
    val b1out = rows.filter(r => r.getString(0) == "b1" && r.getString(2) == "output")
    assert(b1out.map(_.getString(5)).toSeq ==
      Seq("DUP", "HASH160", "PUSHDATA(20)", "EQUALVERIFY", "CHECKSIG")
        .flatMap(op => Seq(op, op))) // duplicates adjacent under the op_idx sort
    // truncated scripts contribute no op rows (inner generator semantics)
    assert(!rows.exists(r => r.getString(0) == "b3"))
    // scalar-only output (driver checker constraint)
    assert(df.schema.fields.forall(f =>
      !f.dataType.typeName.matches("array|map|struct|binary")))
  }

  test("base58check round-trips the two known version bytes") {
    assert(Base58.encodeChecked(0x00.toByte, new Array[Byte](20)) ==
      "1111111111111111111114oLvT2")
    assert(Base58.encodeChecked(0x05.toByte, new Array[Byte](20)).startsWith("3"))
  }
}
