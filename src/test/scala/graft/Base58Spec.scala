package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Base58

/** Golden vectors: the Base58 test vectors published with the Bitcoin
  * reference implementation + the canonical P2PKH address example
  * (hash160 010966... -> 16UwLL9Risc3QfPqBUvKofHmBQ7wMtjvM). */
class Base58Spec extends AnyFunSuite {
  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("plain encode vectors") {
    assert(Base58.encode(Array.empty) == "")
    assert(Base58.encode(hex("61")) == "2g")
    assert(Base58.encode(hex("626262")) == "a3gV")
    assert(Base58.encode(hex("636363")) == "aPEr")
    assert(Base58.encode(hex("73696d706c792061206c6f6e6720737472696e67")) ==
      "2cFupjhnEsSn59qHXstmK2ffpLv2")
  }

  test("leading zeros map to leading '1's") {
    assert(Base58.encode(Array[Byte](0)) == "1")
    assert(Base58.encode(Array[Byte](0, 0)) == "11")
    assert(Base58.encode(hex("00010966776006953D5567439E5E39F86A0D273BEED61967F6")) ==
      "16UwLL9Risc3QfPqBUvKofHmBQ7wMtjvM")
  }

  test("base58check address derivation (the R5 pubkey->address analog)") {
    assert(Base58.encodeChecked(0x00, hex("010966776006953D5567439E5E39F86A0D273BEE")) ==
      "16UwLL9Risc3QfPqBUvKofHmBQ7wMtjvM")
    // version 0 + 20 zero bytes = the well-known burn address
    assert(Base58.encodeChecked(0x00, new Array[Byte](20)) ==
      "1111111111111111111114oLvT2")
  }

  test("codegen graft_base58check expression matches the golden vectors " +
    "and the Scala implementation, incl. a non-zero version byte") {
    val spark = SharedSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, lit}
    val payloads = Seq(
      hex("010966776006953D5567439E5E39F86A0D273BEE"),
      new Array[Byte](20),
      hex("00010966776006953D5567439E5E39F86A0D27")) // leading-zero payload
    val got = payloads.map(Tuple1(_)).toDF("p")
      .select(
        call_function("graft_base58check", col("p")).as("a0"),
        call_function("graft_base58check", col("p"), lit(5)).as("a5"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    payloads.zip(got).foreach { case (p, (a0, a5)) =>
      assert(a0 == Base58.encodeChecked(0x00, p))
      assert(a5 == Base58.encodeChecked(0x05, p)) // P2SH-style version
    }
    assert(got(0)._1 == "16UwLL9Risc3QfPqBUvKofHmBQ7wMtjvM")
    assert(got(1)._1 == "1111111111111111111114oLvT2")
  }
}
