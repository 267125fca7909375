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
}
