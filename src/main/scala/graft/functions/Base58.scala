package graft.functions

import java.security.MessageDigest

/** Base58Check encoding — the address-derivation primitive the reference
  * gets from bitcoinj (`BitcoinBlockHandler.java:148-149,180`:
  * `getToAddress(...).toBase58()`). Implemented from the public Base58
  * alphabet/spec; registered as a Scala UDF (cold path — runs once per
  * output script, never in a hot aggregate loop).
  */
object Base58 {
  private val Alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

  /** Plain base58 of a byte string (big-endian base-256 -> base-58). */
  def encode(input: Array[Byte]): String = {
    if (input.isEmpty) return ""
    val zeros = input.takeWhile(_ == 0).length
    var num = BigInt(1, input)
    val sb = new StringBuilder
    while (num > 0) {
      val (q, r) = num /% 58
      sb.append(Alphabet(r.toInt))
      num = q
    }
    ("1" * zeros) + sb.reverseContents().toString
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  /** Base58Check: version byte + payload + 4-byte double-SHA256 checksum.
    * version 0x00 + hash160 => a P2PKH address (the reference's
    * `input_pubkey_base58` / `output_pubkey_base58` columns). */
  def encodeChecked(version: Byte, payload: Array[Byte]): String = {
    val data = version +: payload
    val checksum = sha256(sha256(data)).take(4)
    encode(data ++ checksum)
  }
}
