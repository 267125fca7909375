package graft.functions

/** Shared lowercase-hex codec (single home — BtcScript, Bitcoin fixtures
  * and the minhash signature UDF all need one and must agree). */
object Hex {
  private val Digits = "0123456789abcdef".toCharArray

  def bytesToHex(b: Array[Byte]): String = bytesToHex(b, 0, b.length)

  /** Hot-loop overload: encode into a caller-reused char buffer
    * (buf.length must be >= 2*len) — one String alloc, no char[]. */
  def bytesToHex(b: Array[Byte], len: Int, buf: Array[Char]): String = {
    var i = 0
    while (i < len) {
      buf(2 * i) = Digits((b(i) >> 4) & 0xf)
      buf(2 * i + 1) = Digits(b(i) & 0xf)
      i += 1
    }
    new String(buf, 0, 2 * len)
  }

  def bytesToHex(b: Array[Byte], from: Int, len: Int): String = {
    val out = new Array[Char](len * 2)
    var i = 0
    while (i < len) {
      out(2 * i) = Digits((b(from + i) >> 4) & 0xf)
      out(2 * i + 1) = Digits(b(from + i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def hexToBytes(h: String): Array[Byte] = {
    require(h.length % 2 == 0, s"odd-length hex: ${h.length}")
    val out = new Array[Byte](h.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }
}
