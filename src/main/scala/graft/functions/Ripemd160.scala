package graft.functions

/** RIPEMD-160 (Dobbertin/Bosselaers/Preneel 1996, the public spec) —
  * needed for Bitcoin's hash160 = RIPEMD160(SHA256(pubkey)) address
  * derivation (the reference gets it from bitcoinj's Utils.sha256hash160;
  * the JDK's MessageDigest has no RIPEMD-160 provider, so it is
  * implemented here from the published algorithm).
  */
object Ripemd160 {

  // message word selection, left and right lines
  private val R = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13)
  private val Rp = Array(
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11)
  // rotation amounts, left and right lines
  private val S = Array(
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6)
  private val Sp = Array(
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11)
  private val K = Array(0x00000000, 0x5a827999, 0x6ed9eba1, 0x8f1bbcdc, 0xa953fd4e)
  private val Kp = Array(0x50a28be6, 0x5c4dd124, 0x6d703ef3, 0x7a6d76e9, 0x00000000)

  @inline private def rotl(x: Int, n: Int): Int = (x << n) | (x >>> (32 - n))

  @inline private def f(j: Int, x: Int, y: Int, z: Int): Int = (j / 16) match {
    case 0 => x ^ y ^ z
    case 1 => (x & y) | (~x & z)
    case 2 => (x | ~y) ^ z
    case 3 => (x & z) | (y & ~z)
    case _ => x ^ (y | ~z)
  }

  def digest(input: Array[Byte]): Array[Byte] = {
    // MD4-style padding: 0x80, zeros, 64-bit little-endian bit length
    val bitLen = input.length.toLong * 8
    val padLen = {
      val rem = (input.length + 1) % 64
      (if (rem <= 56) 56 - rem else 120 - rem) + 1
    }
    val msg = new Array[Byte](input.length + padLen + 8)
    System.arraycopy(input, 0, msg, 0, input.length)
    msg(input.length) = 0x80.toByte
    var i = 0
    while (i < 8) {
      msg(msg.length - 8 + i) = ((bitLen >>> (8 * i)) & 0xff).toByte
      i += 1
    }

    var h0 = 0x67452301; var h1 = 0xefcdab89; var h2 = 0x98badcfe
    var h3 = 0x10325476; var h4 = 0xc3d2e1f0

    val x = new Array[Int](16)
    var block = 0
    while (block < msg.length / 64) {
      var w = 0
      while (w < 16) {
        val o = block * 64 + w * 4
        x(w) = (msg(o) & 0xff) | ((msg(o + 1) & 0xff) << 8) |
          ((msg(o + 2) & 0xff) << 16) | ((msg(o + 3) & 0xff) << 24)
        w += 1
      }
      var a = h0; var b = h1; var c = h2; var d = h3; var e = h4
      var ap = h0; var bp = h1; var cp = h2; var dp = h3; var ep = h4
      var j = 0
      while (j < 80) {
        var t = rotl(a + f(j, b, c, d) + x(R(j)) + K(j / 16), S(j)) + e
        a = e; e = d; d = rotl(c, 10); c = b; b = t
        t = rotl(ap + f(79 - j, bp, cp, dp) + x(Rp(j)) + Kp(j / 16), Sp(j)) + ep
        ap = ep; ep = dp; dp = rotl(cp, 10); cp = bp; bp = t
        j += 1
      }
      val t = h1 + c + dp
      h1 = h2 + d + ep; h2 = h3 + e + ap; h3 = h4 + a + bp; h4 = h0 + b + cp
      h0 = t
      block += 1
    }

    val out = new Array[Byte](20)
    val hs = Array(h0, h1, h2, h3, h4)
    i = 0
    while (i < 20) {
      out(i) = ((hs(i / 4) >>> (8 * (i % 4))) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Bitcoin's hash160: RIPEMD160(SHA256(b)). */
  def hash160(b: Array[Byte]): Array[Byte] =
    digest(java.security.MessageDigest.getInstance("SHA-256").digest(b))
}
