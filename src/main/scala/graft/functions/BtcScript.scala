package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Bitcoin script decoder, from the public wire format: a script is a
  * byte sequence of operations — direct pushes (opcode 0x01-0x4b = push
  * that many bytes), PUSHDATA1/2/4 (explicit little-endian length), and
  * named opcodes.
  *
  * Display format and error behavior follow the reference's decoder
  * conventions (it delegates to bitcoinj 0.14 `Script.toString`,
  * `pom.xml:15-23`): named opcodes without the `OP_` prefix, direct
  * pushes as `PUSHDATA(n)[hex]`, explicit pushes as `PUSHDATA1[hex]`
  * etc., unknown opcodes as `NON_OP(n)`; truncated pushes throw, and the
  * caller maps the exception message into the sibling `*_error` column
  * (`BitcoinBlockHandler.java:136-141` scriptSig, `:171-178`
  * scriptPubKey, `:144-153` + `:180-184` addresses).
  */
object BtcScript {

  /** One decoded script operation. `pushHex` is null for plain opcodes. */
  final case class ScriptOp(opcode: Int, name: String, pushHex: String)

  final class ScriptDecodeException(msg: String) extends RuntimeException(msg)

  private val OpPushData1 = 0x4c
  private val OpPushData2 = 0x4d
  private val OpPushData4 = 0x4e

  /** Named opcodes (the public opcode table), bitcoinj-style names
    * (no OP_ prefix; 0x51-0x60 are the small integers "1".."16"). */
  private val OpNames: Map[Int, String] = Map(
    0x00 -> "0", 0x4f -> "1NEGATE", 0x50 -> "RESERVED",
    0x61 -> "NOP", 0x62 -> "VER", 0x63 -> "IF", 0x64 -> "NOTIF",
    0x65 -> "VERIF", 0x66 -> "VERNOTIF", 0x67 -> "ELSE", 0x68 -> "ENDIF",
    0x69 -> "VERIFY", 0x6a -> "RETURN",
    0x6b -> "TOALTSTACK", 0x6c -> "FROMALTSTACK",
    0x6d -> "2DROP", 0x6e -> "2DUP", 0x6f -> "3DUP",
    0x70 -> "2OVER", 0x71 -> "2ROT", 0x72 -> "2SWAP",
    0x73 -> "IFDUP", 0x74 -> "DEPTH", 0x75 -> "DROP", 0x76 -> "DUP",
    0x77 -> "NIP", 0x78 -> "OVER", 0x79 -> "PICK", 0x7a -> "ROLL",
    0x7b -> "ROT", 0x7c -> "SWAP", 0x7d -> "TUCK",
    0x7e -> "CAT", 0x7f -> "SUBSTR", 0x80 -> "LEFT", 0x81 -> "RIGHT",
    0x82 -> "SIZE", 0x83 -> "INVERT", 0x84 -> "AND", 0x85 -> "OR",
    0x86 -> "XOR", 0x87 -> "EQUAL", 0x88 -> "EQUALVERIFY",
    0x89 -> "RESERVED1", 0x8a -> "RESERVED2",
    0x8b -> "1ADD", 0x8c -> "1SUB", 0x8d -> "2MUL", 0x8e -> "2DIV",
    0x8f -> "NEGATE", 0x90 -> "ABS", 0x91 -> "NOT", 0x92 -> "0NOTEQUAL",
    0x93 -> "ADD", 0x94 -> "SUB", 0x95 -> "MUL", 0x96 -> "DIV",
    0x97 -> "MOD", 0x98 -> "LSHIFT", 0x99 -> "RSHIFT",
    0x9a -> "BOOLAND", 0x9b -> "BOOLOR",
    0x9c -> "NUMEQUAL", 0x9d -> "NUMEQUALVERIFY", 0x9e -> "NUMNOTEQUAL",
    0x9f -> "LESSTHAN", 0xa0 -> "GREATERTHAN",
    0xa1 -> "LESSTHANOREQUAL", 0xa2 -> "GREATERTHANOREQUAL",
    0xa3 -> "MIN", 0xa4 -> "MAX", 0xa5 -> "WITHIN",
    0xa6 -> "RIPEMD160", 0xa7 -> "SHA1", 0xa8 -> "SHA256",
    0xa9 -> "HASH160", 0xaa -> "HASH256", 0xab -> "CODESEPARATOR",
    0xac -> "CHECKSIG", 0xad -> "CHECKSIGVERIFY",
    0xae -> "CHECKMULTISIG", 0xaf -> "CHECKMULTISIGVERIFY",
    0xb0 -> "NOP1", 0xb1 -> "CHECKLOCKTIMEVERIFY", 0xb2 -> "NOP3",
    0xb3 -> "NOP4", 0xb4 -> "NOP5", 0xb5 -> "NOP6", 0xb6 -> "NOP7",
    0xb7 -> "NOP8", 0xb8 -> "NOP9", 0xb9 -> "NOP10"
  ) ++ (1 to 16).map(n => (0x50 + n) -> n.toString).toMap

  private def hex(b: Array[Byte], from: Int, len: Int): String =
    Hex.bytesToHex(b, from, len)

  /** Parse script bytes into operations; throws [[ScriptDecodeException]]
    * on truncated pushes (the messages mirror the reference decoder's). */
  def parse(bytes: Array[Byte]): Seq[ScriptOp] = {
    if (bytes == null) throw new ScriptDecodeException("null script")
    val ops = ArrayBuffer.empty[ScriptOp]
    var i = 0
    def need(n: Int, what: String): Unit =
      if (i + n > bytes.length) throw new ScriptDecodeException(what)
    while (i < bytes.length) {
      val opcode = bytes(i) & 0xff
      i += 1
      if (opcode > 0 && opcode < OpPushData1) {
        need(opcode, "Push of data element that is larger than remaining data")
        ops += ScriptOp(opcode, s"PUSHDATA($opcode)", hex(bytes, i, opcode))
        i += opcode
      } else if (opcode == OpPushData1) {
        need(1, "Unexpected end of script")
        val len = bytes(i) & 0xff; i += 1
        need(len, "Push of data element that is larger than remaining data")
        ops += ScriptOp(opcode, "PUSHDATA1", hex(bytes, i, len)); i += len
      } else if (opcode == OpPushData2) {
        need(2, "Unexpected end of script")
        val len = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8); i += 2
        need(len, "Push of data element that is larger than remaining data")
        ops += ScriptOp(opcode, "PUSHDATA2", hex(bytes, i, len)); i += len
      } else if (opcode == OpPushData4) {
        need(4, "Unexpected end of script")
        val len = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
          ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
        i += 4
        if (len < 0 || i + len > bytes.length)
          throw new ScriptDecodeException(
            "Push of data element that is larger than remaining data")
        ops += ScriptOp(opcode, "PUSHDATA4", hex(bytes, i, len)); i += len
      } else {
        ops += ScriptOp(opcode, OpNames.getOrElse(opcode, s"NON_OP($opcode)"), null)
      }
    }
    ops.toSeq
  }

  /** Render ops in the reference display form: space-joined, pushes as
    * `NAME[hex]`. */
  def display(ops: Seq[ScriptOp]): String =
    ops.map(op => if (op.pushHex == null) op.name else s"${op.name}[${op.pushHex}]")
      .mkString(" ")

  /** The (value, error) pair for a script-string column (R6 convention). */
  def decodeToString(bytes: Array[Byte]): (String, String) =
    try (display(parse(bytes)), null)
    catch { case e: ScriptDecodeException => (null, e.getMessage) }

  private def hexToBytes(h: String): Array[Byte] = Hex.hexToBytes(h)

  /** Destination address of a scriptPubKey: P2PKH (version 0x00) or
    * P2SH (version 0x05); anything else is the reference's
    * "cannot cast" error (`BitcoinBlockHandler.java:180-184`). */
  def outputAddress(bytes: Array[Byte]): (String, String) =
    try {
      val ops = parse(bytes)
      ops.map(o => (o.name, o.pushHex)) match {
        // P2PKH per bitcoinj isSentToAddress: structural match on chunk
        // count + a 20-byte push payload (ANY push encoding — a
        // PUSHDATA1-wrapped hash is still a valid address there).
        case Seq(("DUP", null), ("HASH160", null), (_, h),
            ("EQUALVERIFY", null), ("CHECKSIG", null))
            if h != null && h.length == 40 =>
          (Base58.encodeChecked(0x00.toByte, hexToBytes(h)), null)
        // P2SH per bitcoinj isPayToScriptHash: byte-exact template
        // (0xa9 0x14 <20 bytes> 0x87) — a direct push only, which is
        // exactly the PUSHDATA(20) display form.
        case Seq(("HASH160", null), ("PUSHDATA(20)", h), ("EQUAL", null)) =>
          (Base58.encodeChecked(0x05.toByte, hexToBytes(h)), null)
        case _ =>
          (null, "Cannot cast this script to a pay-to-address type")
      }
    } catch { case e: ScriptDecodeException => (null, e.getMessage) }

  /** Sender address of a P2PKH scriptSig (sig push + pubkey push):
    * base58check(0x00, hash160(pubkey)). Non-standard spends error like
    * the reference's getFromAddress (`BitcoinBlockHandler.java:148-153`). */
  def inputAddress(bytes: Array[Byte]): (String, String) =
    try {
      val ops = parse(bytes)
      if (ops.length != 2)
        (null, s"Script not of right size, expecting 2 but got ${ops.length}")
      else {
        // bitcoinj getPubKey: two "large" (>2 byte) pushes -> the second
        // is the pubkey; a large push followed by CHECKSIG -> the first
        // is. A 1-2 byte 'pubkey' is NOT accepted (degenerate spends
        // error out, matching the reference's error column).
        val big0 = ops(0).pushHex != null && ops(0).pushHex.length > 4
        val big1 = ops(1).pushHex != null && ops(1).pushHex.length > 4
        val pubkeyHex =
          if (big0 && big1) ops(1).pushHex
          else if (big0 && ops(1).name == "CHECKSIG") ops(0).pushHex
          else null
        if (pubkeyHex == null)
          (null, "Script did not match expected form: " + display(ops))
        else {
          val pubkey = hexToBytes(pubkeyHex)
          (Base58.encodeChecked(0x00.toByte, Ripemd160.hash160(pubkey)), null)
        }
      }
    } catch { case e: ScriptDecodeException => (null, e.getMessage) }
}
