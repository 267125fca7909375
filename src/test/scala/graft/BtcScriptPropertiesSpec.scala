package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.functions.BtcScript

/** ScalaCheck properties for the script decoder: parsing is total
  * (parse-or-ScriptDecodeException, never another failure), and
  * serialize->parse is an exact round trip for structurally valid
  * scripts. */
class BtcScriptPropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  // -- generators for structurally valid scripts -------------------------

  private val namedOpcode: Gen[Array[Byte]] =
    Gen.oneOf(Seq(0x00, 0x51, 0x60, 0x76, 0xa9, 0x87, 0x88, 0xac, 0x6a, 0xba)
      .map(op => Array(op.toByte)))

  private val directPush: Gen[Array[Byte]] = for {
    n <- Gen.choose(1, 75)
    data <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield n.toByte +: data.toArray

  private val pushData1: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 255)
    data <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield Array(0x4c.toByte, n.toByte) ++ data.toArray

  private val pushData2: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 600)
    data <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield Array(0x4d.toByte, (n & 0xff).toByte, ((n >> 8) & 0xff).toByte) ++ data.toArray

  private val chunkGen: Gen[Array[Byte]] = Gen.frequency(
    4 -> namedOpcode, 4 -> directPush, 1 -> pushData1, 1 -> pushData2)

  test("serialize -> parse round trip: op count, opcodes, and payload sizes agree") {
    check(forAll(Gen.listOf(chunkGen)) { chunks =>
      val bytes = chunks.flatten.toArray
      val ops = BtcScript.parse(bytes)
      val sizesOk = ops.length == chunks.length &&
        ops.zip(chunks).forall { case (op, chunk) =>
          op.opcode == (chunk.head & 0xff) &&
            (op.pushHex == null || {
              val headerLen = (chunk.head & 0xff) match {
                case 0x4c => 2
                case 0x4d => 3
                case _ => 1
              }
              op.pushHex.length / 2 == chunk.length - headerLen
            })
        }
      // display is one space-joined token per op (tokens carry no spaces)
      val d = BtcScript.display(ops)
      val tokensOk = ops.isEmpty || d.split(" ").length == ops.length
      sizesOk && tokensOk
    })
  }

  test("parsing is total: random bytes either parse or throw ScriptDecodeException") {
    check(forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { l =>
      try { BtcScript.parse(l.toArray); true }
      catch {
        case _: BtcScript.ScriptDecodeException => true
        case _: Throwable => false
      }
    })
  }

  test("decodeToString is a proper (value XOR error) pair on random bytes") {
    check(forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { l =>
      val (v, e) = BtcScript.decodeToString(l.toArray)
      (v == null) != (e == null)
    })
  }
}
