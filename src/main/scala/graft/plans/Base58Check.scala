package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Base58Check address derivation as a codegen'd native expression —
  * SURVEY §4.3's declared stretch goal (the UDF form was correct but
  * boxed; this runs inside the scan's generated loop like the fx
  * kernels). Semantics are exactly [[graft.functions.Base58
  * .encodeChecked]] (version byte + payload + 4-byte double-SHA256
  * checksum, leading-zero '1's preserved), which stays the single
  * implementation — eval and generated code both call its static
  * forwarder, so the expression can never drift from the Base58Spec
  * golden vectors.
  *
  * `version` is a construction-time constant (a foldable int literal
  * in the SQL form `graft_base58check(payload[, version])`): address
  * types are schema decisions, not per-row data.
  */
case class Base58Check(child: Expression,
    version: Int = 0x00)
    extends UnaryExpression {

  require(version >= 0 && version <= 255,
    s"version must be an unsigned byte, got $version")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_base58check requires binary payload, got ${other.simpleString}")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_base58check"

  override def nullSafeEval(payload: Any): Any =
    Base58Check.encode(version, payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => {
      s"""
        |${ev.value} = graft.plans.Base58Check.encode($version, $p);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Base58Check {
  /** Static forwarder shared by eval and generated code (janino-visible). */
  def encode(version: Int, payload: Array[Byte]): UTF8String =
    UTF8String.fromString(
      graft.functions.Base58.encodeChecked(version.toByte, payload))

  /** SQL-registration builder: 1 arg uses version 0x00 (P2PKH); a
    * second arg must be a foldable integer literal version byte. */
  def fromChildren(children: Seq[Expression]): Base58Check =
    children match {
      case Seq(p) => Base58Check(p)
      case Seq(p, v) =>
        val ev = if (v.foldable) v.eval() else null
        ev match {
          case i: Int => Base58Check(p, i)
          case l: Long => Base58Check(p, l.toInt)
          case _ => throw new IllegalArgumentException(
            "graft_base58check: second argument (version) must be a " +
              s"foldable integer literal, got $v")
        }
      case _ => throw new IllegalArgumentException(
        s"graft_base58check takes 1 or 2 arguments, got ${children.size}")
    }
}
