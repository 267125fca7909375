package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom-filter membership probe over the broadcast `array<bigint>`
  * word vector ([[graft.functions.BloomFilter]]), as a codegen'd native
  * expression: reads the `ArrayData` words in place inside whole-stage
  * codegen — no per-row conversion of the filter to a Scala `Seq`, no
  * boxed UDF call. The boxed-UDF form this replaces was the slowest
  * "should-be-a-scan" query in the suite (~1.9s local[32] for a probe
  * over lineitem); the probe itself is two SplitMix64 mixes plus
  * `numHashes` masked reads, which belongs in the scan's generated
  * loop exactly like [[FxDotProduct]].
  *
  * Spark's own `might_contain` is internal-only (and bound to its
  * sketch layout); this probe matches the deterministic aggregate in
  * `BloomFilter.Agg`, whose layout is part of graft's contract.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  private val numHashes = BloomMightContain.NumHashes

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain requires (array<bigint>, bigint), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(words: Any, key: Any): Any =
    graft.functions.BloomFilter.mightContainArray(
      words.asInstanceOf[ArrayData], numHashes, key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, k) => {
      // static forwarder on the object's class: resolvable from janino
      s"""
        |${ev.value} = graft.functions.BloomFilter.mightContainArray(
        |  $w, $numHashes, $k);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  /** Matches [[graft.functions.BloomFilter.agg]]'s default k. */
  val NumHashes = 4
}
