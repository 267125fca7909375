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
  *
  * `numHashes` MUST equal the k the filter was built with
  * ([[graft.functions.BloomFilter.agg]]'s `numHashes`): a mismatched k
  * probes different bit positions and yields FALSE NEGATIVES (rows
  * wrongly pruned), not just extra false positives. The SQL function
  * takes it as an optional third foldable-int argument —
  * `graft_bloom_might_contain(words, key[, num_hashes])` — defaulting
  * to [[BloomMightContain.NumHashes]], the `agg` default.
  */
case class BloomMightContain(left: Expression, right: Expression,
    numHashes: Int = BloomMightContain.NumHashes)
    extends BinaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

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

  /** SQL-registration builder: 2 args use the default k; a third arg
    * must be a foldable integer literal naming the k the filter was
    * built with (a non-literal k can't be validated at plan time and
    * a wrong k silently false-negatives — fail analysis instead). */
  def fromChildren(children: Seq[Expression]): BloomMightContain =
    children match {
      case Seq(w, k) => BloomMightContain(w, k)
      case Seq(w, k, n) =>
        val v = if (n.foldable) n.eval() else null
        v match {
          case i: Int => BloomMightContain(w, k, i)
          case l: Long => BloomMightContain(w, k, l.toInt)
          case _ => throw new IllegalArgumentException(
            "graft_bloom_might_contain: third argument (num_hashes) must " +
              s"be a foldable integer literal, got $n")
        }
      case _ => throw new IllegalArgumentException(
        s"graft_bloom_might_contain takes 2 or 3 arguments, got ${children.size}")
    }
}
