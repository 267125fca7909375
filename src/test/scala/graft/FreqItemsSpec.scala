package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FreqItems

/** Order-independent guarantees of the Misra-Gries sketch (the
  * estimates themselves are order-dependent, which is why q_freq_items
  * carries no SQL oracle):
  *
  *  - est(x) <= true(x)                          (downward bias)
  *  - true(x) - est(x) <= n/(k+1)                (error bound)
  *  - true(x) >  n/(k+1)  =>  x is in the summary (hot-item recall)
  *
  * and the bounds must survive arbitrary merge trees (Spark partial
  * aggregation merges in a nondeterministic order).
  */
class FreqItemsSpec extends AnyFunSuite {

  /** Zipf-ish deterministic stream: term i appears ~ 1/(i+1) often. */
  private def stream(n: Int, vocab: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val weights = (0 until vocab).map(i => 1.0 / (i + 1))
    val total = weights.sum
    Seq.fill(n) {
      var r = rnd.nextDouble() * total
      var i = 0
      while (r > weights(i) && i < vocab - 1) { r -= weights(i); i += 1 }
      s"t$i"
    }
  }

  private def checkBounds(agg: FreqItems, sketch: Map[String, Long],
      truth: Map[String, Long], n: Long): Unit = {
    val slack = n.toDouble / (agg.k + 1)
    sketch.foreach { case (t, est) =>
      val tru = truth.getOrElse(t, 0L)
      assert(est <= tru, s"$t overestimated: $est > $tru")
      assert(tru - est <= slack, s"$t error ${tru - est} > $slack")
    }
    truth.foreach { case (t, tru) =>
      if (tru > slack)
        assert(sketch.contains(t), s"hot item $t (freq $tru > $slack) missing")
    }
  }

  test("exact when the vocabulary fits the capacity") {
    val agg = FreqItems(16)
    val xs = Seq("a", "b", "a", "c", "a", "b")
    val sketch = xs.foldLeft(agg.zero)(agg.reduce)
    assert(sketch == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("sequential bounds on a zipf stream with tiny capacity") {
    val agg = FreqItems(4)
    val xs = stream(5000, vocab = 50, seed = 7)
    val sketch = xs.foldLeft(agg.zero)(agg.reduce)
    assert(sketch.size <= 4)
    checkBounds(agg, sketch, xs.groupBy(identity).view.mapValues(_.size.toLong).toMap, xs.size)
  }

  test("bounds survive arbitrary merge trees") {
    val agg = FreqItems(4)
    val xs = stream(8000, vocab = 40, seed = 13)
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // 16 partial sketches merged pairwise (a balanced tree), then the
    // same partials merged left-to-right — both must satisfy the bound
    val partials = xs.grouped(500).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    def treeMerge(ps: Seq[Map[String, Long]]): Map[String, Long] =
      if (ps.size == 1) ps.head
      else treeMerge(ps.grouped(2).map(g => g.reduce(agg.merge)).toSeq)
    for (merged <- Seq(treeMerge(partials), partials.reduce(agg.merge))) {
      assert(merged.size <= 4)
      checkBounds(agg, merged, truth, xs.size)
    }
  }

  test("Spark udaf wiring: hot terms survive distributed aggregation") {
    val spark = SharedSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{Encoders => E}
    val xs = stream(6000, vocab = 30, seed = 21)
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fi = udaf(FreqItems(8), E.STRING)
    val sketch = xs.toDF("term")
      .repartition(7) // force multiple partials + a real merge phase
      .agg(fi(col("term")).as("sketch"))
      .as[Map[String, Long]]
      .head()
    checkBounds(FreqItems(8), sketch, truth, xs.size)
  }
}
