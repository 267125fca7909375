package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.dedup.Cdc

/** Content-defined chunking properties — chiefly the LBFS guarantee:
  * boundaries depend only on local content, so a prefix edit leaves
  * every chunk after the first surviving boundary byte-identical. */
class CdcSpec extends AnyFunSuite {

  private def check(prop: org.scalacheck.Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  // word-ish text (spaces matter: real docs are token streams)
  private val texts: Gen[String] =
    Gen.listOf(Gen.oneOf("key", "agg", "row", "scan", "slow", "fast",
      "table", "value", "part", "hash", "a", "the")).map(_.mkString(" "))

  test("chunks concatenate back to the exact document") {
    check(forAll(texts) { t => Cdc.chunks(t).mkString == t })
  }

  test("short and degenerate docs are a single chunk") {
    assert(Cdc.chunks("").toSeq == Seq(""))
    assert(Cdc.chunks("abcdefgh").toSeq == Seq("abcdefgh")) // n == K: no cut at e <= n-1
    assert(Cdc.chunks("abc").toSeq == Seq("abc"))
    assert(Cdc.chunks(null).isEmpty)
  }

  test("cut positions are in (K, n) and strictly increasing") {
    check(forAll(texts) { t =>
      val cs = Cdc.cuts(t)
      cs.forall(e => e >= Cdc.K && e <= t.length - 1) &&
        cs.sameElements(cs.sorted) && cs.distinct.length == cs.length
    })
  }

  test("prefix-edit robustness: every chunk after the first boundary survives") {
    // Boundaries are a pure function of the trailing K chars, so every
    // cut of t (all at e >= K, i.e. k-gram fully inside the shared
    // suffix) persists in prefix+t at e+|prefix|; extra cuts can only
    // appear before t's first cut (k-grams overlapping the junction).
    // Hence chunks(t).drop(1) is a contiguous slice of chunks(prefix+t).
    val prefixes = Gen.listOf(Gen.oneOf("xx", "zq", "m")).map(_.mkString(" "))
    check(forAll(texts, prefixes) { (t, p) =>
      val base = Cdc.chunks(t)
      base.length < 2 || {
        val edited = Cdc.chunks(p + " " + t)
        edited.toSeq.containsSlice(base.toSeq.drop(1))
      }
    })
  }

  test("expected chunk size tracks the mask (sanity, not exactness)") {
    val t = Gen.listOfN(5000,
      Gen.oneOf("key", "agg", "row", "scan", "slow", "fast", "table",
        "value", "part", "hash")).sample.get.mkString(" ")
    val cs = Cdc.chunks(t)
    val mean = t.length.toDouble / cs.length
    // mask 63 -> expected ~64; allow a generous band for hash bias
    assert(mean > 20 && mean < 200, s"mean chunk $mean")
  }

  test("duplicate documents produce identical chunk sequences") {
    check(forAll(texts) { t =>
      Cdc.chunks(t).toSeq == Cdc.chunks(new String(t.toCharArray)).toSeq
    })
  }
}
