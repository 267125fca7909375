package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.text.Winnow

/** Winnowing fingerprint properties — chiefly the paper's guarantee:
  * a shared substring of length >= w + k - 1 forces a shared
  * fingerprint. */
class WinnowSpec extends AnyFunSuite {
  private val K = 5
  private val W = 4

  private def check(prop: org.scalacheck.Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  private val letters = Gen.listOf(Gen.alphaLowerChar).map(_.mkString)

  test("documents shorter than k have no fingerprints") {
    assert(Winnow.fingerprints("abcd", K, W).isEmpty)
    assert(Winnow.fingerprints(null, K, W).isEmpty)
    assert(Winnow.fingerprints("", K, W).isEmpty)
  }

  test("deterministic, unsigned-sorted, distinct") {
    val s = "the quick brown fox jumps over the lazy dog"
    val a = Winnow.fingerprints(s, K, W)
    val b = Winnow.fingerprints(s, K, W)
    assert(a.toSeq == b.toSeq)
    // presentation order matches the unsigned comparison used to select
    // window minima (so fp_first/fp_last are the unsigned min/max)
    val unsigned = Ordering.fromLessThan[Long](java.lang.Long.compareUnsigned(_, _) < 0)
    assert(a.toSeq == a.distinct.sorted(unsigned).toSeq)
    assert(a.nonEmpty)
  }

  test("anchors carry the same hash set as fingerprints, with valid positions") {
    check(forAll(letters) { s =>
      val fps = Winnow.fingerprints(s, K, W).toSet
      val anc = Winnow.anchors(s, K, W)
      anc.map(_._2).toSet == fps &&
        anc.forall { case (p, _) => p >= 1 && p <= math.max(0, s.length - K + 1) } &&
        anc.map(_._1).distinct.length == anc.length
    })
  }

  test("anchors: a shared substring of length >= 2 windows + gram aligns " +
    ">= 2 anchors on one diagonal (the substring-dedup support filter's premise)") {
    // interior winnow windows see identical context in both docs, so
    // their picks land at the same in-match offsets — the diagonal
    // (pos_a - pos_b) is constant across them
    val shared = "unmistakably-unique-shared-run-0123456789"
    val a = "aaaabbbbcccc" + shared + "ddddeeee"
    val b = "zz" + shared + "qqrrssttuuvv"
    val ancA = Winnow.anchors(a, K, W)
    val ancB = Winnow.anchors(b, K, W)
    val diag = (for {
      (pa, ha) <- ancA
      (pb, hb) <- ancB if ha == hb
    } yield pa - pb).groupBy(identity).view.mapValues(_.length)
    assert(diag.values.exists(_ >= 2),
      s"expected >=2 aligned shared anchors, got $diag")
  }

  test("guarantee: a shared substring of length >= w + k - 1 shares a fingerprint") {
    // shared block long enough to contain a full winnowing window
    val shared = Gen.listOfN(2 * (W + K - 1), Gen.alphaLowerChar).map(_.mkString)
    check(forAll(letters, letters, letters, letters, shared) { (p1, s1, p2, s2, block) =>
      val d1 = p1 + block + s1
      val d2 = p2 + block + s2
      val f1 = Winnow.fingerprints(d1, K, W).toSet
      val f2 = Winnow.fingerprints(d2, K, W).toSet
      (f1 & f2).nonEmpty
    })
  }

  test("fingerprint count is bounded by the k-gram count") {
    check(forAll(letters.suchThat(_.length >= K)) { s =>
      Winnow.fingerprints(s, K, W).length <= s.length - K + 1
    })
  }
}
