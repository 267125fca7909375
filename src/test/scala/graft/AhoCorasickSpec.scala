package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.text.AhoCorasick

/** Aho-Corasick vs naive position enumeration — the exact semantics
  * the q_blocklist_filter oracle replays in SQL. */
class AhoCorasickSpec extends AnyFunSuite {

  private def naive(text: String, patterns: Seq[String]): Array[Long] =
    patterns.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }.toArray

  private def check(prop: org.scalacheck.Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  test("nested and overlapping patterns count every occurrence") {
    val ps = Seq("a", "aa", "ab", "aba", "abcde", "cde", "de")
    val ac = AhoCorasick.build(ps)
    val t = "aabababcdeaa"
    assert(ac.countAll(t).toSeq == naive(t, ps).toSeq)
    // self-overlap: "aa" in "aaa" occurs twice (greedy replace says 1)
    val ac2 = AhoCorasick.build(Seq("aa"))
    assert(ac2.countAll("aaa").toSeq == Seq(2L))
  }

  test("property: counts match naive enumeration on a tiny alphabet") {
    // 2-char alphabet maximizes nesting/overlap among random patterns
    val texts = Gen.listOf(Gen.oneOf('a', 'b')).map(_.mkString)
    val patterns = Gen
      .nonEmptyListOf(Gen.choose(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)))
      .map(_.distinct)
    check(forAll(texts, patterns) { (t, ps) =>
      ps.isEmpty || AhoCorasick.build(ps).countAll(t).toSeq == naive(t, ps).toSeq
    })
  }

  test("phrase patterns with spaces (the blocklist shape)") {
    val ps = Seq("scan", "scan scan", "table key")
    val ac = AhoCorasick.build(ps)
    val t = "scan scan scan table key scan"
    // "scan": 4; "scan scan": 2 (overlapping at the middle word); "table key": 1
    assert(ac.countAll(t).toSeq == Seq(4L, 2L, 1L))
    assert(ac.countAll(t).toSeq == naive(t, ps).toSeq)
  }

  test("null and empty text, no matches") {
    val ac = AhoCorasick.build(Seq("xyz"))
    assert(ac.countAll(null).toSeq == Seq(0L))
    assert(ac.countAll("").toSeq == Seq(0L))
    assert(ac.countAll("xy zxy").toSeq == Seq(0L))
  }

  test("automaton survives serialization (task closure shipping)") {
    val ps = Seq("aa", "ab a", "b")
    val ac = AhoCorasick.build(ps)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(ac)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[AhoCorasick]
    val t = "aab ab aba b"
    assert(back.countAll(t).toSeq == ac.countAll(t).toSeq)
    assert(back.countAll(t).toSeq == naive(t, ps).toSeq)
  }
}
