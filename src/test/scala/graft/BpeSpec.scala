package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Bpe

class BpeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("mergeUdf is left-to-right greedy on overlapping runs") {
    // "aaaa_" with (a,a): greedy pairs positions 0-1 and 2-3, leaves '_'
    val df = Seq(Seq("a", "a", "a", "a", "_")).toDF("syms")
      .select(Bpe.mergeUdf(col("syms"), lit("a"), lit("a")).as("m"))
    assert(df.head.getSeq[String](0) == Seq("aa", "aa", "_"))
    // odd run: "aaa_" -> merge first pair only
    val odd = Seq(Seq("a", "a", "a", "_")).toDF("syms")
      .select(Bpe.mergeUdf(col("syms"), lit("a"), lit("a")).as("m"))
    assert(odd.head.getSeq[String](0) == Seq("aa", "a", "_"))
    // non-overlapping x != y: "xyxy" merges both occurrences
    val xy = Seq(Seq("x", "y", "x", "y")).toDF("syms")
      .select(Bpe.mergeUdf(col("syms"), lit("x"), lit("y")).as("m"))
    assert(xy.head.getSeq[String](0) == Seq("xy", "xy"))
  }

  test("train learns the hand-computed merges, ties broken (cnt DESC, x, y)") {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    // vocab: aaaa (freq 2), ab (freq 1); "Z9" is filtered by ^[a-z]+$
    Seq((0L, "aaaa aaaa ab Z9"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t = Bpe.train(spark, dir, 2)
    // step 1: (a,a) cnt = 3 pairs x freq 2 = 6; tokens after: 3*2 + 3*1 = 9
    assert(t.merges(0) == Bpe.Merge(1L, "a", "a", 6L, 9L))
    // step 2 tie at cnt=2 between (aa,aa) and (aa,_): y asc picks '_' (0x5f < 'a')
    assert(t.merges(1) == Bpe.Merge(2L, "aa", "_", 2L, 7L))
    val syms = t.vocab.filter(col("w") === "aaaa").head.getSeq[String](2)
    assert(syms == Seq("aa", "aa_"))
    t.release()
  }

  test("encodeUdf applies learned merges; counts match tokenizeWord") {
    val merges = Seq(("a", "a"), ("aa", "_"))
    assert(Bpe.tokenizeWord("aaaa", merges).toSeq == Seq("aa", "aa_"))
    assert(Bpe.tokenizeWord("ab", merges).toSeq == Seq("a", "b", "_"))
    val df = Seq("Aaaa ab Z9 aaaa").toDF("text")
      .select(Bpe.encodeUdf(merges)(col("text")).as("e"))
      .select(col("e._1"), col("e._2"), col("e._3"))
    val r = df.head
    // words: aaaa, ab, aaaa (Z9 filtered); tokens: 2 + 3 + 2 = 7
    assert(r.getLong(0) == 3L && r.getLong(1) == 7L)
    assert(r.getString(2) == "aa aa_ a b _ aa aa_")
  }

  /** Deep-K run against an independent in-memory reference BPE over the
    * same word-frequency table — pins (a) the bounded merge-chain
    * materialization path (materializeEvery=8 forces 7 cache
    * hand-offs in 64 rounds) and (b) checkpoint-invariance of the
    * learned merges, counts and token accounting at tokenizer-real
    * depth. */
  test("train(K=64, materializeEvery=8) matches an in-memory reference BPE") {
    val dir = "/root/testdata/sf0.001"
    val k = 64
    val t = Bpe.train(spark, dir, k, materializeEvery = 8)
    // reference: plain-Scala BPE with the identical tie-break
    var vocab: Array[(Array[String], Long)] = Bpe.wordFreq(spark, dir)
      .collect()
      .map(r => ((r.getString(0) + "_").map(_.toString).toArray, r.getLong(1)))
    for (step <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          counts(key) = counts.getOrElse(key, 0L) + f
          i += 1
        }
      }
      val ((x, y), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      vocab = vocab.map { case (syms, f) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
            out += (x + y); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toArray, f)
      }
      val toks = vocab.map { case (syms, f) => syms.length * f }.sum
      assert(t.merges(step - 1) == Bpe.Merge(step.toLong, x, y, cnt, toks),
        s"merge $step diverged: got ${t.merges(step - 1)}, want ($x,$y,$cnt,$toks)")
    }
    t.release()
  }

  test("q_bpe_fertility equals a word-by-word tokenizeWord recompute " +
    "per language, and every word costs at least one token") {
    val dir = SharedSpark.sf001
    val (merges, _) = graft.queries.BpeQueries.trainedForTest(spark, dir)
    val ms = merges.map(m => (m.x, m.y))
    val docs = Tables.load(spark, dir, "documents")
      .selectExpr("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perLang = docs.flatMap { case (id, lang, text) =>
      text.toLowerCase.split(" ")
        .filter(w => w.matches("^[a-z]+$") && w.length <= Bpe.MaxWordLen)
        .map(w => (lang, id, Bpe.tokenizeWord(w, ms).length.toLong))
    }
    val expect = perLang.groupBy(_._1).map { case (lang, xs) =>
      val nw = xs.length.toLong
      val nt = xs.map(_._3).sum
      val ns = xs.count(_._3 == 1L).toLong
      lang -> (xs.map(_._2).distinct.length.toLong, nw, nt, ns,
        nt * 1000000L / nw, ns * 1000000L / nw)
    }
    val got = SparkEntry.queries("q_bpe_fertility")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == expect, s"fertility drift: $got vs $expect")
    got.values.foreach { case (_, nw, nt, ns, f, _) =>
      assert(nt >= nw && f >= 1000000L && ns <= nw)
    }
  }
}
