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
    val (merges, vocab) = Bpe.train(spark, dir, 2)
    // step 1: (a,a) cnt = 3 pairs x freq 2 = 6; tokens after: 3*2 + 3*1 = 9
    assert(merges(0) == Bpe.Merge(1L, "a", "a", 6L, 9L))
    // step 2 tie at cnt=2 between (aa,aa) and (aa,_): y asc picks '_' (0x5f < 'a')
    assert(merges(1) == Bpe.Merge(2L, "aa", "_", 2L, 7L))
    val syms = vocab.filter(col("w") === "aaaa").head.getSeq[String](2)
    assert(syms == Seq("aa", "aa_"))
    vocab.unpersist()
  }
}
