package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Text

class TextSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("tokens: lowercased, empties removed") {
    val out = Seq("The  Quick brown ").toDF("text")
      .select(Text.tokens(col("text"))).head.getSeq[String](0)
    assert(out == Seq("the", "quick", "brown"))
  }

  test("shingles: n-grams with short-doc guard") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(Text.shingles(Text.tokens(col("text")), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1).isEmpty) // fewer than n tokens -> empty, not [1,0] blowup
  }

  test("langId scores marker vocab with deterministic tie-break") {
    val df = Seq(
      "the cat and the dog is in a house", // en
      "el perro y la casa de un gato que", // es
      "xyz qrs").toDF("text") // no markers -> first lang wins tie at 0
      .select(Text.langId(Text.tokens(col("text"))))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "es", "en"))
  }

  test("quality features: ratios and counts") {
    val feats = Text.qualityFeatures(col("text"))
    val row = Seq("the the cat!").toDF("text")
      .select(feats.map { case (n, c) => c.as(n) }: _*).head
    assert(row.getAs[Long]("n_tokens") == 3)
    assert(row.getAs[Long]("n_distinct_tokens") == 2)
    assert(row.getAs[Long]("n_punct") == 1) // '!'
    assert(math.abs(row.getAs[Double]("stopword_ratio") - 2.0 / 3) < 1e-9)
  }

  test("regexTokens splits alpha/digit runs") {
    val out = Seq("GPT-4 is 2x better!").toDF("text")
      .select(Text.regexTokens(col("text"))).head.getSeq[String](0)
    assert(out == Seq("gpt", "4", "is", "2x", "better"))
  }
}
