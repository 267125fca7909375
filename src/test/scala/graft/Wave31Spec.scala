package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 31 invariants: readability against a character-walk recompute,
  * feature hashing against an md5 recompute plus load conservation.
  */
class Wave31Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def docs(): Array[(Long, String)] =
    Tables.load(spark, SharedSpark.sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        Option(r.getString(1)).getOrElse("").toLowerCase))

  test("q_text_readability equals a character-walk recompute") {
    val want = docs().map { case (id, t) =>
      val words = t.split(" ").count(_.nonEmpty).toLong
      val vowels = "aeiou".toSet
      var sylls = 0L; var in = false
      t.foreach { c =>
        if (vowels(c)) { if (!in) sylls += 1; in = true } else in = false
      }
      val chunks = (words + 15) / 16
      val flesch =
        if (words > 0)
          Some(206835L - (1015 * words) / chunks - (84600 * sylls) / words)
        else None
      val band = flesch match {
        case None => "empty"
        case Some(f) if f >= 70000 => "easy"
        case Some(f) if f >= 30000 => "standard"
        case _ => "hard"
      }
      id -> ((words, sylls, chunks, flesch, band))
    }.toMap
    val got = graft.queries.Wave31.textReadability
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (w, sy, ch, fl, bd) = want(r.getLong(0))
      assert(r.getLong(1) == w && r.getLong(2) == sy && r.getLong(3) == ch,
        s"doc ${r.getLong(0)}")
      assert(Option(r.get(4)).map(_.asInstanceOf[Long]) == fl)
      assert(r.getString(5) == bd)
    }
  }

  test("q_feature_hashing equals an md5 recompute and conserves load") {
    val tf = scala.collection.mutable.Map.empty[String, Long]
    docs().foreach { case (_, t) =>
      t.split(" ").filter(_.nonEmpty)
        .foreach(w => tf(w) = tf.getOrElse(w, 0L) + 1)
    }
    def bucket(term: String): Long = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hx.take(8), 16) % 16
    }
    val byBucket = tf.toSeq.groupBy(e => bucket(e._1))
    val v = tf.size.toLong
    val collisionPpm = (v - byBucket.size) * 1000000L / v
    val got = graft.queries.Wave31.featureHashing
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == byBucket.size && got.nonEmpty)
    got.foreach { r =>
      val g = byBucket(r.getLong(0))
      assert(r.getLong(1) == g.size.toLong)
      assert(r.getLong(2) == g.map(_._2).sum)
      assert(r.getString(3) == g.map(_._1).min)
      assert(r.getLong(4) == collisionPpm)
    }
    // load conservation: every term lands in exactly one bucket
    assert(got.map(_.getLong(1)).sum == v)
  }
}
