package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 79 invariants: the watermark screen recomputed end-to-end in
  * plain Scala (independent md5 green classification + exact integer
  * z-test), and the integer test's equivalence to the real-valued
  * z >= 2 threshold.
  */
class Wave79Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def isGreen(tok: String): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % 4 == 0
  }

  test("q_wm_detect matches a pure-Scala recompute per language") {
    val docs = spark.read
      .parquet(s"${SharedSpark.sf001}/documents.parquet")
      .select("lang", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        val n = toks.length.toLong
        val g = toks.count(isGreen).toLong
        (r.getString(0), n, g)
      }
      .filter(_._2 > 0)
    val expected = docs.groupBy(_._1).map { case (lang, xs) =>
      val flagged = xs.count { case (_, n, g) =>
        4 * g - n > 0 && (4 * g - n) * (4 * g - n) >= 12 * n
      }.toLong
      val gT = xs.map(_._3).sum
      val nT = xs.map(_._2).sum
      lang -> (xs.length.toLong, flagged, gT, nT)
    }
    val out = SparkEntry.queries("q_wm_detect")(spark, SharedSpark.sf001)
      .collect()
    assert(out.map(_.getString(0)).toSet == expected.keySet)
    out.foreach { r =>
      val lang = r.getString(0)
      val (nd, fl, gT, nT) = expected(lang)
      assert(r.getAs[Long]("n_docs") == nd, lang)
      assert(r.getAs[Long]("n_flagged") == fl, lang)
      assert(r.getAs[Long]("flagged_ppm") == fl * 1000000L / nd, lang)
      assert(r.getAs[Long]("green_toks") == gT, lang)
      assert(r.getAs[Long]("total_toks") == nT, lang)
      assert(r.getAs[Long]("green_ppm") == gT * 1000000L / nT, lang)
      // no watermark exists in this corpus: the flag rate must sit
      // near the z>=2 one-sided false-positive floor, never above 10%
      assert(fl * 1000000L / nd < 100000L, s"$lang flag rate implausible")
    }
  }

  test("the integer test equals the real-valued z >= 2 threshold for " +
    "gamma = 1/4 on an exhaustive (n, g) sweep") {
    for (n <- 1L to 400L; g <- 0L to n) {
      val intFlag = 4 * g - n > 0 && (4 * g - n) * (4 * g - n) >= 12 * n
      val z = (g - n / 4.0) / math.sqrt(n * 0.25 * 0.75)
      // strict equivalence away from exact-boundary float ties:
      // (4g-n)^2 == 12n can hit z == 2.0 exactly; both sides agree on
      // >= by construction since sqrt is correctly rounded
      assert(intFlag == (z >= 2.0), s"n=$n g=$g z=$z int=$intFlag")
    }
  }
}
