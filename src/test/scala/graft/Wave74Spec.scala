package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Text

/** Wave 74 invariants: the langid confusion/F1 report recomputed from
  * a pure-Scala marker argmax, and majority-vote stability recomputed
  * from raw lineitem with an independent plurality implementation.
  */
class Wave74Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_eval_f1_langid matches a pure-Scala marker-argmax recompute; " +
    "macro-F1 is sane and confusion mass conserves") {
    val markers = Text.langMarkers
    def predict(toks: Array[String]): String =
      markers.foldLeft(("", -1L)) { case ((bl, bs), (lang, ms)) =>
        val s = toks.count(ms.contains).toLong
        if (s > bs) (lang, s) else (bl, bs)
      }._1
    val docs = spark.read
      .parquet(s"${SharedSpark.sf001}/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)))
    val cells = docs.groupBy { case (l, t) => (l, predict(t)) }
      .map { case (k, xs) => k -> xs.length.toLong }
    val langs = docs.map(_._1).distinct.sorted
    val out = SparkEntry.queries("q_eval_f1_langid")(
      spark, SharedSpark.sf001).collect()
    assert(out.map(_.getAs[String]("lang")).toSeq == langs.toSeq)
    var tpSum = 0L
    out.foreach { r =>
      val l = r.getAs[String]("lang")
      val nTrue = cells.collect { case ((`l`, _), n) => n }.sum
      val nPred = cells.collect { case ((_, `l`), n) => n }.sum
      val tp = cells.getOrElse((l, l), 0L)
      assert(r.getAs[Long]("n_true") == nTrue, l)
      assert(r.getAs[Long]("n_pred") == nPred, l)
      assert(r.getAs[Long]("tp") == tp, l)
      assert(r.getAs[Long]("rec_ppm") == tp * 1000000 / nTrue, l)
      assert(Option(r.getAs[java.lang.Long]("prec_ppm")).map(_.toLong) ==
        (if (nPred > 0) Some(tp * 1000000 / nPred) else None), l)
      assert(r.getAs[Long]("f1_ppm") == 2 * tp * 1000000 / (nTrue + nPred), l)
      tpSum += tp
    }
    // confusion mass conserves: sum of n_true equals the corpus size,
    // and the trace never exceeds it
    assert(out.map(_.getAs[Long]("n_true")).sum == docs.length.toLong)
    assert(tpSum <= docs.length.toLong)
  }

  test("q_eval_majority matches an independent plurality recompute") {
    val li = spark.read
      .parquet(s"${SharedSpark.sf001}/lineitem.parquet")
      .select("l_partkey", "l_returnflag", "l_orderkey", "l_linenumber")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3).toLong)) // l_linenumber is INT32 in the parquet
    val brands = spark.read
      .parquet(s"${SharedSpark.sf001}/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def plurality(ans: Seq[String]): String =
      ans.groupBy(identity).toSeq
        .map { case (a, xs) => (a, xs.size) }
        .sortBy { case (a, c) => (-c, a) }.head._1
    val stable = li.groupBy(_._1).toSeq.collect {
      case (task, xs) if xs.length >= 5 =>
        val ordered = xs.sortBy(x => (x._3, x._4, x._2)).map(_._2)
        (brands(task),
          plurality(ordered.take(3).toSeq) == plurality(ordered.toSeq))
    }
    val expected = stable.groupBy(_._1).map { case (b, xs) =>
      b -> (xs.length.toLong, xs.count(_._2).toLong)
    }
    val out = SparkEntry.queries("q_eval_majority")(
      spark, SharedSpark.sf001).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val b = r.getAs[String]("brand")
      val (nTasks, nStable) = expected(b)
      assert(r.getAs[Long]("n_tasks") == nTasks, b)
      assert(r.getAs[Long]("n_stable") == nStable, b)
      assert(r.getAs[Long]("stable_ppm") == nStable * 1000000 / nTasks, b)
    }
  }
}
