package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler for the BPE training build (dev tool):
  * wordFreq materialization vs the K argmax rounds vs encode.
  * Usage: runMain graft.BpeProfile [sfDir]
  */
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "false"))
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bpe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // warm codegen on the smallest SF
    SparkEntry.queries("q_bpe_encode")(spark, "/root/testdata/sf0.001").count()
    graft.ops.SharedFrames.releaseAll()

    import org.apache.spark.storage.StorageLevel
    val cur0 = graft.text.Bpe.wordFreq(spark, sfDir)
      .select(col("w"), col("freq"),
        graft.text.Bpe.toSymsUdf(col("w")).as("syms"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wordTotal = t("wordFreq+persist+total")(
      cur0.agg(sum(col("freq"))).collect()(0).getLong(0))
    println(s"[bpe] vocab rows = ${cur0.count()}, partitions = ${cur0.rdd.getNumPartitions}")
    var pending = List.empty[(String, String)]
    def symsCol = pending.foldLeft(col("syms")) {
      case (c, (x, y)) => graft.text.Bpe.mergeUdf(c, lit(x), lit(y))
    }
    for (step <- 1 to 8) {
      val pc = t(s"round $step paircount+collect") {
        cur0.select(col("freq"),
            explode(graft.text.Bpe.pairsUdf(symsCol)).as("p"))
          .groupBy(col("p._1").as("x"), col("p._2").as("y"))
          .agg(sum("freq").as("cnt"))
          .collect()
      }
      val best = pc.minBy(r => (-r.getLong(2), r.getString(0), r.getString(1)))
      pending = pending :+ ((best.getString(0), best.getString(1)))
    }
    val fin = cur0.select(col("w"), col("freq"), symsCol.as("syms"))
    t("final toks agg")(
      fin.agg(sum(size(col("syms")).cast("long") * col("freq"))).collect())
    t("vocab rows agg+collect") {
      fin.select(col("w"), col("freq"), explode(col("syms")).as("sym"))
        .groupBy("sym")
        .agg(sum("freq").as("occurrences"), countDistinct("w").as("n_words"))
        .orderBy(col("occurrences").desc, col("sym").asc)
        .collect()
    }
    val enc = graft.text.Bpe.encodeUdf(pending)
    t("encode full corpus") {
      Tables.load(spark, sfDir, "documents")
        .repartition(32)
        .select(col("doc_id"), enc(col("text")).as("e"))
        .select(col("doc_id"), col("e._1").as("n_words"),
          col("e._2").as("n_tokens"), col("e._3").as("toks"))
        .filter(col("n_words") > 0)
        .orderBy("doc_id").count()
    }
    spark.stop()
  }
}
