package graft

import org.apache.spark.sql.SparkSession

/** Scratch micro-profiler for the RetrievalShared build chain. */
object RetrProfile {
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
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[retr] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warm codegen at the smallest SF
    SparkEntry.queries("q_eval_mrr")(spark, "/root/testdata/sf0.001").count()
    graft.ops.SharedFrames.releaseAll()
    spark.sharedState.cacheManager.clearCache()
    t("vsize")(graft.queries.RetrievalShared.vsize(spark, sfDir))
    t("docvecs")(graft.queries.RetrievalShared.docvecs(spark, sfDir).count())
    t("sparse_top20")(
      graft.queries.RetrievalShared.sparseTop20(spark, sfDir).count())
    t("dense_top20")(
      graft.queries.RetrievalShared.denseTop20(spark, sfDir).count())
    t("mrr readout")(
      SparkEntry.queries("q_eval_mrr")(spark, sfDir).count())
    spark.stop()
  }
}
