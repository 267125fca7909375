package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch micro-profiler for q_dedup_prefixfilter's stages. */
object PfProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pf] $label%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    SparkEntry.queries("q_dedup_prefixfilter")(spark, "/root/testdata/sf0.001").count()
    val np = 32
    val docs = Tables.load(spark, sfDir, "documents")
      .repartition(np)
      .select(col("doc_id"), graft.text.Text.shingleSetUdf(3)(col("text")).as("shs"))
      .filter(size(col("shs")) > 0)
    val marked = t("marked ckpt (fp+windows)") {
      docs
        .withColumn("fp", md5(to_json(struct(sort_array(col("shs")).as("s")))))
        .withColumn("mrk", row_number().over(
          Window.partitionBy("fp").orderBy("doc_id")))
        .withColumn("rep", min(col("doc_id")).over(Window.partitionBy("fp")))
        .select(col("doc_id"), col("shs"), col("rep"), col("mrk"))
        .localCheckpoint(true)
    }
    val repDocs = marked.filter(col("mrk") === 1)
    val sh = repDocs.select(col("doc_id"), explode(col("shs")).as("shingle"))
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("doc_id")
    val ranked = sh.join(dfreq, "shingle")
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("rk", row_number().over(byDoc.orderBy(col("df"), col("shingle"))))
    val pre = ranked.filter(col("rk") <= col("n") - expr("(n + 1) div 2") + 1)
      .select("doc_id", "shingle")
    t("pre count")(pre.count())
    val cand = pre.select(col("doc_id").as("doc_a"), col("shingle")).hint("merge")
      .join(pre.select(col("doc_id").as("doc_b"), col("shingle")).hint("merge"), "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .localCheckpoint(false)
    t("cand count")(cand.count())
    val cdocs = cand.select(col("doc_a").as("doc_id"))
      .unionAll(cand.select(col("doc_b").as("doc_id"))).distinct()
    val shc = sh.join(cdocs, Seq("doc_id"), "left_semi")
    val common = shc.select(col("doc_id").as("doc_a"), col("shingle")).hint("merge")
      .join(shc.select(col("doc_id").as("doc_b"), col("shingle")).hint("merge"), "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
    t("common count")(common.count())
    t("full query")(SparkEntry.queries("q_dedup_prefixfilter")(spark, sfDir).count())
    spark.stop()
  }
}
