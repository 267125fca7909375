package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.Text

/** Scratch micro-profiler for pipeline stages (dev tool). */
object ProfileParts {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[parts] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n)")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(Text.shingles(Text.tokens(col("text")), 3))).as("shingle"))

    val shU = docs.select(col("doc_id"),
      explode(Text.shingleSetUdf(3)(col("text"))).as("shingle"))
    t("warmup count")(docs.count())
    t("shingles count")(sh.count())
    t("shingles count again")(sh.count())
    t("udf shingles count")(shU.count())
    t("udf shingles count again")(shU.count())
    val joined = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(broadcast(sh.select(col("doc_id").as("doc_b"), col("shingle"))), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
    t("bjoin rows")(joined.count())
    t("pair groupBy")(joined.groupBy("doc_a", "doc_b").count().count())
    val joinedS = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
    t("shuffle-join rows")(joinedS.count())
    t("shuffle pair groupBy")(joinedS.groupBy("doc_a", "doc_b").count().count())
    // signature pass (minhash)
    val mhCols = (0 until 8).map(p =>
      min(md5(concat(lit(s"$p:"), col("shingle")))).as(s"mh$p"))
    t("minhash signatures")(sh.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*).count())

    // cosine kernels: interpreted HOF vs native codegen expression
    val emb = Tables.load(spark, sfDir, "embeddings")
    val probes = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_embedding"))
    val crossed = emb.crossJoin(broadcast(probes))
    t("cosine HOF")(crossed.filter(
      graft.ml.Embeddings.cosine(col("embedding"), col("probe_embedding")) > 0.99).count())
    t("cosine native")(crossed.filter(
      graft.ml.Embeddings.cosineNative(col("embedding"), col("probe_embedding")) > 0.99).count())
    t("cosine native again")(crossed.filter(
      graft.ml.Embeddings.cosineNative(col("embedding"), col("probe_embedding")) > 0.99).count())

    // SQL registration surface of the extension + its type-check error
    val one = spark.sql(
      "SELECT graft_cosine(array(cast(0.6 as float), cast(0.8 as float)), " +
        "array(cast(0.6 as float), cast(0.8 as float))) AS c").head.getDouble(0)
    println(s"[parts] sql graft_cosine(self) = $one")
    try spark.sql("SELECT graft_cosine(1, 2)").collect()
    catch {
      case e: Exception =>
        println("[parts] type-check: " + e.getMessage.linesIterator.next().take(140))
    }
    spark.stop()
  }
}
