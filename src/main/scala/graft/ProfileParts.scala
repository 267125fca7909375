package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-profiler for pipeline stages (dev tool). Currently
  * instrumented for the q_hits_scores decomposition. */
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
    import spark.implicits._

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[parts] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n)")
    }

    // warm codegen
    SparkEntry.queries("q_hits_scores")(spark, "/root/testdata/sf0.001").count()

    val np = cpus.toInt
    val ed = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
      .join(Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
      .repartition(np, col("c"))
      .persist()
    t("ed build+persist")(ed.count())
    def norm(raw: DataFrame, key: String): DataFrame = {
      val mx = raw.agg(max(col("raw")).as("mx"))
      raw.crossJoin(broadcast(mx))
        .select(col(key),
          expr("CAST(CAST(raw AS DECIMAL(38,0)) * 1000000 div mx AS BIGINT)")
            .as("score"))
    }
    var h = ed.select(col("c")).distinct()
      .withColumn("score", lit(1000000L))
      .localCheckpoint(false)
    t("h0 ckpt")(h.count())
    var a: DataFrame = null
    (1 to 4).foreach { r =>
      val araw = ed
        .join(broadcast(h.select(col("c"), col("score"))), "c")
        .groupBy("s").agg(sum(col("score")).as("raw"))
        .localCheckpoint(false)
      t(s"round $r araw")(araw.count())
      a = norm(araw, "s")
      val hraw = ed
        .join(broadcast(a.select(col("s"), col("score"))), "s")
        .groupBy("c").agg(sum(col("score")).as("raw"))
        .localCheckpoint(false)
      t(s"round $r hraw")(hraw.count())
      h = norm(hraw, "c")
    }
    t("final union+sort")(
      a.select(lit("auth").as("role"), col("s").as("id"), col("score"))
        .unionAll(
          h.select(lit("hub").as("role"), col("c").as("id"), col("score")))
        .orderBy("role", "id").count())
    spark.stop()
  }
}
