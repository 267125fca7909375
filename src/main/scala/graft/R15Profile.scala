package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch micro-profiler for the round-15 optimization targets
  * (dev tool, mirrors ProfileParts). Usage:
  *   runMain graft.R15Profile <which> [sfDir]
  * which: coverage | profiletable | mstround | bipround
  */
object R15Profile {
  def main(args: Array[String]): Unit = {
    val which = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[r15] $label%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n)")
    }

    which match {
      case "coverage" =>
        // warm codegen
        SparkEntry.queries("q_max_coverage")(spark, "/root/testdata/sf0.001").count()
        def ckptLeaf(df: DataFrame): DataFrame = df.localCheckpoint(false)
        val inc = ckptLeaf(Tables.load(s, sfDir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct())
        var unc = ckptLeaf(inc.select("ok").distinct())
        t("inc+unc0 build (count)")(unc.count())
        for (k <- 1 to 8) {
          var pk = 0L; var gain = 0L
          t(s"round $k argmax") {
            val best = inc.join(broadcast(unc), Seq("ok"), "left_semi")
              .groupBy("pk").agg(count(lit(1)).as("gain"))
              .agg(max(struct(col("gain"), (-col("pk")).as("npk"))).as("m"))
              .select(expr("-m.npk").as("pk"), col("m.gain").as("gain"))
              .collect()(0)
            pk = best.getLong(0); gain = best.getLong(1); gain
          }
          val hit = inc.filter(col("pk") === pk).select("ok")
          unc = ckptLeaf(unc.join(broadcast(hit), Seq("ok"), "left_anti"))
        }
        t("final unc count")(unc.count())

      case "profiletable" =>
        SparkEntry.queries("q_profile_table")(spark, "/root/testdata/sf0.001").count()
        (1 to 3).foreach { i =>
          t(s"full query run $i")(
            SparkEntry.queries("q_profile_table")(spark, sfDir).count())
        }
        // decomposition: scan+project only, then the wide agg
        val v = Tables.load(s, sfDir, "orders")
          .repartition(32)
          .select(
            col("o_orderkey").as("k"), col("o_custkey").as("ck"),
            col("o_orderstatus").as("st"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
            graft.functions.Exact.bucket(
              graft.functions.Exact.ms(col("o_orderdate")), 86400000L).as("day"),
            col("o_orderpriority").as("pri"))
        t("scan+repartition+project") { v.write.format("noop").mode("overwrite").save(); 0L }
        val a6 = v.agg(
          count(lit(1)).as("n"),
          count(col("k")).as("nn_k"), countDistinct(col("k")).as("nd_k"),
          count(col("ck")).as("nn_ck"), countDistinct(col("ck")).as("nd_ck"),
          count(col("cents")).as("nn_c"), countDistinct(col("cents")).as("nd_c"),
          count(col("day")).as("nn_d"), countDistinct(col("day")).as("nd_d"),
          count(col("st")).as("nn_st"), countDistinct(col("st")).as("nd_st"),
          count(col("pri")).as("nn_p"), countDistinct(col("pri")).as("nd_p"))
        t("6x countDistinct agg")(a6.count())
        val a1 = v.agg(count(lit(1)).as("n"),
          count(col("k")).as("nn_k"), countDistinct(col("k")).as("nd_k"))
        t("1x countDistinct agg")(a1.count())
        val a0 = v.agg(count(lit(1)).as("n"),
          min(col("k")), max(col("k")), min(col("cents")), max(col("cents")))
        t("no-distinct agg")(a0.count())

      case "mstround" =>
        SparkEntry.queries("q_graph_mst")(spark, "/root/testdata/sf0.001").count()
        val np = 32
        val ep = graft.queries.GraphShared.pairs(s, sfDir)
          .select(col("u"), col("v"), expr("1000000 div n").as("w"))
          .repartition(np, col("u"))
          .persist()
        t("ep build")(ep.count())
        val nodes = ep.select(col("u").as("node"))
          .unionAll(ep.select(col("v").as("node"))).distinct()
        def ckptLeaf(df: DataFrame): DataFrame = {
          val ck = df.localCheckpoint(true)
          s.createDataFrame(ck.toDF().rdd, ck.schema)
        }
        var comp = ckptLeaf(nodes.withColumn("c", col("node")))
        t("comp0")(comp.count())
        for (r <- 1 to 3) {
          val cu = comp.select(col("node").as("u"), col("c").as("cu"))
          val cv = comp.select(col("node").as("v"), col("c").as("cv"))
          val ce = ep.join(broadcast(cu), "u").join(broadcast(cv), "v")
            .filter(col("cu") =!= col("cv"))
          val inc = ce.select(col("cu").as("c"), col("u"), col("v"), col("w"),
              col("cv").as("oc"))
            .unionAll(ce.select(col("cv").as("c"), col("u"), col("v"),
              col("w"), col("cu").as("oc")))
          var pickW: DataFrame = null
          t(s"round $r pick (window)") {
            pickW = ckptLeaf(inc.withColumn("rn", row_number().over(
                Window.partitionBy("c").orderBy(col("w"), col("u"), col("v"))))
              .filter(col("rn") === 1).drop("rn"))
            pickW.count()
          }
          var pickA: DataFrame = null
          t(s"round $r pick (min_by agg)") {
            pickA = ckptLeaf(inc.groupBy("c")
              .agg(min_by(struct(col("u"), col("v"), col("w"), col("oc")),
                struct(col("w"), col("u"), col("v"))).as("m"))
              .select(col("c"), col("m.u").as("u"), col("m.v").as("v"),
                col("m.w").as("w"), col("m.oc").as("oc")))
            pickA.count()
          }
          t(s"round $r pick equal") {
            val d1 = pickW.exceptAll(pickA).count()
            val d2 = pickA.exceptAll(pickW).count()
            require(d1 == 0 && d2 == 0, s"pick mismatch: $d1/$d2")
            0L
          }
          val pick = pickA
          val mutual = pick.select(col("c").as("bc"), col("oc").as("boc"))
          val ptr0 = pick.join(broadcast(mutual),
              col("bc") === col("oc"), "left")
            .select(col("c"),
              when(col("boc") === col("c") && col("oc") > col("c"), col("c"))
                .otherwise(col("oc")).as("p"))
            .dropDuplicates("c")
          val ids = comp.select(col("c")).distinct()
          var ptr = ckptLeaf(ids.join(ptr0.withColumnRenamed("c", "pc"),
              col("c") === col("pc"), "left")
            .select(col("c"), coalesce(col("p"), col("c")).as("p")))
          for (_ <- 1 to 4) {
            val b = ptr.select(col("c").as("jc"), col("p").as("jp"))
            ptr = ptr.select(col("c"), col("p").as("jc"))
              .join(broadcast(b), "jc")
              .select(col("c"), col("jp").as("p"))
          }
          t(s"round $r comp update") {
            comp = ckptLeaf(comp.select(col("node"), col("c").as("jc"))
              .join(broadcast(ptr.select(col("c").as("jc"), col("p"))), "jc")
              .select(col("node"), col("p").as("c")))
            comp.count()
          }
          t(s"round $r picks left") {
            pick.count()
          }
        }

      case "bipround" =>
        SparkEntry.queries("q_bipartite_match")(spark, "/root/testdata/sf0.001").count()
        val np = 32
        def ckptLeaf(df: DataFrame): DataFrame = df.localCheckpoint(true)
        val e0 = ckptLeaf(Tables.load(s, sfDir, "lineitem").repartition(np)
          .groupBy(col("l_suppkey").as("s"), col("l_partkey").as("p"))
          .agg(sum(expr("CAST(ROUND(l_quantity, 0) AS BIGINT)")).as("a")))
        t("e0 build")(e0.count())
        var edges = e0
        for (r <- 1 to 3) {
          var mW: DataFrame = null
          t(s"round $r mutual (window)") {
            val bs = edges.withColumn("rn", row_number().over(
                Window.partitionBy("s").orderBy(col("a").desc, col("p"))))
              .filter(col("rn") === 1).select("s", "p")
            val bp = edges.withColumn("rn", row_number().over(
                Window.partitionBy("p").orderBy(col("a").desc, col("s"))))
              .filter(col("rn") === 1)
              .select(col("s").as("s2"), col("p").as("p2"))
            mW = ckptLeaf(
              bs.join(bp, col("p") === col("p2") && col("s") === col("s2"))
                .select(col("s"), col("p")))
            mW.count()
          }
          var mA: DataFrame = null
          t(s"round $r mutual (max_by)") {
            val bs = edges.groupBy("s")
              .agg(max_by(col("p"), struct(col("a"), (-col("p")).as("np")))
                .as("p"))
            val bp = edges.groupBy("p")
              .agg(max_by(col("s"), struct(col("a"), (-col("s")).as("ns")))
                .as("s"))
              .select(col("s").as("s2"), col("p").as("p2"))
            mA = ckptLeaf(
              bs.join(bp, col("p") === col("p2") && col("s") === col("s2"))
                .select(col("s"), col("p")))
            mA.count()
          }
          t(s"round $r m equal") {
            val d1 = mW.exceptAll(mA).count()
            val d2 = mA.exceptAll(mW).count()
            require(d1 == 0 && d2 == 0, s"m mismatch: $d1/$d2")
            0L
          }
          t(s"round $r retire") {
            edges = ckptLeaf(edges
              .join(broadcast(mA.select(col("s"))), Seq("s"), "left_anti")
              .join(broadcast(mA.select(col("p"))), Seq("p"), "left_anti"))
            edges.count()
          }
        }

      case "sccparts" =>
        SparkEntry.queries("q_graph_scc")(spark, "/root/testdata/sf0.001").count()
        def ckptLeaf(df: DataFrame): DataFrame = df.localCheckpoint(false)
        val inc = Tables.load(s, sfDir, "lineitem")
          .groupBy(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .agg(min("l_linenumber").as("ln"))
        val a = inc.select(col("ok"), col("pk").as("u"), col("ln").as("lu"))
          .hint("merge")
        val b = inc.select(col("ok").as("ok2"), col("pk").as("v"),
          col("ln").as("lv")).hint("merge")
        val e1 = ckptLeaf(a
          .join(b, col("ok") === col("ok2") &&
            (col("lu") < col("lv") ||
              (col("lu") === col("lv") && col("u") < col("v"))))
          .groupBy(col("u").as("src"), col("v").as("dst"))
          .agg(count(lit(1)))
          .select("src", "dst"))
        t("e1 build")(e1.count())
        val vx = ckptLeaf(
          e1.select(col("src").as("v")).unionAll(e1.select(col("dst").as("v")))
            .distinct())
        t("vx build")(vx.count())
        val tmpl = ckptLeaf(
          e1.select(col("dst").as("from"), col("src").as("to"),
              lit("f").as("dir"))
            .unionByName(e1.select(col("src").as("from"),
              col("dst").as("to"), lit("b").as("dir")))
            .unionByName(vx.select(col("v").as("from"),
              col("v").as("to"), lit("s").as("dir"))))
        t("tmpl build")(tmpl.count())
        def step(l: DataFrame): DataFrame =
          tmpl.join(broadcast(l), col("from") === col("v"))
            .groupBy(col("to").as("v"))
            .agg(
              min(when(col("dir") =!= "b", col("f"))).as("f"),
              min(when(col("dir") =!= "f", col("b"))).as("b"))
        def labSum(l: DataFrame): java.math.BigDecimal = l
          .agg(sum(col("f").cast("decimal(38,0)"))
            + sum(col("b").cast("decimal(38,0)")))
          .head().getDecimal(0)
        var lab = vx.select(col("v"), col("v").as("f"),
          col("v").as("b")).localCheckpoint(false)
        t("lab0 sum")({ labSum(lab); 0L })
        for (r <- 1 to 3) {
          t(s"fused step $r (2 rounds + sum)") {
            lab = step(step(lab)).localCheckpoint(false)
            labSum(lab); 0L
          }
        }
        t("assembly (s1/u1 filters)") {
          lab.filter(col("f") === col("b")).count() +
            lab.filter(col("f") =!= col("b")).count()
        }

      case other =>
        sys.error(s"unknown profile: $other")
    }
    spark.stop()
  }
}
