package graft.ml

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Job/stage-level profiler for one full [[Pq.ivfAdcTopK]] run (dev
  * tool): prints every Spark job's wall time + callsite to attribute
  * where the 14.8s on 2000 vectors actually goes. */
object ProfileIvf2 {
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

    val jobStart = TrieMap.empty[Int, (Long, String)]
    val stageTime = TrieMap.empty[Int, Long] // jobId -> sum of task time? keep simple
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart(e.jobId) = (System.nanoTime(),
          Option(e.properties.getProperty("callSite.short")).getOrElse(""))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        jobStart.remove(e.jobId).foreach { case (t0, cs) =>
          val s = (System.nanoTime() - t0) / 1e9
          if (s > 0.05)
            println(f"[job] ${e.jobId}%4d ${s}%7.2f s  $cs")
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val info = e.stageInfo
        val dur = (for {a <- info.completionTime; b <- info.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        val m = info.taskMetrics
        if (dur > 0.05)
          println(f"[stage] ${info.stageId}%4d ${dur}%7.2f s tasks=${info.numTasks} " +
            f"run=${m.executorRunTime / 1e3}%6.2f deser=${m.executorDeserializeTime / 1e3}%6.2f " +
            f"gc=${m.jvmGCTime / 1e3}%5.2f cpu=${m.executorCpuTime / 1e9}%6.2f ${info.name.take(50)}")
      }
    })

    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    emb.count()

    def cg(): (Long, Long, Long) = {
      val m = org.apache.spark.metrics.source.CodegenMetrics
      (m.METRIC_COMPILATION_TIME.getCount,
        m.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum,
        m.METRIC_GENERATED_METHOD_BYTECODE_SIZE.getCount)
    }
    val (c0, t0c, _) = cg()
    val t0 = System.nanoTime()
    val n = Pq.ivfAdcTopK(emb, "vec_id", "embedding",
      8, 2, 4, 16, 16, 2, 100L, 10).count()
    println(f"[ivf2] full ivfAdcTopK ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n)")
    val (c1, t1c, _) = cg()
    println(s"[ivf2] codegen compiles=${c1 - c0} compile_ms_total=${t1c - t0c}")
    val t2 = System.nanoTime()
    val n2 = Pq.ivfAdcTopK(emb, "vec_id", "embedding",
      8, 2, 4, 16, 16, 2, 100L, 10).count()
    println(f"[ivf2] rerun ivfAdcTopK ${(System.nanoTime() - t2) / 1e9}%6.2f s ($n2)")
    val (c2, t2c, _) = cg()
    println(s"[ivf2] rerun codegen compiles=${c2 - c1} compile_ms_total=${t2c - t1c}")
    Thread.sleep(1000)
    spark.stop()
  }
}
