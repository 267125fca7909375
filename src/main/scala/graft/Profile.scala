package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection harness: runMain graft.Profile <queryName> [sfDir]
  * Prints the formatted physical plan and wall-times three runs. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
      // the pre-execution formatted plan hides AQE's runtime stage
      // reuse — drive one plan to completion and print its FINAL
      // adaptive form, where ReusedExchange/ReusedSubquery show
      if (i == 1) {
        val qe = fn(spark, sfDir).queryExecution
        qe.executedPlan.execute()
          .foreachPartition((_: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => ())
        println("[profile] final adaptive plan:\n" + qe.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
