package graft

import org.apache.spark.sql.SparkSession

/** Driver-smoke simulation: calls SparkEntry.entry under a DEFAULT
  * SparkSession — no ANSI-off, no NTZ-off, no extensions — because the
  * driver's smoke check may not use our Verify session configs. The
  * flagship must return rows under Spark 4 defaults (ANSI on, millis
  * parquet read as TIMESTAMP_NTZ). */
object SmokeDefault {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke-default] entry rows = $n (ansi=${spark.conf.get("spark.sql.ansi.enabled")})")
    require(n > 0, "driver smoke would fail")
    spark.stop()
  }
}
