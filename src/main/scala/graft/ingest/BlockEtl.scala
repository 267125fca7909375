package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The reference's whole pipeline as one runnable unit — what its user
  * actually operates day to day:
  *
  *   blocks -> rotated Avro files (R7, `AvroWriter.java`)
  *          -> warehouse APPEND (R8, `Main.java:204-259` — at-least-once:
  *             re-running appends duplicates, exactly like a retried load)
  *          -> dedup + flatten ETL materialized with REPLACE
  *             (R12-R17, `etl.sh`)
  *
  * CLI flags mirror `Main.java:55-93` where they still mean something on
  * Spark (`--rotationtime`; `--threads` ≙ the session's parallelism) —
  * the GCS/BQ plumbing they configured dissolves into paths.
  *
  * Usage: runMain graft.ingest.BlockEtl --workdir <dir>
  *          [--input <blocks parquet>|golden] [--rotationtime <sec>]
  */
object BlockEtl {

  final case class Result(avroFiles: Int, warehouseRows: Long, etlRows: Long)

  /** One pipeline run. Repeated calls APPEND to the warehouse (the
    * reference's at-least-once semantics) while the ETL destination is
    * fully replaced each time — so `etlRows` is stable across re-runs
    * even as `warehouseRows` grows: the dedup repair at work. */
  def run(spark: SparkSession, blocks: DataFrame, workDir: String,
      rotationSeconds: Long): Result = {
    val avroDir = s"$workDir/avro"
    val warehouseDir = s"$workDir/warehouse"
    val destDir = s"$workDir/transactions"

    // R7: rotated Avro container files, event-time bucketed.
    // avroFiles reports THIS run's output (the directory accumulates
    // across re-runs by design — append semantics).
    def countAvro() = Option(new java.io.File(avroDir).listFiles())
      .getOrElse(Array.empty[java.io.File]).count(_.getName.endsWith(".avro"))
    val before = countAvro()
    AvroSink.write(blocks, "timestamp", rotationSeconds, avroDir)
    val avroFiles = countAvro() - before

    // R8: warehouse append (parquet stands in for the BQ table). The
    // rotated files are the transport format; the warehouse loads the
    // same rows (we append the source frame — one job, same data —
    // rather than re-parsing avro, which AvroSink.readAll covers).
    blocks.write.mode(SaveMode.Append).parquet(warehouseDir)
    val warehouse = spark.read.schema(blocks.schema).parquet(warehouseDir)
    val warehouseRows = warehouse.count()

    // R12-R17: dedup + inner-unnest + star-project, REPLACE destination
    Bitcoin.etl(warehouse).write.mode(SaveMode.Overwrite).parquet(destDir)
    val etlRows = spark.read.parquet(destDir).count()

    Result(avroFiles, warehouseRows, etlRows)
  }

  private val KnownFlags = Set("workdir", "input", "rotationtime", "threads")

  def main(args: Array[String]): Unit = {
    // strict flag parsing: unknown or value-less flags abort instead of
    // silently falling back (a typo'd --workdir must not send the
    // warehouse to a fresh temp dir)
    val opts = args.grouped(2).map {
      // a value may not itself look like a flag: "--input --workdir /x"
      // must abort, not read "--workdir" as the input path
      case Array(k, v) if k.startsWith("--") && KnownFlags(k.drop(2)) &&
          !v.startsWith("--") =>
        k.drop(2) -> v
      case bad =>
        sys.error(s"usage: BlockEtl [--workdir D] [--input P|golden] " +
          s"[--rotationtime S] [--threads N]; offending args: ${bad.mkString(" ")}")
    }.toMap
    val workDir = opts.getOrElse("workdir",
      java.nio.file.Files.createTempDirectory("blocketl").toString)
    val rotation = opts.getOrElse("rotationtime", "600").toLong
    val threads = opts.getOrElse("threads", "4")
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val blocks = opts.get("input").filter(_ != "golden")
      .map(p => spark.read.schema(Bitcoin.blockSchema).parquet(p))
      .getOrElse(Bitcoin.goldenBlocks(spark))
    val r = run(spark, blocks, workDir, rotation)
    println(s"[blocketl] avroFiles=${r.avroFiles} warehouseRows=${r.warehouseRows} " +
      s"etlRows=${r.etlRows} workdir=$workDir")
    spark.stop()
  }
}
