package graft

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.{AvroSink, Blocks, Prices}

class IngestSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("Prices: headerless gzipped CSV loads with the declared schema " +
    "(ingest_prices.sh:10,29-32)") {
    val dir = Files.createTempDirectory("prices").toFile
    val gz = new File(dir, "coinbaseUSD.csv.gz")
    val out = new GZIPOutputStream(new FileOutputStream(gz))
    out.write(
      """2015-01-01 00:00:00,300.5,1.25
        |2015-01-01 00:01:00,301.0,0.5
        |""".stripMargin.getBytes("UTF-8"))
    out.close()
    val df = Prices.read(spark, gz.getAbsolutePath)
    assert(df.schema.fieldNames.toSeq == Seq("timestamp", "priceUSD", "volumeBTC"))
    val rows = df.orderBy("timestamp").collect()
    assert(rows.length == 2)
    assert(rows(0).getDouble(1) == 300.5 && rows(0).getDouble(2) == 1.25)
    // full-replace materialization (the --replace semantics)
    val dest = new File(dir, "out").getAbsolutePath
    Prices.replaceInto(df, dest)
    Prices.replaceInto(df, dest) // replace, not append
    assert(spark.read.parquet(dest).count() == 2)
  }

  test("AvroSink: rotated container files round-trip and bucket by event time " +
    "(AvroWriter.java:38-49 re-expressed)") {
    val out = Files.createTempDirectory("avrosink").toString
    import spark.implicits._
    val df = Seq(
      (0L, "r1", Some(1.5)), (59000L, "r2", Some(2.5)), // window 0
      (60000L, "r3", Some(3.5)), // window 1
      (7200000L, "r4", None)) // null value exercises the union-with-null schema
      .toDF("ts_ms", "name", "value")
    AvroSink.write(df, "ts_ms", rotationSeconds = 60, outDir = out)
    val rows = AvroSink.readAll(out)
    assert(rows.size == 4)
    assert(rows.map(_("name")).toSet == Set("r1", "r2", "r3", "r4"))
    val files = new File(out).listFiles().map(_.getName)
    assert(files.forall(_.matches("""\d{4}\.\d{2}\.\d{2}\.\d{2}\.\d{2}\.\d{2}-p\d+-w[0-9a-z]+-\d+\.avro""")))
    assert(files.exists(_.startsWith("1970.01.01.00.00.00")))
    assert(files.exists(_.startsWith("1970.01.01.00.01.00")))
    assert(files.exists(_.startsWith("1970.01.01.02.00.00")))
  }

  test("AvroSink: rapid re-writes into one directory never truncate " +
    "(per-invocation suffix keeps same-bucket file names distinct)") {
    val out = Files.createTempDirectory("avrosink-retrigger").toString
    import spark.implicits._
    // identical rows, identical time bucket, back-to-back writes — the
    // deterministic stamp-p<pid> prefix COLLIDES by construction, and
    // DataFileWriter.create would silently truncate the first file if
    // the suffix didn't disambiguate invocations
    val df = Seq((0L, "a", Some(1.0)), (1000L, "b", Some(2.0)))
      .toDF("ts_ms", "name", "value")
    AvroSink.write(df, "ts_ms", rotationSeconds = 60, outDir = out)
    AvroSink.write(df, "ts_ms", rotationSeconds = 60, outDir = out)
    val rows = AvroSink.readAll(out)
    assert(rows.size == 4, s"expected 4 rows (2 writes x 2), got ${rows.size}")
    assert(rows.map(_("name")).count(_ == "a") == 2)
    // same stamp prefix, distinct full names
    val files = new File(out).listFiles().map(_.getName)
    assert(files.length == files.distinct.length)
    assert(files.forall(_.startsWith("1970.01.01.00.00.00")))
  }

  test("Blocks.nested: empty-tx blocks get [], duplicates injected 1-in-10") {
    val blocks = Blocks.nested(spark, SharedSpark.sf001).cache()
    assert(blocks.filter(col("transactions").isNull).count() == 0)
    val n = blocks.count()
    val dup = Blocks.withDuplicates(blocks)
    val extra = blocks.filter(col("block_id") % 10 === 0).count()
    assert(dup.count() == n + extra)
    // arrays sorted by leading l_linenumber
    val arr = blocks.filter(size(col("transactions")) > 2)
      .select(col("transactions.l_linenumber")).head.getSeq[Int](0)
    assert(arr == arr.sorted)
  }
}
