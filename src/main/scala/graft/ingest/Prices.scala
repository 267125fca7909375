package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Price-history CSV ingest — the reference's third pipeline
  * (`bitcoin_pricing/ingest_prices.sh`): headerless gzipped CSV per
  * exchange, explicit schema `timestamp,priceUSD,volumeBTC`
  * (`ingest_prices.sh:10`), full-replace load (`:32`).
  *
  * Spark-first: the CSV datasource handles gzip transparently from the
  * `.gz` extension, schema is declared (never inferred), and the
  * "full replace" is `mode("overwrite")`.
  */
object Prices {

  /** `ingest_prices.sh:10` — schema string
    * `timestamp:timestamp,priceUSD:float,volumeBTC:float`.
    * Floats widened to double (Spark CSV reads FloatType fine, but the
    * warehouse-side BQ FLOAT is 64-bit — double is the faithful map). */
  val schema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = true),
    StructField("priceUSD", DoubleType, nullable = true),
    StructField("volumeBTC", DoubleType, nullable = true)))

  /** The five exchanges of `ingest_prices.sh:12-17`. */
  val exchanges: Seq[String] =
    Seq("coinbaseUSD", "bitstampUSD", "btceUSD", "krakenUSD", "bitflyerJPY")

  /** Load one exchange's CSV(.gz): headerless, typed on load. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "false")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  /** Full-replace materialization (ingest_prices.sh:32 `--replace`). */
  def replaceInto(df: DataFrame, dest: String): Unit =
    df.write.mode("overwrite").parquet(dest)
}
