package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: opaque `binary`
  * payloads + typed metadata structs, processed in partition-sized
  * batches.
  *
  * The Spark-side plumbing (schema, batch shape, partitioning) is real;
  * the codec kernels are STUBBED deterministically — this container has
  * no image/audio libraries, so `decodeStub` derives fake-but-stable
  * dimensions from the payload bytes. Swap `decodeStub` for a real
  * decoder (JNI/javacv) without touching the pipeline.
  */
object Multimodal {

  /** One decoded asset's metadata (the typed half of the column pair). */
  final case class MediaMeta(
      width: Int, height: Int, channels: Int, format: String, nBytes: Long)

  final case class Asset(asset_id: Long, payload: Array[Byte])
  final case class DecodedAsset(
      asset_id: Long, payload: Array[Byte], meta: MediaMeta)

  /** STUB decoder — deterministic pseudo-decode from payload bytes.
    * A real implementation would parse the container header here. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 64 + math.floorMod(h, 1024)
    val ht = 64 + math.floorMod(h >> 10, 1024)
    MediaMeta(w, ht, 3, "stub/rgb8", payload.length.toLong)
  }

  /** Attach decoded metadata to a binary column — batch-at-a-time via
    * mapPartitions (the Scala analog of a pandas batch UDF): one codec
    * init per partition, not per row. */
  def decode(spark: SparkSession, assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // per-partition codec initialization would go here
      it.map(a => DecodedAsset(a.asset_id, a.payload, decodeStub(a.payload)))
    }
  }

  /** Deterministic stub feature vector (e.g. a perceptual hash /
    * embedding in a real pipeline): fixed-length floats from bytes. */
  def featuresStub(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Feature extraction over decoded assets. */
  def extractFeatures(spark: SparkSession, assets: Dataset[DecodedAsset], dim: Int = 8)
      : DataFrame = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map(a => (a.asset_id, featuresStub(a.payload, dim), a.meta.width, a.meta.height))
    }.toDF("asset_id", "features", "width", "height")
  }

  /** STUB resize — nearest-neighbor downsample over the raw payload
    * bytes (a real implementation would operate on the decoded pixel
    * buffer): deterministic, length-exact, order-preserving. */
  def resizeStub(payload: Array[Byte], outLen: Int): Array[Byte] = {
    if (payload.isEmpty || outLen <= 0) return Array.emptyByteArray
    val n = math.min(outLen, payload.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = payload((i.toLong * payload.length / n).toInt)
      i += 1
    }
    out
  }

  /** Resize every asset's payload to at most `targetBytes` — same
    * partition-batched shape as [[decode]] (codec init once per
    * partition, not per row). */
  def resize(spark: SparkSession, assets: Dataset[Asset], targetBytes: Int): Dataset[Asset] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map(a => Asset(a.asset_id, resizeStub(a.payload, targetBytes)))
    }
  }

  /** Frame sampling for a (stub) video payload: byte-range slices at a
    * fixed stride standing in for decoded frames. */
  def sampleFrames(spark: SparkSession, assets: Dataset[Asset], every: Int): DataFrame = {
    import spark.implicits._
    assets.flatMap { a =>
      a.payload.grouped(every).zipWithIndex.map { case (chunk, i) =>
        (a.asset_id, i.toLong, chunk)
      }
    }.toDF("asset_id", "frame_no", "frame_bytes")
  }

  /** Build a synthetic binary-asset table from the documents table
    * (text bytes as stand-in payloads) — lets the whole pipeline run
    * against driver testdata.
    *
    * Contract: the corpus must be ASCII. The frames oracle
    * (q_multimodal_frames) reproduces byte slicing with character
    * substrings, which is only exact when bytes == chars; a non-ASCII
    * document would silently shift offsets, so it raises instead. */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    val enc = encode(col("text"), "UTF-8")
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        when(octet_length(enc) === length(col("text")), enc)
          .otherwise(raise_error(concat(
            lit("non-ASCII document (byte!=char offsets break frame "),
            lit("slicing): "), col("doc_id"))))
          .as("payload"))
      .as[Asset]
  }
}
