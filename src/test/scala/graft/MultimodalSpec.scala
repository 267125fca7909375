package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("decode attaches deterministic stub metadata per asset") {
    val assets = Multimodal.assetsFromDocuments(spark, SharedSpark.sf001)
    val decoded = Multimodal.decode(spark, assets)
    val twice = Multimodal.decode(spark, assets)
    val a = decoded.collect().map(d => d.asset_id -> d.meta).toMap
    val b = twice.collect().map(d => d.asset_id -> d.meta).toMap
    assert(a == b) // deterministic "codec"
    assert(a.values.forall(m => m.width >= 64 && m.nBytes > 0))
  }

  test("feature extraction: fixed-length vectors, batch-shaped") {
    val decoded = Multimodal.decode(spark,
      Multimodal.assetsFromDocuments(spark, SharedSpark.sf001))
    val feats = Multimodal.extractFeatures(spark, decoded, dim = 8)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("asset_id", "features", "width", "height"))
    assert(feats.select(size(col("features"))).distinct().head.getInt(0) == 8)
    assert(feats.count() == 500)
  }

  test("frame sampling: one row per chunk, ordered frame numbers") {
    import spark.implicits._
    val assets = Seq(Multimodal.Asset(1L, Array.fill[Byte](100)(7))).toDS()
    val frames = Multimodal.sampleFrames(spark, assets, every = 30)
    val rows = frames.orderBy("frame_no").collect()
    assert(rows.length == 4) // 30+30+30+10
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.last.getAs[Array[Byte]]("frame_bytes").length == 10)
  }

  test("resize: deterministic nearest-neighbor downsample, never upsamples") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val assets = Seq(Multimodal.Asset(1L, payload)).toDS()
    val out = Multimodal.resize(spark, assets, targetBytes = 10)
      .collect().head.payload
    assert(out.length == 10)
    assert(out.toSeq == Seq.tabulate(10)(i => (i * 10).toByte)) // every 10th byte
    // target larger than the payload: keep original length (no upsample)
    val same = Multimodal.resize(spark, assets, targetBytes = 500)
      .collect().head.payload
    assert(same.toSeq == payload.toSeq)
    assert(Multimodal.resizeStub(Array.emptyByteArray, 10).isEmpty)
  }
}
