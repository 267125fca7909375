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
}
