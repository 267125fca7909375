package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Embeddings

class EmbeddingsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.load(spark, SharedSpark.sf001, "embeddings").cache()

  test("cosine of a vector with itself is 1") {
    val c = emb.limit(5)
      .select(Embeddings.cosine(col("embedding"), col("embedding")))
      .collect().map(_.getDouble(0))
    assert(c.forall(v => math.abs(v - 1.0) < 1e-6))
  }

  test("knnBrute: probe present in corpus ranks itself first with cosine ~1") {
    val probes = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_embedding"))
    val top1 = Embeddings.knnBrute(emb, probes, k = 1)
      .select("probe_id", "vec_id", "cosine").collect()
    assert(top1.length == 3)
    top1.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-6)
    }
  }

  test("knnLsh finds exact duplicates (same bucket by construction)") {
    val planes = Embeddings.hyperplanes(dim = 64, numPlanes = 6, seed = 42L)
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_embedding"))
    val hits = Embeddings.knnLsh(emb, probes, k = 3, planes)
      .filter(col("vec_id") === col("probe_id"))
    assert(hits.count() == 5) // each probe finds its own copy, rank 1
    assert(hits.filter(col("rank") === 1).count() == 5)
  }

  test("lshBucket is deterministic across evaluations") {
    val planes = Embeddings.hyperplanes(64, 6, seed = 42L)
    val b1 = emb.select(col("vec_id"), Embeddings.lshBucket(col("embedding"), planes))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b2 = emb.select(col("vec_id"), Embeddings.lshBucket(col("embedding"), planes))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(b1 == b2)
    assert(b1.values.toSet.size > 1, "buckets should partition the space")
  }
}
