package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Algebraic invariants on real testdata (SURVEY.md §5.2.3). */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = SharedSpark.sf001

  test("(value, error) pairs are mutually exclusive (R6 convention)") {
    val df = graft.queries.Scalars.caseErrorCols.run(spark, sf)
    val bad = df.filter(
      (col("work_value").isNull && col("work_error").isNull) ||
        (col("work_value").isNotNull && col("work_error").isNotNull))
    assert(bad.count() == 0)
    val bad2 = df.filter(
      (col("bounded_value").isNull && col("bounded_error").isNull) ||
        (col("bounded_value").isNotNull && col("bounded_error").isNotNull))
    assert(bad2.count() == 0)
  }

  test("set algebra: |A union B| == |A| + |B| - |A intersect B|") {
    val a = Tables.load(spark, sf, "customer").select(col("c_custkey").as("k")).distinct()
    val b = Tables.load(spark, sf, "orders").select(col("o_custkey").as("k")).distinct()
    val u = a.union(b).distinct().count()
    assert(u == a.count() + b.count() - a.intersect(b).count())
    // except is the complement of intersect within A
    assert(a.except(b).count() == a.count() - a.intersect(b).count())
  }

  test("dedup is idempotent on duplicate-injected orders") {
    val orders = Tables.load(spark, sf, "orders")
    val dup = orders.unionAll(orders.limit(100))
    val once = graft.ops.Dedup.keepFirst(dup, Seq(col("o_orderkey")), Seq(col("o_orderkey")))
    val twice = graft.ops.Dedup.keepFirst(once, Seq(col("o_orderkey")), Seq(col("o_orderkey")))
    assert(once.count() == orders.count())
    assert(twice.count() == once.count())
  }

  test("explode row count equals sum of array sizes (R15 accounting)") {
    val blocks = graft.ingest.Blocks.nested(spark, sf)
    val sumSizes = blocks.agg(sum(size(col("transactions")))).head.getLong(0)
    val exploded = blocks.select(explode(col("transactions"))).count()
    assert(exploded == sumSizes)
    assert(exploded == Tables.load(spark, sf, "lineitem").count())
  }

  test("weighted avg aggregator equals algebraic form") {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val e: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    val w = udaf(graft.functions.WeightedAvg)
    val li = Tables.load(spark, sf, "lineitem")
    val got = li.agg(w(col("l_extendedprice"), col("l_quantity"))).head.getDouble(0)
    val expected = li.agg(
      (sum(round(col("l_extendedprice") * 100, 0).cast("long") *
        round(col("l_quantity") * 100, 0).cast("long"))
        .cast("double") / 100 /
        sum(round(col("l_quantity") * 100, 0).cast("long")).cast("double"))).head.getDouble(0)
    assert(math.abs(got - expected) < 1e-6)
  }
}
