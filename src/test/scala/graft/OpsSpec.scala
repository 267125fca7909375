package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{AsOf, Dedup, Nest, Scd2, Sessionize, TopK}

/** Operator-library unit specs on small hand-built frames. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("TopK.perGroup returns at most k rows per group, in rank order") {
    val df = Seq((1, 10), (1, 20), (1, 30), (2, 5)).toDF("g", "v")
    val top = TopK.perGroup(df, Seq(col("g")), Seq(col("v").desc), k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(top.toSet == Set((1, 30, 1), (1, 20, 2), (2, 5, 1)))
  }

  test("Dedup.keepFirst keeps the order-minimal survivor, idempotently") {
    val df = Seq((1, "b"), (1, "a"), (2, "z")).toDF("k", "v")
    val once = Dedup.keepFirst(df, Seq(col("k")), Seq(col("v").asc))
    assert(once.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((1, "a"), (2, "z")))
    val twice = Dedup.keepFirst(once, Seq(col("k")), Seq(col("v").asc))
    assert(twice.collect().toSet == once.collect().toSet) // idempotent
  }

  test("Nest.nest gives childless parents an empty array, never null " +
    "(BitcoinBlockHandler.java:103-104 convention)") {
    val parents = Seq(1, 2).toDF("pk")
    val children = Seq((1, "x")).toDF("ck", "v")
    val nested = Nest.nest(parents, children, col("pk"), col("ck"),
      struct(col("v")), "kids")
    val rows = nested.collect().map(r => (r.getInt(0), r.getSeq[Any](1).length)).toMap
    assert(rows == Map(1 -> 1, 2 -> 0))
    assert(!nested.collect().exists(_.isNullAt(1)))
  }

  test("nest then explode_outer is identity-ish; inner drops empty parents (R15)") {
    val parents = Seq(1, 2, 3).toDF("pk")
    val children = Seq((1, 10), (1, 11), (3, 30)).toDF("ck", "v")
    val nested = Nest.nest(parents, children, col("pk"), col("ck"),
      struct(col("v")), "kids")
    assert(Nest.flattenInner(nested, "kids", "kid").count() == 3)
    assert(Nest.flattenOuter(nested, "kids", "kid").count() == 4) // parent 2 kept
    // explode row-count == sum of array sizes
    val sizes = nested.agg(sum(size(col("kids")))).head.getLong(0)
    assert(sizes == 3)
  }

  test("Sessionize splits on gaps > threshold") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 1000L, 2L), (1L, 100000L, 3L), // gap 99s -> new session
      (2L, 0L, 4L)).toDF("user", "ms", "id")
    val s = Sessionize.withSessionId(df, col("user"), col("ms"), col("id"), gapMs = 30000)
    val m = s.collect().map(r => (r.getLong(2), r.getLong(3))).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("AsOf.join matches latest right row at-or-before left ts") {
    val purchases = Seq((100L, 1L, 50L), (101L, 1L, 5L), (102L, 2L, 10L))
      .toDF("event_id", "user_id", "p_ms")
    val logins = Seq((10L, 1L, 10L), (11L, 1L, 40L), (12L, 2L, 20L))
      .toDF("login_id", "user_id", "l_ms")
    val joined = AsOf.join(purchases, logins, "user_id", "p_ms", "l_ms",
      rightVals = Seq("login_id", "l_ms"), rightTiebreak = "login_id")
      .select("event_id", "login_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(joined(100L).contains(11L)) // latest login at ms<=50 is login 11 @40
    assert(joined(101L).isEmpty)       // no login at-or-before ms=5
    assert(joined(102L).isEmpty)       // user 2's only login is after ms=10
  }

  test("AsOf.join fill is atomic: a null column in the latest right row is " +
    "NOT backfilled from an older right row") {
    val left = Seq((100L, 1L, 100L)).toDF("event_id", "user_id", "p_ms")
    // older right row has label "a"; the LATEST right row's label is null —
    // a per-column fill would mix "a" with the newer row's code 2
    val right = Seq(
      (10L, 1L, 10L, Some("a"), 1L),
      (11L, 1L, 50L, Option.empty[String], 2L))
      .toDF("login_id", "user_id", "l_ms", "label", "code")
    val row = AsOf.join(left, right, "user_id", "p_ms", "l_ms",
      rightVals = Seq("label", "code"), rightTiebreak = "login_id")
      .select("label", "code").head
    assert(row.isNullAt(0), "label must come from the SAME (latest) right row -> null")
    assert(row.getLong(1) == 2L)
  }

  test("Scd2.buildHistory: intervals tile the key's timeline; newest is open") {
    val changes = Seq((1L, 100L, 10L, "a"), (1L, 200L, 11L, "b"), (2L, 50L, 12L, "c"))
      .toDF("k", "ms", "id", "v")
    val hist = Scd2.buildHistory(changes, "k", "ms", "id")
      .select("k", "valid_from_ms", "valid_to_ms", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(hist == Set(
      (1L, 100L, 200L, "a"),
      (1L, 200L, Long.MaxValue, "b"),
      (2L, 50L, Long.MaxValue, "c")))
  }

  test("Scd2.pointInTime: each fact hits exactly the version valid then; " +
    "facts before the first version drop out; valid_to is exclusive") {
    val changes = Seq((1L, 100L, 10L, "a"), (1L, 200L, 11L, "b"))
      .toDF("k", "ms", "id", "v")
    val hist = Scd2.buildHistory(changes, "k", "ms", "id")
    val facts = Seq((900L, 1L, 50L), (901L, 1L, 100L), (902L, 1L, 199L),
      (903L, 1L, 200L), (904L, 1L, 99999L))
      .toDF("fid", "k", "f_ms")
    val got = Scd2.pointInTime(facts, hist, "k", "f_ms")
      .select("fid", "v").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(901L -> "a", 902L -> "a", 903L -> "b", 904L -> "b"))
  }

  test("Scd2: simultaneous changes give the earlier a zero-width interval " +
    "that matches no fact (deterministic tiebreak order)") {
    val changes = Seq((1L, 100L, 10L, "first"), (1L, 100L, 11L, "second"))
      .toDF("k", "ms", "id", "v")
    val hist = Scd2.buildHistory(changes, "k", "ms", "id")
    val facts = Seq((900L, 1L, 100L)).toDF("fid", "k", "f_ms")
    val got = Scd2.pointInTime(facts, hist, "k", "f_ms")
      .select("v").collect().map(_.getString(0)).toSeq
    assert(got == Seq("second"))
  }
}
