package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Structured Streaming specs (SURVEY.md §2.B s_stream_*): these have
  * no SQL oracle, so MemoryStream-driven ScalaTest is the gate. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("s_stream_tumbling: watermarked tumbling window counts") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "v")
    val q = Streams.runToMemory(
      Streams.tumblingCounts(df, "ts", widthSeconds = 60), "tumbling", "complete")
    try {
      mem.addData((ts(0), "a"), (ts(10), "b"), (ts(59), "c"), (ts(60), "d"), (ts(100), "e"))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select(unix_timestamp(col("window_start")).as("w"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(rows == Map(0L -> 3L, 60L -> 2L))
    } finally q.stop()
  }

  test("s_observe_listener: per-batch progress listener fires with row/state counts " +
    "(R11, the Main.java:154-160 queue monitor analog)") {
    implicit val ctx = spark.sqlContext
    val listener = new graft.streaming.ProgressListener(quiet = true)
    spark.streams.addListener(listener)
    val mem = MemoryStream[(Timestamp, String)]
    val q = Streams.runToMemory(
      Streams.tumblingCounts(mem.toDF().toDF("ts", "v"), "ts", widthSeconds = 60),
      "observed", "complete")
    try {
      mem.addData((ts(0), "a"), (ts(10), "b"), (ts(70), "c"))
      q.processAllAvailable()
      // listener events are delivered async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while ((listener.batchesSeen.get() == 0 || listener.maxStateRows.get() == 0) &&
        System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(listener.batchesSeen.get() > 0)
      assert(listener.inputRowsSeen.get() == 3)
      assert(listener.maxStateRows.get() > 0) // the windowed agg keeps state rows
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("s_stream_backpressure: a file backlog drains as bounded " +
    "micro-batches under maxFilesPerTrigger, completely and in order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bp").toString
    val chk = java.nio.file.Files.createTempDirectory("graft-bpchk").toString
    // 12 files x 50 rows of backlog
    val in = spark.range(600).select(col("id"), (col("id") % 7).as("k"))
    in.repartition(12).write.mode("overwrite").parquet(s"$dir/in")
    val ledger = Streams.drainWithBackpressure(
      spark, in.schema, s"$dir/in", maxFilesPerTrigger = 3, chk)
    // bounded: 12 files / 3 per trigger -> at least 4 batches, none
    // carrying the whole backlog
    assert(ledger.size >= 4, ledger.toString)
    assert(ledger.map(_._2).max < 600, ledger.toString)
    // complete + in epoch order
    assert(ledger.map(_._2).sum == 600, ledger.toString)
    assert(ledger.map(_._1) == ledger.map(_._1).sorted, ledger.toString)
  }

  test("s_stream_backpressure_sustained: per-batch intake stays capped " +
    "while a producer keeps appending mid-drain, and every appended " +
    "row is accounted for (the bounded-in-flight property the " +
    "reference's unbounded queue lacks)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bps").toString
    val chk = java.nio.file.Files.createTempDirectory("graft-bpschk").toString
    // initial backlog: 6 files x 40 rows
    val mk = (n: Int) => spark.range(n).select(col("id"), (col("id") % 7).as("k"))
    mk(240).repartition(6).write.mode("overwrite").parquet(s"$dir/in")
    val ledger = Streams.sustainedDrainWithBackpressure(
      spark, mk(1).schema, s"$dir/in", maxFilesPerTrigger = 2, chk,
      waves = 3) { _ =>
      // each wave lands 2 more 40-row files while the query runs
      mk(80).repartition(2).write.mode("append").parquet(s"$dir/in")
    }
    // bounded in-flight across EVERY trigger: never more than 2 files'
    // worth (80 rows) in one batch, pressure or not
    assert(ledger.map(_._2).max <= 80, ledger.toString)
    // (6 + 3*2) files / 2 per trigger -> at least 6 batches
    assert(ledger.size >= 6, ledger.toString)
    // complete: 240 initial + 3 waves x 80 pumped, in epoch order
    assert(ledger.map(_._2).sum == 480, ledger.toString)
    assert(ledger.map(_._1) == ledger.map(_._1).sorted, ledger.toString)
  }

  test("s_stream_session_window: built-in session windows merge within gap") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "user_id")
    val q = Streams.runToMemory(
      Streams.sessionCounts(df, "ts", "user_id", gap = "60 seconds"),
      "swin", "complete")
    try {
      // user 1: events at 0s and 30s merge (gap < 60s); 500s is separate
      mem.addData((ts(0), 1L), (ts(30), 1L), (ts(500), 1L), (ts(5), 2L))
      q.processAllAvailable()
      val rows = spark.table("swin")
        .select("user_id", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.count(_._1 == 1L) == 2) // two sessions for user 1
      assert(rows.toSet == Set((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("s_stream_dedup: duplicates dropped within the watermark " +
    "(streaming repair of the at-least-once append, etl.sh:12-17)") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "block_id")
    val q = Streams.runToMemory(
      Streams.dedupWithinWatermark(df, "ts", Seq("block_id")), "dedup")
    try {
      mem.addData((ts(0), 1L), (ts(1), 1L), (ts(2), 2L), (ts(3), 1L), (ts(4), 3L))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("block_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("s_stream_interval_join: trades match prices within the trailing interval") {
    implicit val ctx = spark.sqlContext
    val trades = MemoryStream[(Timestamp, String, Long)]
    val prices = MemoryStream[(Timestamp, String, Double)]
    val joined = Streams.intervalJoin(
      trades.toDF().toDF("t_ts", "t_sym", "trade_id"),
      prices.toDF().toDF("p_ts", "p_sym", "price"),
      leftKey = "t_sym", rightKey = "p_sym",
      leftTs = "t_ts", rightTs = "p_ts",
      interval = "60 SECONDS")
    val q = Streams.runToMemory(joined, "ivjoin")
    try {
      // base offset: an event at exactly epoch 0 ties with Spark's
      // INITIAL watermark (0) and is dropped as late — real data never
      // sits at epoch 0, tests shouldn't either
      val b = 100000L
      prices.addData((ts(b), "BTC", 100.0), (ts(b + 30), "BTC", 101.0),
        (ts(b + 200), "BTC", 105.0))
      trades.addData((ts(b + 40), "BTC", 1L), (ts(b + 500), "BTC", 2L))
      q.processAllAvailable()
      val rows = spark.table("ivjoin")
        .select("trade_id", "price").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      // trade 1 @+40s sees prices @+0s and @+30s (within 60s); trade 2
      // @+500s sees nothing (last price @+200s is 300s stale)
      assert(rows == Set((1L, 100.0), (1L, 101.0)))
    } finally q.stop()
  }

  test("s_stream_static_join: events enrich from a broadcast dim table, " +
      "unmatched keys survive as NULL (left join), state stays empty") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("dim_id", "tier")
    val joined = Streams.enrichWithStatic(
      mem.toDF().toDF("ts", "user"), dim, "user", "dim_id")
      .select(col("user"), col("tier"))
    val q = Streams.runToMemory(joined, "enriched")
    try {
      mem.addData((ts(100), 1L), (ts(101), 2L), (ts(102), 7L))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows == Set((1L, Some("gold")), (2L, Some("silver")), (7L, None)))
      // stateless: a stream-static join keeps no state rows between batches
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("s_stream_rotate_sink: micro-batches land as rotated Avro container files") {
    implicit val ctx = spark.sqlContext
    val out = Files.createTempDirectory("rotsink").toString
    val chk = Files.createTempDirectory("rotchk").toString
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("ts_ms", "payload")
    val q = Streams.rotatedAvroSink(df, "ts_ms", rotationSeconds = 60,
      outDir = out, checkpoint = chk).start()
    try {
      // two rotation windows: 0..59s and 60..119s (event time)
      mem.addData((1000L, "a"), (2000L, "b"), (61000L, "c"))
      q.processAllAvailable()
      val rows = graft.ingest.AvroSink.readAll(out)
      assert(rows.map(_("payload")).toSet == Set("a", "b", "c"))
      val files = new java.io.File(out).listFiles().map(_.getName).sorted
      assert(files.exists(_.startsWith("1970.01.01.00.00.00")))
      assert(files.exists(_.startsWith("1970.01.01.00.01.00")))
      // second micro-batch hitting the SAME event-time bucket must not
      // truncate batch 1's container file (regression: deterministic
      // file names collided across batches)
      mem.addData((3000L, "d"), (4000L, "e"))
      q.processAllAvailable()
      val all = graft.ingest.AvroSink.readAll(out).map(_("payload")).toSet
      assert(all == Set("a", "b", "c", "d", "e"))
    } finally q.stop()
  }

  test("s_stream_upsert_sink: micro-batch CDC merges into a versioned snapshot, " +
    "last change per key wins within a batch") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val mem = MemoryStream[(Long, Long, String, String)] // (k, seq, v, op)
    val df = mem.toDF().toDF("k", "seq", "v", "op")
    val q = Streams.upsertSink(df, "k", "seq",
      s"$dir/table", s"$dir/ckpt").start()
    def snapshot(): Map[Long, String] =
      Streams.currentSnapshot(spark, s"$dir/table").get
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    try {
      // batch 0: two inserts, plus an intra-batch overwrite of k=1 (seq wins)
      mem.addData((1L, 1L, "a1", "upsert"), (2L, 1L, "b1", "upsert"),
        (1L, 2L, "a2", "upsert"))
      q.processAllAvailable()
      assert(snapshot() == Map(1L -> "a2", 2L -> "b1"))
      // batch 1: update k=2, delete k=1, insert k=3
      mem.addData((2L, 3L, "b2", "upsert"), (1L, 4L, "", "delete"),
        (3L, 5L, "c1", "upsert"))
      q.processAllAvailable()
      assert(snapshot() == Map(2L -> "b2", 3L -> "c1"))
      // the seq column rides along unchanged; both versions still readable
      assert(spark.read.parquet(s"$dir/table/v0").count() == 2)
    } finally q.stop()
  }

  test("upsert sink batch replay after a committed pointer is a no-op " +
    "(crash between commitPointer and the checkpoint commit)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val table = s"$dir/table"
    val b0 = Seq((1L, 1L, "a1", "upsert"), (2L, 1L, "b1", "upsert"))
      .toDF("k", "seq", "v", "op")
    Streams.mergeBatch(b0, 0L, "k", "seq", table)
    val b1 = Seq((2L, 2L, "b2", "upsert"), (3L, 3L, "c1", "upsert"))
      .toDF("k", "seq", "v", "op")
    Streams.mergeBatch(b1, 1L, "k", "seq", table)
    def snapshot(): Map[Long, String] =
      Streams.currentSnapshot(spark, table).get
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val committed = snapshot()
    assert(committed == Map(1L -> "a1", 2L -> "b2", 3L -> "c1"))
    // replay of batch 1 (checkpoint hadn't committed): LATEST already
    // points at v1 — pre-fix this overwrote the directory being read
    // and threw; now it must no-op and leave the snapshot intact
    Streams.mergeBatch(b1, 1L, "k", "seq", table)
    assert(Streams.currentVersion(table).contains(1L))
    assert(snapshot() == committed)
  }

  test("s_stream_scd2: the maintained history equals a full batch " +
    "rebuild after every micro-batch, including a LATE change that " +
    "splices into an existing key's timeline; replay is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2s").toString
    val table = s"$dir/hist"
    def hist(rows: Seq[(Long, Long, Long, String)]) =
      graft.ops.Scd2.buildHistory(
        rows.toDF("k", "ts", "seq", "v"), "k", "ts", "seq")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
          r.getLong(4), r.getLong(5))).toSet
    def snapshot() = Streams.currentSnapshot(spark, table).get
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSet
    val b0 = Seq((1L, 100L, 1L, "a1"), (2L, 100L, 2L, "b1"))
    val b1 = Seq((1L, 200L, 3L, "a2"), (3L, 150L, 4L, "c1"))
    // late: k=1 changed at ts=160, BETWEEN the two existing versions —
    // must close a1 at 160 and the new row at 200
    val b2 = Seq((1L, 160L, 5L, "a1b"))
    Streams.scd2MergeBatch(b0.toDF("k", "ts", "seq", "v"), 0L,
      "k", "ts", "seq", table)
    assert(snapshot() == hist(b0))
    Streams.scd2MergeBatch(b1.toDF("k", "ts", "seq", "v"), 1L,
      "k", "ts", "seq", table)
    assert(snapshot() == hist(b0 ++ b1))
    Streams.scd2MergeBatch(b2.toDF("k", "ts", "seq", "v"), 2L,
      "k", "ts", "seq", table)
    assert(snapshot() == hist(b0 ++ b1 ++ b2))
    // the spliced key has exactly three versions chained 100->160->200
    val k1 = snapshot().filter(_._1 == 1L).toSeq.sortBy(_._5)
    assert(k1.map(t => (t._5, t._6)) ==
      Seq((100L, 160L), (160L, 200L), (200L, Long.MaxValue)))
    // replay of the committed batch is a no-op
    Streams.scd2MergeBatch(b2.toDF("k", "ts", "seq", "v"), 2L,
      "k", "ts", "seq", table)
    assert(Streams.currentVersion(table).contains(2L))
    assert(snapshot() == hist(b0 ++ b1 ++ b2))
    // a batchId strictly behind the pointer fails loudly
    intercept[IllegalStateException] {
      Streams.scd2MergeBatch(b1.toDF("k", "ts", "seq", "v"), 1L,
        "k", "ts", "seq", table)
    }
  }

  test("streaming dedup verdict sink: per-batch exact/near/unique vs a " +
    "static corpus, replay-idempotent per-batch output dirs") {
    implicit val ctx = spark.sqlContext
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu one two three four"
    val corpus = Seq(
      (100L, base),
      (101L, "totally different corpus content about nothing in particular"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val mem = MemoryStream[(Long, String)]
    val q = Streams.dedupVerdictSink(
      mem.toDF().toDF("doc_id", "text"), corpus,
      s"$dir/out", s"$dir/ckpt").start()
    try {
      mem.addData(
        (1L, base),                                   // exact (same token set)
        (2L, base.replace("four", "FIVE")),           // near (one word changed)
        (3L, "nothing shared with anything at all")) // unique
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out/b0")
        .select("doc_id", "verdict", "dup_of")
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(got == Map(1L -> "exact_dup", 2L -> "near_dup", 3L -> "unique"),
        s"got $got")
      // second batch appends its own directory
      mem.addData((4L, base))
      q.processAllAvailable()
      val b1 = spark.read.parquet(s"$dir/out/b1")
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(b1 == Map(4L -> "exact_dup"))
    } finally q.stop()
  }

  test("upsert sink fails loudly when a fresh checkpoint (batchId " +
    "restarting at 0) is pointed at an existing table dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stale").toString
    val table = s"$dir/table"
    val b = Seq((1L, 1L, "a1", "upsert")).toDF("k", "seq", "v", "op")
    Streams.mergeBatch(b, 0L, "k", "seq", table)
    Streams.mergeBatch(b, 1L, "k", "seq", table)
    // true replay only ever re-runs the in-flight batch (== committed);
    // strictly-below means a mismatched checkpoint — previously every
    // early batch was silently dropped until batchId caught up
    val e = intercept[IllegalStateException] {
      Streams.mergeBatch(b, 0L, "k", "seq", table)
    }
    assert(e.getMessage.contains("behind committed version"))
  }

  test("s_stream_kmv: incremental bottom-k sketch equals the batch " +
    "sketch at every micro-batch prefix (mergeability over time)") {
    implicit val ctx = spark.sqlContext
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def kmvRef(ids: Seq[Long], k: Int): (Long, Long) = {
      val hs = ids.distinct.map(i => md5hex(i.toString)).sorted.take(k)
      val est =
        if (hs.length < k) hs.length.toLong
        else (k - 1).toLong * 281474976710656L /
          math.max(java.lang.Long.parseLong(hs.last.take(12), 16), 1L)
      (hs.length.toLong, est)
    }
    val mem = MemoryStream[(String, Long)]
    val ds = graft.streaming.StatefulKmv.kmvDistinct(
      spark, mem.toDF().toDF("grp", "id"), "grp", "id", k = 16)
    val q = Streams.runToMemory(ds.toDF(), "kmvstream", "update")
    try {
      val b1 = (1L to 60L).toSeq
      val b2 = (41L to 100L).toSeq // overlaps b1: distinct-ness matters
      mem.addData(b1.map(i => ("x", i)): _*)
      q.processAllAvailable()
      mem.addData(b2.map(i => ("x", i)): _*)
      q.processAllAvailable()
      val rows = spark.table("kmvstream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val p1 = kmvRef(b1, 16)
      val pAll = kmvRef(b1 ++ b2, 16)
      // one update per micro-batch, each equal to the BATCH sketch over
      // everything seen so far
      assert(rows == Set(("x", p1._1, p1._2), ("x", pAll._1, pAll._2)),
        s"got $rows, want prefix=$p1 full=$pAll")
      assert(pAll._2 > 0 && p1._1 == 16L && pAll._1 == 16L)
    } finally q.stop()
  }

  test("s_stream_reservoir: incremental md5-priority sample equals the " +
    "batch sample at every micro-batch prefix, any arrival order") {
    implicit val ctx = spark.sqlContext
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def ref(ids: Seq[Long], k: Int): Seq[Long] =
      ids.distinct.map(i => (md5hex(i.toString), i)).sortBy(_._1)
        .take(k).map(_._2)
    val mem = MemoryStream[(String, Long)]
    val ds = graft.streaming.StatefulReservoir.uniformSample(
      spark, mem.toDF().toDF("grp", "id"), "grp", "id", k = 8)
    val q = Streams.runToMemory(ds.toDF(), "resstream", "update")
    try {
      // second batch arrives out of order and overlaps the first:
      // both order-independence and distinct-ness sit in the pin
      val b1 = (1L to 40L).toSeq
      val b2 = (60L to 25L by -1L).toSeq
      mem.addData(b1.map(i => ("x", i)): _*)
      q.processAllAvailable()
      mem.addData(b2.map(i => ("x", i)): _*)
      q.processAllAvailable()
      val rows = spark.table("resstream").collect()
        .map(r => (r.getLong(1), r.getSeq[Long](2).toSeq)).toSet
      val p1 = ref(b1, 8)
      val pAll = ref(b1 ++ b2, 8)
      assert(rows == Set((p1.length.toLong, p1), (pAll.length.toLong, pAll)),
        s"got $rows, want prefix=$p1 full=$pAll")
      // the sample is a uniform subset: every id within seen range
      assert(pAll.forall(i => i >= 1L && i <= 60L) && pAll.length == 8)
    } finally q.stop()
  }

  test("s_stream_hll: incremental 256-register HLL equals the batch " +
    "sketch at every micro-batch prefix (register-max mergeability)") {
    implicit val ctx = spark.sqlContext
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // Independent reference: same construction, recomputed from raw ids.
    def hllRef(ids: Seq[Long]): (Long, Long) = {
      val regs = new Array[Int](256)
      ids.distinct.foreach { i =>
        val h = md5hex(i.toString)
        val reg = Integer.parseInt(h.substring(0, 2), 16)
        val w = java.lang.Long.parseLong(h.substring(2, 14), 16)
        val r = if (w == 0L) 49 else 49 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (r > regs(reg)) regs(reg) = r
      }
      val ss = regs.map(m => BigInt(1) << (49 - m)).sum
      (regs.count(_ == 0).toLong,
        (BigInt("26499596412111161535758336") / (ss * 1000000)).toLong)
    }
    val mem = MemoryStream[(String, Long)]
    val ds = graft.streaming.StatefulHll.hllDistinct(
      spark, mem.toDF().toDF("grp", "id"), "grp", "id")
    val q = Streams.runToMemory(ds.toDF(), "hllstream", "update")
    try {
      val b1 = (1L to 400L).toSeq
      val b2 = (201L to 700L).toSeq // overlap: register max must dedup
      mem.addData(b1.map(i => ("x", i)): _*)
      q.processAllAvailable()
      mem.addData(b2.map(i => ("x", i)): _*)
      q.processAllAvailable()
      val rows = spark.table("hllstream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val p1 = hllRef(b1)
      val pAll = hllRef(b1 ++ b2)
      assert(rows == Set(("x", p1._1, p1._2), ("x", pAll._1, pAll._2)),
        s"got $rows, want prefix=$p1 full=$pAll")
      // The full-stream estimate should sit near the true 700.
      assert(math.abs(pAll._2 - 700) <= 700 * 26 / 100,
        s"estimate ${pAll._2} drifts past 4 sigma of 700")
    } finally q.stop()
  }

  test("s_stream_quantile: incremental 64-bucket histogram median " +
    "equals the batch sketch at every prefix and stays in the bucket " +
    "bound of the exact median") {
    implicit val ctx = spark.sqlContext
    val (mn, mx) = (0L, 1023L) // frozen range, the batch-trained artifact
    // Independent reference: same construction, recomputed from values.
    def ref(vs: Seq[Long]): (Long, Long) = {
      val counts = new Array[Long](64)
      vs.foreach { v =>
        counts(math.max(0L, math.min(63L, (v - mn) * 64 / (mx - mn + 1))).toInt) += 1
      }
      val n = vs.length.toLong
      val target = (n + 1) / 2
      var cum = 0L; var i = 0
      while (cum + counts(i) < target) { cum += counts(i); i += 1 }
      val width = mx - mn + 1
      (n, mn + width * i / 64 + (width / 64) * (target - cum - 1) / counts(i))
    }
    val mem = MemoryStream[(String, Long)]
    val ds = graft.streaming.StatefulQuantile.medianSketch(
      spark, mem.toDF().toDF("grp", "v"), "grp", "v", mn, mx)
    val q = Streams.runToMemory(ds.toDF(), "quantstream", "update")
    try {
      val b1 = (1 to 500).map(i => (i * 37L) % 1024L)
      val b2 = (1 to 400).map(i => (i * 91L) % 1024L)
      mem.addData(b1.map(v => ("x", v)): _*)
      q.processAllAvailable()
      mem.addData(b2.map(v => ("x", v)): _*)
      q.processAllAvailable()
      val rows = spark.table("quantstream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val p1 = ref(b1)
      val pAll = ref(b1 ++ b2)
      assert(rows == Set(("x", p1._1, p1._2), ("x", pAll._1, pAll._2)),
        s"got $rows, want prefix=$p1 full=$pAll")
      // sketch contract: estimate within one bucket width of the exact
      // (lower) median
      val exact = (b1 ++ b2).sorted.apply(((b1.size + b2.size + 1) / 2) - 1)
      assert(math.abs(pAll._2 - exact) <= (mx - mn + 1) / 64 + 1,
        s"est ${pAll._2} vs exact $exact")
    } finally q.stop()
  }

  test("s_stream_funnel: stage tracking equals the batch window " +
    "formula at every prefix, including a late signup that rewrites " +
    "the click selection") {
    implicit val ctx = spark.sqlContext
    // Batch semantics: first signup; first click >= signup; first
    // purchase >= click (exactly q_funnel_stages' window chain).
    def ref(evts: Seq[(String, Long)]): (Long, Option[Long], Option[Long], Option[Long], Long) = {
      val by = evts.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
      val s = by.getOrElse("signup", Seq.empty).headOption
      val c = s.flatMap(sm => by.getOrElse("click", Seq.empty).find(_ >= sm))
      val p = c.flatMap(cm => by.getOrElse("purchase", Seq.empty).find(_ >= cm))
      val stage = if (s.isEmpty) 0L else if (p.isDefined) 3L
        else if (c.isDefined) 2L else 1L
      (evts.size.toLong, s, c, p, stage)
    }
    val mem = MemoryStream[(Long, String, Long)]
    val ds = graft.streaming.StatefulFunnel.stages(
      spark, mem.toDF().toDF("uid", "t", "m"), "uid", "t", "m")
    val q = Streams.runToMemory(ds.toDF(), "funnelstream", "update")
    try {
      // b1: click at 10 precedes the (late) signup at 5 — until the
      // signup arrives, the user is stage 0 with clicks banked
      val b1 = Seq(("click", 10L), ("purchase", 20L), ("click", 30L))
      val b2 = Seq(("signup", 5L)) // late: should select click=10, purchase=20
      mem.addData(b1.map { case (t, m) => (7L, t, m) }: _*)
      q.processAllAvailable()
      mem.addData(b2.map { case (t, m) => (7L, t, m) }: _*)
      q.processAllAvailable()
      val rows = spark.table("funnelstream").collect()
        .map(r => (r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          r.getLong(5))).toSet
      assert(rows == Set(ref(b1), ref(b1 ++ b2)),
        s"got $rows want ${Set(ref(b1), ref(b1 ++ b2))}")
      assert(ref(b1 ++ b2) == (4L, Some(5L), Some(10L), Some(20L), 3L))
    } finally q.stop()
  }

  test("s_stream_topk: the continuous leaderboard equals the batch " +
    "top-k at every micro-batch prefix (merge-then-trim monoid)") {
    implicit val ctx = spark.sqlContext
    def ref(rows: Seq[(Long, Long)], k: Int): Seq[(Int, Long, Long)] =
      rows.distinct.sortBy { case (id, v) => (-v, id) }
        .map { case (id, v) => (v, id) }
        .sortBy { case (v, id) => (-v, id) }.take(k).zipWithIndex
        .map { case ((v, id), i) => (i + 1, id, v) }
    val mem = MemoryStream[(String, Long, Long)]
    val ds = graft.streaming.StatefulTopK.topK(
      spark, mem.toDF().toDF("grp", "id", "v"), "grp", "id", "v", k = 3)
    val q = Streams.runToMemory(ds.toDF(), "topkstream", "update")
    try {
      val b1 = Seq((1L, 10L), (2L, 50L), (3L, 30L), (4L, 20L))
      val b2 = Seq((5L, 40L), (6L, 60L), (7L, 5L)) // displaces 2 of top-3
      mem.addData(b1.map { case (i, v) => ("x", i, v) }: _*)
      q.processAllAvailable()
      val after1 = spark.table("topkstream").collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      assert(after1 == ref(b1, 3).toSet, s"prefix: $after1")
      mem.addData(b2.map { case (i, v) => ("x", i, v) }: _*)
      q.processAllAvailable()
      val all = spark.table("topkstream").collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSet
      // update mode appends each batch's full leaderboard; the final
      // state must contain the batch top-3 of everything
      ref(b1 ++ b2, 3).foreach(t => assert(all.contains(t), s"missing $t"))
    } finally q.stop()
  }

  test("s_stream_ohlc: the maintained candle equals the batch OHLC at " +
    "every prefix, including out-of-order (late) arrivals") {
    implicit val ctx = spark.sqlContext
    def ref(rows: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
      val sorted = rows.sortBy(_._1)
      (rows.length.toLong, sorted.head._2, rows.map(_._2).max,
        rows.map(_._2).min, sorted.last._2)
    }
    val mem = MemoryStream[(String, Long, Long)]
    val ds = graft.streaming.StatefulOhlc.candles(
      spark, mem.toDF().toDF("key", "k", "v"), "key", "k", "v")
    val q = Streams.runToMemory(ds.toDF(), "ohlcstream", "update")
    try {
      val b1 = Seq((5L, 100L), (7L, 90L), (9L, 130L))
      val b2 = Seq((2L, 110L), (11L, 80L)) // k=2 arrives LATE: open moves
      mem.addData(b1.map { case (k, v) => ("c", k, v) }: _*)
      q.processAllAvailable()
      mem.addData(b2.map { case (k, v) => ("c", k, v) }: _*)
      q.processAllAvailable()
      val rows = spark.table("ohlcstream").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toSet
      assert(rows == Set(ref(b1), ref(b1 ++ b2)),
        s"got $rows want ${Set(ref(b1), ref(b1 ++ b2))}")
      // the late k=2 row must have REWRITTEN the open to 110
      assert(ref(b1 ++ b2)._2 == 110L)
    } finally q.stop()
  }

  test("s_stream_pq_encode: vectors encoded on a stream against a " +
    "frozen batch-trained codebook are bit-identical to batch encode " +
    "(the FAISS add path — stateless, no shuffle per trigger)") {
    implicit val ctx = spark.sqlContext
    val (m, subDim, k, iters) = (4, 16, 16, 2)
    val emb = Tables.load(spark, SharedSpark.sf001, "embeddings")
    val enc = graft.ml.Pq.encoderFor(
      emb, "vec_id", "embedding", m, subDim, k, iters)
    val batch = graft.ml.Pq.encode(
      emb, "vec_id", "embedding", m, subDim, k, iters)
      .collect()
      .map(r => r.getLong(0) -> (0 until m).map(j => r.getLong(1 + j)).toSeq)
      .toMap
    val all = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = mem.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"), enc(col("embedding")).as("codes"))
    val q = Streams.runToMemory(out, "pqencode", "append")
    try {
      val (b1, b2) = all.splitAt(all.length / 2)
      mem.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("pqencode").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got.size == all.length)
      val bad = got.filter { case (id, codes) => batch(id) != codes }
      assert(bad.isEmpty,
        s"stream/batch code drift on ${bad.keys.take(5).mkString(",")}")
    } finally q.stop()
  }

  test("s_stream_anomaly: running moments + flag counts equal the batch " +
    "fold at every micro-batch prefix (including an injected outlier)") {
    implicit val ctx = spark.sqlContext
    import graft.streaming.StatefulAnomaly
    val mem = MemoryStream[(String, Long)]
    val ds = StatefulAnomaly.anomaly(
      spark, mem.toDF().toDF("k", "cents"), "k", "cents")
    val q = Streams.runToMemory(ds.toDF(), "anomstream", "update")
    try {
      // a lone outlier's |z| is bounded by sqrt(n-1), so n must be
      // comfortably above 10 for the |z|>3 gate to be reachable
      val b1 = Seq(100L, 105L, 98L, 102L, 99L, 101L, 100L, 103L,
        97L, 100L, 104L, 96L, 101L, 99L, 100L, 102L)
      val b2 = Seq(103L, 97L, 5000L, 100L) // 5000 is the planted outlier
      def expect(batches: Seq[Seq[Long]]) =
        batches.foldLeft((0L, 0L, 0L, 0L))(StatefulAnomaly.fold)
      mem.addData(b1.map(("m", _)): _*)
      q.processAllAvailable()
      val after1 = spark.table("anomstream").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .last
      assert(after1 == expect(Seq(b1)))
      mem.addData(b2.map(("m", _)): _*)
      q.processAllAvailable()
      val after2 = spark.table("anomstream").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .maxBy(_._1)
      val exp2 = expect(Seq(b1, b2))
      assert(after2 == exp2)
      assert(exp2._4 >= 1, "the planted outlier must be flagged")
      // a flag-free key stays flag-free
      assert(expect(Seq(b1))._4 == 0L)
    } finally q.stop()
  }

  test("s_stream_price_asof: every trade is enriched with the exact " +
    "batch as-of quote (same-batch quotes visible, late trades LOCF " +
    "from the ring, pre-history trades unpriced) and the pure fold is " +
    "order-insensitive within a batch") {
    implicit val ctx = spark.sqlContext
    import graft.streaming.StatefulPriceAsOf
    val mem = MemoryStream[(String, String, Long, Long, Long)]
    val ds = StatefulPriceAsOf.enrich(
      spark, mem.toDF().toDF("exchange", "kind", "ms", "id", "v"))
    val q = Streams.runToMemory(ds.toDF(), "pxasof", "update")
    try {
      // batch 1: trades listed BEFORE the quotes that price them —
      // the fold must apply quotes first (batch as-of semantics)
      mem.addData(
        ("cb", "T", 1500L, 1L, 3L), ("cb", "T", 2500L, 2L, 7L),
        ("cb", "Q", 1000L, 1L, 500L), ("cb", "Q", 2000L, 2L, 520L))
      q.processAllAvailable()
      val g1 = spark.table("pxasof").collect()
        .map(r => r.getLong(1) -> (r.getLong(4), r.getLong(5), r.getBoolean(6)))
        .toMap
      assert(g1(1L) == ((1000L, 500L, true)), s"t1 got ${g1(1L)}")
      assert(g1(2L) == ((2000L, 520L, true)), s"t2 got ${g1(2L)}")
      // batch 2: a late trade prices off the RETAINED ring (LOCF),
      // a fresh trade sees the new quote, a pre-history trade reports
      // priced = false
      mem.addData(
        ("cb", "Q", 3000L, 3L, 540L),
        ("cb", "T", 1200L, 3L, 2L), ("cb", "T", 3500L, 4L, 4L),
        ("cb", "T", 500L, 5L, 1L))
      q.processAllAvailable()
      val g2 = spark.table("pxasof").collect()
        .map(r => r.getLong(1) -> (r.getLong(4), r.getLong(5), r.getBoolean(6)))
        .toMap
      assert(g2(3L) == ((1000L, 500L, true)), s"late t3 got ${g2(3L)}")
      assert(g2(4L) == ((3000L, 540L, true)), s"t4 got ${g2(4L)}")
      assert(g2(5L) == ((-1L, 0L, false)), s"pre-history t5 got ${g2(5L)}")
      // pure-fold properties: within-batch order insensitivity and
      // newest-cap eviction refusing to mis-price an evicted lookback
      val quotes = Seq((1000L, 1L, 500L), (2000L, 2L, 520L))
      val trades = Seq((1500L, 1L, 3L), (2500L, 2L, 7L))
      val a = StatefulPriceAsOf.fold(Vector.empty, quotes, trades)
      val b = StatefulPriceAsOf.fold(Vector.empty, quotes.reverse, trades.reverse)
      assert(a == b, "fold must be order-insensitive within a batch")
      val (ring, out) = StatefulPriceAsOf.fold(
        Vector.empty, (1 to 5).map(i => (i * 1000L, i.toLong, 100L + i)),
        Seq((1500L, 9L, 1L)), cap = 2)
      assert(ring.map(_._1) == Vector(4000L, 5000L), "evict oldest")
      assert(out.head._6 == false,
        "a trade older than the surviving ring must be unpriced, not " +
          "matched to a newer quote")
    } finally q.stop()
  }
}
