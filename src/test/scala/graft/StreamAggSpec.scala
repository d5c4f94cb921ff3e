package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.streaming.Streams

/** Streaming incremental aggregate maintenance (D9): exactness across
  * micro-batches, at-least-once replays, and compaction. */
class StreamAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(p: String) =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  test("streamAggMaintain: two batches roll up exactly; facts never persist") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmpDir("graft_aggstore")
    val ckpt = tmpDir("graft_aggckpt")
    val input = MemoryStream[Streams.Fact]
    val q = Streams.streamAggMaintain(input.toDS(), store, ckpt)
    try {
      input.addData(Streams.Fact(1L, 10.0), Streams.Fact(1L, 20.0),
                    Streams.Fact(2L, 5.0))
      q.processAllAvailable()
      input.addData(Streams.Fact(1L, -3.0), Streams.Fact(3L, 7.5))
      q.processAllAvailable()
    } finally q.stop()
    val got = Relational.readAggStore(spark, store, Seq("key"))
      .orderBy("key").collect().map(_.toSeq).toSeq
    val want = Relational.aggSnapshot(
        Seq((1L, 10.0), (1L, 20.0), (2L, 5.0), (1L, -3.0), (3L, 7.5))
          .toDF("key", "value"), Seq("key"), "value")
      .orderBy("key").collect().map(_.toSeq).toSeq
    assert(got == want)
    // the store holds batch partials (2 batches × keys), not fact rows
    assert(spark.read.parquet(s"$store/agg").count() == 4L) // (1,2) + (1,3)
  }

  test("replayed batch partial is collapsed by (key, batch_id) dedup") {
    val store = tmpDir("graft_aggreplay")
    val facts = Seq((1L, 4.0), (2L, 6.0)).toDF("key", "value")
    Relational.extendAggStore(facts, store, Seq("key"), "value", batchId = 0L)
    // at-least-once: the same batch re-executes with the same id
    Relational.extendAggStore(facts, store, Seq("key"), "value", batchId = 0L)
    val got = Relational.readAggStore(spark, store, Seq("key"))
      .orderBy("key").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 4000L, 4000L, 4000L),
                      (2L, 1L, 6000L, 6000L, 6000L)))
  }

  test("stream-stream click attribution equals the batch join") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val views = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val clicks = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val out = Streams.streamClickAttribution(
      views.toDF().toDF("ts", "user_id", "event_id"),
      clicks.toDF().toDF("ts", "user_id", "event_id"),
      lookback = "10 minutes", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      // u1: view@100s, clicks @200s (in window) and @800s (out);
      // u2: click@300s with views @100s and @250s (both in window);
      // u3: click with NO view → no row
      views.addData((ts(100), 1L, 10L), (ts(100), 2L, 20L), (ts(250), 2L, 21L))
      clicks.addData((ts(200), 1L, 50L), (ts(800), 1L, 51L),
                     (ts(300), 2L, 52L), (ts(300), 3L, 53L))
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("user_id", "view_event_id", "click_event_id", "gap_us")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set(
        (1L, 10L, 50L, 100000000L),
        (2L, 20L, 52L, 200000000L),
        (2L, 21L, 52L, 50000000L)))
      // advance the watermark far past the old events (max 800s − 10m
      // watermark = 200s), then replay an in-window-for-@300s-click
      // view at 295s: the engine must DROP it — its join state is gone
      views.addData((ts(5000), 9L, 90L))
      clicks.addData((ts(5000), 9L, 91L))
      q.processAllAvailable()
      views.addData((ts(295), 2L, 22L)) // late: before the watermark
      q.processAllAvailable()
      val after = spark.table("attrib")
        .select("view_event_id").as[Long].collect().toSet
      assert(!after.contains(22L), "late view must be evicted, not joined")
      assert(after.contains(90L)) // the watermark-advancing pair joined
    } finally q.stop()
  }

  test("compaction folds committed batches only and preserves results") {
    val store = tmpDir("graft_aggcompact")
    (0L until 5L).foreach { b =>
      Relational.extendAggStore(
        Seq((b % 2, b.toDouble)).toDF("key", "value"),
        store, Seq("key"), "value", batchId = b)
    }
    val before = Relational.readAggStore(spark, store, Seq("key"))
      .orderBy("key").collect().map(_.toSeq).toSeq
    // fold batches < 4; batch 4 (the in-flight one) stays intact
    Relational.compactAggStore(spark, store, Seq("key"), beforeBatch = 4L)
    val after = Relational.readAggStore(spark, store, Seq("key"))
      .orderBy("key").collect().map(_.toSeq).toSeq
    assert(before == after)
    val partials = spark.read.parquet(s"$store/agg")
    assert(partials.filter(col("batch_id") >= 0L && col("batch_id") < 4L)
      .count() == 0L)
    assert(partials.filter(col("batch_id") === 4L).count() == 1L)
    // replay of the in-flight batch AFTER compaction still dedups
    Relational.extendAggStore(
      Seq((0L, 4.0)).toDF("key", "value"),
      store, Seq("key"), "value", batchId = 4L)
    val replayed = Relational.readAggStore(spark, store, Seq("key"))
      .orderBy("key").collect().map(_.toSeq).toSeq
    assert(replayed == after)
    // a second identical compaction is a no-op on content
    Relational.compactAggStore(spark, store, Seq("key"), beforeBatch = 4L)
    assert(Relational.readAggStore(spark, store, Seq("key"))
      .orderBy("key").collect().map(_.toSeq).toSeq == after)
  }

  test("streamAnomalyZscore (D16): prequential test-then-train, " +
       "deterministic in-batch order, exact boundary") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.BucketObs
    val input = MemoryStream[BucketObs]
    val q = graft.streaming.Streams.streamAnomalyZscore(input.toDS(), kSigma = 1)
      .writeStream.format("memory").queryName("d16_anomalies")
      .outputMode("append").start()
    try {
      // batch 1 folds in (x, obs_id) order: 10, 10, 10 — the first two
      // have n < 2 state, the third sees dev = 0; nothing flags
      input.addData(BucketObs("A", 3L, 10L), BucketObs("A", 1L, 10L),
        BucketObs("A", 2L, 10L))
      q.processAllAvailable()
      assert(spark.table("d16_anomalies").count() == 0L)
      // batch 2 folds sorted (10 first, then 70): the 10 sees dev = 0
      // against (n=3, S1=30) → no flag, folds to (n=4, S1=40, S2=400);
      // the 70 then sees dev = 4·70−40 = 240, 240² > 1·(4·400−40²) = 0
      // → flags. Exactly the 70.
      input.addData(BucketObs("A", 5L, 70L), BucketObs("A", 4L, 10L))
      q.processAllAvailable()
      val got = spark.table("d16_anomalies")
        .as[(String, Long, Long)].collect().toSeq
      assert(got == Seq(("A", 5L, 70L)))
    } finally q.stop()
  }

  test("streamEventTransitions (D14): stream counts ≡ batch twin, " +
       "boundary pairs cross batches, replays emit nothing") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Behavior
    import graft.streaming.Streams.UserEvent
    val input = MemoryStream[UserEvent]
    val q = graft.streaming.Streams.streamEventTransitions(input.toDS())
      .writeStream.format("memory").queryName("d14_transitions")
      .outputMode("append").start()
    val b1 = Seq(UserEvent(1L, 10L, 100L, "A"), UserEvent(1L, 20L, 200L, "B"),
      UserEvent(2L, 30L, 50L, "C"))
    val b2 = Seq(UserEvent(1L, 40L, 300L, "A"), UserEvent(2L, 50L, 60L, "D"),
      UserEvent(2L, 60L, 70L, "C"))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // at-least-once replay of batch 2's rows: all at-or-below the
      // held state → dropped, zero new transitions
      val before = spark.table("d14_transitions").count()
      input.addData(b2: _*); q.processAllAvailable()
      assert(spark.table("d14_transitions").count() == before)
    } finally q.stop()
    val streamed = spark.table("d14_transitions")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
      .as[(String, String, Long)].collect().toSeq
    val batch = Behavior.eventTransitions(
        (b1 ++ b2).toDF("user_id", "event_id", "ts_us", "event_type"),
        "user_id", "ts_us", "event_id", "event_type")
      .select("from_type", "to_type", "n")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long)].collect().toSeq
    // u1: A→B (batch 1), B→A (ACROSS the batch boundary);
    // u2: C→D, D→C
    assert(streamed == Seq(("A", "B", 1L), ("B", "A", 1L),
      ("C", "D", 1L), ("D", "C", 1L)))
    assert(streamed == batch)
  }

  // --- D17: streaming join-view-store maintenance ------------------------

  test("streamJoinMaintain: two CDC batches maintain the view store; " +
       "replays from EVERY swap crash point converge") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmpDir("graft_jvstore")
    val ckpt = tmpDir("graft_jvckpt")
    def writeTbl(sub: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$store/$sub")
    def readTbl(sub: String) =
      spark.read.parquet(s"$store/$sub").collect()
        .map(_.toSeq).toSet
    // seed consistent snapshots
    val fact0 = Seq((1L, 20L, "a"), (2L, 20L, "b"), (3L, 21L, "c"),
      (4L, 20L, "d"), (5L, 22L, "e"), (6L, 23L, "f")).toDF("k", "fk", "v")
    val dim0 = Seq((20L, "x"), (21L, "y"), (22L, "z"), (23L, "w"))
      .toDF("bk", "seg")
    writeTbl("fact", fact0)
    writeTbl("dim", dim0)
    writeTbl("view", fact0.join(dim0, fact0("fk") === dim0("bk"))
      .select(col("k"), col("fk"), col("v"), col("seg")))
    val b1 = Seq(
      Streams.JoinChange("fact", "changed", Some(2L), Some(20L), Some(20L),
        Some("b"), Some("B"), None, None, None),
      Streams.JoinChange("fact", "removed", Some(3L), Some(21L), None,
        Some("c"), None, None, None, None),
      Streams.JoinChange("fact", "changed", Some(4L), Some(20L), Some(21L),
        Some("d"), Some("d"), None, None, None),
      Streams.JoinChange("fact", "added", Some(7L), None, Some(24L),
        None, Some("g"), None, None, None),
      Streams.JoinChange("dim", "changed", None, None, None, None, None,
        Some(22L), Some("z"), Some("Z")),
      Streams.JoinChange("dim", "added", None, None, None, None, None,
        Some(24L), None, Some("n")))
    val b2 = Seq(
      Streams.JoinChange("dim", "removed", None, None, None, None, None,
        Some(23L), Some("w"), None),
      Streams.JoinChange("fact", "added", Some(8L), None, Some(20L),
        None, Some("h"), None, None, None))
    val input = MemoryStream[Streams.JoinChange]
    val q = Streams.streamJoinMaintain(input.toDF(), store, ckpt,
      "k", "fk", "bk", Seq("fk", "v"), Seq("seg"))
    val view1 = Set(Seq(1L, 20L, "a", "x"), Seq(2L, 20L, "B", "x"),
      Seq(4L, 21L, "d", "y"), Seq(5L, 22L, "e", "Z"),
      Seq(6L, 23L, "f", "w"), Seq(7L, 24L, "g", "n"))
    val view2 = Set(Seq(1L, 20L, "a", "x"), Seq(2L, 20L, "B", "x"),
      Seq(4L, 21L, "d", "y"), Seq(5L, 22L, "e", "Z"),
      Seq(7L, 24L, "g", "n"), Seq(8L, 20L, "h", "x"))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(readTbl("view") == view1)
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(readTbl("view") == view2)
    } finally q.stop()
    val fact2 = readTbl("fact"); val dim2 = readTbl("dim")
    assert(fact2.contains(Seq(8L, 20L, "h")) && !dim2.exists(_.head == 23L))
    // pre-batch2 base snapshots, for crash-point restores
    val fact1 = fact2 - Seq(8L, 20L, "h")
    val dim1 = dim2 + Seq(23L, "w")
    def applyB2(): Unit = Relational.joinMaintainApply(
      b2.toDF(), store, "k", "fk", "bk", Seq("fk", "v"), Seq("seg"))
    def toDF3(s: Set[Seq[Any]]) = s.toSeq
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(2).asInstanceOf[String])).toDF("k", "fk", "v")
    def toDF2(s: Set[Seq[Any]]) = s.toSeq
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[String]))
      .toDF("bk", "seg")
    // crash point A: nothing swapped yet (plain full replay)
    applyB2()
    assert(readTbl("view") == view2 && readTbl("fact") == fact2 &&
           readTbl("dim") == dim2)
    // crash point B: view swapped, fact/dim not — restore both bases
    writeTbl("fact", toDF3(fact1)); writeTbl("dim", toDF2(dim1))
    applyB2()
    assert(readTbl("view") == view2 && readTbl("fact") == fact2 &&
           readTbl("dim") == dim2)
    // crash point C: view+fact swapped, dim not — restore dim only
    writeTbl("dim", toDF2(dim1))
    applyB2()
    assert(readTbl("view") == view2 && readTbl("fact") == fact2 &&
           readTbl("dim") == dim2)
  }

  // --- D18: streaming EWMA ------------------------------------------------

  test("streamEwma: per-batch emissions equal the batch fold on the " +
       "concatenated input; replays emit nothing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.DailyMetric]
    val q = input.toDS().transform(ds => Streams.streamEwma(ds, 300L))
      .writeStream.format("memory").queryName("ewma_sink")
      .outputMode("append").start()
    val b1 = Seq(Streams.DailyMetric("A", 0L, 1L),
      Streams.DailyMetric("A", 1L, 0L), Streams.DailyMetric("B", 0L, 10L))
    val b2 = Seq(Streams.DailyMetric("A", 3L, 0L),   // gap at day 2
      Streams.DailyMetric("B", 1L, 20L),
      Streams.DailyMetric("A", 1L, 99L))             // replayed day: dropped
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // full replay of b2: every day at-or-below the frontier
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ewma_sink")
      .as[(String, Long, Long)].collect().toSeq.sorted
    // batch twin on the concatenated deduped input
    val daily = Seq(("A", 0L, 1L), ("A", 1L, 0L), ("B", 0L, 10L),
      ("A", 3L, 0L), ("B", 1L, 20L)).toDF("key", "day", "x")
    val want = graft.operators.Behavior
      .ewmaSmooth(daily, Seq("key"), "day", "x", 300L)
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(got == want)
    // hand-check the A trajectory incl. the gap carry: 1000, 700,
    // then day 3 folds against 700 -> 490 (no decay for missing day 2)
    assert(got.filter(_._1 == "A").map(_._3) == Seq(1000L, 700L, 490L))
  }

  // --- D24: streaming Holt -------------------------------------------------

  test("streamHolt (D24): per-batch emissions equal the batch " +
       "level/trend fold on the concatenated input; replays emit " +
       "nothing; trend survives batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.DailyMetric]
    val q = input.toDS()
      .transform(ds => Streams.streamHolt(ds, 500L, 500L))
      .writeStream.format("memory").queryName("holt_sink")
      .outputMode("append").start()
    val b1 = Seq(Streams.DailyMetric("A", 1L, 10L),
      Streams.DailyMetric("A", 2L, 20L))
    val b2 = Seq(Streams.DailyMetric("A", 3L, 30L), // ramp continues
      Streams.DailyMetric("A", 2L, 99L),            // replayed: dropped
      Streams.DailyMetric("B", 1L, 30L), Streams.DailyMetric("B", 2L, 10L))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable() // full replay
    } finally q.stop()
    val got = spark.table("holt_sink")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    val daily = Seq(("A", 1L, 10L), ("A", 2L, 20L), ("A", 3L, 30L),
      ("B", 1L, 30L), ("B", 2L, 10L)).toDF("key", "day", "x")
    val want = graft.operators.Behavior
      .holtSmooth(daily, Seq("key"), "day", "x", 500L, 500L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got == want)
    // the hand-computed ramp from the batch spec holds across batches
    assert(got.filter(_._1 == "A").map(r => (r._3, r._4)) ==
      Seq((10000L, 0L), (15000L, 2500L), (23750L, 5625L)))
    // and the decline's negative trend
    assert(got.filter(_._1 == "B").map(r => (r._3, r._4)) ==
      Seq((30000L, 0L), (20000L, -5000L)))
  }

  // --- D25: streaming Holt-Winters seasonal -------------------------------

  test("streamHwSeasonal (D25): per-batch emissions equal the batch " +
       "seasonal fold on the concatenated input across a slot " +
       "wraparound; replays emit nothing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.DailyMetric]
    val q = input.toDS()
      .transform(ds => Streams.streamHwSeasonal(ds))
      .writeStream.format("memory").queryName("hw_sink")
      .outputMode("append").start()
    // 10 days with a weekly sawtooth: wraps past slot 7 so the
    // seasonal array is read back across the batch boundary
    def x(d: Long): Long = 10L + (d % 7L) * 3L
    val b1 = (1L to 6L).map(d => Streams.DailyMetric("A", d, x(d)))
    val b2 = (7L to 10L).map(d => Streams.DailyMetric("A", d, x(d))) ++
      Seq(Streams.DailyMetric("A", 3L, 99L), // replayed day: dropped
          Streams.DailyMetric("B", 1L, 5L))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable() // full replay
    } finally q.stop()
    val got = spark.table("hw_sink")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val daily = ((1L to 10L).map(d => ("A", d, x(d))) :+ (("B", 1L, 5L)))
      .toDF("key", "day", "x")
    val want = graft.operators.Behavior
      .hwSeasonal(daily, Seq("key"), "day", "x")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got == want)
    // first row is the stated init; a replay added nothing
    assert(got.filter(_._1 == "B") ==
      Seq(("B", 1L, 5000L, 0L, 0L, 5000L)))
    assert(got.size == 11)
  }

  // --- D19: streaming CUSUM ----------------------------------------------

  test("streamCusum: emissions flush when the reference window fills " +
       "and equal the batch operator; replays and short series emit " +
       "nothing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.DailyMetric]
    val q = input.toDS()
      .transform(ds => Streams.streamCusum(ds, refDays = 3,
        slackMilli = 1000L, thresholdMilli = 12000L))
      .writeStream.format("memory").queryName("cusum_sink")
      .outputMode("append").start()
    def m(k: String, d: Long, x: Long) = Streams.DailyMetric(k, d, x)
    try {
      // batch 1: reference window still open -> NOTHING emitted
      input.addData(m("A", 0L, 10L), m("A", 1L, 10L), m("C", 0L, 5L))
      q.processAllAvailable()
      assert(spark.table("cusum_sink").isEmpty)
      // batch 2: day 2 completes A's window -> days 0..2 flush, 3,4 score
      input.addData(m("A", 2L, 10L), m("A", 3L, 20L), m("A", 4L, 20L),
        m("C", 1L, 5L))
      q.processAllAvailable()
      // batch 3: day 5 + full replay of batch 2 (all at-or-below frontier)
      input.addData(m("A", 5L, 20L), m("A", 3L, 20L), m("A", 4L, 20L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cusum_sink")
      .as[(String, Long, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().toSeq.sorted
    // C never reaches 3 days -> absent entirely
    assert(got.forall(_._1 == "A"))
    val daily = Seq(("A", 0L, 10L), ("A", 1L, 10L), ("A", 2L, 10L),
      ("A", 3L, 20L), ("A", 4L, 20L), ("A", 5L, 20L)).toDF("k", "day", "n")
    val want = graft.operators.Behavior
      .cusumChangepoints(daily, Seq("k"), "day", "n",
        refDays = 3, slackMilli = 1000L, thresholdMilli = 12000L)
      .select("k", "day", "x", "mu_milli", "cusum_up_milli",
        "cusum_down_milli", "shift_up", "shift_down")
      .as[(String, Long, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().toSeq.sorted
    assert(got == want)
  }

  // --- D20: streaming A/B monitor ----------------------------------------

  test("streamAbTest: running counts equal the batch test per prefix; " +
       "replays cannot double-count an arm; one-arm strata stay silent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.AbObs]
    val q = input.toDS()
      .transform(ds => Streams.streamAbTest(ds, 72000L))
      .writeStream.format("memory").queryName("ab_sink")
      .outputMode("append").start()
    def o(t: Long, id: Long, v: Long, ok: Boolean) =
      Streams.AbObs("x", t, id, v, ok)
    // batch 1: the exact-boundary counts from the batch spec
    // (8/10 vs 2/10, boundary z2 = 72000 -> NOT significant)
    val b1 = (0 until 10).map(i => o(1L, i, 0L, i < 8)) ++
      (0 until 10).map(i => o(1L, 10L + i, 1L, i < 2)) ++
      Seq(Streams.AbObs("solo", 1L, 0L, 0L, true))
    // batch 2: two more B conversions push it over the line,
    // plus a full replay of batch 1 (all at-or-below frontier)
    val b2 = Seq(o(2L, 0L, 1L, true), o(2L, 1L, 1L, true)) ++ b1
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ab_sink")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.forall(_._1 == "x"), "one-arm stratum must stay silent")
    assert(got == Seq(
      ("x", 10L, 8L, 10L, 2L, false),
      ("x", 10L, 8L, 12L, 4L, got(1)._6)))
    // cross-check the second emission against the batch operator
    val df = ((0 until 10).map(i => ("x", 0L, i < 8)) ++
      (0 until 10).map(i => ("x", 1L, i < 2)) ++
      Seq(("x", 1L, true), ("x", 1L, true))).toDF("s", "variant", "ok")
    val want = graft.operators.Behavior.abTest(df, "s", "variant", "ok", 72000L)
      .select("significant").as[Boolean].head()
    assert(got(1)._6 == want)
  }

  test("streamAttribution: touches buffer across batches, credits land " +
       "in the conversion's batch and equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Touch]
    val q = Streams.streamAttribution(input.toDS(), "purchase",
        Set("view", "click"), "u_shape")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      input.addData(Streams.Touch(1L, 1L, 1L, "view"),
        Streams.Touch(1L, 2L, 2L, "click"))
      q.processAllAvailable()
      assert(spark.table("attr_out").count() == 0L) // no conversion yet
      input.addData(Streams.Touch(1L, 3L, 3L, "view"),
        Streams.Touch(1L, 4L, 4L, "purchase"),
        Streams.Touch(2L, 5L, 5L, "purchase"), // no touches: emits none
        Streams.Touch(1L, 6L, 6L, "view"))     // after conv: re-buffers
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr_out")
      .select("user_id", "conv_id", "touch_id", "position", "n_touches",
        "credit_permille")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // batch-1 touches credited by batch-2's conversion: state crossed
    assert(got == Set((1L, 4L, 1L, 1L, 3L, 400L),
      (1L, 4L, 2L, 2L, 3L, 200L), (1L, 4L, 3L, 3L, 3L, 400L)))
    // the batch twin over the full event log agrees exactly
    val log = Seq((1L, 1L, 1L, "view"), (1L, 2L, 2L, "click"),
        (1L, 3L, 3L, "view"), (1L, 4L, 4L, "purchase"),
        (2L, 5L, 5L, "purchase"), (1L, 6L, 6L, "view"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val twin = graft.operators.Behavior.attributionCredits(log, "user_id",
        "ts_us", "event_id", "event_type", "purchase",
        Seq("view", "click"), "u_shape")
      .select(col("user").as("user_id"), col("conv_id"), col("touch_id"),
        col("position"), col("n_touches"), col("credit_permille"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(twin == got)
  }

  test("streamKsDrift (D22): per-batch emission ≡ batch ksDrift on " +
       "the prefix, keys isolate, empty/zero base rejected") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Behavior
    import graft.streaming.Streams.ScoreObs
    val base = Map(100L -> 2L, 300L -> 1L)
    // the batch twin over (base ∪ prefix) as one flagged frame
    def twin(cur: Seq[Long]): (String, Long, Long, Long, Long) = {
      val rows = base.toSeq.flatMap { case (s, n) =>
        Seq.fill(n.toInt)((s, true)) } ++ cur.map((_, false))
      val t = Behavior.ksDrift(rows.toDF("score", "base"),
        "score", "base")
        .as[(Long, Long, Option[Long], Option[Long])].head()
      ("", t._1, t._2, t._3.get, t._4.get)
    }
    val input = MemoryStream[ScoreObs]
    val q = Streams.streamKsDrift(input.toDS(), base)
      .writeStream.format("memory").queryName("d22_ks")
      .outputMode("update").start()
    try {
      input.addData(ScoreObs("A", 100L), ScoreObs("A", 500L))
      q.processAllAvailable()
      val r1 = spark.table("d22_ks")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(r1 == Seq(twin(Seq(100L, 500L)).copy(_1 = "A")))
      // batch 2 extends A's histogram and opens key B
      input.addData(ScoreObs("A", 500L), ScoreObs("B", 300L))
      q.processAllAvailable()
      val r2 = spark.table("d22_ks")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(r2 == Set(
        twin(Seq(100L, 500L)).copy(_1 = "A"),
        twin(Seq(100L, 500L, 500L)).copy(_1 = "A"),
        twin(Seq(300L)).copy(_1 = "B")))
    } finally q.stop()
    intercept[IllegalArgumentException] {
      Streams.streamKsDrift(input.toDS(), Map.empty[Long, Long])
    }
    intercept[IllegalArgumentException] {
      Streams.streamKsDrift(input.toDS(), Map(1L -> 0L))
    }
  }

  test("streamConfusionCells (D23): running cell counts across " +
       "batches; the report rebuilt from latest cells ≡ batch " +
       "classificationReport on the prefix") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streams.LabeledPred
    val input = MemoryStream[LabeledPred]
    val q = Streams.streamConfusionCells(input.toDS())
      .writeStream.format("memory").queryName("d23_cells")
      .outputMode("update").start()
    def latestCells(): Seq[(String, String, Long)] =
      spark.table("d23_cells").groupBy("truth", "pred")
        .agg(max("n").as("n")) // running counts only grow
        .as[(String, String, Long)].collect().toSeq
    try {
      input.addData(LabeledPred("A", "A"), LabeledPred("A", "B"),
        LabeledPred("B", "B"))
      q.processAllAvailable()
      assert(latestCells().toSet ==
        Set(("A", "A", 1L), ("A", "B", 1L), ("B", "B", 1L)))
      input.addData(LabeledPred("A", "A"), LabeledPred("B", "B"),
        LabeledPred("B", "B"), LabeledPred("C", "D"))
      q.processAllAvailable()
      // rebuild the report from the maintained cells and compare to
      // the batch operator over the full prefix
      val cells = latestCells()
      val fromCells = graft.operators.Behavior.classificationReport(
          cells.flatMap { case (t, p, n) =>
            Seq.fill(n.toInt)((t, p)) }.toDF("truth", "pred"),
          "truth", "pred")
        .as[(String, Long, Long, Long, Long, Long,
             Option[Long], Option[Long], Long)].collect().toSet
      val prefix = Seq(("A", "A"), ("A", "B"), ("B", "B"),
        ("A", "A"), ("B", "B"), ("B", "B"), ("C", "D"))
        .toDF("truth", "pred")
      val twin = graft.operators.Behavior.classificationReport(
          prefix, "truth", "pred")
        .as[(String, Long, Long, Long, Long, Long,
             Option[Long], Option[Long], Long)].collect().toSet
      assert(fromCells == twin)
    } finally q.stop()
  }

  // --- D26: streaming cross-correlation ------------------------------------

  test("streamCrossCorr (D26): final emission equals the batch operator " +
       "over a gapped series split across batches; replays emit nothing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.DailyXY]
    val q = input.toDS()
      .transform(ds => Streams.streamCrossCorr(ds, maxLag = 3))
      .writeStream.format("memory").queryName("xcorr_sink")
      .outputMode("update").start()
    // days 1..9 with day 5 MISSING — gapped pairs must not form
    def p(d: Long) = Streams.DailyXY("A", d, d * 2L + (d % 3L), 30L - d)
    val series = (1L to 9L).filter(_ != 5L).map(p)
    val b2 = series.drop(4) ++ Seq(Streams.DailyXY("A", 2L, 999L, 999L))
    try {
      input.addData(series.take(4): _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val before = spark.table("xcorr_sink").count()
      input.addData(b2: _*); q.processAllAvailable() // full replay
      assert(spark.table("xcorr_sink").count() == before)
    } finally q.stop()
    val got = spark.table("xcorr_sink").filter($"upto_day" === 9L)
      .select("lag", "n_pairs", "r_sign", "r2_permyriad")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq.sorted
    val daily = series.map(m => (m.day, m.x, m.y)).toDF("day", "x", "y")
    val want = graft.operators.Behavior.crossCorr(daily, "day", "x", "y", 3)
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq.sorted
    assert(got == want && got.nonEmpty)
  }

  // --- D31: streaming token-keyness cells ------------------------------------

  test("streamTokenCells (D31): keyness rebuilt from latest cells equals " +
       "the batch operator on the full prefix") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.GDoc]
    val q = input.toDS()
      .transform(ds => Streams.streamTokenCells(ds))
      .writeStream.format("memory").queryName("tok_sink")
      .outputMode("update").start()
    val b1 = Seq(Streams.GDoc("g1", "apple Apple banana"),
      Streams.GDoc("g2", "banana cherry"))
    val b2 = Seq(Streams.GDoc("g2", "cherry"),
      Streams.GDoc("g1", "apple"))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // latest cell per (grp, token) — Update sink appends, take max n
    // (materialized to break the memory-view self-join ambiguity the
    // keyness tail's re-aggregation would otherwise trip)
    val cells = spark.table("tok_sink")
      .groupBy("grp", "token")
      .agg(org.apache.spark.sql.functions.max("n").as("__a"))
      .as[(String, String, Long)].collect().toSeq
      .toDF("grp", "token", "__a")
    val fromCells = graft.operators.TextAnalysis
      .tokenKeynessFromCells(cells, topK = 1, minCount = 1L)
      .as[(String, String, Long, Long, Long)].collect().toSet
    val docs = (b1 ++ b2).map(d => (d.grp, d.text)).toDF("src", "text")
    val twin = graft.operators.TextAnalysis
      .tokenKeyness(docs, "text", "src", topK = 1, minCount = 1L)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(fromCells == twin && twin.nonEmpty)
    // the case rule matched the batch tokenizer: Apple+apple merged
    assert(cells.filter($"grp" === "g1" && $"token" === "apple")
      .select("__a").as[Long].collect().toSeq == Seq(3L))
  }

  // --- D30: streaming BH-FDR ------------------------------------------------

  test("streamBhFdr (D30): running cutoff equals the batch rule per " +
       "prefix; keys isolate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.PObs]
    val q = input.toDS()
      .transform(ds => Streams.streamBhFdr(ds, alphaPermille = 50L))
      .writeStream.format("memory").queryName("bh_sink")
      .outputMode("update").start()
    try {
      input.addData(Streams.PObs("A", 10000L), Streams.PObs("A", 20000L),
        Streams.PObs("B", 900000L))
      q.processAllAvailable()
      input.addData(Streams.PObs("A", 40000L), Streams.PObs("A", 500000L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bh_sink")
      .as[(String, Long, Option[Long], Long)].collect().toSeq
    // batch-1 prefix: m=2 -> both pass, cutoff 20000
    assert(got.contains(("A", 2L, Some(20000L), 2L)))
    // final: the R9OpsSpec hand case — m=4, k*=2
    assert(got.contains(("A", 4L, Some(20000L), 2L)))
    // B: nothing passes at m=1
    assert(got.contains(("B", 1L, None, 0L)))
  }

  // --- D29: streaming Mann-Kendall -----------------------------------------

  test("streamMannKendall (D29): final emission equals the batch " +
       "S/var18/significance over batches; replays emit nothing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.DailyMetric]
    val q = input.toDS()
      .transform(ds => Streams.streamMannKendall(ds))
      .writeStream.format("memory").queryName("mk_sink")
      .outputMode("update").start()
    // the R9OpsSpec hand case [3,1,4,4,5] split across two batches,
    // plus a strictly-ramping key that goes significant
    val a = Seq(3L, 1L, 4L, 4L, 5L).zipWithIndex.map { case (x, i) =>
      Streams.DailyMetric("A", i + 1L, x) }
    val b = (1L to 8L).map(d => Streams.DailyMetric("B", d, d))
    try {
      input.addData((a.take(3) ++ b.take(4)): _*); q.processAllAvailable()
      input.addData((a.drop(3) ++ b.drop(4)): _*); q.processAllAvailable()
      val before = spark.table("mk_sink").count()
      input.addData(a.drop(3): _*); q.processAllAvailable() // replay
      assert(spark.table("mk_sink").count() == before)
    } finally q.stop()
    val finals = spark.table("mk_sink")
      .as[(String, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    val gotA = finals.filter(r => r._1 == "A" && r._2 == 5L)
    val gotB = finals.filter(r => r._1 == "B" && r._2 == 8L)
    // batch twins: the R9OpsSpec hand values
    assert(gotA == Seq(("A", 5L, 5L, 7L, 282L, 1L, false)))
    assert(gotB == Seq(("B", 8L, 8L, 28L, 1176L, 1L, true)))
  }

  // --- D27: streaming seasonal decomposition -------------------------------

  test("streamSeasonalDecompose (D27): emissions equal the batch operator " +
       "on a dow-constant detrended series across a gap; replays emit " +
       "nothing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.DailyMetric]
    val q = input.toDS()
      .transform(ds => Streams.streamSeasonalDecompose(ds))
      .writeStream.format("memory").queryName("sdec_sink")
      .outputMode("append").start()
    // x = 3·day + q(day mod 7), Σq = 49 (7 | P ⇒ trend exact, det
    // dow-constant ⇒ running seasonal means equal batch means)
    val qs = Seq(0L, 7L, 14L, 0L, 7L, 14L, 7L)
    def x(d: Long) = 3L * d + qs((d % 7L).toInt)
    // day 11 missing: windows centered 8..14 must drop on BOTH sides
    val days = ((1L to 20L).filter(_ != 11L)).map(d =>
      Streams.DailyMetric("A", d, x(d)))
    try {
      input.addData(days.take(9): _*); q.processAllAvailable()
      input.addData(days.drop(9): _*); q.processAllAvailable()
      val before = spark.table("sdec_sink").count()
      input.addData(days.drop(9): _*); q.processAllAvailable() // replay
      assert(spark.table("sdec_sink").count() == before)
    } finally q.stop()
    val got = spark.table("sdec_sink")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val daily = days.map(m => ("A", m.day, m.x)).toDF("key", "day", "x")
    val want = graft.operators.Behavior
      .seasonalDecompose(daily, Seq("key"), "day", "x")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got == want && got.nonEmpty)
    // the gap really bit: centers 8..14 absent, both engines agree
    assert(got.map(_._2).toSet.intersect((8L to 14L).toSet).isEmpty)
  }

  // --- D28: streaming skyline-store maintenance ----------------------------

  test("streamSkylineMaintain (D28): store-derived front equals batch " +
       "skyline2d over all streamed points; replay partials collapse; " +
       "compaction folds committed batches") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmpDir("graft_skystore")
    val ckpt = tmpDir("graft_skyckpt")
    val input = MemoryStream[Streams.Point2D]
    val q = Streams.streamSkylineMaintain(input.toDS(), store, ckpt)
    val pts1 = Seq((1L, 5L), (1L, 3L), (2L, 10L), (3L, 7L))
    val pts2 = Seq((2L, 10L), (3L, 12L), (4L, 12L), (1L, 5L))
    try {
      input.addData(pts1.map(p => Streams.Point2D(p._1, p._2)): _*)
      q.processAllAvailable()
      input.addData(pts2.map(p => Streams.Point2D(p._1, p._2)): _*)
      q.processAllAvailable()
    } finally q.stop()
    def front() = Relational.readSkylineStore(spark, store)
      .orderBy("x").as[(Long, Long, Long)].collect().toSeq
    val want = Relational.skyline2d(
        (pts1 ++ pts2).toDF("px", "py"), "px", "py")
      .orderBy("x").as[(Long, Long, Long)].collect().toSeq
    assert(front() == want)
    // (2,10) streamed in both batches -> n_points sums across partials
    assert(want.contains((2L, 10L, 2L)))
    // at-least-once: a replayed partial is collapsed by (x, batch_id)
    Relational.extendSkylineStore(pts2.toDF("px", "py"), store,
      "px", "py", batchId = 1L)
    assert(front() == want)
    // compaction folds batches < 2 into one row per x; front unchanged
    Relational.compactSkylineStore(spark, store, beforeBatch = 2L)
    assert(front() == want)
    val rows = spark.read.parquet(s"$store/skyline")
    assert(rows.count() == 4L) // one folded row per distinct x
    assert(rows.select("batch_id").distinct().as[Long].collect().toSet
      == Set(-1L))
  }
}
