package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Behavior

/** Hand-computed cases for the round-10 wave: Krippendorff's alpha
  * (ragged-panel agreement), Cochran's Q (matched binary battery),
  * and the Wald-Wolfowitz runs test (daily-series randomness).
  */
class R10OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- Krippendorff's alpha ---------------------------------------------------

  test("krippendorffAlpha: hand-computed two-rater panel (alpha 4/9), " +
       "single-vote units drop") {
    // u1 (A,A), u2 (A,B), u3 (B,B): n=6, n_A=n_B=3, E=18, S=2e6
    // alpha = 1 - 5*2/18 = 8/18 -> 4444 permyriad; u4 has ONE vote
    val r = Seq((1L, "r1", "A"), (1L, "r2", "A"),
      (2L, "r1", "A"), (2L, "r2", "B"),
      (3L, "r1", "B"), (3L, "r2", "B"),
      (4L, "r1", "A"))
      .toDF("item", "rater", "label")
    val got = Behavior.krippendorffAlpha(r, "item", "rater", "label")
      .as[(Long, Long, Long, Option[Long])].collect()(0)
    assert(got == ((3L, 6L, 2L, Some(4444L))))
  }

  test("krippendorffAlpha: RAGGED panels stay in (the fleiss " +
       "difference) — mixed 3- and 2-vote units, alpha 9/16") {
    // u1 (A,A,A) m=3 U=0; u2 (A,B) m=2 U=2e6; u3 (B,B,B) m=3 U=0:
    // n=8, n_A=n_B=4, E=32 -> alpha = 1 - 7*2/32 = 18/32 -> 5625
    val r = Seq((1L, "r1", "A"), (1L, "r2", "A"), (1L, "r3", "A"),
      (2L, "r1", "A"), (2L, "r2", "B"),
      (3L, "r1", "B"), (3L, "r2", "B"), (3L, "r3", "B"))
      .toDF("item", "rater", "label")
    val got = Behavior.krippendorffAlpha(r, "item", "rater", "label")
      .as[(Long, Long, Long, Option[Long])].collect()(0)
    assert(got == ((3L, 8L, 2L, Some(5625L))))
  }

  test("krippendorffAlpha: systematic disagreement reads NEGATIVE; " +
       "unanimous single label reads null") {
    // u1 (A,B), u2 (A,B): alpha = 1 - 3*4/8 = -0.5 -> -5000
    val neg = Seq((1L, "r1", "A"), (1L, "r2", "B"),
      (2L, "r1", "A"), (2L, "r2", "B")).toDF("item", "rater", "label")
    val g1 = Behavior.krippendorffAlpha(neg, "item", "rater", "label")
      .select("alpha_permyriad").as[Option[Long]].collect()(0)
    assert(g1 == Some(-5000L))
    val una = Seq((1L, "r1", "A"), (1L, "r2", "A"))
      .toDF("item", "rater", "label")
    val g2 = Behavior.krippendorffAlpha(una, "item", "rater", "label")
      .select("alpha_permyriad").as[Option[Long]].collect()(0)
    assert(g2.isEmpty)
  }

  test("krippendorffAlpha: duplicate (item, rater) rows collapse to " +
       "one min-label vote (the fleissKappa rule)") {
    // without the collapse u1 would read 3 votes (A,A,B) and shift
    // both n and the cells; with it u1 is exactly (A,A)
    val r = Seq((1L, "r1", "B"), (1L, "r1", "A"), (1L, "r2", "A"),
      (2L, "r1", "A"), (2L, "r2", "B"),
      (3L, "r1", "B"), (3L, "r2", "B"))
      .toDF("item", "rater", "label")
    val got = Behavior.krippendorffAlpha(r, "item", "rater", "label")
      .as[(Long, Long, Long, Option[Long])].collect()(0)
    assert(got == ((3L, 6L, 2L, Some(4444L))))
  }

  // --- Cochran's Q ------------------------------------------------------------

  test("cochranQ: hand-computed 4-subject 3-treatment panel (Q = 3.0, " +
       "not significant at df 2); incomplete blocks drop; duplicate " +
       "observations collapse by OR") {
    // R = (2,1,3,0), T = (3,2,1), S = 6: num = 2*18 = 36,
    // den = 3*(18-14) = 12 -> q_milli 3000; 36000 < 5991*12
    val o = Seq(
      (1L, "t1", true), (1L, "t2", true), (1L, "t3", false),
      (1L, "t1", false), // duplicate: OR keeps true
      (2L, "t1", true), (2L, "t2", false), (2L, "t3", false),
      (3L, "t1", true), (3L, "t2", true), (3L, "t3", true),
      (4L, "t1", false), (4L, "t2", false), (4L, "t3", false),
      (5L, "t1", true), (5L, "t2", true)) // incomplete block: drops
      .toDF("subj", "trt", "ok")
    val got = Behavior.cochranQ(o, "subj", "trt", "ok", 3)
      .as[(Long, Long, Long, Option[Long], Option[Boolean])].collect()(0)
    assert(got == ((4L, 3L, 2L, Some(3000L), Some(false))))
  }

  test("cochranQ: one dominant treatment IS significant; degenerate " +
       "all-equal rows read null") {
    // 10 subjects: t1 always succeeds, t2/t3 never ->
    // T=(10,0,0), S=10, R_i=1 each: num = 2*((30-10)^2+100+100)
    // = 2*600 = 1200, den = 3*(30-10) = 60 -> q 20000 > 5991*60/1000
    val succ = (1L to 10L).flatMap(s =>
      Seq((s, "t1", true), (s, "t2", false), (s, "t3", false)))
      .toDF("subj", "trt", "ok")
    val g1 = Behavior.cochranQ(succ, "subj", "trt", "ok", 3)
      .as[(Long, Long, Long, Option[Long], Option[Boolean])].collect()(0)
    assert(g1 == ((10L, 3L, 2L, Some(20000L), Some(true))))
    // all-success: k*S - sum(R^2) = 3*30 - 10*9 = 0 -> null
    val const = (1L to 10L).flatMap(s =>
      Seq((s, "t1", true), (s, "t2", true), (s, "t3", true)))
      .toDF("subj", "trt", "ok")
    val g2 = Behavior.cochranQ(const, "subj", "trt", "ok", 3)
      .select("q_milli", "significant")
      .as[(Option[Long], Option[Boolean])].collect()(0)
    assert(g2 == ((None, None)))
  }

  // --- runs test --------------------------------------------------------------

  test("runsTest: hand-computed run counts and the integer z² rule") {
    // [1,1,0,0,1]: n1=3, n2=2, R=3 -> |z| < 1.96 (not significant)
    val a = Seq((1L, true), (2L, true), (3L, false), (4L, false),
      (5L, true)).toDF("day", "hot")
    val g1 = Behavior.runsTest(a, "day", "hot")
      .as[(Long, Long, Long, Long, Option[Boolean])].collect()(0)
    assert(g1 == ((5L, 3L, 2L, 3L, Some(false))))
    // 5 ones then 5 zeros: R=2, z = -2.68 -> significant clumping
    val b = ((1L to 5L).map(d => (d, true)) ++
      (6L to 10L).map(d => (d, false))).toDF("day", "hot")
    val g2 = Behavior.runsTest(b, "day", "hot")
      .as[(Long, Long, Long, Long, Option[Boolean])].collect()(0)
    assert(g2 == ((10L, 5L, 5L, 2L, Some(true))))
  }

  // --- D34: streaming runs monitor -------------------------------------------

  test("streamRunsTest (D34): emissions equal the batch runs test at " +
       "each prefix; replays and out-of-order arrivals emit nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.DailyFlag]
    val q = input.toDS()
      .transform(ds => Streams.streamRunsTest(ds))
      .writeStream.format("memory").queryName("runs_sink")
      .outputMode("update").start()
    def f(d: Long, x: Boolean) = Streams.DailyFlag("A", d, x)
    val b1 = Seq(f(1, true), f(2, true), f(3, false))
    val b2 = Seq(f(4, false), f(5, true), f(2, false)) // day 2: stale
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val before = spark.table("runs_sink").count()
      input.addData(b2: _*); q.processAllAvailable() // full replay
      assert(spark.table("runs_sink").count() == before)
    } finally q.stop()
    val got = spark.table("runs_sink").filter($"upto_day" === 5L)
      .select("n_days", "n_pos", "n_neg", "runs", "significant")
      .as[(Long, Long, Long, Long, Option[Boolean])].collect().toSeq
    val daily = Seq((1L, true), (2L, true), (3L, false), (4L, false),
      (5L, true)).toDF("day", "hot")
    val want = Behavior.runsTest(daily, "day", "hot")
      .select("n_days", "n_pos", "n_neg", "runs", "significant")
      .as[(Long, Long, Long, Long, Option[Boolean])].collect().toSeq
    assert(got == want && got == Seq((5L, 3L, 2L, 3L, Some(false))))
  }

  // --- alpha from the D33 cell store ------------------------------------------

  test("krippendorffAlphaFromCells: alpha rebuilt from streamFleissCells' " +
       "latest cells equals the batch operator — one maintained cell " +
       "store serves both agreement reports") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.RatingObs]
    val q = input.toDS()
      .transform(ds => Streams.streamFleissCells(ds))
      .writeStream.format("memory").queryName("alpha_sink")
      .outputMode("update").start()
    val votes = Seq(
      Streams.RatingObs(1L, "r1", "A"), Streams.RatingObs(1L, "r2", "A"),
      Streams.RatingObs(1L, "r3", "A"),
      Streams.RatingObs(2L, "r1", "A"), Streams.RatingObs(2L, "r2", "B"),
      Streams.RatingObs(3L, "r1", "B"), Streams.RatingObs(3L, "r2", "B"),
      Streams.RatingObs(3L, "r3", "B"),
      Streams.RatingObs(4L, "r1", "A")) // single vote: tail drops it
    try {
      input.addData(votes.take(4): _*); q.processAllAvailable()
      input.addData(votes.drop(4): _*); q.processAllAvailable()
    } finally q.stop()
    val cells = spark.table("alpha_sink")
      .groupBy("item", "label")
      .agg(org.apache.spark.sql.functions.max("n").as("n"))
    val got = Behavior
      .krippendorffAlphaFromCells(cells, "item", "label", "n")
      .as[(Long, Long, Long, Option[Long])].collect()(0)
    val batch = votes.map(v => (v.item, v.rater, v.label))
      .toDF("item", "rater", "label")
    val want = Behavior.krippendorffAlpha(batch, "item", "rater", "label")
      .as[(Long, Long, Long, Option[Long])].collect()(0)
    assert(got == want)
    // the r10 hand case: mixed 3- and 2-vote units, alpha 5625
    assert(got == ((3L, 8L, 2L, Some(5625L))))
  }

  test("runsTest: one-sided series reads null significance; " +
       "duplicate-day frames fail the daily guard") {
    val ones = Seq((1L, true), (2L, true), (3L, true)).toDF("day", "hot")
    val g = Behavior.runsTest(ones, "day", "hot")
      .as[(Long, Long, Long, Long, Option[Boolean])].collect()(0)
    assert(g == ((3L, 3L, 0L, 1L, None)))
    val dup = Seq((1L, true), (1L, false), (2L, true)).toDF("day", "hot")
    val ex = intercept[Exception] {
      Behavior.runsTest(dup, "day", "hot").collect()
    }
    assert(ex.getMessage.contains("runsTest") &&
      ex.getMessage.contains("3 rows over 2 days"))
  }
}
