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

  test("streamLjungBox (D35): emissions equal the batch ljungBox at " +
       "each prefix (incl. the hand-computed alternating series); " +
       "replays and out-of-order arrivals emit nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.DailyMetric]
    val q = input.toDS()
      .transform(ds => Streams.streamLjungBox(ds, maxLag = 1))
      .writeStream.format("memory").queryName("lb_sink")
      .outputMode("update").start()
    def m(d: Long, x: Long) = Streams.DailyMetric("A", d, x)
    val b1 = Seq(m(0, 1), m(1, 2), m(2, 1))
    val b2 = Seq(m(3, 2), m(4, 1), m(5, 2), m(1, 9)) // day 1: stale
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val before = spark.table("lb_sink").count()
      input.addData(b2: _*); q.processAllAvailable() // full replay
      assert(spark.table("lb_sink").count() == before)
    } finally q.stop()
    // prefix at day 2 (n=3 > maxLag=1): stream vs batch on 3 days
    val got3 = spark.table("lb_sink").filter($"upto_day" === 2L)
      .select("n_days", "rho1_micro", "q_milli", "significant")
      .as[(Long, Option[Long], Option[Long], Option[Boolean])]
      .collect().toSeq
    val want3 = Behavior.ljungBox(
      Seq((0L, 1L), (1L, 2L), (2L, 1L)).toDF("day", "n"),
      "day", "n", maxLag = 1)
      .select("n_days", "rho1_micro", "q_milli", "significant")
      .as[(Long, Option[Long], Option[Long], Option[Boolean])]
      .collect().toSeq
    assert(got3 == want3)
    // full prefix = the R10 hand case: rho -5/6, q 6666, significant
    val got6 = spark.table("lb_sink").filter($"upto_day" === 5L)
      .select("n_days", "rho1_micro", "q_milli", "significant")
      .as[(Long, Option[Long], Option[Long], Option[Boolean])]
      .collect().toSeq
    assert(got6 == Seq((6L, Some(-833333L), Some(6666L), Some(true))))
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

  // --- Friedman test ----------------------------------------------------------

  test("friedmanTest: hand-computed 3-subject perfect ordering " +
       "(Q = 6.0, significant at df 2 by 144000 > 143784 — the grid " +
       "edge); duplicate observations collapse to MIN") {
    // every block ranks t1<t2<t3: r2 = (2,4,6) per block,
    // R2 = (6,12,18), sum R2² = 504, n²k(k+1)² = 432 -> num 144;
    // A2 = 3·56 = 168, nk(k+1)² = 144 -> den 24; Q = 6.0
    val o = Seq(
      (1L, "t1", 10L), (1L, "t2", 20L), (1L, "t3", 30L),
      (2L, "t1", 1L), (2L, "t2", 5L), (2L, "t3", 9L),
      (3L, "t1", 100L), (3L, "t2", 200L), (3L, "t3", 300L),
      // duplicate (3, t1) with a HIGH value — collapses to MIN 100,
      // leaving the ordering (and Q) untouched
      (3L, "t1", 999L))
      .toDF("subj", "trt", "v")
    val got = Behavior.friedmanTest(o, "subj", "trt", "v", 3)
      .as[(Long, Long, Long, Option[Long], Option[Boolean])].collect()(0)
    assert(got == ((3L, 3L, 2L, Some(6000L), Some(true))))
  }

  test("friedmanTest: ties carry doubled average ranks (Q = 26/7); " +
       "incomplete blocks drop") {
    // block 1 (5,5,9): r2 = (3,3,6); block 2 (1,2,3): r2 = (2,4,6)
    // R2 = (5,7,12), sumR2² = 218 - 192 = 26; A2 = 110 - 96 = 14
    // q_milli = 52000 div 14 = 3714, not significant
    val o = Seq(
      (1L, "t1", 5L), (1L, "t2", 5L), (1L, "t3", 9L),
      (2L, "t1", 1L), (2L, "t2", 2L), (2L, "t3", 3L),
      // subject 3 has only two treatments -> drops
      (3L, "t1", 7L), (3L, "t2", 8L))
      .toDF("subj", "trt", "v")
    val got = Behavior.friedmanTest(o, "subj", "trt", "v", 3)
      .as[(Long, Long, Long, Option[Long], Option[Boolean])].collect()(0)
    assert(got == ((2L, 3L, 2L, Some(3714L), Some(false))))
  }

  test("friedmanTest: all-tied panels read null (zero rank variance)") {
    val o = Seq(
      (1L, "t1", 7L), (1L, "t2", 7L), (1L, "t3", 7L),
      (2L, "t1", 2L), (2L, "t2", 2L), (2L, "t3", 2L))
      .toDF("subj", "trt", "v")
    val got = Behavior.friedmanTest(o, "subj", "trt", "v", 3)
      .select("q_milli").as[Option[Long]].collect()(0)
    assert(got.isEmpty)
  }

  // --- Ljung-Box --------------------------------------------------------------

  test("ljungBox: hand-computed alternating series at lag 1 " +
       "(rho = -5/6, Q = 6.666, significant at df 1)") {
    // x = (1,2,1,2,1,2): c = 6x-9 = ±3, den = 54, num1 = -45,
    // rho = 833333, term = 833333²·10⁶ div 5, q_milli = 6666
    val d = Seq((0L, 1L), (1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L),
      (5L, 2L)).toDF("day", "n")
    val got = Behavior.ljungBox(d, "day", "n", maxLag = 1)
      .as[(Long, Long, Option[Long], Option[Long], Option[Boolean])]
      .collect()(0)
    assert(got == ((6L, 1L, Some(-833333L), Some(6666L), Some(true))))
  }

  test("ljungBox: n <= maxLag and zero-variance series read null; " +
       "duplicate-day frames fail the daily guard") {
    val short = Seq((0L, 1L), (1L, 5L), (2L, 2L)).toDF("day", "n")
    val g1 = Behavior.ljungBox(short, "day", "n", maxLag = 3)
      .select("q_milli").as[Option[Long]].collect()(0)
    assert(g1.isEmpty)
    val flat = Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 4L))
      .toDF("day", "n")
    val g2 = Behavior.ljungBox(flat, "day", "n", maxLag = 2)
      .select("q_milli").as[Option[Long]].collect()(0)
    assert(g2.isEmpty)
    val dup = Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("day", "n")
    val ex = intercept[Exception] {
      Behavior.ljungBox(dup, "day", "n", maxLag = 1).collect()
    }
    assert(ex.getMessage.contains("ljungBox") &&
      ex.getMessage.contains("3 rows over 2 days"))
  }

  test("ljungBox: white-noise-ish irregular series is NOT significant " +
       "and rho1 carries its sign") {
    // hand-irregular values; the assertion is structural (not
    // significant, rho1 defined) — the exact integers are oracle-
    // verified at all three SFs by the driver key
    val d = Seq((0L, 5L), (1L, 9L), (2L, 4L), (3L, 9L), (4L, 6L),
      (5L, 3L), (6L, 8L), (7L, 5L), (8L, 7L), (9L, 4L))
      .toDF("day", "n")
    val got = Behavior.ljungBox(d, "day", "n", maxLag = 3)
      .as[(Long, Long, Option[Long], Option[Long], Option[Boolean])]
      .collect()(0)
    assert(got._1 == 10L && got._3.nonEmpty && got._4.nonEmpty &&
      got._5 == Some(false))
  }

  // --- Wilcoxon signed-rank ---------------------------------------------------

  test("wilcoxonSignedRank: hand-computed no-tie panel (W2+ = 16, " +
       "z² = 1.2, not significant); zero differences drop") {
    // d = (+1, -2, +3, +4): r2 = (2,4,6,8), W2+ = 2+6+8 = 16,
    // num = 32-20 = 12, var48 = 2·4·5·9 = 360, z2_milli = 1200
    val p = Seq((10L, 9L), (1L, 3L), (7L, 4L), (9L, 5L),
      (6L, 6L)) // zero difference -> drops
      .toDF("a", "b")
    val got = Behavior.wilcoxonSignedRank(p, "a", "b")
      .as[(Long, Long, Option[Long], Option[Boolean])].collect()(0)
    assert(got == ((4L, 16L, Some(1200L), Some(false))))
  }

  test("wilcoxonSignedRank: consistent one-sided shift IS significant " +
       "(d = 1..6 all positive, z² = 4.846)") {
    val p = (1L to 6L).map(i => (10L + i, 10L)).toDF("a", "b")
    val got = Behavior.wilcoxonSignedRank(p, "a", "b")
      .as[(Long, Long, Option[Long], Option[Boolean])].collect()(0)
    // W2+ = sum(2i) = 42, num = 42, var48 = 2·6·7·13 = 1092
    assert(got == ((6L, 42L, Some(4846L), Some(true))))
  }

  test("wilcoxonSignedRank: tied |d| carry doubled average ranks; " +
       "all-zero panels read null") {
    // d = (+1, -1, +2): |d| group 1 has r2 = 3 each, group 2 r2 = 6
    // W2+ = 9, num = 6, ties = 6, var48 = 168-6 = 162, z2 = 666
    val p = Seq((5L, 4L), (4L, 5L), (9L, 7L)).toDF("a", "b")
    val got = Behavior.wilcoxonSignedRank(p, "a", "b")
      .as[(Long, Long, Option[Long], Option[Boolean])].collect()(0)
    assert(got == ((3L, 9L, Some(666L), Some(false))))
    val z = Seq((1L, 1L), (2L, 2L)).toDF("a", "b")
    val gz = Behavior.wilcoxonSignedRank(z, "a", "b")
      .as[(Long, Long, Option[Long], Option[Boolean])].collect()(0)
    assert(gz == ((0L, 0L, None, None)))
  }

  // --- dup n-gram ratio -------------------------------------------------------

  test("dupNgramRatio: hand-computed looping text (4 trigrams, 2 " +
       "distinct -> 5000 permyriad); normalization matches the " +
       "exact-dedup rule; short and null docs read 0/null") {
    val docs = Seq(
      (1L, "a b a b a b"),           // trigrams: aba, bab, aba, bab
      (2L, "A  b a\tB a B"),         // same after lower + ws collapse
      (3L, "x y z"),                 // one trigram, no dups
      (4L, "w x"),                   // < 3 tokens -> 0 ngrams
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .dupNgramRatio(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(got(0) == ((1L, 4L, 2L, Some(5000L))))
    assert(got(1) == ((2L, 4L, 2L, Some(5000L))))
    assert(got(2) == ((3L, 1L, 1L, Some(0L))))
    assert(got(3) == ((4L, 0L, 0L, None)))
    assert(got(4) == ((5L, 0L, 0L, None)))
  }
}
