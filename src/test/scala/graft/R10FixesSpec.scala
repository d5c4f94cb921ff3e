package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Behavior, Multimodal}
import graft.streaming.Streams

/** Round-10 discipline closures: the daily-series guard grown to
  * changepointDetect + distinct-day counting, the fleissKappa
  * (item, rater) vote collapse, GVID null-payload routing, the
  * streamTokenCells Misra-Gries state bound, and the D32/D33
  * streaming twins (user gaps / fleiss vote cells).
  */
class R10FixesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- withDailyGuard: changepointDetect + mannKendall -----------------------

  test("changepointDetect: maxDays guard fails fast on an oversized series") {
    val d = (1L to 50L).map(i => (i, i)).toDF("day", "x")
    val ex = intercept[Exception] {
      Behavior.changepointDetect(d, "day", "x", maxDays = 10L).collect()
    }
    assert(ex.getMessage.contains("changepointDetect") &&
      ex.getMessage.contains("maxDays=10"))
  }

  test("changepointDetect: duplicate-day frame fails fast (mis-grained " +
       "input must not silently split a day across array entries)") {
    val d = Seq((1L, 0L), (2L, 5L), (2L, 7L), (3L, 9L)).toDF("day", "x")
    val ex = intercept[Exception] {
      Behavior.changepointDetect(d, "day", "x").collect()
    }
    assert(ex.getMessage.contains("DAILY-AGGREGATED") &&
      ex.getMessage.contains("4 rows over 3 days"))
  }

  test("changepointDetect: a valid daily series still splits exactly " +
       "under the guard") {
    val d = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 10L), (5L, 10L),
      (6L, 10L)).toDF("day", "x")
    val r = Behavior.changepointDetect(d, "day", "x")
      .as[(Long, Option[Long], Option[Long])].collect()(0)
    assert(r == ((6L, Some(3L), Some(25000000L))))
  }

  test("mannKendall: duplicate-day frame under the row bound fails fast " +
       "(the guard counts DISTINCT days, not rows)") {
    val d = Seq((1L, 3L), (2L, 1L), (2L, 4L), (3L, 5L)).toDF("day", "x")
    val ex = intercept[Exception] {
      Behavior.mannKendall(d, "day", "x").collect()
    }
    assert(ex.getMessage.contains("mannKendall") &&
      ex.getMessage.contains("4 rows over 3 days"))
  }

  // --- fleissKappa vote collapse ---------------------------------------------

  test("fleissKappa: duplicate (item, rater) rows collapse to ONE vote " +
       "(min label), never to a phantom rater") {
    // item 1: r1 votes twice (B then A -> min A), r2 votes A;
    // item 2: r1=A r2=B; item 3: r1=B r2=B — same panel as the
    // hand-computed R9 case (kappa 1/3) once duplicates collapse.
    // Without the collapse item 1 would read 3 votes and DROP from
    // the exactly-2 panel.
    val r = Seq((1L, "r1", "B"), (1L, "r1", "A"), (1L, "r2", "A"),
      (2L, "r1", "A"), (2L, "r2", "B"),
      (3L, "r1", "B"), (3L, "r2", "B"))
      .toDF("item", "rater", "label")
    val got = Behavior.fleissKappa(r, "item", "rater", "label", 2)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect()(0)
    assert(got == ((3L, 2L, 2L, Some(6666L), Some(5000L), Some(3333L))))
  }

  // --- GVID null payload ------------------------------------------------------

  test("isGvidPayload: null-safe like its image/audio siblings; a null " +
       "video payload routes to the stub, not a decode-error row") {
    assert(!Multimodal.isGvidPayload(null))
    val assets = Seq((1L, "video", null: Array[Byte]))
      .toDF("asset_id", "kind", "payload")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.lit(16).as("width"),
        org.apache.spark.sql.functions.lit(16).as("height"),
        org.apache.spark.sql.functions.lit(16000).as("sample_rate"),
        org.apache.spark.sql.functions.lit(1).as("n_frames"),
        org.apache.spark.sql.functions.lit("x").as("mime")))
    val got = Multimodal.featurize(assets)
      .select("decode_error").as[Option[String]].collect().toSeq
    assert(got == Seq(None))
  }

  // --- videoNearDup stride sensitivity (the §3 seam note, pinned) -------------

  test("videoNearDup stride sensitivity: alternating shared frames read " +
       "containment 1000 at stride 2 but 500 at stride 1 — the stride " +
       "trades decode cost for containment RESOLUTION, not correctness") {
    val a = Multimodal.scramble64(101L); val b = Multimodal.scramble64(202L)
    val x1 = Multimodal.scramble64(303L); val x2 = Multimodal.scramble64(404L)
    val y1 = Multimodal.scramble64(505L); val y2 = Multimodal.scramble64(606L)
    // shared frames at EVEN positions, unique filler at odd ones;
    // different lumaBase: dHash is gradient signs, brightness-invariant
    val v1 = Multimodal.syntheticGvid(Seq(a, x1, b, x2), 128)
    val v2 = Multimodal.syntheticGvid(Seq(a, y1, b, y2), 168)
    val assets = Seq((1L, v1), (2L, v2)).toDF("asset_id", "payload")
    def cont(stride: Int): Seq[Long] = {
      val (fr, _) = Multimodal.videoFrameHashes(assets, stride)
      Multimodal.videoNearDup(fr, maxHamming = 0, minSharedPermille = 0L)
        .filter($"id_a" === 1L && $"id_b" === 2L)
        .select("containment_permille").as[Long].collect().toSeq
    }
    assert(cont(2) == Seq(1000L)) // sampled sets {a, b} coincide fully
    assert(cont(1) == Seq(500L))  // full sets share 2 of 4
  }

  // --- streamTokenCells Misra-Gries bound -------------------------------------

  test("streamTokenCells (D31): per-group state and emission bounded at " +
       "capacity under a high-cardinality token stream; heavy hitter " +
       "survives within the MG error bound") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.GDoc]
    val q = input.toDS()
      .transform(ds => Streams.streamTokenCells(ds, capacity = 8))
      .writeStream.format("memory").queryName("tokcap_sink")
      .outputMode("update").start()
    val noise1 = (0 until 50).map(i => f"noise$i%03d").mkString(" ")
    val noise2 = (50 until 100).map(i => f"noise$i%03d").mkString(" ")
    try {
      input.addData(Streams.GDoc("g",
        Seq.fill(30)("heavy").mkString(" ") + " " + noise1))
      q.processAllAvailable()
      input.addData(Streams.GDoc("g", "heavy " + noise2))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("tokcap_sink")
      .as[(String, String, Long)].collect().toSeq
    // each batch emits the tracked set only: ≤ capacity rows per batch
    assert(rows.nonEmpty && rows.size <= 16, s"got ${rows.size} rows")
    // the heavy hitter is tracked throughout; its count never exceeds
    // the true 31 and never undershoots by more than N/(capacity+1)
    val heavy = rows.filter(_._2 == "heavy").map(_._3)
    assert(heavy.nonEmpty && heavy.max <= 31L && heavy.max >= 31L - 131L / 9L)
  }

  // --- D32: streaming user gaps ------------------------------------------------

  test("streamUserGaps (D32): CV² rebuilt from the streamed gap log " +
       "equals batch burstiness on a tie-free series; replays and " +
       "out-of-order arrivals emit nothing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.GapEvent]
    val q = input.toDS()
      .transform(ds => Streams.streamUserGaps(ds))
      .writeStream.format("memory").queryName("gap_sink")
      .outputMode("update").start()
    val b1 = Seq(Streams.GapEvent(1L, "g", 0L), Streams.GapEvent(1L, "g", 10L),
      Streams.GapEvent(2L, "g", 5L))
    val b2 = Seq(Streams.GapEvent(1L, "g", 20L), Streams.GapEvent(2L, "g", 25L),
      Streams.GapEvent(2L, "g", 3L)) // out-of-order: behind user 2's frontier
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val before = spark.table("gap_sink").count()
      input.addData(b2: _*); q.processAllAvailable() // full replay
      assert(spark.table("gap_sink").count() == before)
    } finally q.stop()
    val gaps = spark.table("gap_sink")
      .select($"grp", $"gap".as("__gap"))
    val got = Behavior.burstinessFromGaps(gaps)
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    val batch = (b1 ++ b2.take(2)).map(e => (e.user, e.ts, e.grp))
      .toDF("user", "ts", "grp")
    val want = Behavior.burstiness(batch, "user", "ts", "grp")
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got == want && got.nonEmpty)
    // hand-check: gaps {10, 10, 20} -> n=3, mean 13333 milli, S=40,
    // S2=600 -> cv2 = 1e4*(3*600-1600)/1600 = 1250
    assert(got == Seq(("g", 3L, 13333L, Some(1250L))))
  }

  // --- D33: streaming fleiss vote cells ----------------------------------------

  test("streamFleissCells (D33): kappa rebuilt from latest cells equals " +
       "batch fleissKappa on the full prefix; re-votes are idempotent " +
       "and replay-silent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.RatingObs]
    val q = input.toDS()
      .transform(ds => Streams.streamFleissCells(ds))
      .writeStream.format("memory").queryName("kappa_sink")
      .outputMode("update").start()
    val b1 = Seq(Streams.RatingObs(1L, "r1", "A"), Streams.RatingObs(1L, "r2", "A"),
      Streams.RatingObs(2L, "r1", "A"))
    val b2 = Seq(Streams.RatingObs(2L, "r2", "B"),
      Streams.RatingObs(3L, "r1", "B"), Streams.RatingObs(3L, "r2", "B"),
      Streams.RatingObs(4L, "r1", "A"), // ragged: one rating only
      Streams.RatingObs(1L, "r1", "B")) // re-vote: first wins, ignored
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val before = spark.table("kappa_sink").count()
      input.addData(b2: _*); q.processAllAvailable() // full replay
      assert(spark.table("kappa_sink").count() == before)
    } finally q.stop()
    // cell counts are monotone (first-vote-wins): latest = max
    val cells = spark.table("kappa_sink")
      .groupBy("item", "label")
      .agg(org.apache.spark.sql.functions.max("n").as("n"))
    val got = Behavior.fleissKappaFromCells(cells, "item", "label", "n", 2)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect()(0)
    // same panel as the R9 hand-computed case: kappa = 1/3
    val batch = (b1 ++ b2).map(r => (r.item, r.rater, r.label))
      .toDF("item", "rater", "label")
    val want = Behavior.fleissKappa(batch, "item", "rater", "label", 2)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect()(0)
    assert(got == want)
    assert(got == ((3L, 2L, 2L, Some(6666L), Some(5000L), Some(3333L))))
  }
}
