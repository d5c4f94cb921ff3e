package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Behavior, Graph, TextAnalysis}

/** Hand-computed cases for the behavioral-analytics family
  * (retention cohorts, z-score anomalies, transition matrix, RFM) and
  * the round-6c graph additions (neighbor-Jaccard link prediction,
  * k-core peeling), plus the readability grade.
  */
class BehaviorGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val WeekUs = 7L * 86400L * 1000000L

  test("retentionCohorts: planted first-weeks and return offsets") {
    // u1 first week 0, returns weeks 1 and 2 (twice in week 1 — the
    // distinct collapses it); u2 only week 0; u3 first week 1
    val ev = Seq(
      (1L, 0L), (1L, WeekUs + 5L), (1L, WeekUs + 9L), (1L, 2 * WeekUs),
      (2L, 100L),
      (3L, WeekUs + 1L)
    ).toDF("user_id", "ts_us")
    val got = Behavior.retentionCohorts(ev, "user_id", "ts_us")
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L)))
  }

  test("anomalyZscore: exact integer moment test incl. the boundary tie") {
    // bucket A: four 10s and one 90 → n=5, S1=130, S2=8500;
    // for x=90: (n·x−S1)² = 320² = 102400 and n·S2−S1² = 25600, so
    // k=1 flags it (102400 > 25600), while k=2 lands EXACTLY on the
    // tie (4·25600 = 102400) and the strict > must NOT flag;
    // bucket B: all-equal values → σ = 0, dev = 0, never flagged;
    // bucket C: a single row → n < 2, excluded
    val ev = Seq(
      (1L, "A", 10L), (2L, "A", 10L), (3L, "A", 10L), (4L, "A", 10L),
      (5L, "A", 90L),
      (6L, "B", 7L), (7L, "B", 7L), (8L, "B", 7L),
      (9L, "C", 1000L)
    ).toDF("event_id", "bucket", "value_milli")
    val k1 = Behavior.anomalyZscore(ev, Seq("bucket"), "value_milli", 1)
      .select("event_id").as[Long].collect().toSeq
    assert(k1 == Seq(5L))
    assert(Behavior.anomalyZscore(ev, Seq("bucket"), "value_milli", 2)
      .count() == 0L)
  }

  test("eventTransitions: tie-broken ordering, permille shares") {
    // u1: A,B,A,C (B and the second A share ts — event_id breaks the
    // tie deterministically); u2: B,A
    val ev = Seq(
      (1L, 10L, 100L, "A"), (1L, 20L, 200L, "B"), (1L, 21L, 200L, "A"),
      (1L, 30L, 300L, "C"),
      (2L, 40L, 100L, "B"), (2L, 50L, 150L, "A")
    ).toDF("user_id", "event_id", "ts_us", "event_type")
    val got = Behavior
      .eventTransitions(ev, "user_id", "ts_us", "event_id", "event_type")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long)].collect().toSeq
    // from A: A→B, A→C (500 each); from B: B→A twice (1000)
    assert(got == Seq(("A", "B", 1L, 500L), ("A", "C", 1L, 500L),
      ("B", "A", 2L, 1000L)))
  }

  test("eventTransitions: permille shares sum to ~1000 per from_type") {
    val ev = Seq.tabulate(60) { i =>
      (i.toLong % 5, i.toLong, i.toLong * 10,
        Seq("A", "B", "C")((i * 7) % 3))
    }.toDF("user_id", "event_id", "ts_us", "event_type")
    val sums = Behavior
      .eventTransitions(ev, "user_id", "ts_us", "event_id", "event_type")
      .groupBy("from_type").agg(sum("permille").as("s"))
      .select("s").as[Long].collect()
    // truncating div: each from-row loses < 1 permille
    assert(sums.forall(s => s >= 997L && s <= 1000L))
  }

  test("rfmSegments: hand-computed quartile scores on 4 customers") {
    val day = 86400L * 1000000L
    // cust → (last day, n orders, cents): thresholds under the type-1
    // rank rule on n=4 are the 1st/2nd/3rd sorted values
    val orders = Seq(
      (1L, 0L * day, 100L),
      (2L, 0L * day, 120L), (2L, 1L * day, 80L),
      (3L, 0L * day, 100L), (3L, 1L * day, 100L), (3L, 2L * day, 100L),
      (4L, 0L * day, 100L), (4L, 1L * day, 100L), (4L, 2L * day, 100L),
      (4L, 3L * day, 100L)
    ).toDF("cust", "order_us", "cents")
    val got = Behavior.rfmSegments(orders, "cust", "order_us", "cents")
      .orderBy("cust")
      .as[(Long, Long, Long, Long, Int, Int, Int, Int)].collect().toSeq
    // recency_days: c1=3 c2=2 c3=1 c4=0 → q=(0,1,2) → scores 4,4,3,2
    // frequency: 1,2,3,4 → q=(1,2,3) → scores 2,3,4,4
    // monetary: 100,200,300,400 → q=(100,200,300) → scores 2,3,4,4
    assert(got == Seq(
      (1L, 3L, 1L, 100L, 4, 2, 2, 422),
      (2L, 2L, 2L, 200L, 4, 3, 3, 433),
      (3L, 1L, 3L, 300L, 3, 4, 4, 344),
      (4L, 0L, 4L, 400L, 2, 4, 4, 244)))
  }

  test("jaccardNeighbors: hand graphs, adjacency exclusion, hub cap") {
    // triangle 1-2-3 with pendant 4 on node 3: candidate pairs are
    // (1,4) and (2,4) through center 3 (deg 2 vs 1 → 1000/2 = 500);
    // (1,2),(1,3),(2,3) are adjacent and excluded
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("s", "t")
    val got = Graph.jaccardNeighbors(tri, "s", "t")
      .orderBy("id_a", "id_b").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 1L, 500L), (2L, 4L, 1L, 500L)))

    // square 1-2-3-4-1: diagonals share BOTH neighbors → jaccard 1000
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "t")
    val gotSq = Graph.jaccardNeighbors(sq, "s", "t")
      .orderBy("id_a", "id_b").as[(Long, Long, Long, Long)].collect().toSeq
    assert(gotSq == Seq((1L, 3L, 2L, 1000L), (2L, 4L, 2L, 1000L)))

    // hub cap: maxDegree=1 excludes every center in the triangle
    // graph (all have degree ≥ 2) → no candidates at all
    assert(Graph.jaccardNeighbors(tri, "s", "t", maxDegree = 1).count() == 0L)
    // threshold filter
    assert(Graph.jaccardNeighbors(tri, "s", "t", minPermille = 501)
      .count() == 0L)
  }

  test("kCore: pendant chain erodes onto the cycle core; empty when k too big") {
    // chain 1-2-3-4-5 feeding triangle 5-6-7: the 2-core is exactly
    // the triangle, reached after 4 peel rounds
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (5L, 7L)).toDF("s", "t")
    val got = Graph.kCore(g, "s", "t", k = 2, maxRounds = 6)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((5L, 2L), (6L, 2L), (7L, 2L)))
    // k=3: the triangle's degree-2 nodes all drop in one round
    assert(Graph.kCore(g, "s", "t", k = 3, maxRounds = 3).count() == 0L)
  }

  test("kCore: maxRounds truncation equals the same-depth unroll") {
    // after exactly 2 rounds nodes 1,2 are gone; node 3 survives the
    // round-2 CUT (its round-2 degree still counted node 2) and shows
    // its UNCONVERGED degree 1 in the round-2 state
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (5L, 7L)).toDF("s", "t")
    val got = Graph.kCore(g, "s", "t", k = 2, maxRounds = 2)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((3L, 1L), (4L, 2L), (5L, 3L), (6L, 2L), (7L, 2L)))
  }

  test("kCore and jaccardNeighbors: layout invariance") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (5L, 7L), (1L, 7L), (2L, 6L)).toDF("s", "t")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.map(col): _*).collect().toSeq
    assert(canon(Graph.kCore(g.repartition(7), "s", "t", 2, 6)) ==
      canon(Graph.kCore(g.coalesce(1), "s", "t", 2, 6)))
    assert(canon(Graph.jaccardNeighbors(g.repartition(5), "s", "t")) ==
      canon(Graph.jaccardNeighbors(g.coalesce(1), "s", "t")))
  }

  test("windowFunnel: in-window converts, out-of-window blocked, anchor " +
       "pinned to the earliest entry") {
    import graft.operators.Relational
    val T = 100L
    val ev = Seq(
      // u1: full conversion inside the window
      (1L, 0L, "view"), (1L, 50L, "click"), (1L, 90L, "purchase"),
      // u2: click lands past anchor+T → level 1 (purchase unreachable)
      (2L, 0L, "view"), (2L, 150L, "click"), (2L, 160L, "purchase"),
      // u3: anchor is the EARLIEST view; the later view at 100 does
      // not re-anchor, so the click at 180 is out of window
      (3L, 0L, "view"), (3L, 100L, "view"), (3L, 180L, "click"),
      // u4: click before the view doesn't count; none after → level 1
      (4L, 10L, "click"), (4L, 20L, "view")
    ).toDF("user_id", "ts_us", "event_type")
    val got = Relational.windowFunnel(ev, "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"), windowUs = T)
      .select("user_id", "level").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 1))
  }

  test("pathTrigrams: hand-counted triples with tail prune") {
    val ev = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 20L, "B"), (1L, 3L, 30L, "C"),
      (1L, 4L, 40L, "A"), (1L, 5L, 50L, "B"), (1L, 6L, 60L, "C"),
      (2L, 7L, 10L, "A"), (2L, 8L, 20L, "B"), (2L, 9L, 30L, "C")
    ).toDF("user_id", "event_id", "ts_us", "event_type")
    val all = Behavior.pathTrigrams(ev, "user_id", "ts_us", "event_id",
        "event_type").orderBy("e1", "e2", "e3")
      .as[(String, String, String, Long)].collect().toSeq
    // u1: ABC, BCA, CAB, ABC; u2: ABC → ABC×3, BCA, CAB
    assert(all == Seq(("A", "B", "C", 3L), ("B", "C", "A", 1L),
      ("C", "A", "B", 1L)))
    val pruned = Behavior.pathTrigrams(ev, "user_id", "ts_us", "event_id",
        "event_type", minCount = 2L)
      .as[(String, String, String, Long)].collect().toSeq
    assert(pruned == Seq(("A", "B", "C", 3L)))
  }

  test("weekOverWeek: consecutive delta, gap week null, zero base null") {
    val wk = WeekUs
    val ev = Seq(
      // type A: weeks 0 (1000), 1 (1500), 3 (900) — gap at 2
      ("A", 0L, 1000L), ("A", wk, 1500L), ("A", 3 * wk, 900L),
      // type B: week 0 sums to 0 → week 1 has a zero base
      ("B", 0L, 5L), ("B", 1L, -5L), ("B", wk, 70L)
    ).toDF("event_type", "ts_us", "value_milli")
    val got = Behavior.weekOverWeek(ev, "event_type", "ts_us", "value_milli")
      .orderBy("event_type", "week")
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      ("A", 0L, 1L, 1000L, None),
      ("A", 1L, 1L, 1500L, Some(500L)),   // +50.0%
      ("A", 3L, 1L, 900L, None),          // gap week
      ("B", 0L, 2L, 0L, None),
      ("B", 1L, 1L, 70L, None)))          // zero base
  }

  test("hopDistance: multi-source BFS labels, truncation, isolated source") {
    // path 1-2-3-4-5, separate edge 6-7
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
      .toDF("s", "t")
    def run(src: Seq[Long], hops: Int) =
      Graph.hopDistance(g, "s", "t", src.toDF("id"), "id", hops)
        .orderBy("dist", "id").as[(Long, Int)].collect().toSeq
    // single source, truncated at 3 hops: node 5 not yet reached
    assert(run(Seq(1L), 3) ==
      Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3)))
    // enough hops: exhausts at distance 4; 6,7 unreachable — absent
    assert(run(Seq(1L), 10) ==
      Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3), (5L, 4)))
    // multi-source: both ends at once, meet in the middle
    assert(run(Seq(1L, 5L), 10) ==
      Seq((1L, 0), (5L, 0), (2L, 1), (4L, 1), (3L, 2)))
    // a source with no edges stays isolated at distance 0
    assert(run(Seq(99L), 4) == Seq((99L, 0)))
  }

  test("activeUsersRolling: hand-computed DAU/WAU/MAU and stickiness") {
    val day = 86400L * 1000000L
    // day 0: users {1,2}; day 1: {2,3}; day 8: {1}
    val ev = Seq((1L, 0L), (2L, 10L), (2L, day + 1L), (3L, day + 2L),
      (1L, 8 * day + 3L)).toDF("user_id", "ts_us")
    val got = Behavior.activeUsersRolling(ev, "user_id", "ts_us", k = 64)
      .orderBy("day").as[(Long, Long, Long, Long, Long)].collect().toSeq
    // wau(1) spans days −5..1 → {1,2,3}; wau(8) spans 2..8 → {1};
    // mau(8) spans −19..8 → everyone
    assert(got == Seq(
      (0L, 2L, 2L, 2L, 1000L),
      (1L, 2L, 3L, 3L, 666L),
      (8L, 1L, 1L, 3L, 333L)))
  }

  test("activeUsersRolling: layout invariance") {
    val ev = Seq.tabulate(300)(i =>
      ((i * 13L) % 40L, i.toLong * 9999999L)).toDF("user_id", "ts_us")
    val a = Behavior.activeUsersRolling(ev.repartition(7), "user_id", "ts_us",
      1 << 10).orderBy("day").collect().toSeq
    val b = Behavior.activeUsersRolling(ev.coalesce(1), "user_id", "ts_us",
      1 << 10).orderBy("day").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("cohortLtv: hand-computed cumulative revenue per cohort") {
    val wk = WeekUs
    val o = Seq(
      // c1 enters week 0, buys again weeks 0 and 2; c2 enters week 0;
      // c3 enters week 1
      (1L, 0L, 100L), (1L, 5L, 50L), (1L, 2 * wk, 25L),
      (2L, wk - 1, 40L),
      (3L, wk, 60L)
    ).toDF("cust", "order_us", "cents")
    val got = Behavior.cohortLtv(o, "cust", "order_us", "cents")
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L, 190L, 190L),   // c1 (100+50) + c2 (40)
      (0L, 2L, 1L, 25L, 215L),    // c1's week-2 order, cumulative
      (1L, 0L, 1L, 60L, 60L)))
  }

  test("attributionLinear: equal split, remainder to first touch, " +
       "credits sum to exactly 1000") {
    import graft.operators.Behavior
    val ev = Seq(
      // purchase 100 at t=1000 with 3 views in window → 334/333/333
      (1L, 10L, 400L, "view"), (1L, 11L, 500L, "view"),
      (1L, 12L, 900L, "view"), (1L, 100L, 1000L, "purchase"),
      // view outside the lookback (t=keep window 100) excluded
      (2L, 20L, 1L, "view"), (2L, 21L, 950L, "view"),
      (2L, 200L, 1000L, "purchase"),
      // purchase with no touches emits nothing
      (3L, 300L, 1000L, "purchase")
    ).toDF("user_id", "event_id", "ts_us", "event_type")
    val got = Behavior.attributionLinear(ev, "user_id", "ts_us", "event_id",
        "event_type", "view", "purchase", lookbackUs = 600L)
      .orderBy("purchase_event_id", "view_event_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((100L, 10L, 334L), (100L, 11L, 333L),
      (100L, 12L, 333L), (200L, 21L, 1000L)))
    val sums = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(sums.values.forall(_ == 1000L))
  }

  test("clusterTopics: hand-computed ppb-rate lift, thresholds") {
    // cell 0 docs are all "apple"; cell 1 docs all "banana" — each
    // token's in-cell rate is 10⁹ ppb vs corpus rate 5·10⁸ ppb →
    // lift exactly 2000; common token "the" everywhere → lift 1000
    val docs = Seq(
      (1L, "apple apple apple apple the"),
      (2L, "apple apple apple apple the"),
      (3L, "banana banana banana banana the"),
      (4L, "banana banana banana banana the")
    ).toDF("doc_id", "text")
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("vec_id", "cell")
    val got = TextAnalysis.clusterTopics(docs, "doc_id", "text",
        assign, "vec_id", "cell", minCount = 5L, minLiftPermille = 1500L)
      .orderBy("cell", "token")
      .as[(Long, String, Long, Long)].collect().toSeq
    // per cell: 8 apples (or bananas) + 2 "the" = 10 tokens; corpus
    // T = 20; apple rate_cell = 8·10⁹/10, rate_corp = 8·10⁹/20 →
    // lift 2000; "the" lift 1000 (< 1500, excluded); counts < 5 gone
    assert(got == Seq((0L, "apple", 8L, 2000L), (1L, "banana", 8L, 2000L)))
  }

  test("sourceOverlap: hand-computed shared trigrams and jaccard") {
    val docs = Seq(
      ("A", "one two three four"),     // grams: {one two three, two three four}
      ("B", "one two three"),          // {one two three}
      ("B", "zz yy xx"),               // {zz yy xx}
      ("C", "totally different words here") // 2 grams, none shared
    ).toDF("source", "text")
    val got = TextAnalysis.sourceOverlap(docs, "source", "text", n = 3)
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long)].collect().toSeq
    // A∩B = {one two three}: |A|=2, |B|=2 → 1000·1/(2+2−1) = 333
    assert(got == Seq(("A", "B", 1L, 333L)))
  }

  test("sourceOverlap: hub-gram cap drops grams shared by > maxSources " +
       "sources from the whole universe; exact when df ≤ cap") {
    // "hub hub hub" lives in ALL four sources (boilerplate); the
    // distinguishing gram "one two three" only in A and B
    val docs = Seq(
      ("A", "hub hub hub"), ("A", "one two three"),
      ("B", "hub hub hub"), ("B", "one two three"),
      ("C", "hub hub hub"), ("C", "c only words here"),
      ("D", "hub hub hub"), ("D", "d text quite unlike")
    ).toDF("source", "text")
    // cap 3 < df(hub)=4: hub gram leaves the universe entirely —
    // C and D then share nothing and drop out; A∩B = {one two three}
    // over capped sizes |A|=|B|=1 → jaccard 1000
    val capped = TextAnalysis.sourceOverlap(docs, "source", "text",
        n = 3, maxSources = 3)
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(capped == Seq(("A", "B", 1L, 1000L)))
    // cap ≥ #sources: exact — identical to the uncapped algebra
    // (every pair shares hub; A-B also share the trigram)
    val exact = TextAnalysis.sourceOverlap(docs, "source", "text",
        n = 3, maxSources = 1024)
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(exact == Seq(
      ("A", "B", 2L, 1000L), ("A", "C", 1L, 250L), ("A", "D", 1L, 250L),
      ("B", "C", 1L, 250L), ("B", "D", 1L, 250L), ("C", "D", 1L, 200L)))
  }

  test("readability: hand-counted words/sentences/syllables") {
    val docs = Seq(
      (1L, "The cat sat. It ran!"),
      (2L, ""),
      (3L, "Extraordinary!!! Yes?")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc1: W=5 S=2 Syl=5 → 39·5 div 2 + 1180·5 div 5 − 1559 = −282
    // doc2: empty → 0 + 0 − 1559
    // doc3: W=2 S=2; syllables e-ao-i-a-y|e (extraordinary → e,ao,i,a,y
    //   = 5 groups; yes → e... 'y' leads: "yes" = [ye]s → 1 group) = 6
    //   → 39·2 div 2 + 1180·6 div 2 − 1559 = 39 + 3540 − 1559 = 2020
    assert(got == Seq((1L, 5L, 2L, 5L, -282L), (2L, 0L, 0L, 0L, -1559L),
      (3L, 2L, 2L, 6L, 2020L)))
  }

  test("ewmaSmooth: hand-folded trajectory, gap carry, truncation, " +
       "key isolation") {
    // key A: days 0,1,3 (gap at 2) values 10,20,0 with alpha=500:
    //   s(0)=10000; s(1)=(500*20*1000+500*10000)/1000=15000;
    //   s(3)=(0+500*15000)/1000=7500 (gap carries state unchanged)
    // key B: impulse 1 then zeros with alpha=300: 1000, 700, 490,
    //   (300*0+700*490)/1000=343 — truncating division each step
    val a = Seq(("A", 0L, 10L), ("A", 1L, 20L), ("A", 3L, 0L))
      .toDF("k", "day", "n")
    val gotA = Behavior.ewmaSmooth(a, Seq("k"), "day", "n", 500L)
      .orderBy("day").as[(String, Long, Long)].collect().toSeq
    assert(gotA == Seq(("A", 0L, 10000L), ("A", 1L, 15000L),
      ("A", 3L, 7500L)))
    val b = Seq(("B", 0L, 1L), ("B", 1L, 0L), ("B", 2L, 0L),
      ("B", 3L, 0L), ("A", 0L, 5L))
      .toDF("k", "day", "n")
    val gotB = Behavior.ewmaSmooth(b, Seq("k"), "day", "n", 300L)
      .orderBy("k", "day").as[(String, Long, Long)].collect().toSeq
    assert(gotB == Seq(("A", 0L, 5000L), ("B", 0L, 1000L),
      ("B", 1L, 700L), ("B", 2L, 490L), ("B", 3L, 343L)))
  }

  test("cusumChangepoints: hand-folded up/down trajectories, causal " +
       "reference mean, spike-vs-shift behavior") {
    // A: level UP shift at day 3 (10,10,10 -> 20,20,20), refDays=3 so
    // mu=10000 milli; slack 1000: sp = 0,0,0 then 9000,18000,27000 —
    // threshold 12000 trips from day 4. sn stays 0 throughout.
    // B: DOWN shift (10,10,10 -> 2,2): sn = 7000,14000 — trips day 4.
    val daily = Seq(
      ("A", 0L, 10L), ("A", 1L, 10L), ("A", 2L, 10L),
      ("A", 3L, 20L), ("A", 4L, 20L), ("A", 5L, 20L),
      ("B", 0L, 10L), ("B", 1L, 10L), ("B", 2L, 10L),
      ("B", 3L, 2L), ("B", 4L, 2L)).toDF("k", "day", "n")
    val got = Behavior.cusumChangepoints(daily, Seq("k"), "day", "n",
        refDays = 3, slackMilli = 1000L, thresholdMilli = 12000L)
      .orderBy("k", "day")
      .select("k", "day", "mu_milli", "cusum_up_milli", "cusum_down_milli",
              "shift_up", "shift_down")
      .as[(String, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().toSeq
    assert(got == Seq(
      ("A", 0L, 10000L, 0L, 0L, false, false),
      ("A", 1L, 10000L, 0L, 0L, false, false),
      ("A", 2L, 10000L, 0L, 0L, false, false),
      ("A", 3L, 10000L, 9000L, 0L, false, false),
      ("A", 4L, 10000L, 18000L, 0L, true, false),
      ("A", 5L, 10000L, 27000L, 0L, true, false),
      ("B", 0L, 10000L, 0L, 0L, false, false),
      ("B", 1L, 10000L, 0L, 0L, false, false),
      ("B", 2L, 10000L, 0L, 0L, false, false),
      ("B", 3L, 10000L, 0L, 7000L, false, false),
      ("B", 4L, 10000L, 0L, 14000L, false, true)))
    // a single spike then recovery: integrates once, then drains —
    // never trips (the point-anomaly case belongs to anomaly_zscore)
    val spike = Seq(("S", 0L, 10L), ("S", 1L, 10L), ("S", 2L, 10L),
      ("S", 3L, 25L), ("S", 4L, 10L), ("S", 5L, 10L)).toDF("k", "day", "n")
    val sp = Behavior.cusumChangepoints(spike, Seq("k"), "day", "n",
        refDays = 3, slackMilli = 1000L, thresholdMilli = 15000L)
      .orderBy("day").select("cusum_up_milli", "shift_up")
      .as[(Long, Boolean)].collect().toSeq
    assert(sp.map(_._1) == Seq(0L, 0L, 0L, 14000L, 13000L, 12000L))
    assert(sp.forall(!_._2))
  }

  test("acfLags: alternating series reads period 2, missing days pair " +
       "by observed (d, d+h), constant series (den=0) drops out") {
    // A alternates 10,20 (period 2): c = 6x-90 = ∓30; den = 5400.
    //   lag1: 5 pairs of -900 -> -(4500000 div 5400) = -833
    //   lag2: 4 pairs of +900 ->   3600000 div 5400  =  666
    //   lag3: 3 pairs of -900 -> -(2700000 div 5400) = -500
    // B days 0,1,3 values 1,2,4: c = 3x-7 = -4,-1,5; den = 42.
    //   lag1 (0,1): 4 -> 95; lag2 (1,3): -5 -> -119; lag3 (0,3): -20 -> -476
    // C constant: all c = 0 -> den 0 -> no rows.
    val daily = (Seq.tabulate(6)(d =>
        ("A", d.toLong, if (d % 2 == 0) 10L else 20L)) ++
      Seq(("B", 0L, 1L), ("B", 1L, 2L), ("B", 3L, 4L),
          ("C", 0L, 5L), ("C", 1L, 5L), ("C", 2L, 5L)))
      .toDF("k", "day", "n")
    val got = Behavior.acfLags(daily, Seq("k"), "day", "n", maxLag = 3)
      .orderBy("k", "lag")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 1L, 5L, -833L), ("A", 2L, 4L, 666L), ("A", 3L, 3L, -500L),
      ("B", 1L, 1L, 95L), ("B", 2L, 1L, -119L), ("B", 3L, 1L, -476L)))
  }

  test("seasonalityDow: exact cross-ratio index, flat week reads 1000") {
    // 14 days; days 0 and 7 (dow 0) carry 2, every other day 1:
    // dow0 index = 4*14*1000 div (16*2) = 1750; others = 875
    val daily = (0L until 14L)
      .map(d => ("A", d, if (d % 7 == 0) 2L else 1L))
      .toDF("k", "day", "n")
    val got = Behavior.seasonalityDow(daily, Seq("k"), "day", "n")
      .orderBy("dow")
      .select("dow", "dow_days", "dow_total", "index_permille")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.head == ((0L, 2L, 4L, 1750L)))
    assert(got.tail.forall(r => r._2 == 2L && r._3 == 2L && r._4 == 875L))
    // flat series -> every weekday indexes exactly 1000
    val flat = (0L until 21L).map(d => ("B", d, 5L)).toDF("k", "day", "n")
    val f = Behavior.seasonalityDow(flat, Seq("k"), "day", "n")
      .select("index_permille").as[Long].collect().toSeq
    assert(f.size == 7 && f.forall(_ == 1000L))
  }

  test("aucScore: hand-computed tie-corrected U, perfect and inverted " +
       "separation, degenerate single-class reads null") {
    // pos@300, pos@200; neg@100 x2, neg@300: U = 4.5 of 6 -> 750
    val d = Seq((300L, true), (200L, true), (100L, false), (100L, false),
      (300L, false)).toDF("score", "label")
    val got = Behavior.aucScore(d, "score", "label")
      .as[(Long, Long, Option[Long])].head()
    assert(got == ((2L, 3L, Some(750L))))
    val perfect = Seq((900L, true), (901L, true), (100L, false))
      .toDF("score", "label")
    assert(Behavior.aucScore(perfect, "score", "label")
      .as[(Long, Long, Option[Long])].head() == ((2L, 1L, Some(1000L))))
    val inverted = Seq((100L, true), (900L, false)).toDF("score", "label")
    assert(Behavior.aucScore(inverted, "score", "label")
      .as[(Long, Long, Option[Long])].head() == ((1L, 1L, Some(0L))))
    val oneClass = Seq((100L, true), (200L, true)).toDF("score", "label")
    assert(Behavior.aucScore(oneClass, "score", "label")
      .as[(Long, Long, Option[Long])].head() == ((2L, 0L, None)))
  }

  test("ksDrift: hand-computed supremum, lowest-score tie rule, " +
       "identical distributions read 0, one-sided reads null") {
    // base {100, 300}, cur {300}: D = |1/2 - 0/1| = 1/2 at s=100
    val d = Seq((100L, true), (300L, true), (300L, false))
      .toDF("score", "base")
    assert(Behavior.ksDrift(d, "score", "base")
      .as[(Long, Long, Option[Long], Option[Long])].head() ==
      ((2L, 1L, Some(500000L), Some(100L))))
    // identical distributions: every CDF step ties at diff 0 -> the
    // lowest observed score is the argmax by the explicit tie rule
    val same = Seq((100L, true), (200L, true), (100L, false),
      (200L, false)).toDF("score", "base")
    assert(Behavior.ksDrift(same, "score", "base")
      .as[(Long, Long, Option[Long], Option[Long])].head() ==
      ((2L, 2L, Some(0L), Some(100L))))
    // disjoint supports: full separation, D = 1
    val apart = Seq((100L, true), (200L, false)).toDF("score", "base")
    assert(Behavior.ksDrift(apart, "score", "base")
      .as[(Long, Long, Option[Long], Option[Long])].head() ==
      ((1L, 1L, Some(1000000L), Some(100L))))
    val oneSided = Seq((100L, true), (200L, true)).toDF("score", "base")
    assert(Behavior.ksDrift(oneSided, "score", "base")
      .as[(Long, Long, Option[Long], Option[Long])].head() ==
      ((2L, 0L, None, None)))
  }

  test("liftCurve: hand-computed descending deciles, duplicates stay " +
       "whole, cumulative gain/lift, zero-positive reads null") {
    // desc: 900 x2 (2 pos) -> bin 0; 500, 100 (1 pos) -> bin 1
    val d = Seq((900L, true), (900L, true), (500L, false), (100L, true))
      .toDF("score", "label")
    val got = Behavior.liftCurve(d, "score", "label", nBins = 2)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 2L, 2L, Some(666L), Some(1333L)),
      (1L, 2L, 1L, 4L, 3L, Some(1000L), Some(1000L))))
    // a heavy duplicate score owns its bin outright (never splits)
    val dup = Seq((700L, true), (700L, false), (700L, true),
      (600L, false)).toDF("score", "label")
    val bins = Behavior.liftCurve(dup, "score", "label", nBins = 2)
      .orderBy("bin").as[(Long, Long, Long, Long, Long, Option[Long],
        Option[Long])].collect().toSeq
    assert(bins == Seq(
      (0L, 3L, 2L, 3L, 2L, Some(1000L), Some(1333L)),
      (1L, 1L, 0L, 4L, 2L, Some(1000L), Some(1000L))))
    // zero positives: gain/lift unread, counts still real
    val noPos = Seq((900L, false), (100L, false)).toDF("score", "label")
    val np = Behavior.liftCurve(noPos, "score", "label", nBins = 2)
      .orderBy("bin").as[(Long, Long, Long, Long, Long, Option[Long],
        Option[Long])].collect().toSeq
    assert(np == Seq(
      (0L, 1L, 0L, 1L, 0L, None, None),
      (1L, 1L, 0L, 2L, 0L, None, None)))
  }

  test("sequentialPatterns: first<last collapse, distinct-user " +
       "support, equal timestamps never order, support prune") {
    // u1: A@1 B@2 A@5 -> both A-then-B and B-then-A exist
    // u2: B@5 A@10 -> only B-then-A; u3: A only; u4: A@3 B@3 (tie)
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 5L, "A"),
      (2L, 10L, "A"), (2L, 5L, "B"), (3L, 7L, "A"),
      (4L, 3L, "A"), (4L, 3L, "B"))
      .toDF("user_id", "ts_us", "event_type")
    val got = Behavior.sequentialPatterns(ev, "user_id", "ts_us",
        "event_type", minSupport = 1L)
      .orderBy("first_type", "then_type")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("A", "B", 1L, 250L), ("B", "A", 2L, 500L)))
    assert(Behavior.sequentialPatterns(ev, "user_id", "ts_us",
        "event_type", minSupport = 2L)
      .as[(String, String, Long, Long)].collect().toSeq ==
      Seq(("B", "A", 2L, 500L)))
  }

  test("basketRules: hand-computed support/confidence/lift, duplicate " +
       "item rows collapse, support prune, degenerate-basket cap") {
    // b1 {A,B,C} (A twice -> distinct), b2 {A,B}, b3 {A,C}, b4 {B}
    val items = Seq((1L, "A"), (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"), (3L, "A"), (3L, "C"), (4L, "B"))
      .toDF("basket", "item")
    val got = Behavior.basketRules(items, "basket", "item",
        minSupport = 2L, maxBasketSize = 30L)
      .orderBy("antecedent", "consequent")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // nb=4; n(A)=3 n(B)=3 n(C)=2; AB support 2, AC support 2, BC 1
    assert(got == Seq(
      ("A", "B", 2L, 3L, 3L, 666L, 888888L),
      ("A", "C", 2L, 3L, 2L, 666L, 1333333L),
      ("B", "A", 2L, 3L, 3L, 666L, 888888L),
      ("C", "A", 2L, 2L, 3L, 1000L, 1333333L)))
    // a basket over the cap is dropped wholesale: adding a 5-item
    // basket under cap 4 changes nothing
    val withGiant = items.unionAll(Seq((5L, "A"), (5L, "B"), (5L, "C"),
      (5L, "D"), (5L, "E")).toDF("basket", "item"))
    val capped = Behavior.basketRules(withGiant, "basket", "item",
        minSupport = 2L, maxBasketSize = 4L)
      .orderBy("antecedent", "consequent")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(capped == got)
  }

  test("corrMatrix: perfect / inverted / half correlation in quantized " +
       "corr-squared, zero-variance pairs read null") {
    val d = Seq((1L, 1L, -1L, 5L), (2L, 2L, -2L, 5L), (3L, 3L, -3L, 5L))
      .toDF("x", "y", "z", "w")
    val got = Behavior.corrMatrix(d, Seq("x", "y", "z", "w"))
      .orderBy("col_a", "col_b")
      .as[(String, String, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      ("x", "w", 3L, None, None),
      ("x", "y", 3L, Some(1L), Some(10000L)),
      ("x", "z", 3L, Some(-1L), Some(10000L)),
      ("y", "w", 3L, None, None),
      ("y", "z", 3L, Some(-1L), Some(10000L)),
      ("z", "w", 3L, None, None)))
    // x=(1,2,3), u=(1,3,2): Sxy=3, Sxx=Syy=6 -> corr=0.5, corr2=2500
    val half = Seq((1L, 1L), (2L, 3L), (3L, 2L)).toDF("x", "u")
    val h = Behavior.corrMatrix(half, Seq("x", "u"))
      .as[(String, String, Long, Option[Long], Option[Long])].head()
    assert(h == (("x", "u", 3L, Some(1L), Some(2500L))))
  }

  test("attributionCredits: u-shape and linear hand cases, conversions " +
       "sum to exactly 1000, ties break by id, trailing touches drop") {
    val e = Seq(
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "click"), (1L, 3L, 3L, "view"),
      (1L, 4L, 4L, "purchase"), (1L, 5L, 5L, "view"),
      (1L, 6L, 6L, "purchase"), (1L, 7L, 7L, "view"),   // trailing: drops
      (2L, 10L, 11L, "view"), (2L, 10L, 12L, "purchase"), // tie: id order
      (3L, 20L, 22L, "view"), (3L, 20L, 21L, "purchase")) // conv first: drop
      .toDF("user_id", "ts_us", "event_id", "event_type")
    def run(model: String) =
      Behavior.attributionCredits(e, "user_id", "ts_us", "event_id",
          "event_type", "purchase", Seq("view", "click"), model)
        .orderBy("user", "conv_id", "position")
        .select("user", "conv_id", "touch_id", "position", "n_touches",
          "credit_permille")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(run("u_shape") == Seq(
      (1L, 4L, 1L, 1L, 3L, 400L), (1L, 4L, 2L, 2L, 3L, 200L),
      (1L, 4L, 3L, 3L, 3L, 400L), (1L, 6L, 5L, 1L, 1L, 1000L),
      (2L, 12L, 11L, 1L, 1L, 1000L)))
    assert(run("linear") == Seq(
      (1L, 4L, 1L, 1L, 3L, 333L), (1L, 4L, 2L, 2L, 3L, 333L),
      (1L, 4L, 3L, 3L, 3L, 334L), (1L, 6L, 5L, 1L, 1L, 1000L),
      (2L, 12L, 11L, 1L, 1L, 1000L)))
    // exact-sum invariant at an awkward n (5 touches: 400,66,66,68,400)
    val five = (1 to 5).map(i => (9L, i.toLong, i.toLong, "view"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .unionByName(Seq((9L, 9L, 9L, "purchase"))
        .toDF("user_id", "ts_us", "event_id", "event_type"))
    val creds = Behavior.attributionCredits(five, "user_id", "ts_us",
        "event_id", "event_type", "purchase", Seq("view"), "u_shape")
      .orderBy("position").select("credit_permille")
      .as[Long].collect().toSeq
    assert(creds == Seq(400L, 66L, 66L, 68L, 400L))
    assert(creds.sum == 1000L)
  }

  test("calibrationBins: equi-depth assignment, permille arithmetic, " +
       "duplicate scores stay whole in one bin") {
    // scores/labels: 100×3 (1 pos), 200×1 (0), 300×2 (2), 400×2 (1)
    // total 8, nBins=2: cum0 = 0,3,4,6 -> bins 0,0,1,1
    // bin0: n=4 mean=(300+200)/4=125 obs=250 gap=125
    // bin1: n=4 mean=(600+800)/4=350 obs=750 gap=400
    val d = (Seq.fill(3)((100L, false)).updated(0, (100L, true)) ++
      Seq((200L, false)) ++ Seq.fill(2)((300L, true)) ++
      Seq((400L, true), (400L, false))).toDF("score", "label")
    val got = Behavior.calibrationBins(d, "score", "label", nBins = 2)
      .orderBy("bin").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 4L, 125L, 250L, 125L),
                      (1L, 4L, 350L, 750L, 400L)))
    // a heavy score spanning the depth boundary stays whole
    val heavy = (Seq.fill(5)((500L, true)) ++ Seq((600L, false)))
      .toDF("score", "label")
    val hb = Behavior.calibrationBins(heavy, "score", "label", nBins = 2)
      .orderBy("bin").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(hb == Seq((0L, 5L, 500L, 1000L, 500L),
                     (1L, 1L, 600L, 0L, -600L)))
  }

  test("targetEncode: rare category shrinks toward the global prior, " +
       "big category barely moves") {
    // global: n=4, sum=16000 -> prior 4000; m=2
    // A (n=3, sum=6000): enc = (6000 + 8000) div 5 = 2800
    // B (n=1, sum=10000): enc = (10000 + 8000) div 3 = 6000 (raw 10000
    //   pulled hard toward 4000; A's raw 2000 moved to 2800)
    val df = Seq(("A", 1000L), ("A", 2000L), ("A", 3000L), ("B", 10000L))
      .toDF("cat", "y")
    val got = Behavior.targetEncode(df, "cat", "y", pseudoCount = 2L)
      .orderBy("category")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", 3L, 4000L, 2800L), ("B", 1L, 4000L, 6000L)))
    // m = 0 degenerates to the raw category mean
    val raw = Behavior.targetEncode(df, "cat", "y", pseudoCount = 0L)
      .orderBy("category").as[(String, Long, Long, Long)].collect().toSeq
    assert(raw.map(_._4) == Seq(2000L, 10000L))
  }

  test("forecastBaseline: seasonal-naive residuals, signed bias, " +
       "missing prior days score nothing") {
    val daily = (Seq.tabulate(10)(d => ("K", d.toLong, 10L + d)) ++
      Seq(("L", 0L, 20L), ("L", 7L, 5L), ("L", 20L, 9L)))
      .toDF("k", "day", "n")
    val got = Behavior.forecastBaseline(daily, Seq("k"), "day", "n",
        period = 7L)
      .orderBy("k").as[(String, Long, Long, Long)].collect().toSeq
    // K: days 7,8,9 score vs 0,1,2 -> residual +7 each
    // L: only day 7 has a prior (day 0) -> residual -15; day 20 has none
    assert(got == Seq(("K", 3L, 7000L, 7000L),
                      ("L", 1L, 15000L, -15000L)))
  }

  test("cupedAdjust: hand-computed theta and adjusted means, covariate " +
       "imbalance removed, zero-variance pool is empty by contract") {
    // A: (x,y) = (1,11),(2,12),(3,13); B: (3,23),(4,24),(5,25)
    // pooled n=6 sx=18 sy=108: sxx=60, syy=1320, sxy=240
    // theta = 2400000 div 60 = 40000; rho2 = (24000 div 60)*(24000 div 1320)
    //       = 400*18 = 7200
    // A: mean=12000; n*sxv-nv*sx = 36-54 = -18 -> adj 12000+4000 = 16000
    // B: mean=24000; +18 -> adj 24000-4000 = 20000
    val units = Seq((0L, 1L, 11L), (0L, 2L, 12L), (0L, 3L, 13L),
                    (1L, 3L, 23L), (1L, 4L, 24L), (1L, 5L, 25L))
      .toDF("variant", "x", "y")
    val got = Behavior.cupedAdjust(units, "variant", "x", "y")
      .orderBy("variant")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 12000L, 16000L, 40000L, 7200L),
                      (1L, 3L, 24000L, 20000L, 40000L, 7200L)))
    // adjustment moved the arm means toward each other but kept the
    // pooled total: 16000+20000 == 12000+24000
    assert(got.map(_._4).sum == got.map(_._3).sum)
    // constant covariate -> sxx = 0 -> empty result
    val flat = Seq((0L, 5L, 1L), (1L, 5L, 9L)).toDF("variant", "x", "y")
    assert(Behavior.cupedAdjust(flat, "variant", "x", "y").count() == 0L)
  }

  test("abTest: exact squared-boundary decision, micro rates, " +
       "single-arm strata dropped") {
    // n_a=n_b=10, c_a=8, c_b=2: d=60, N=20, C=10 ->
    // d^2*N*1e4 = 7.2e8 and C(N-C)*n_a*n_b = 1e4, so the boundary
    // z^2 permyriad is EXACTLY 72000: strict > must not fire there
    // and must fire one permyriad below
    val rows = (0 until 10).map(i => ("x", 0L, i < 8)) ++
      (0 until 10).map(i => ("x", 1L, i < 2)) ++
      Seq(("solo", 0L, true)) // one-arm stratum: no test exists
    val df = rows.toDF("stratum", "variant", "ok")
    val at = Behavior.abTest(df, "stratum", "variant", "ok", 72000L)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(at == Seq(("x", 10L, 8L, 10L, 2L, 800000L, 200000L, false)))
    val below = Behavior.abTest(df, "stratum", "variant", "ok", 71999L)
      .select("significant").as[Boolean].head()
    assert(below)
  }

  test("srmCheck: exact chi-square boundary on both sides") {
    // n_a=64, n_b=36: delta=28, N=100 -> delta^2*1e4 = 7.84e6,
    // boundary chi2 permyriad = 7.84e6/100 = 78400 exactly
    val rows = (0 until 64).map(_ => ("x", 0L)) ++
      (0 until 36).map(_ => ("x", 1L))
    val df = rows.toDF("s", "variant")
    val at = Behavior.srmCheck(df, "s", "variant", 78400L)
      .as[(String, Long, Long, Long, Boolean)].head()
    assert(at == (("x", 64L, 36L, 28L, false)))
    val below = Behavior.srmCheck(df, "s", "variant", 78399L)
      .select("srm").as[Boolean].head()
    assert(below)
  }

  test("classificationReport: hand-computed confusion incl. a " +
       "never-predicted class, a predicted-only class, and the macro row") {
    val d = Seq(("A", "A"), ("A", "B"), ("B", "B"), ("B", "B"),
      ("B", "A"), ("C", "D")).toDF("truth", "pred")
    val got = Behavior.classificationReport(d, "truth", "pred")
      .orderBy("cls")
      .as[(String, Long, Long, Long, Long, Long,
           Option[Long], Option[Long], Long)].collect().toSeq
    assert(got == Seq(
      // cls, support, tp, pred_n, fp, fn, prec, rec, f1
      ("A", 2L, 1L, 2L, 1L, 1L, Some(500L), Some(500L), 500L),
      ("B", 3L, 2L, 3L, 1L, 1L, Some(666L), Some(666L), 666L),
      ("C", 1L, 0L, 0L, 0L, 1L, None, Some(0L), 0L),
      ("D", 0L, 0L, 1L, 1L, 0L, Some(0L), None, 0L),
      // macro: sums + unweighted means over 4 classes (absent -> 0)
      ("__macro__", 6L, 3L, 6L, 3L, 3L, Some(291L), Some(291L), 291L)))
  }

  test("cohensKappa: hand-computed chance correction, negative kappa, " +
       "degenerate concentrated marginals read null") {
    // s1: N=5 agree=4, P = 4*3 + 1*2 = 14 -> 1000*(20-14)/(25-14) = 545
    // s2: perfect systematic disagreement -> kappa = -1000
    // s3: both raters constant -> N^2 = P -> null, agreement 1000
    val d = Seq(
      ("s1", "A", "A"), ("s1", "A", "A"), ("s1", "A", "A"),
      ("s1", "B", "B"), ("s1", "A", "B"),
      ("s2", "A", "B"), ("s2", "B", "A"),
      ("s3", "A", "A"), ("s3", "A", "A"))
      .toDF("stratum", "ra", "rb")
    val got = Behavior.cohensKappa(d, "stratum", "ra", "rb")
      .orderBy("stratum")
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(("s1", 5L, 800L, Some(545L)),
      ("s2", 2L, 0L, Some(-1000L)), ("s3", 2L, 1000L, None)))
  }

  test("featureMi: perfect dependence reads H(label), independence " +
       "reads zero, entropies in micro-nats") {
    // ln 2 = 0.6931472 -> 693147 micro-nats
    val dep = Seq(("x1", "y1"), ("x1", "y1"), ("x2", "y2"), ("x2", "y2"))
      .toDF("f", "l")
    val gotDep = Behavior.featureMi(dep, "f", "l")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(gotDep == ((4L, 2L, 693147L, 693147L, 693147L)))
    val ind = Seq(("x1", "y1"), ("x1", "y2"), ("x2", "y1"), ("x2", "y2"))
      .toDF("f", "l")
    val gotInd = Behavior.featureMi(ind, "f", "l")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(gotInd == ((4L, 4L, 0L, 693147L, 693147L)))
  }

  test("survivalCurve: hand-computed KM steps — censoring shrinks the " +
       "risk set without a step, same-time censor is at risk, " +
       "everyone-dies step reads ln null / surv 0") {
    // n=5: event@1, censor@2, event@3 + censor@3, event@5
    val d = Seq(("a", 1L, true), ("a", 2L, false), ("a", 3L, true),
      ("a", 3L, false), ("a", 5L, true))
      .toDF("cohort", "dur", "ev")
    val got = Behavior.survivalCurve(d, "cohort", "dur", "ev")
      .orderBy("t")
      .as[(String, Long, Long, Long, Long, Option[Long], Long)]
      .collect().toSeq
    // ln(4/5) -> -223144; ln(2/3) -> -405465; exp back: 800, 533
    assert(got == Seq(
      ("a", 1L, 5L, 1L, 0L, Some(-223144L), 800L),
      ("a", 3L, 3L, 1L, 1L, Some(-628609L), 533L),
      ("a", 5L, 1L, 1L, 0L, None, 0L)))
    // all-censored stratum emits no steps
    val cen = Seq(("b", 4L, false), ("b", 7L, false))
      .toDF("cohort", "dur", "ev")
    assert(Behavior.survivalCurve(cen, "cohort", "dur", "ev")
      .count() == 0L)
  }

  test("rankingEval: hand-computed nDCG/MRR/precision@k, zero-gain " +
       "query nulls, beyond-k rows ignored") {
    // q1 top-3: gains 0,2,1 -> dcg = 2*630930 + 500000 = 1761860,
    // ideal [2,1] -> idcg = 2630930, ndcg = 669; rr = 10^6/2
    val d = Seq(("q1", 1L, 0L), ("q1", 2L, 2L), ("q1", 3L, 1L),
      ("q1", 4L, 5L), // beyond k: must not affect anything
      ("q2", 1L, 0L)).toDF("query", "rank", "gain")
    val got = Behavior.rankingEval(d, "query", "rank", "gain", k = 3)
      .orderBy("query")
      .as[(String, Long, Long, Long, Option[Long], Option[Long], Long)]
      .collect().toSeq
    assert(got == Seq(
      ("q1", 3L, 1761860L, 2630930L, Some(669L), Some(500000L), 666L),
      ("q2", 1L, 0L, 0L, None, None, 0L)))
  }

  test("holtSmooth: hand-computed level/trend recurrence on a ramp, " +
       "negative trend on a decline (sign-explicit truncation)") {
    // ramp 10,20,30 at alpha=beta=500
    val ramp = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 30L))
      .toDF("key", "day", "x")
    val got = Behavior.holtSmooth(ramp, Seq("key"), "day", "x",
        alphaPermille = 500L, betaPermille = 500L)
      .orderBy("day").as[(String, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(("k", 1L, 10000L, 0L, 10000L),
      ("k", 2L, 15000L, 2500L, 17500L),
      ("k", 3L, 23750L, 5625L, 29375L)))
    // decline 30,10: trend goes negative
    val dec = Seq(("k", 1L, 30L), ("k", 2L, 10L)).toDF("key", "day", "x")
    val gd = Behavior.holtSmooth(dec, Seq("key"), "day", "x",
        alphaPermille = 500L, betaPermille = 500L)
      .orderBy("day").as[(String, Long, Long, Long, Long)]
      .collect().toSeq
    assert(gd == Seq(("k", 1L, 30000L, 0L, 30000L),
      ("k", 2L, 20000L, -5000L, 15000L)))
  }

  test("clusterEval: hand-computed B-cubed over a mixed partition; " +
       "the perfect partition reads 10^6 across the board") {
    // c1 = {A,A,B}, c2 = {B,B}: P = R = 3666665 div 5 = 733333
    val d = Seq(("c1", "A"), ("c1", "A"), ("c1", "B"),
      ("c2", "B"), ("c2", "B")).toDF("cluster", "truth")
    val got = Behavior.clusterEval(d, "cluster", "truth")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((5L, 733333L, 733333L, 733333L)))
    val perfect = Seq(("x", "A"), ("x", "A"), ("y", "B"))
      .toDF("cluster", "truth")
    assert(Behavior.clusterEval(perfect, "cluster", "truth")
      .as[(Long, Long, Long, Long)].head() ==
      ((3L, 1000000L, 1000000L, 1000000L)))
  }

  test("conversionLag: first-touch-to-first-conversion day quartiles; " +
       "touches after conversion and non-converters excluded") {
    val D = 86400000000L
    val ev = Seq(
      (1L, 0L, "view"), (1L, 2 * D, "purchase"),
      (2L, 1 * D, "view"), (2L, 1 * D, "click"), (2L, 5 * D, "purchase"),
      (3L, 3 * D, "view"), (3L, 2 * D, "purchase"), // view after conv
      (4L, 0L, "view")                              // never converts
    ).toDF("u", "ts", "t")
    val got = Behavior.conversionLag(ev, "u", "ts", "t", "purchase")
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // view lags [2, 4] -> q1 2, median 2, q3 4; click [4] -> 4/4/4
    assert(got == Seq(("click", 1L, 4L, 4L, 4L),
      ("view", 2L, 2L, 2L, 4L)))
  }

  test("bleuPairs: hand-computed clipping + brevity penalty; zero " +
       "unigram precision and a no-bigram candidate read BLEU 0") {
    val d = Seq(
      (1L, "a b c", "a b c d"), // perfect precisions, BP = exp(-1/3)
      (2L, "a a b", "a b"),     // clipped: p1 = 2/3, p2 = 1/2, BP = 1
      (3L, "x y", "a b"),       // clip1 = 0
      (4L, "a", "a b")          // no bigrams
    ).toDF("id", "cand", "ref")
    val got = TextAnalysis.bleuPairs(d, "id", "cand", "ref")
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long],
           Option[Long], Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 4L, 3L, 2L, Some(0L), Some(0L), Some(-333333L), 717L),
      (2L, 3L, 2L, 2L, 1L, Some(-405465L), Some(-693147L),
        Some(-549306L), 577L),
      (3L, 2L, 2L, 0L, 0L, None, None, None, 0L),
      (4L, 1L, 2L, 1L, 0L, Some(0L), None, None, 0L)))
  }

  test("personalizedPagerank: hand-computed seeded walk on a 3-cycle " +
       "— teleport mass returns only to the seed; empty seeds reject") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    // r1: 1=150000, 2=850000, 3=0; r2: 1=150000, 2=127500, 3=722500
    val got = Graph.personalizedPagerank(edges, "src", "dst",
        seeds, "id", iterations = 2)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 150000L), (2L, 127500L), (3L, 722500L)))
    intercept[IllegalArgumentException] {
      Graph.personalizedPagerank(edges, "src", "dst",
        Seq.empty[Tuple1[Long]].toDF("id"), "id", iterations = 1)
    }
  }

  test("labelPropagation: two triangles + a bridge resolve to two " +
       "communities in 3 synchronous rounds (lowest-label ties)") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.labelPropagation(edges, "src", "dst", rounds = 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // hand-unrolled: r1 = (2,1,1,3,4,4), r2 = (1,1,1,4,3,3),
    // r3 = (1,1,1,3,3,3)
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 3L), (5L, 3L), (6L, 3L)))
    // round 1 alone reproduces the hand-computed first sweep
    assert(Graph.labelPropagation(edges, "src", "dst", rounds = 1)
      .orderBy("id").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 2L), (2L, 1L), (3L, 1L), (4L, 3L), (5L, 4L), (6L, 4L)))
  }

  test("isotonicCalibrate: PAV merges the violating block pair, " +
       "monotone input passes through, raw rates ride along") {
    // 4 bins, n=5 each, rates .2 .6 .4 .8 -> PAV pools bins 1,2 to .5
    def mk(ps: Seq[Int]) = ps.zipWithIndex.flatMap { case (p, b) =>
      val s = Seq(100L, 350L, 600L, 900L)(b)
      Seq.fill(p)((s, true)) ++ Seq.fill(5 - p)((s, false))
    }.toDF("score", "label")
    val got = Behavior.isotonicCalibrate(mk(Seq(1, 3, 2, 4)),
        "score", "label", nBins = 4)
      .orderBy("bin").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 5L, 1L, 200L, 200L), (1L, 5L, 3L, 600L, 500L),
      (2L, 5L, 2L, 400L, 500L), (3L, 5L, 4L, 800L, 800L)))
    val mono = Behavior.isotonicCalibrate(mk(Seq(1, 2, 3, 4)),
        "score", "label", nBins = 4)
      .orderBy("bin").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(mono.map(_._5) == Seq(200L, 400L, 600L, 800L))
  }
}
