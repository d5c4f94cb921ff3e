package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Behavior, Graph, Relational, Similarity, TextAnalysis}

/** Hand-computed cases for the round-7 additions: the eval-family
  * completions (PR-AUC, Brier+ECE, McNemar), the non-parametric /
  * categorical test pair (Mann-Whitney, chi-square), the privacy
  * third rung (t-closeness), interval coalescing, HITS, item-item CF,
  * and ROUGE-N.
  */
class R7OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("prAuc: hand-computed step AP with a tied score level") {
    // descending: 900(+) → term 1e6·1·1/1; 800(−) no term;
    // 700(+,−) → 1e6·1·2 div 4; 600(+) → 1e6·1·3 div 5
    val d = Seq((900L, true), (800L, false), (700L, true),
      (700L, false), (600L, true)).toDF("score", "label")
    val got = Behavior.prAuc(d, "score", "label")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 2L, (1000000L + 500000L + 600000L) / 3)))
  }

  test("prAuc: zero positives reads null AP") {
    val d = Seq((10L, false), (20L, false)).toDF("score", "label")
    val r = Behavior.prAuc(d, "score", "label")
      .select("n_pos", "ap_micro").collect()(0)
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("brierEce: perfect predictions → brier 0; crossed → 1e6 each") {
    val good = Seq((1000L, true), (0L, false)).toDF("score", "label")
    val g = Behavior.brierEce(good, "score", "label", nBins = 1)
      .as[(Long, Long, Long)].collect()(0)
    assert(g == ((2L, 0L, 0L)))
    // crossed: each row squared error (1000)² = 1e6 micro; with 2
    // bins each holds one row, |gap| = 1000 both → ece 1e6
    val bad = Seq((1000L, false), (0L, true)).toDF("score", "label")
    val b = Behavior.brierEce(bad, "score", "label", nBins = 2)
      .as[(Long, Long, Long)].collect()(0)
    assert(b == ((2L, 1000000L, 1000000L)))
  }

  test("mcnemarCheck: discordant-pair counts and the milli statistic") {
    // 10 both right, 6 only-B-wrong, 2 only-A-wrong, 1 both wrong →
    // chi2 = 1000·(|6−2|−1)² div 8 = 1125, not significant
    val rows =
      Seq.fill(10)((true, true, true)) ++
      Seq.fill(6)((true, true, false)) ++
      Seq.fill(2)((true, false, true)) ++
      Seq.fill(1)((true, false, false))
    val d = rows.toDF("label", "pred_a", "pred_b")
    val r = Behavior.mcnemarCheck(d, "label", "pred_a", "pred_b")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()(0)
    assert(r == ((19L, 10L, 6L, 2L, 1L, 1125L, false)))
  }

  test("mcnemarCheck: never-disagreeing models read null/insignificant") {
    val d = Seq((true, true, true), (false, true, true))
      .toDF("label", "pred_a", "pred_b")
    val r = Behavior.mcnemarCheck(d, "label", "pred_a", "pred_b")
      .select("chi2_milli", "significant").collect()(0)
    assert(r.isNullAt(0) && !r.getBoolean(1))
  }

  test("mannWhitney: A={1,2} vs B={2,3} — exact 2U, tie term, z²") {
    // 2U = 1 (the 2-2 tie counts half, doubled); T = 2³−2 = 6;
    // z² = 3·(1−4)²·4·3 / (4·(5·4·3−6)) = 1.5 exactly
    val d = Seq((true, 1L), (true, 2L), (false, 2L), (false, 3L))
      .toDF("is_a", "value")
    val r = Behavior.mannWhitney(d, "is_a", "value")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()(0)
    assert(r == ((2L, 2L, 1L, 125L, 1500000L, false)))
  }

  test("mannWhitney: identical distributions → z² 0") {
    val d = Seq((true, 5L), (false, 5L), (true, 9L), (false, 9L))
      .toDF("is_a", "value")
    val r = Behavior.mannWhitney(d, "is_a", "value")
      .select("auc_permille", "z2_micro").as[(Long, Long)].collect()(0)
    // u2 = 2U = na·nb exactly when symmetric → auc 500, d = 0
    assert(r == ((500L, 0L)))
  }

  test("chiSquareIndep: independent table reads exactly 0") {
    val rows = Seq.fill(10)(("A", "X")) ++ Seq.fill(20)(("A", "Y")) ++
      Seq.fill(20)(("B", "X")) ++ Seq.fill(40)(("B", "Y"))
    val r = Behavior.chiSquareIndep(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect()(0)
    assert(r == ((90L, 2L, 2L, 1L, 0L)))
  }

  test("chiSquareIndep: diagonal 2×2 — absent cells contribute, χ²=N") {
    // cells (A,X):2 and (B,Y):3 only; perfect association in a 2×2
    // has χ² = N = 5; present terms 1.8+0.8, absent rows 1.2+1.2
    val rows = Seq.fill(2)(("A", "X")) ++ Seq.fill(3)(("B", "Y"))
    val r = Behavior.chiSquareIndep(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect()(0)
    assert(r == ((5L, 2L, 2L, 1L, 5000000L)))
  }

  test("tCloseness: hand-computed TVD incl. the absent-value mass") {
    // global: v1×3, v2×1 (N=4). g1={v1,v1}: dist {v1:1} vs
    // {.75,.25} → TVD .25; g2={v1,v2}: {.5,.5} → TVD .25
    val d = Seq(("g1", "v1"), ("g1", "v1"), ("g2", "v1"), ("g2", "v2"))
      .toDF("grp", "sv")
    val got = Relational.tCloseness(d, Seq("grp"), "sv", tPermille = 200L)
      .orderBy("grp").as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(("g1", 2L, 250L, true), ("g2", 2L, 250L, true)))
    val none = Relational.tCloseness(d, Seq("grp"), "sv", tPermille = 300L)
      .filter(col("breach")).count()
    assert(none == 0L)
  }

  test("mergeIntervals: overlap and touch merge, gaps split, dup rows") {
    // the duplicate (8,9) row exercises the tie-safety pre-agg: with
    // raw tied rows, two independent window sorts may disagree on
    // which tie carries the new-island flag (the sf0.1 oracle bug)
    val d = Seq((1L, 1L, 3L), (1L, 2L, 5L), (1L, 7L, 8L), (1L, 8L, 9L),
      (1L, 8L, 9L), (1L, 11L, 12L), (2L, 1L, 2L)).toDF("k", "s", "e")
    val got = Relational.mergeIntervals(d, Seq("k"), "s", "e")
      .orderBy("k", "island")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 1L, 5L, 2L), (1L, 2L, 7L, 9L, 3L),
      (1L, 3L, 11L, 12L, 1L), (2L, 1L, 1L, 2L, 1L)))
  }

  test("hitsScores: one round of the max-normalized integer HITS") {
    // o1→{p1,p2}, o2→p1: auth p1 = max → 1e6, p2 = 1e6 div 2;
    // hub o1 = max → 1e6, o2 = (1e6·1e6) div 1.5e6 = 666666
    val e = Seq((1L, 101L), (1L, 102L), (2L, 101L)).toDF("src", "dst")
    val got = Graph.hitsScores(e, "src", "dst", iterations = 1)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1000000L, 0L), (2L, 666666L, 0L),
      (101L, 0L, 1000000L), (102L, 0L, 500000L)))
  }

  test("hitsScores: more rounds keep scores in [0, 1e6] and ranked") {
    val e = Seq((1L, 101L), (1L, 102L), (2L, 101L), (3L, 101L))
      .toDF("src", "dst")
    val m = Graph.hitsScores(e, "src", "dst", iterations = 3)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3)))
      .toMap
    assert(m.values.forall(v => v._1 >= 0 && v._1 <= 1000000L &&
      v._2 >= 0 && v._2 <= 1000000L))
    // p101 (indeg 3) is the top authority; o1 (outdeg 2) the top hub
    assert(m(101L)._2 == 1000000L && m(1L)._1 == 1000000L)
    assert(m(101L)._2 > m(102L)._2)
  }

  test("itemCf: the basket cap drops hub users before ALL counting") {
    // u1 has 3 items > maxBasket=2 → dropped entirely; u2={i1,i2},
    // u3={i1} remain: n(i1)=2, n(i2)=1, co(i1,i2)=1
    val d = Seq((1L, 11L), (1L, 12L), (1L, 13L), (2L, 11L), (2L, 12L),
      (3L, 11L)).toDF("u", "it")
    val got = Graph.itemCf(d, "u", "it", maxBasket = 2, minCo = 1L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((11L, 12L, 1L, 2L, 1L, 500000L, 500L)))
    // minCo prunes the singleton pair
    assert(Graph.itemCf(d, "u", "it", maxBasket = 2, minCo = 2L)
      .count() == 0L)
  }

  test("spearmanCorr: perfect monotone and the tie-averaged case") {
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    assert(Behavior.spearmanCorr(mono, "x", "y")
      .as[(Long, Long, Long)].collect()(0) == ((3L, 1L, 10000L)))
    // x = [1,1,2] (doubled ranks 3,3,6), y = [5,7,9] (2,4,6):
    // Sxx=18, Syy=24, Sxy=18 → rho² = 324/432 = 0.75 exactly
    val tied = Seq((1L, 5L), (1L, 7L), (2L, 9L)).toDF("x", "y")
    assert(Behavior.spearmanCorr(tied, "x", "y")
      .as[(Long, Long, Long)].collect()(0) == ((3L, 1L, 7500L)))
  }

  test("spearmanCorr: constant column reads null") {
    val d = Seq((5L, 1L), (5L, 2L)).toDF("x", "y")
    val r = Behavior.spearmanCorr(d, "x", "y")
      .select("rho_sign", "rho2_permyriad").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("welchTtest: hand-computed moments, t², Welch dof") {
    // A={10,20}: se2 = var/n = 50/2 → 25e6 micro; B={10,30}: 100e6;
    // md = −5 → t² = 25e12/125e6 = 0.2; dof = 15625/10625 = 1.4706
    val d = Seq((true, 10L), (true, 20L), (false, 10L), (false, 30L))
      .toDF("is_a", "value")
    val r = Behavior.welchTtest(d, "is_a", "value")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()(0)
    assert(r == ((2L, 2L, -5000000L, 200000L, 1470L, false)))
  }

  test("welchTtest: zero variance or n<2 reads null") {
    val d = Seq((true, 5L), (true, 5L), (false, 5L), (false, 5L))
      .toDF("is_a", "value")
    val r = Behavior.welchTtest(d, "is_a", "value")
      .select("t2_micro").collect()(0)
    assert(r.isNullAt(0))
    val single = Seq((true, 5L), (false, 1L), (false, 9L))
      .toDF("is_a", "value")
    assert(Behavior.welchTtest(single, "is_a", "value")
      .select("t2_micro").collect()(0).isNullAt(0))
  }

  test("jsDivergence: identical → 0; disjoint → ln 2 micro-nats") {
    val same = Seq((1L, true), (2L, true), (1L, false), (2L, false))
      .toDF("v", "base")
    assert(Behavior.jsDivergence(same, "v", "base")
      .select("jsd_micro").as[Long].collect()(0) == 0L)
    val disj = Seq((1L, true), (2L, false)).toDF("v", "base")
    val r = Behavior.jsDivergence(disj, "v", "base")
      .as[(Long, Long, Long, Boolean)].collect()(0)
    assert(r == ((1L, 1L, 693147L, true)))
  }

  test("ipsEval: clipped propensities, matched mass, SNIPS") {
    // ctx 1: a×3 (r 2000 each), b×1 → pact=a, phat_a=750:
    // Σw·r = (1000·6000) div 750 = 8000 → ips = 2000;
    // Σw = (1e6 div 750)·3 = 3999 → snips = 8000000 div 3999 = 2000
    val ev = Seq((1L, "a", 2000L), (1L, "a", 2000L), (1L, "a", 2000L),
      (1L, "b", 1000L)).toDF("ctx", "act", "r_milli")
    val pol = Seq((1L, "a")).toDF("ctx", "pact")
    val r = Behavior.ipsEval(ev, "ctx", "act", "r_milli", pol,
      "ctx", "pact").as[(Long, Long, Long, Long)].collect()(0)
    assert(r == ((4L, 3L, 2000L, 2000L)))
  }

  test("ipsEval: negative rewards ride the sign-trunc rule") {
    val ev = Seq((1L, "a", -1500L), (1L, "a", -1500L))
      .toDF("ctx", "act", "r_milli")
    val pol = Seq((1L, "a")).toDF("ctx", "pact")
    val r = Behavior.ipsEval(ev, "ctx", "act", "r_milli", pol,
      "ctx", "pact").select("ips_milli").as[Long].collect()(0)
    assert(r == -1500L)
  }

  test("reachReport: path graph rings, coverage, harmonic mass") {
    // 1-2-3-4, seed {1}, maxHops=2: rings 0/1/2 reach 1/2/3 of 4
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.reachReport(e, "s", "d", seeds, "id", maxHops = 2)
      .orderBy("dist")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 1L, 250L, 0L),
      (1L, 1L, 2L, 500L, 1000000L), (2L, 1L, 3L, 750L, 1500000L)))
  }

  test("embeddingMixup: successor pairing, fixed λ, milli blend") {
    val d = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingMixup(d, "vec_id", "embedding")
      .orderBy("dim")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // λ(1) = (2654435761 % 899) + 51 = 714 + 51 = 765
    assert(got == Seq((1L, 2L, 765L, 0L, 765L), (1L, 2L, 765L, 1L, 235L)))
  }

  test("genDiversity: distinct-1/distinct-2 with a sub-2-token doc") {
    val d = Seq(("g", "a a b"), ("g", "a")).toDF("source", "text")
    val r = TextAnalysis.genDiversity(d, "source", "text")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect()(0)
    assert(r == (("g", 2L, 4L, 2L, 2L, 2L, 500L, 1000L)))
  }

  test("forecastEval: MAE, pinball asymmetry, coverage, width") {
    // actuals {10,20,30}, mid=20, band [15,25]: mae = 20/3 → 6;
    // p500 = 10000/3 → 3333; p900 = (100·10 + 900·10)/3 → 3333;
    // only 20 covered → 333‰; width 10
    val d = Seq(("g", 10L, 15L, 20L, 25L), ("g", 20L, 15L, 20L, 25L),
      ("g", 30L, 15L, 20L, 25L)).toDF("grp", "a", "lo", "mid", "hi")
    val r = Behavior.forecastEval(d, "grp", "a", "lo", "mid", "hi")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()(0)
    assert(r == (("g", 3L, 6L, 3333L, 3333L, 333L, 10L)))
  }

  test("jackknifeMeans: leave-one-out means, influence, variance row") {
    // A={2,4} (S=6), B={6}: loo_A = 6e6, loo_B = 3e6, overall 4e6;
    // mean_loo = 4.5e6 → jk_var = (1·2·(1.5e6)²) div 2 = 2.25e12
    val d = Seq(("A", 2L), ("A", 4L), ("B", 6L)).toDF("s", "v")
    val got = Behavior.jackknifeMeans(d, "s", "v").orderBy("stratum")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    assert(got == Seq(
      ("A", 2L, 6000000L, 2000000L, -1L),
      ("B", 1L, 3000000L, -1000000L, -1L),
      ("__jack__", 3L, -1L, -1L, 2250000000000L)))
  }

  test("trimmedMean: order-statistic tail removal incl. partial value") {
    // milli values {1000, 2000×2, 3000, 100000}, 20% trim → k=1:
    // kept {2000×2, 3000} → 7000/3 = 2333
    val d = Seq(("s", 1.0), ("s", 2.0), ("s", 2.0), ("s", 3.0),
      ("s", 100.0)).toDF("f", "p")
    val r = Relational.trimmedMean(d, "f", "p", trimPermille = 200L)
      .as[(String, Long, Long, Long)].collect()(0)
    assert(r == (("s", 5L, 1L, 2333L)))
  }

  test("CmSketch: single-key exactness, over-count bound, mergeability") {
    import graft.operators.CmSketch
    // only one distinct key → its counters hold exactly its count
    val solo = Seq(5L, 5L, 5L).toDF("k")
    val c1 = CmSketch.counters(solo, "k", w = 64)
    val q1 = Seq((5L, 3L)).toDF("k", "true_n")
    assert(CmSketch.estimate(c1, q1, "k", w = 64)
      .select("est_n").as[Long].collect()(0) == 3L)
    // est >= true for every queried key (the CM guarantee)
    val skew = (1 to 50).flatMap(i => Seq.fill(i % 7 + 1)(i.toLong))
      .toDF("k")
    val ctrs = CmSketch.counters(skew, "k", w = 16) // collisions forced
    val truth = skew.groupBy("k").agg(count(lit(1)).as("true_n"))
    val est = CmSketch.estimate(ctrs, truth, "k", w = 16)
    assert(est.filter(col("est_n") < col("true_n")).count() == 0L)
    // mergeability: counters(A ∪ B) == re-aggregated union of parts
    val a = Seq(1L, 2L).toDF("k"); val b = Seq(2L, 3L).toDF("k")
    val merged = CmSketch.counters(a, "k", w = 64)
      .unionByName(CmSketch.counters(b, "k", w = 64))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val direct = CmSketch.counters(a.unionByName(b), "k", w = 64)
    assert(merged.orderBy("row", "bucket")
        .as[(Int, Long, Long)].collect().toSeq ==
      direct.orderBy("row", "bucket")
        .as[(Int, Long, Long)].collect().toSeq)
  }

  test("edit-distance after exact dedup: dups collapse, signal survives") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, base), (2L, base), (3L, base + " appended"))
      .toDF("doc_id", "text")
    val reps = d.groupBy("text").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id", "text")
    val got = graft.operators.Dedup
      .editDistancePairs(reps, "doc_id", "text", q = 24, maxDist = 10)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().toSeq
    assert(got == Seq((1L, 3L, 9)))
  }

  test("rougeN: clipped recall/F1 for uni- and bigrams") {
    val d = Seq((1L, "a b c", "a b d"), (2L, "x", "x"))
      .toDF("id", "cand", "ref")
    val got = TextAnalysis.rougeN(d, "id", "cand", "ref")
      .orderBy("id")
      .select("id", "cand_len", "ref_len", "clip1", "clip2",
        "rouge1_recall_permille", "rouge1_f1_permille",
        "rouge2_recall_permille", "rouge2_f1_permille")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 2L, 1L, 666L, 666L, 500L, 500L),
      (2L, 1L, 1L, 1L, 0L, 1000L, 1000L, 0L, 0L)))
  }
}
