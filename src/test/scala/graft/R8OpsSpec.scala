package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Behavior, Graph, Relational, Retrieval, TextAnalysis}

/** Hand-computed cases for the round-8 stats wave: Kendall tau-b on
  * the quantized grid, Kruskal-Wallis, Cramér's V, one-way ANOVA F,
  * Brown-Forsythe Levene, and the group-fairness report.
  */
class R8OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kendallTau: hand-computed tau-b with ties on both axes") {
    // pairs (1,1) (2,2) (3,3) (3,1): S = +1+1+0+1-1 = 2;
    // t1 = 2 (x=3 twice), t2 = 2 (y=1 twice) → d1 = d2 = 10;
    // tau = 2/sqrt(5*5) = 0.4 → sign 1, tau² = 1600 permyriad
    val d = Seq((1L, 1L), (2L, 2L), (3L, 3L), (3L, 1L)).toDF("x", "y")
    val r = Behavior.kendallTau(d, "x", "y")
      .as[(Long, Option[Long], Option[Long])].collect()(0)
    assert(r == ((4L, Some(1L), Some(1600L))))
  }

  test("kendallTau: constant axis reads null") {
    val d = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    val r = Behavior.kendallTau(d, "x", "y")
      .as[(Long, Option[Long], Option[Long])].collect()(0)
    assert(r == ((3L, None, None)))
  }

  test("kruskalWallis: two clean groups, no ties") {
    // a={1,2} b={3,4}: R_a=3, R_b=7 → H = 12/20*(9/2+49/2) - 15 = 2.4
    val d = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("grp", "value")
    val r = Behavior.kruskalWallis(d, "grp", "value")
      .as[(Long, Long, Long, Option[Long])].collect()(0)
    assert(r == ((4L, 2L, 1L, Some(2400000L))))
  }

  test("kruskalWallis: all values tied reads null H") {
    val d = Seq(("a", 7L), ("b", 7L), ("b", 7L)).toDF("grp", "value")
    val r = Behavior.kruskalWallis(d, "grp", "value")
      .as[(Long, Long, Long, Option[Long])].collect()(0)
    assert(r._4.isEmpty && r._1 == 3L)
  }

  test("cramersV: perfect 2x2 association reads V² = 1") {
    val rows = Seq.fill(10)(("A", "X")) ++ Seq.fill(10)(("B", "Y"))
    val d = rows.toDF("a", "b")
    val r = Behavior.cramersV(d, "a", "b")
      .select("n", "chi2_micro", "v2_permyriad")
      .as[(Long, Long, Option[Long])].collect()(0)
    // chi² = n = 20 → 20e6 micro; V² = 20e6 div (100*20*1) = 10000
    assert(r == ((20L, 20000000L, Some(10000L))))
  }

  test("cramersV: independent 2x2 reads 0") {
    val rows = Seq.fill(5)(("A", "X")) ++ Seq.fill(5)(("A", "Y")) ++
      Seq.fill(5)(("B", "X")) ++ Seq.fill(5)(("B", "Y"))
    val r = Behavior.cramersV(rows.toDF("a", "b"), "a", "b")
      .select("chi2_micro", "v2_permyriad")
      .as[(Long, Option[Long])].collect()(0)
    assert(r == ((0L, Some(0L))))
  }

  test("anovaF: hand-computed F and eta²") {
    // a={1,1,3,3} b={5,5,7,7}: SSB=32, SSW=8 → F = 32/(8/6) = 24,
    // eta² = 32/40 = 0.8
    val d = (Seq(1L, 1L, 3L, 3L).map(("a", _)) ++
      Seq(5L, 5L, 7L, 7L).map(("b", _))).toDF("grp", "value")
    val r = Behavior.anovaF(d, "grp", "value")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect()(0)
    assert(r == ((8L, 2L, 1L, 6L, Some(24000L), Some(8000L))))
  }

  test("anovaF: zero within-variance reads null F") {
    val d = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L))
      .toDF("grp", "value")
    val r = Behavior.anovaF(d, "grp", "value")
      .select("f_milli", "eta2_permyriad")
      .as[(Option[Long], Option[Long])].collect()(0)
    assert(r._1.isEmpty && r._2 == Some(10000L))
  }

  test("leveneTest: exact group medians then F over deviations") {
    // a={1,2,3} med 2 → devs {1,0,1}; b={10,20,90} med 20 →
    // devs {10,0,70}; ANOVA on devs: ssb=1014e6, ssw=2867333334
    val d = (Seq(1L, 2L, 3L).map(("a", _)) ++
      Seq(10L, 20L, 90L).map(("b", _))).toDF("grp", "value")
    val r = Behavior.leveneTest(d, "grp", "value")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect()(0)
    assert(r == ((6L, 2L, 1L, 4L, Some(1414L), Some(2612L))))
  }

  test("fairnessReport: hand-computed parity gaps") {
    // g1: sr 250, tpr 500, fpr 0; g2: sr 1000, tpr 1000, fpr 1000
    val d = Seq(
      ("g1", true, true), ("g1", true, false),
      ("g1", false, false), ("g1", false, false),
      ("g2", true, true), ("g2", false, true))
      .toDF("grp", "label", "pred")
    val r = Behavior.fairnessReport(d, "grp", "label", "pred")
      .as[(Long, Long, Long, Long, Long)].collect()(0)
    assert(r == ((6L, 2L, 750L, 500L, 1000L)))
  }

  test("fairnessReport: single-class group drops out of that gap") {
    // g2 has no negatives → fpr null there; fpr gap comes from g1
    // alone (max-min over one group = 0)
    val d = Seq(
      ("g1", true, true), ("g1", false, true), ("g1", false, false),
      ("g2", true, true), ("g2", true, false))
      .toDF("grp", "label", "pred")
    val r = Behavior.fairnessReport(d, "grp", "label", "pred")
      .select("fpr_gap_permille").as[Option[Long]].collect()(0)
    assert(r == Some(0L))
  }

  test("clusteringCoeff: triangle plus pendant") {
    // K3 {1,2,3} + pendant 3-4: node 3 deg 3 → cc 333‰; node 4
    // deg 1 drops
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val got = Graph.clusteringCoeff(e, "s", "d")
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L, 1000L), (2L, 2L, 1L, 1000L),
      (3L, 3L, 1L, 333L)))
  }

  test("assortativity: path graph reads r = -1") {
    // 1-2-3: every edge joins deg 1 to deg 2 → perfectly
    // disassortative
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val r = Graph.assortativity(e, "s", "d")
      .as[(Long, Option[Long], Option[Long])].collect()(0)
    assert(r == ((4L, Some(-1L), Some(10000L))))
  }

  test("modularityScore: two disjoint triangles read Q = 0.5") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("s", "d")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("id", "community")
    val r = Graph.modularityScore(e, "s", "d", labels, "id", "community")
      .as[(Long, Long, Long)].collect()(0)
    assert(r == ((2L, 6L, 500000L)))
  }

  test("adamicAdar: single wedge scores round(1e6/ln 2)") {
    val e = Seq((1L, 3L), (2L, 3L)).toDF("s", "d")
    val got = Graph.adamicAdar(e, "s", "d")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L, 1442695L)))
  }

  test("adamicAdar: hub cap excludes high-degree centers") {
    // star center 5 with 4 leaves; maxDegree 3 silences it entirely
    val e = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("s", "d")
    assert(Graph.adamicAdar(e, "s", "d", maxDegree = 3).count() == 0L)
    assert(Graph.adamicAdar(e, "s", "d").count() == 6L)
  }

  test("crossCorr: y = 2x reads r² = 1 at every computable lag") {
    val d = Seq((1L, 1L, 2L), (2L, 2L, 4L), (3L, 3L, 6L), (4L, 4L, 8L))
      .toDF("day", "x", "y")
    val got = Behavior.crossCorr(d, "day", "x", "y", maxLag = 3)
      .orderBy("lag")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(got == Seq(
      (0L, 4L, Some(1L), Some(10000L)),
      (1L, 3L, Some(1L), Some(10000L)),
      (2L, 2L, Some(1L), Some(10000L)),
      (3L, 1L, None, None))) // single pair: zero variance → null
  }

  test("hwSeasonal: hand-computed two-step recurrence") {
    // t1: lvl 10000, tr 0, sea 0, fc 10000
    // t2: lvl (300*20000+700*10000)/1000 = 13000, tr 600, sea 2100,
    //     fc 13000+600+0 = 13600
    val d = Seq(("k", 1L, 10L), ("k", 2L, 20L)).toDF("key", "day", "x")
    val got = Behavior.hwSeasonal(d, Seq("key"), "day", "x")
      .orderBy("day")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("k", 1L, 10000L, 0L, 0L, 10000L),
      ("k", 2L, 13000L, 600L, 2100L, 13600L)))
  }

  test("seasonalDecompose: linear ramp has zero seasonal and residual") {
    val d = (1L to 7L).map(i => ("k", i, 7L * (i - 1))).toDF("key", "day", "x")
    val got = Behavior.seasonalDecompose(d, Seq("key"), "day", "x")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // only day 4 has the full 7-day window: trend = mean = 21000 milli
    assert(got == Seq(("k", 4L, 21L, 21000L, 0L, 0L)))
  }

  test("skyline2d: dominance with duplicates and per-x ties") {
    val d = Seq((1L, 5L), (1L, 3L), (2L, 10L), (2L, 10L), (3L, 7L))
      .toDF("price", "size")
    val got = Relational.skyline2d(d, "price", "size")
      .orderBy("x").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L, 1L), (2L, 10L, 2L)))
  }

  test("rocchioExpand: feedback terms exclude the query, tf*idf weights") {
    // query 'window': d2 (shorter) outranks d1 under BM25 length
    // normalization → feedback {d2} → the only candidate is 'banana'
    val docs = Seq((1L, "window apple apple"), (2L, "window banana"),
      (3L, "cherry cherry")).toDF("doc_id", "text")
    val got = Retrieval.rocchioExpand(docs, "doc_id", "text",
      Seq("window"), fbDocs = 1, expandK = 5)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val idfBanana = math.round(
      math.log(1.0 + (3.0 - 1 + 0.5) / (1 + 0.5)) * 1e6)
    assert(got == Seq(("banana", 1L, 1L, idfBanana, idfBanana)))
  }

  test("curriculumOrder: two bands interleave round-robin") {
    val d = (1L to 6L).map(i => (i, i - 1)).toDF("id", "s")
    val got = TextAnalysis.curriculumOrder(d, "id", "s", nBands = 2)
      .orderBy("curriculum_pos")
      .select("id").as[Long].collect().toSeq
    // scores 0,1,2 → band 0; 3,4,5 → band 1; positions alternate
    assert(got == Seq(1L, 4L, 2L, 5L, 3L, 6L))
  }

  test("curriculumOrder: plan has no window — rank comes from the zipWithIndex device") {
    val d = (1L to 100L).map(i => (i, i % 17)).toDF("id", "s")
    val plan = TextAnalysis.curriculumOrder(d, "id", "s", nBands = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("Window"),
      s"curriculumOrder reverted to the band-partitioned window:\n$plan")
  }

  test("curriculumOrder: device rank matches the window formulation") {
    // 1000 rows, ties in score (forces the id tiebreak), 5 bands —
    // the zipWithIndex device must reproduce row_number exactly
    val d = (1L to 1000L).map(i => (i, (i * 7) % 50)).toDF("id", "s")
    val got = TextAnalysis.curriculumOrder(d, "id", "s", nBands = 5)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val mx = d.agg(max("s").as("__mx"))
    val want = d.crossJoin(broadcast(mx))
      .withColumn("band", expr("least(4, (s * 5) div (__mx + 1))"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("band")).orderBy(col("s"), col("id"))))
      .select(col("id"), col("s").as("score"), col("band"),
        (expr("(__r - 1) * 5") + col("band")).as("curriculum_pos"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("kendallTau: cell guard fails fast on unquantized input") {
    val d = (1L to 100L).map(i => (i, i)).toDF("x", "y")
    val ex = intercept[Exception] {
      Behavior.kendallTau(d, "x", "y", maxCells = 50L).collect()
    }
    assert(ex.getMessage.contains("maxCells=50") &&
      ex.getMessage.contains("quantized"), ex.getMessage)
    // at the bound it still runs
    assert(Behavior.kendallTau(d, "x", "y", maxCells = 100L)
      .collect().length == 1)
  }

  test("skyline2d: distinct-x guard fails fast past the bound") {
    val d = (1L to 100L).map(i => (i, i)).toDF("x", "y")
    val ex = intercept[Exception] {
      Relational.skyline2d(d, "x", "y", maxDistinctX = 50L).collect()
    }
    assert(ex.getMessage.contains("maxDistinctX=50"), ex.getMessage)
    assert(Relational.skyline2d(d, "x", "y", maxDistinctX = 100L)
      .count() == 100L) // monotone ramp: every x sets a new frontier max
  }

  test("adamicAdar: degree-1 centers are filtered before the weight") {
    // pendant 4-3 makes node 4 a degree-1 center; ln(1)=0 must never
    // reach the quotient (the oracle materializes the same expression)
    val e = Seq((1L, 3L), (2L, 3L), (4L, 3L)).toDF("s", "d")
    val got = Graph.adamicAdar(e, "s", "d")
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // center 3 (deg 3) scores all three leaf pairs at 1e6/ln 3
    val w = math.round(1e6 / math.log(3.0))
    assert(got == Seq((1L, 2L, 1L, w), (1L, 4L, 1L, w), (2L, 4L, 1L, w)))
  }

  test("modularityScore: m derives from the labeled subgraph") {
    // labels cover only the first triangle; the unlabeled one must
    // not skew m — labeled subgraph is one community holding every
    // labeled edge → Q = e/m - (d/2m)² = 1 - 1 = 0
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("s", "d")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("id", "community")
    val r = Graph.modularityScore(e, "s", "d", labels, "id", "community")
      .as[(Long, Long, Long)].collect()(0)
    assert(r == ((1L, 3L, 0L)))
  }

  test("garbledText: consonant runs, symbol density, replacement chars") {
    val docs = Seq((1L, "hello world."), (2L, "zxqwrtplzz"),
      (3L, "a�b")).toDF("doc_id", "text")
    val got = TextAnalysis.garbledText(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 12L, 0L, 0L, 3L, false),   // max run 'rld'
      (2L, 10L, 0L, 0L, 10L, true),   // 10-consonant run
      (3L, 3L, 1L, 333L, 1L, true)))  // U+FFFD + symbol density
  }
}
