package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Plan-shape assertions (SURVEY.md §5): pushdown, pruning, broadcast
  * choices, and codegen coverage are part of the engine's contract —
  * a plan that scans every column or shuffles a dimension would still
  * pass value checks but die at 100 TB.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val sf = "/root/testdata/sf0.001"
  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filters and projections reach the parquet scan") {
    val t = Tables(spark, sf)
    val plan = formatted(
      t.lineitem.filter(col("l_quantity") > 10).select("l_orderkey", "l_quantity"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10.0)]"),
      s"pushdown missing:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"column pruning missing:\n$plan")
  }

  test("NO verified query plans a partition-less window (single-partition killer)") {
    // typed check on the physical plan — every WindowExec must have a
    // non-empty partition spec (global windows move everything to one
    // partition; all were eliminated in round 2)
    SparkEntry.queries.foreach { case (name, fn) =>
      // sparkPlan, not executedPlan: under AQE the executed plan is an
      // AdaptiveSparkPlanExec leaf and a typed collect sees nothing
      val plan = fn(spark, sf).queryExecution.sparkPlan
      val bad = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name plans a partition-less window:\n${bad.headOption.getOrElse("")}")
    }
  }

  test("item_info_view: dimensions broadcast, no dimension shuffle") {
    val plan = formatted(SparkEntry.queries("item_info_view")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // nation + region joins must be broadcast, not shuffled
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).size
    assert(broadcasts >= 2, s"expected >=2 broadcast dims, got $broadcasts\n$plan")
  }

  private def codegenPlan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("codegen"))
  private def scanCount(plan: String): Int =
    "\\(\\d+\\) Scan parquet".r.findAllIn(plan).size

  test("q1_agg is one scan + partial agg inside whole-stage codegen") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    val plan = formatted(df)
    assert(scanCount(plan) == 1, plan)
    // partial (map-side) + final aggregate around one exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(codegenPlan(df).contains("WholeStageCodegen"), "no codegen span")
  }

  test("dedup_minhash: equi-join on band buckets, never a cartesian product") {
    val plan = formatted(SparkEntry.queries("dedup_minhash")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("shared_spans: hash-equi self-join, never a cartesian product") {
    val plan = formatted(SparkEntry.queries("shared_spans")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("ann_bruteforce broadcasts the query side") {
    val plan = formatted(SparkEntry.queries("ann_bruteforce")(spark, sf))
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("upsert merge reads each side once (no plan explosion)") {
    val plan = formatted(SparkEntry.queries("upsert_latest_wins")(spark, sf))
    // base orders + update batch (open + closed branches) = 3 scans max
    assert(scanCount(plan) <= 3, plan)
  }

  test("native expressions stay inside whole-stage codegen") {
    val t = Tables(spark, sf)
    val df = t.documents.select(
      graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"),
      graft.operators.Dedup.simhash64(col("text")).as("sh"))
    val gen = codegenPlan(df)
    assert(gen.contains("WholeStageCodegen"), "no codegen span")
    // the native expressions compile to static calls INSIDE the
    // generated projection (not CodegenFallback)
    assert(gen.contains("graft.functions.HashSketches"), "sketches fell out of codegen")
  }

  test("repetition/normalize expressions stay inside whole-stage codegen") {
    val t = Tables(spark, sf)
    val df = t.documents.select(
      graft.functions.RepetitionStatsExpr(split(col("text"), " ")).as("rs"),
      graft.functions.NormalizeUnicodeExpr(col("text"), "NFC").as("nfc"))
    val gen = codegenPlan(df)
    assert(gen.contains("WholeStageCodegen"), "no codegen span")
    assert(gen.contains("graft.functions.TextStats"), "TextStats fell out of codegen")
  }

  test("perplexity_score: the LM joins broadcast, never sort-merge on the token stream") {
    val plan = formatted(SparkEntry.queries("perplexity_score")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"vocab-sized model must broadcast:\n$plan")
  }

  test("webhook parse path: exactly one from_json, zero Generate nodes") {
    // the OncePerRowExpr barrier must keep pinning a single parse —
    // if an optimizer change re-inlines it, from_json multiplies; if
    // someone reverts to the explode barrier, a Generate appears
    val plan = SparkEntry.queries("webhook_item_status")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("from_json".r.findAllIn(plan).size == 1, s"parse duplicated:\n$plan")
    assert(!plan.contains("Generate"), s"explode barrier reintroduced:\n$plan")
  }

  test("approx_top_tokens: sketch partials aggregate before the single-partition exchange") {
    val plan = formatted(SparkEntry.queries("approx_top_tokens")(spark, sf))
    // ObjectHashAggregate partial (map-side sketches) + final after a
    // 1-partition exchange of O(capacity) state — never a vocab groupBy
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("ANN top-k plans bounded heaps, never a per-query window sort") {
    // the scored n·|queries| frame must flow into GroupedTopKAgg
    // partials (ObjectHashAggregate), not a WindowExec sort-shuffle
    Seq("ann_bruteforce", "hard_negatives", "ann_lsh", "ann_ivf").foreach { q =>
      val plan = formatted(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("WindowExec") && !plan.contains("Window"),
        s"$q still plans a window:\n$plan")
      assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
        s"$q lacks partial+final heap aggregation:\n$plan")
    }
  }

  // formatted mode prints every node twice (tree line + detail header);
  // count the detail headers only
  private def nodeCount(plan: String, node: String): Int =
    s"""(?m)^\\(\\d+\\) $node""".r.findAllIn(plan).size

  test("preference_pairs: one stratum aggregation, no window, no extra shuffle") {
    val df = SparkEntry.queries("preference_pairs")(spark, sf)
    val plan = formatted(df)
    assert(!plan.contains("WindowExec") && !plan.contains("Window"), plan)
    // ONE shuffle: the stratum exchange between partial and final heaps
    assert(nodeCount(plan, "Exchange") == 1, plan)
  }

  test("lang_id argmax: hash aggregation, no doc-partitioned window") {
    val plan = formatted(SparkEntry.queries("lang_id")(spark, sf))
    assert(!plan.contains("WindowExec") && !plan.contains("Window"),
      s"lang_id reverted to the window argmax:\n$plan")
  }

  test("agg_maintain: delta aggregates map-side; base never re-expands") {
    val plan = formatted(SparkEntry.queries("agg_maintain")(spark, sf))
    // partial+final on the delta, partial+final on the merge = >=4
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("zorder_stats: map-side Z values, 1-row max broadcast back") {
    val plan = formatted(SparkEntry.queries("zorder_stats")(spark, sf))
    // the zmax scalar joins back via broadcast, never a shuffle join
    assert(plan.contains("BroadcastNestedLoopJoin") ||
           plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("column_stats_index: one scan, partial+final block aggregation") {
    val df = SparkEntry.queries("column_stats_index")(spark, sf)
    val plan = formatted(df)
    assert(scanCount(plan) == 1, plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(codegenPlan(df).contains("WholeStageCodegen"), "no codegen span")
  }

  test("rolling_stats: RANGE frame window keyed on user, single shuffle") {
    val df = SparkEntry.queries("rolling_stats")(spark, sf)
    val plan = formatted(df)
    // the window IS the operator here — but it must be key-partitioned
    // (asserted globally above) and the plan's only exchange
    assert(nodeCount(plan, "Exchange") == 1, plan)
  }

  test("click_attribution: user-keyed equi join, never cartesian") {
    val plan = formatted(SparkEntry.queries("click_attribution")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("snapshot_diff: one full-outer join, no plan explosion") {
    val plan = formatted(SparkEntry.queries("snapshot_diff")(spark, sf))
    assert(plan.contains("FullOuter"), plan)
    assert(nodeCount(plan, "SortMergeJoin") +
           nodeCount(plan, "ShuffledHashJoin") +
           nodeCount(plan, "BroadcastHashJoin") == 1, plan)
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("quantile_sketch: two-phase object aggregation — sketches merge " +
       "map-side, values never ride the shuffle") {
    val plan = formatted(SparkEntry.queries("quantile_sketch")(spark, sf))
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial pass before the exchange and a merge pass after — only
    // O(k log n) sketch bytes cross the wire, never the value stream
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(nodeCount(plan, "Exchange") == 1, plan)
    assert(scanCount(plan) == 1, plan)
    assert(!plan.contains("Sort "), s"no sort should be needed:\n$plan")
  }

  test("quantile/distinct store reads: object aggregation over sketch " +
       "partials, never a value-stream shuffle") {
    for (name <- Seq("quantile_store", "distinct_store")) {
      val plan = formatted(SparkEntry.queries(name)(spark, sf))
      assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
        s"$name: sketch merge must be partial+final object agg:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
             !plan.contains("Window"), s"$name:\n$plan")
    }
  }

  test("triangle_count: equi-joins only — orientation kills the " +
       "wedge blowup, never a cartesian") {
    val plan = formatted(SparkEntry.queries("triangle_count")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("edit_distance_pairs: gram join is equi, texts never ride the " +
       "gram shuffle") {
    val df = SparkEntry.queries("edit_distance_pairs")(spark, sf)
    val plan = formatted(df)
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the gram-side exchanges carry (id, len, gram, count) only — a
    // text column in any gram exchange would ship every document once
    // per gram; texts attach post-filter by id equi-join instead.
    // Pin broadcast off so the gram join plans its at-scale SHUFFLE
    // shape (at sf0.001 stats the whole side would broadcast), and use
    // sparkPlan: under AQE the executed plan is an adaptive leaf.
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val text = formatted(SparkEntry.queries("edit_distance_pairs")(spark, sf))
      // formatted blocks: "(n) Exchange\nInput [k]: [cols...]"
      val exchangeInputs = raw"Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]".r
        .findAllMatchIn(text).map(_.group(1)).toSeq
      val gramExchanges = exchangeInputs.filter(_.contains("g#"))
      assert(gramExchanges.nonEmpty,
        s"expected gram-keyed exchanges:\n$text")
      gramExchanges.foreach { cols =>
        assert(!cols.contains("__text#") && !cols.contains("ta#") &&
               !cols.contains("tb#"),
          s"text column rides the gram shuffle: $cols")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("ngram_novelty: df attach is a gram equi-join, no window, " +
       "map-side combined aggregations") {
    val plan = formatted(SparkEntry.queries("ngram_novelty")(spark, sf))
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
  }

  test("anomaly_zscore: bucket stats broadcast back — the fact scan " +
       "never shuffles") {
    val plan = formatted(SparkEntry.queries("anomaly_zscore")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // exactly ONE exchange (the tiny bucket aggregation); the probe
    // side reaches the join straight from its scan
    assert(raw"(?m)^\(\d+\) Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("active_users_rolling: the fact table is scanned ONCE — every " +
       "window is a sketch union over the days-sized frame") {
    // the single scan happens inside the operator's eager checkpoint
    // of the days-sized daily-sketch frame; the returned plan must
    // reference only the checkpoint (ZERO fact scans) — without the
    // checkpoint the six downstream references each re-derived the
    // fact aggregation (6 scans, caught here)
    val plan = formatted(
      SparkEntry.queries("active_users_rolling")(spark, sf))
    val factScans = raw"Scan parquet[\s\S]*?events\.parquet".r
      .findAllIn(plan).size
    assert(factScans == 0, s"expected 0 events scans, got $factScans\n$plan")
    assert(!plan.contains("Window"), plan)
  }

  test("retention_cohorts and wow_change: no cartesian, aggregates " +
       "combine map-side") {
    Seq("retention_cohorts", "wow_change").foreach { k =>
      val plan = formatted(SparkEntry.queries(k)(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"$k:\n$plan")
      assert(plan.contains("partial_"), s"$k lacks partial aggs:\n$plan")
    }
  }

  test("pit_features: ONE keyed window merge — no per-example range " +
       "probe, no cartesian") {
    val plan = formatted(SparkEntry.queries("pit_features")(spark, sf))
    assert(raw"(?m)^\(\d+\) Window".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("join_maintain: view eviction rides BROADCAST anti-joins — the " +
       "view-sized frame never shuffles; no cartesian anywhere") {
    val plan = formatted(SparkEntry.queries("join_maintain")(spark, sf))
    // the two anti-joins against the change-key sets must be broadcast
    assert("BroadcastHashJoin.*LeftAnti".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // deliberate broadcast devices only: no SMJ anti of the view
    assert(!"SortMergeJoin.*LeftAnti".r.findAllIn(plan).hasNext, plan)
  }

  test("bloom_index: probe is a bit-keyed EQUI-join — no nested-loop, " +
       "no cartesian (the quadratic probe shape the 10x rehearsal killed)") {
    val plan = formatted(SparkEntry.queries("bloom_index")(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"), plan)
  }

  test("ewma_smooth: no window at all — the fold is a key-grouped HOF " +
       "over the collected daily series, not a corpus-sized running sum") {
    val plan = formatted(SparkEntry.queries("ewma_smooth")(spark, sf))
    assert(!raw"(?m)^\(\d+\) Window".r.findAllIn(plan).hasNext, plan)
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("fuzzy_entities: candidates from an equi-join on the blocking " +
       "key — never a nested loop or cartesian on the record table") {
    val plan = formatted(SparkEntry.queries("fuzzy_entities")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("calibration_bins: no window — equi-depth assignment rides the " +
       "HOF fold over the collected domain-sized distribution") {
    val plan = formatted(SparkEntry.queries("calibration_bins")(spark, sf))
    assert(!raw"(?m)^\(\d+\) Window".r.findAllIn(plan).hasNext, plan)
  }

  test("acf_lags and forecast_baseline: lag pairing is a co-partitioned " +
       "equi-join, no window, no nested loop") {
    Seq("acf_lags", "forecast_baseline").foreach { k =>
      val plan = formatted(SparkEntry.queries(k)(spark, sf))
      assert(!raw"(?m)^\(\d+\) Window".r.findAllIn(plan).hasNext, s"$k\n$plan")
      assert(!plan.contains("CartesianProduct") &&
             !plan.contains("BroadcastNestedLoopJoin"), s"$k\n$plan")
    }
  }

  test("k_anonymity_groups: TakeOrdered caps the violation list — the " +
       "group frame never fully sorts") {
    val plan = formatted(SparkEntry.queries("k_anonymity_groups")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("ks_drift / lift_curve / auc_score: no window anywhere — CDF " +
       "and binning sweeps ride HOF folds over the collected domain") {
    Seq("ks_drift", "lift_curve", "auc_score").foreach { k =>
      val plan = formatted(SparkEntry.queries(k)(spark, sf))
      assert(!raw"(?m)^\(\d+\) Window".r.findAllIn(plan).hasNext,
        s"$k\n$plan")
    }
  }

  test("basket_rules: pair generation is a basket-keyed EQUI-join; the " +
       "only nested loop is the 1-row basket-total broadcast") {
    val plan = formatted(SparkEntry.queries("basket_rules")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    // detail-header lines only — formatted output also repeats each
    // node name in the tree rendering
    assert(raw"(?m)^\(\d+\) BroadcastNestedLoopJoin".r
      .findAllIn(plan).size <= 1, plan)
  }

  test("corr_matrix: every moment rides ONE aggregation over one scan " +
       "— no join, no window, a single fact-table read") {
    val plan = formatted(SparkEntry.queries("corr_matrix")(spark, sf))
    assert(!raw"(?m)^\(\d+\) .*Join".r.findAllIn(plan).hasNext, plan)
    assert(!raw"(?m)^\(\d+\) Window".r.findAllIn(plan).hasNext, plan)
    assert(raw"(?m)^\(\d+\) Scan parquet".r.findAllIn(plan).size == 1, plan)
  }

  test("chat_format: map-side only — no exchange in the render") {
    val plan = formatted(SparkEntry.queries("chat_format")(spark, sf))
    assert(!plan.contains("Exchange"), plan)
  }

  test("survival_curve / concentration_report: the at-risk / Gini " +
       "sweeps ride HOF folds — no window, no join over the fact scan") {
    Seq("survival_curve", "concentration_report").foreach { k =>
      val plan = formatted(SparkEntry.queries(k)(spark, sf))
      assert(!raw"(?m)^\(\d+\) Window".r.findAllIn(plan).hasNext,
        s"$k\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$k\n$plan")
    }
  }

  test("classification_report / cohens_kappa / feature_mi: one fact " +
       "scan feeds the cell aggregation; every join runs on " +
       "cell-sized frames (no shuffle join of the corpus)") {
    Seq("classification_report", "cohens_kappa", "feature_mi").foreach {
      k =>
        val plan = formatted(SparkEntry.queries(k)(spark, sf))
        // one corpus read; Spark may re-scan for the marginal branches
        // of the cell frame but never windows or sorts the corpus
        assert(!raw"(?m)^\(\d+\) Window".r.findAllIn(plan).hasNext,
          s"$k\n$plan")
        assert(!plan.contains("CartesianProduct"), s"$k\n$plan")
    }
  }

  test("sequential_patterns: the pair self-join is user-keyed on the " +
       "collapsed (user,type) frame — equi-join only, no window") {
    val plan = formatted(SparkEntry.queries("sequential_patterns")(
      spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!raw"(?m)^\(\d+\) Window".r.findAllIn(plan).hasNext, plan)
    // the only nested loop is the 1-row active-user-total broadcast
    assert(raw"(?m)^\(\d+\) BroadcastNestedLoopJoin".r
      .findAllIn(plan).size <= 1, plan)
  }

  test("bleu_pairs: entirely map-side — no exchange anywhere") {
    val plan = formatted(SparkEntry.queries("bleu_pairs")(spark, sf))
    assert(!plan.contains("Exchange"), plan)
  }

  test("holt_smooth / isotonic_calibrate / cluster_eval / l_diversity " +
       "/ fd_check: recurrences and minimax ride folds — no window, " +
       "no cartesian") {
    Seq("holt_smooth", "isotonic_calibrate", "cluster_eval",
        "l_diversity", "fd_check").foreach { k =>
      val plan = formatted(SparkEntry.queries(k)(spark, sf))
      assert(!raw"(?m)^\(\d+\) Window".r.findAllIn(plan).hasNext,
        s"$k\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$k\n$plan")
    }
  }

  test("ranking_eval / robust_zscore: every window is partition-keyed " +
       "(per-user rank / per-stratum distribution) — no global sort") {
    Seq("ranking_eval", "robust_zscore").foreach { k =>
      val df = SparkEntry.queries(k)(spark, sf)
      val plan = formatted(df)
      assert(!plan.contains("CartesianProduct"), s"$k\n$plan")
      // partition-less windows would carry an empty partition spec —
      // the global-sort shape the suite-wide sweep rejects
      val details = plan.split("\n\n").filter(_.contains("Window"))
      assert(!details.exists(_.contains("partitionBy=[]")),
        s"$k\n$plan")
    }
  }

  test("token_keyness: heap threshold not a window; the corpus-sized " +
       "token frame aggregates map-side") {
    val plan = formatted(SparkEntry.queries("token_keyness")(spark, sf))
    assert(!plan.contains("WindowExec") && !plan.contains("Window"),
      s"token_keyness reverted to a window top-k:\n$plan")
    // GroupedTopKAgg partial+final = ObjectHashAggregate pair
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("mann_kendall / bh_fdr: no windows, no cartesians — folds and " +
       "broadcast scalars only") {
    Seq("mann_kendall", "bh_fdr").foreach { k =>
      val plan = formatted(SparkEntry.queries(k)(spark, sf))
      assert(!plan.contains("WindowExec") && !plan.contains("Window"),
        s"$k plans a window:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$k\n$plan")
    }
  }
}
