package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / product-analytics operators over the event stream —
  * the warehouse siblings of the reference's run-metrics dashboards
  * (analytics/run_metrics.py reports per-run activity; these are the
  * same activity questions asked of end-user events at corpus scale):
  * cohort retention, seasonal anomaly flags, session transition
  * matrices, and RFM value segmentation.
  *
  * Shared discipline (repo-wide): every reported number is integer
  * arithmetic — week indexes, permille shares, centi-grades, exact
  * integer moment tests — so results are bit-identical cross-engine
  * and layout-invariant, and every shape is one-or-two key-partitioned
  * aggregations with map-side combine; nothing corpus-sized reaches
  * the driver and no global sort appears anywhere.
  */
object Behavior {

  private val WeekUs = 7L * 86400L * 1000000L
  private val DayUs = 86400L * 1000000L

  /** Cohort retention: users grouped by FIRST-ACTIVITY week, counted
    * in each later week they return — the classic retention triangle
    * `(cohort_week, week_offset) → n_users`.
    *
    * Scale shape: `min(week)` per user is one user-keyed aggregation
    * (map-side min); the join back is user-keyed on both sides so the
    * exchange is reused, not repeated; the `(cohort, offset, user)`
    * distinct and the final count combine map-side. Four total
    * shuffles on sf-proportional frames, none wider than the event
    * key columns — survives 100× unchanged.
    *
    * Weeks are integer epoch-week indexes (`ts_us div 7·86400·10⁶`) —
    * no calendar/timezone dependence, identical on any engine.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsUsCol: String): DataFrame = {
    // integer `div`: tsUs >= 0 contract (epoch micros), so truncating
    // division equals floor and matches DuckDB's `//` exactly
    val e2 = events.select(col(userCol).as("__u"),
      expr(s"$tsUsCol div ${WeekUs}L").as("__w"))
    val first = e2.groupBy(col("__u")).agg(min(col("__w")).as("cohort_week"))
    e2.join(first, "__u")
      .select(col("cohort_week"),
        (col("__w") - col("cohort_week")).as("week_offset"), col("__u"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Seasonal z-score anomaly flags: events whose value deviates more
    * than `kSigma` standard deviations from their OWN seasonal bucket
    * (e.g. event-type × hour-of-day) — the monitoring primitive behind
    * "purchases at 3am are 6σ above their usual 3am level".
    *
    * The σ test never touches floating point: with integer `x` (milli
    * units) and per-bucket moments `n, S1=Σx, S2=Σx²`, the flag
    * `|x−μ| > k·σ` is equivalent to `(n·x−S1)² > k²·(n·S2−S1²)` —
    * exact integer arithmetic, engine- and layout-invariant. Moments
    * ride DECIMAL(38,0) sums so the squared terms keep headroom to
    * ~10³⁸: at 100 TB (n ≈ 10⁹ per bucket, |x| ≤ 10⁹ milli) the
    * largest term `n·S2 ≈ 10³⁰` still fits; Spark sums decimals
    * exactly and DuckDB's HUGEINT does the same on the oracle side.
    *
    * Scale shape: one bucket-keyed aggregation (map-side combine; the
    * bucket table is #buckets-sized, i.e. tiny) broadcast back onto
    * the event scan, then a map-side filter. The fact table never
    * shuffles. Buckets with n < 2 have no defined σ and emit nothing.
    */
  def anomalyZscore(events: DataFrame, bucketCols: Seq[String],
                    valueMilliCol: String, kSigma: Int): DataFrame = {
    require(bucketCols.nonEmpty, "anomalyZscore needs >= 1 bucket column")
    require(kSigma >= 1 && kSigma <= 100, s"kSigma in [1,100], got $kSigma")
    val bc = bucketCols.map(col)
    val xd = col(valueMilliCol).cast("decimal(38,0)")
    val stats = events.groupBy(bc: _*).agg(
      count(lit(1)).as("__n"),
      sum(xd).as("__s1"),
      sum(xd * col(valueMilliCol)).as("__s2"))
    val nd = col("__n").cast("decimal(38,0)")
    val dev = nd * col(valueMilliCol) - col("__s1")
    val varN2 = nd * col("__s2") - col("__s1") * col("__s1") // n²·σ²
    events.join(broadcast(stats), bucketCols)
      .filter(col("__n") >= 2 && dev * dev > lit(kSigma.toLong * kSigma) * varN2)
      .drop("__n", "__s1", "__s2")
  }

  /** First-order transition matrix over each user's event sequence:
    * `(from_type, to_type) → count + permille share of from_type's
    * outgoing transitions` — the Markov-chain view of product flows
    * (and of token-level corpus bigrams; [[TextAnalysis]] holds the
    * text twin as cooccurrence/PMI).
    *
    * Ordering is total: `(ts_us, tiebreakCol)` — colliding timestamps
    * cannot flip pairs between engines. One user-partitioned window
    * (the sessionize device — partition-keyed, never global), one
    * grouped count, then the permille share via a window over the
    * AGGREGATED frame (#types² rows — trivially small at any corpus
    * size). Integer `div` for the share both engines.
    */
  def eventTransitions(events: DataFrame, userCol: String, tsUsCol: String,
                       tiebreakCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsUsCol), col(tiebreakCol))
    val counts = events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("permille",
      expr("n * 1000 div sum(n) over (partition by from_type)"))
  }

  /** Linear multi-touch attribution: every view inside the lookback
    * window before a same-user purchase shares the conversion credit
    * equally — in integer permille, with the division remainder
    * assigned to the EARLIEST touch (deterministic; credits sum to
    * exactly 1000 per converted purchase, no fractional leakage).
    * The martech sibling of the D10 pair join.
    *
    * Shape: one user-keyed equi-join + range filter builds the
    * (purchase, touch) pairs — the click_attribution shape — then a
    * purchase-keyed count window and a rank window assign the split;
    * both windows partition on the purchase id (bounded by touches
    * per purchase, never global).
    */
  def attributionLinear(events: DataFrame, userCol: String, tsUsCol: String,
                        idCol: String, typeCol: String,
                        touchType: String, convType: String,
                        lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, s"lookbackUs must be > 0")
    val p = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("__u"), col(idCol).as("purchase_event_id"),
        col(tsUsCol).as("__pts"))
    val v = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("__u"), col(idCol).as("view_event_id"),
        col(tsUsCol).as("__vts"))
    val pairs = p.join(v, "__u")
      .filter(col("__vts") >= col("__pts") - lookbackUs &&
        col("__vts") <= col("__pts"))
    val wCount = Window.partitionBy(col("purchase_event_id"))
    val wRank = Window.partitionBy(col("purchase_event_id"))
      .orderBy(col("__vts"), col("view_event_id"))
    pairs
      .withColumn("__k", count(lit(1)).over(wCount))
      .withColumn("__r", row_number().over(wRank))
      .select(col("purchase_event_id"), col("view_event_id"),
        (expr("1000 div __k") +
          when(col("__r") === 1, expr("1000 - __k * (1000 div __k)"))
            .otherwise(lit(0L))).as("credit_permille"))
  }

  /** Cohort lifetime-value curves — [[retentionCohorts]]'s revenue
    * sibling: per (first-purchase week, week offset), active-customer
    * count, period revenue, and CUMULATIVE revenue in integer cents —
    * the "how much has the week-W cohort spent by offset k" table LTV
    * projections read off.
    *
    * Shape: one customer-keyed min-week agg, an exchange-aligned join
    * back, one (cohort, offset)-keyed aggregation, then the cumulative
    * sum as a window over the AGGREGATE (cohorts × offsets — tiny;
    * partitioned by cohort, never global). Integer cents end-to-end.
    */
  def cohortLtv(orders: DataFrame, custCol: String, tsUsCol: String,
                centsCol: String): DataFrame = {
    val o = orders.select(col(custCol).as("__c"),
      expr(s"$tsUsCol div ${WeekUs}L").as("__w"), col(centsCol).as("__cents"))
    val first = o.groupBy(col("__c")).agg(min(col("__w")).as("cohort_week"))
    val per = o.join(first, "__c")
      .groupBy(col("cohort_week"), (col("__w") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("__c")).as("n_customers"),
        sum(col("__cents")).as("revenue_cents"))
    per.withColumn("cum_revenue_cents",
      expr("sum(revenue_cents) over (partition by cohort_week " +
        "order by week_offset rows between unbounded preceding " +
        "and current row)"))
  }

  /** Third-order user journeys (the Sankey/path-analysis feed):
    * counts of consecutive event TRIPLES per user sequence under the
    * same `(ts, tiebreak)` total order as [[eventTransitions]], tail
    * pruned by `minCount` in-plan. One user-partitioned window with
    * two leads, one map-side-combined count — the #types³ result
    * frame is tiny at any corpus size.
    */
  def pathTrigrams(events: DataFrame, userCol: String, tsUsCol: String,
                   tiebreakCol: String, typeCol: String,
                   minCount: Long = 1L): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsUsCol), col(tiebreakCol))
    events
      .select(col(typeCol).as("e1"),
        lead(col(typeCol), 1).over(w).as("e2"),
        lead(col(typeCol), 2).over(w).as("e3"))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Week-over-week metric deltas per segment (the dashboard
    * trend primitive): weekly integer-milli value sums + event counts
    * per key, with the previous CONSECUTIVE week's value and the
    * change in integer permille — `lag` over the weekly AGGREGATE
    * (weeks-sized per key, never the fact table), delta emitted only
    * when the previous observed week is exactly `week − 1` and
    * positive (a gap week or a zero base has no meaningful ratio —
    * null, not a fabricated number).
    */
  def weekOverWeek(events: DataFrame, keyCol: String, tsUsCol: String,
                   valueMilliCol: String): DataFrame = {
    val weekly = events
      .select(col(keyCol), expr(s"$tsUsCol div ${WeekUs}L").as("week"),
        col(valueMilliCol))
      .groupBy(col(keyCol), col("week"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueMilliCol)).as("value_milli"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("week"))
    weekly
      .withColumn("__pw", lag(col("week"), 1).over(w))
      .withColumn("__pv", lag(col("value_milli"), 1).over(w))
      .withColumn("delta_permille",
        when(col("__pw") === col("week") - 1 && col("__pv") > 0,
          expr("(value_milli - __pv) * 1000 div __pv")))
      .drop("__pw", "__pv")
  }

  /** Rolling active-user reach: per observed day, DAU plus trailing
    * 7-day WAU and 28-day MAU distinct-user counts and the DAU/MAU
    * stickiness ratio in integer permille — the engagement dashboard
    * primitive, built the only way it stays incremental at scale:
    * COUNT(DISTINCT) does not sum across days, so each day holds a
    * KMV theta-sketch partial ([[graft.functions.KmvSketchAgg]]) and
    * every window is a sketch UNION ([[graft.functions.KmvMergeAgg]])
    * — the [[Relational]] distinct-store argument applied to sliding
    * windows.
    *
    * Scale shape: the fact table is scanned ONCE (day-keyed sketch
    * agg, map-side combine, state O(k) per day); the daily frame is
    * days-sized, so the three window fan-outs (`explode(sequence)` of
    * 1/7/28 anchors), the observed-day semi-join, and the merges are
    * all trivially small regardless of corpus size. Exact below k
    * retained hashes per window (the driver-verified regime ≡ SQL
    * COUNT(DISTINCT)); (k−1)/u_k beyond, with the merge still a pure
    * function of the underlying user set (layout/replay invariant).
    * Days are integer epoch-day indexes; only OBSERVED days emit.
    */
  def activeUsersRolling(events: DataFrame, userCol: String,
                         tsUsCol: String, k: Int): DataFrame = {
    import graft.functions.{KmvMergeAgg, KmvSketchAgg}
    // eager localCheckpoint: the daily frame is referenced SIX times
    // downstream (three windows × sketch + anchor sides) — without it
    // the lazy plan re-derives the fact aggregation per reference and
    // the fact table is scanned six times (caught by PlanQualitySpec);
    // checkpointing the days-sized frame pins the scan count at one
    val daily = events
      .select(expr(s"$tsUsCol div ${DayUs}L").as("day"),
        col(userCol).as("__u"))
      .groupBy("day").agg(KmvSketchAgg(col("__u"), k).as("__sk"))
      .localCheckpoint(true)
    val days = daily.select(col("day").as("anchor"))
    def rolled(span: Int, name: String): DataFrame =
      daily.select(col("__sk"),
          explode(sequence(col("day"), col("day") + lit(span - 1).cast("long")))
            .as("anchor"))
        .join(broadcast(days), Seq("anchor"), "left_semi")
        .groupBy("anchor")
        .agg(KmvMergeAgg(col("__sk"), k).as("__m"))
        .select(col("anchor"), col("__m.n_distinct").as(name))
    rolled(1, "dau")
      .join(rolled(7, "wau_7d"), "anchor")
      .join(rolled(28, "mau_28d"), "anchor")
      .select(col("anchor").as("day"), col("dau"), col("wau_7d"),
        col("mau_28d"),
        expr("dau * 1000 div mau_28d").as("stickiness_permille"))
  }

  /** RFM value segmentation over an order fact table: per customer,
    * Recency (days since last order, relative to the corpus max
    * date), Frequency (order count), Monetary (lifetime cents), each
    * scored into its exact quartile `1..4` (ascending: score s means
    * the value is ≥ the (s−1)·25th percentile), and the composite
    * `segment = r·100 + f·10 + m`.
    *
    * Quartile thresholds come from [[graft.functions.KllQuantilesAgg]]
    * in its exact regime (k ≥ #customers at test SFs — identical to
    * DuckDB `quantile_disc`'s type-1 rank rule), so the corpus never
    * sorts: per-customer rollup is one customer-keyed aggregation,
    * the max date and the nine thresholds are ONE-ROW frames attached
    * by deliberate 1-row broadcast nested loops (the repo's scalar
    * device), and scoring is a map-side comparison. At 100 TB the
    * same plan holds with the sketch in its compacting regime (rank
    * error ≤ the carried bound — thresholds shift by at most that
    * rank error; scores remain exact for values away from the
    * boundary).
    */
  def rfmSegments(orders: DataFrame, custCol: String, dateUsCol: String,
                  amountCentsCol: String): DataFrame = {
    import graft.functions.KllQuantilesAgg
    val per = orders.groupBy(col(custCol)).agg(
      max(col(dateUsCol)).as("__last_us"),
      count(lit(1)).as("frequency"),
      sum(col(amountCentsCol)).as("monetary_cents"))
    val maxD = per.agg(max(col("__last_us")).as("__max_us"))
    val rfm = per.crossJoin(broadcast(maxD))
      .select(col(custCol),
        expr(s"(__max_us - __last_us) div ${DayUs}L").as("recency_days"),
        col("frequency"), col("monetary_cents"))
    val qs = Seq(0.25, 0.5, 0.75)
    val th = rfm.agg(
      KllQuantilesAgg(col("recency_days"), 1 << 19, qs).as("__tr"),
      KllQuantilesAgg(col("frequency"), 1 << 19, qs).as("__tf"),
      KllQuantilesAgg(col("monetary_cents"), 1 << 19, qs).as("__tm"))
    def score(c: Column, t: String): Column =
      (lit(1) + (c >= col(s"$t.qs").getItem(0)).cast("int")
        + (c >= col(s"$t.qs").getItem(1)).cast("int")
        + (c >= col(s"$t.qs").getItem(2)).cast("int"))
    rfm.crossJoin(broadcast(th))
      .select(col(custCol), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        score(col("recency_days"), "__tr").as("r_q"),
        score(col("frequency"), "__tf").as("f_q"),
        score(col("monetary_cents"), "__tm").as("m_q"))
      .withColumn("segment",
        col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
  }

  /** Per-key EWMA smoothing of a daily metric — the trend line under
    * every ops dashboard and the forecast baseline `s_i = α·x_i +
    * (1−α)·s_{i−1}` with `s_0 = x_0`. Exact integer arithmetic: the
    * state rides in MILLI-units and each step is `(α·x_i·1000 +
    * (1000−α)·s_{i−1}) div 1000` with a permille `α` — truncating
    * division on non-negative operands every step, so the whole
    * trajectory is bit-identical in any engine (the DuckDB oracle
    * unrolls it as a recursive CTE).
    *
    * Scale shape: an EWMA is an inherently sequential prefix fold, so
    * it runs over each key's COLLECTED day series — one key-grouped
    * aggregation, then a map-side HOF fold + posexplode. The series is
    * calendar-sized (days per key), never event-sized: aggregate the
    * raw events to daily grain FIRST (that aggregation is the same
    * shuffle this one rides). Gaps carry the state unchanged across
    * missing days (the fold is over observed days in order).
    */
  /** Two-proportion A/B guardrail (C82) — the experimentation
    * primitive: per stratum, is variant B's conversion rate
    * significantly different from A's at the given z? The pooled
    * two-proportion z-test with NO square root and NO float anywhere
    * — the [[anomalyZscore]] device applied to the squared
    * inequality: with `d = c_a·n_b − c_b·n_a`, `N = n_a+n_b`,
    * `C = c_a+c_b`,
    * `|p_a−p_b| > z·√(p̄(1−p̄)(1/n_a+1/n_b))  ⟺
    *  d²·N·10⁴ > z²_permyriad·C·(N−C)·n_a·n_b`
    * evaluated in DECIMAL(38,0) (Spark) vs HUGEINT (oracle) — exact
    * integers end-to-end, so the boundary case is decided identically
    * in both engines. One stratum-keyed aggregation (map-side
    * combined); strata missing an arm are dropped (no test exists).
    */
  def abTest(df: DataFrame, stratumCol: String, variantCol: String,
             successCol: String, z2Permyriad: Long): DataFrame = {
    require(z2Permyriad > 0, s"z2Permyriad must be > 0, got $z2Permyriad")
    val v = col(variantCol); val s = col(successCol)
    val g = df.groupBy(col(stratumCol).as("stratum")).agg(
      sum(when(v === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(v === 0 && s, 1L).otherwise(0L)).as("conv_a"),
      sum(when(v =!= 0, 1L).otherwise(0L)).as("n_b"),
      sum(when(v =!= 0 && s, 1L).otherwise(0L)).as("conv_b"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
    def d38(c: Column) = c.cast("decimal(38,0)")
    val d = d38(col("conv_a")) * d38(col("n_b")) -
            d38(col("conv_b")) * d38(col("n_a"))
    val bigN = d38(col("n_a")) + d38(col("n_b"))
    val bigC = d38(col("conv_a")) + d38(col("conv_b"))
    g.withColumn("p_a_micro", expr("conv_a * 1000000L div n_a"))
      .withColumn("p_b_micro", expr("conv_b * 1000000L div n_b"))
      .withColumn("significant",
        d * d * bigN * lit(10000L) >
          lit(z2Permyriad) * bigC * (bigN - bigC) *
            d38(col("n_a")) * d38(col("n_b")))
  }

  /** Sample-ratio-mismatch check (C83) — the health gate that must
    * pass BEFORE [[abTest]]'s verdict means anything: under a 50/50
    * assignment, is the observed arm split plausible? One-df
    * chi-square `(n_a−n_b)²/N` as the same no-sqrt no-float squared
    * inequality: `srm ⟺ (n_a−n_b)²·10⁴ > χ²_permyriad·N` (the SRM
    * convention tests at p ≈ 0.001 ⇒ χ² = 10.828 ⇒ permyriad
    * 108280). A flagged stratum means the ASSIGNMENT is broken
    * (logging loss, bot filter bias) — its test result is garbage
    * regardless of significance. One stratum-keyed count aggregation.
    */
  def srmCheck(df: DataFrame, stratumCol: String, variantCol: String,
               chi2Permyriad: Long): DataFrame = {
    require(chi2Permyriad > 0, s"chi2Permyriad must be > 0, got $chi2Permyriad")
    val v = col(variantCol)
    df.groupBy(col(stratumCol).as("stratum")).agg(
        sum(when(v === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(v =!= 0, 1L).otherwise(0L)).as("n_b"))
      .withColumn("delta", col("n_a") - col("n_b"))
      .withColumn("srm",
        expr(s"delta * delta * 10000L > ${chi2Permyriad}L * (n_a + n_b)"))
  }

  /** Multi-touch attribution credits (C93 — the batch complement of
    * the last-touch streaming `click_attribution`): every touchpoint
    * preceding a conversion gets an integer-permille share of that
    * conversion's credit, under either classic model:
    *  - `linear`: `1000 div n` each, remainder to the LAST touch so
    *    every conversion's credits sum to exactly 1000;
    *  - `u_shape`: 400 first / 400 last / 200 split over the middles
    *    (`200 div (n−2)` each, remainder to the last middle); n=1 →
    *    1000, n=2 → 500/500.
    * A touch belongs to the NEXT conversion of its user in strict
    * `(ts, event_id)` order (the deterministic tiebreak); touches
    * after the user's final conversion earn nothing.
    *
    * Scale shape: the conversion-GROUP device — a user-partitioned
    * running count of prior conversions puts every touch and its
    * following conversion in one (user, group) cell (the conversion is
    * always last in `(ts, id)` order), so conv attach is a plain
    * max-over-group window, no self-join and no struct-min; then one
    * (user, conversion) ranking window + pure expression credit
    * rules. All windows share the user key family: one shuffle,
    * bounded per-user state.
    */
  /** The shared integer credit rule (see [[attributionCredits]]) —
    * the streaming twin applies it row-at-a-time; the batch SQL
    * expressions encode the identical arithmetic (pinned together by
    * the stream ≡ batch spec). */
  def creditPermille(model: String, position: Long, n: Long): Long =
    model match {
      case "linear" =>
        val base = 1000L / n
        if (position == n) base + (1000L - base * n) else base
      case "u_shape" =>
        if (n == 1) 1000L
        else if (n == 2) 500L
        else if (position == 1 || position == n) 400L
        else {
          val mid = 200L / (n - 2)
          if (position == n - 1) mid + (200L - mid * (n - 2)) else mid
        }
      case other =>
        throw new IllegalArgumentException(s"unknown model $other")
    }

  def attributionCredits(events: DataFrame, userCol: String,
                         tsCol: String, idCol: String, typeCol: String,
                         convType: String, touchTypes: Seq[String],
                         model: String): DataFrame = {
    require(model == "linear" || model == "u_shape",
      s"model must be linear|u_shape, got $model")
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "touchTypes must be non-empty and exclude convType")
    val base = events.select(col(userCol).as("user"),
        col(tsCol).cast("long").as("__ts"), col(idCol).cast("long").as("__id"),
        col(typeCol).as("__ty"))
      .filter(col("__ty") === convType || col("__ty").isin(touchTypes: _*))
      .withColumn("__conv", col("__ty") === convType)
    val wOrd = Window.partitionBy("user")
      .orderBy(col("__ts"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val grp = base.withColumn("__grp",
      coalesce(sum(when(col("__conv"), 1L).otherwise(0L)).over(wOrd),
        lit(0L)))
    val wg = Window.partitionBy("user", "__grp")
    val attach = grp
      .withColumn("conv_id", max(when(col("__conv"), col("__id"))).over(wg))
      .withColumn("conv_ts", max(when(col("__conv"), col("__ts"))).over(wg))
    val touches = attach
      .filter(!col("__conv") && col("conv_id").isNotNull)
      .select(col("user"), col("conv_ts"), col("conv_id"),
        col("__ts").as("touch_ts"), col("__id").as("touch_id"),
        col("__ty").as("touch_type"))
    val wRank = Window.partitionBy("user", "conv_id")
      .orderBy(col("touch_ts"), col("touch_id"))
    val ranked = touches
      .withColumn("position", row_number().over(wRank).cast("long"))
      .withColumn("n_touches",
        count(lit(1)).over(Window.partitionBy("user", "conv_id"))
          .cast("long"))
    val credit = model match {
      case "linear" => expr(
        """1000L div n_touches +
           CASE WHEN position = n_touches
                THEN 1000L - (1000L div n_touches) * n_touches
                ELSE 0L END""")
      case "u_shape" => expr(
        """CASE WHEN n_touches = 1 THEN 1000L
                WHEN n_touches = 2 THEN 500L
                WHEN position = 1 OR position = n_touches THEN 400L
                WHEN position = n_touches - 1
                THEN 200L div (n_touches - 2)
                     + 200L - (200L div (n_touches - 2)) * (n_touches - 2)
                ELSE 200L div (n_touches - 2) END""")
    }
    ranked.withColumn("credit_permille", credit)
  }

  /** Calibration reliability bins (C91 — the diagram every score
    * consumer should read before thresholding: a classifier saying
    * "700 permille" should be right ~70% of the time): rows sort into
    * `nBins` equi-DEPTH bins by score (equal row counts, so sparse
    * score regions don't make empty cells), each bin reporting mean
    * predicted score vs observed positive rate and the signed gap —
    * all integer permille, truncating division on non-negative
    * operands.
    *
    * Contract: `scorePermilleCol` has a BOUNDED domain (permille
    * scores: ≤ 1001 distinct values) — the per-score aggregated frame
    * is domain-sized, so the equi-depth assignment runs as the HOF
    * fold over the COLLECTED distribution (the vocab_growth device —
    * no constant-key window, nothing corpus-sized sorts). Duplicate
    * scores stay whole in one bin (the [[Relational.equiDepthHistogram]]
    * exclusive-prefix rule), so bins are exact and layout-invariant.
    * Scale shape: ONE corpus-sized score-keyed aggregation (map-side
    * combined); everything after runs on ≤ |domain| rows.
    */
  def calibrationBins(df: DataFrame, scorePermilleCol: String,
                      labelCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val perScore = df.groupBy(col(scorePermilleCol).cast("long").as("__s"))
      .agg(count(lit(1)).as("__n"),
           sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"))
    val total = perScore.agg(sum("__n").as("__t"))
    perScore.crossJoin(broadcast(total))
      .agg(array_sort(collect_list(struct(col("__s"), col("__n"),
        col("__p"), col("__t")))).as("__a"))
      .select(explode(expr("""aggregate(__a,
        CAST(array() AS ARRAY<STRUCT<s: BIGINT, n: BIGINT, p: BIGINT,
          t: BIGINT, cum0: BIGINT>>),
        (acc, el) -> array_append(acc, struct(
          el.__s AS s, el.__n AS n, el.__p AS p, el.__t AS t,
          CASE WHEN size(acc) = 0 THEN CAST(0 AS BIGINT)
               ELSE element_at(acc, -1).cum0 + element_at(acc, -1).n
          END AS cum0)))""")).as("__r"))
      .select(col("__r.s").as("__s"), col("__r.n").as("__n"),
        col("__r.p").as("__p"), col("__r.t").as("__t"),
        col("__r.cum0").as("__cum0"))
      .withColumn("bin", expr(s"__cum0 * ${nBins}L div __t"))
      .groupBy("bin")
      .agg(sum("__n").as("n_rows"), sum(expr("__s * __n")).as("__ss"),
           sum("__p").as("__pp"))
      .withColumn("mean_score_permille", expr("__ss div n_rows"))
      .withColumn("observed_permille", expr("(1000L * __pp) div n_rows"))
      .withColumn("gap_permille",
        col("observed_permille") - col("mean_score_permille"))
      .select(col("bin"), col("n_rows"), col("mean_score_permille"),
        col("observed_permille"), col("gap_permille"))
  }

  /** AUC (E79 — the ranking-quality number under every binary
    * classifier, completing the eval family next to
    * [[calibrationBins]]: calibration says whether the scores MEAN
    * what they say, AUC whether they ORDER correctly): the
    * Mann-Whitney U form with the standard tie correction, computed
    * EXACTLY in integers — `2U = Σ_s pos_s·(2·neg_below(s) +
    * neg_at(s))` (ties count half, so doubling clears the fraction),
    * `auc_permille = (1000·2U) div (2·n_pos·n_neg)` with the final
    * ratio in DECIMAL(38,0) so corpus-scale products cannot overflow.
    *
    * Same contract as [[calibrationBins]]: the score domain is
    * BOUNDED (permille scores), so after ONE corpus-sized score-keyed
    * aggregation everything runs on the ≤|domain|-row frame — the
    * cumulative negative count rides the HOF fold over the collected
    * distribution, NOT a corpus ranking window (the global-sort
    * killer a naive rank-based AUC plans).
    */
  def aucScore(df: DataFrame, scorePermilleCol: String,
               labelCol: String): DataFrame = {
    val perScore = df.groupBy(col(scorePermilleCol).cast("long").as("__s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"),
           sum(when(col(labelCol), 0L).otherwise(1L)).as("__n"))
    perScore
      .agg(array_sort(collect_list(struct(col("__s"), col("__p"),
        col("__n")))).as("__a"))
      .select(expr("""aggregate(__a,
        struct(CAST(0 AS BIGINT) AS neglt, CAST(0 AS DECIMAL(38,0)) AS u2,
               CAST(0 AS BIGINT) AS np, CAST(0 AS BIGINT) AS nn),
        (acc, el) -> struct(acc.neglt + el.__n AS neglt,
          acc.u2 + CAST(el.__p AS DECIMAL(38,0))
            * (2 * acc.neglt + el.__n) AS u2,
          acc.np + el.__p AS np, acc.nn + el.__n AS nn))""").as("__r"))
      .select(col("__r.np").as("n_pos"), col("__r.nn").as("n_neg"),
        expr("""CAST(CASE WHEN __r.np > 0 AND __r.nn > 0
                  THEN (1000 * __r.u2) div
                       (2 * CAST(__r.np AS DECIMAL(38,0)) * __r.nn)
                  ELSE NULL END AS BIGINT)""").as("auc_permille"))
  }

  /** Two-sample Kolmogorov-Smirnov drift statistic (E80 — the
    * distribution-drift monitor next to [[psi_drift]]: PSI needs a
    * binning choice, KS is the binning-free supremum
    * `D = max_s |F_base(s) − F_cur(s)|` and the number every
    * score-drift alarm thresholds on). Computed EXACTLY in integers:
    * at each observed score `diff = |cum_base·n_cur − cum_cur·n_base|`
    * (DECIMAL(38,0) — corpus-scale cum·n products cannot overflow),
    * `ks_micro = (10⁶·max diff) div (n_base·n_cur)`, and `ks_at_score`
    * is the LOWEST score attaining the max (explicit tie rule, so the
    * argmax is engine-stable). Either side empty → both read null.
    *
    * Same bounded-score-domain contract as [[aucScore]]: one
    * corpus-sized score-keyed aggregation, then every CDF step rides
    * the HOF fold over the collected ≤|domain|-row distribution —
    * never a corpus ranking window.
    */
  def ksDrift(df: DataFrame, scorePermilleCol: String,
              baseCol: String): DataFrame = {
    val perScore = df.groupBy(col(scorePermilleCol).cast("long").as("__s"))
      .agg(sum(when(col(baseCol), 1L).otherwise(0L)).as("__b"),
           sum(when(col(baseCol), 0L).otherwise(1L)).as("__c"))
    perScore
      .agg(array_sort(collect_list(struct(col("__s"), col("__b"),
        col("__c")))).as("__a"))
      .select(col("__a"),
        expr("aggregate(__a, CAST(0 AS BIGINT), (a, e) -> a + e.__b)")
          .as("__nb"),
        expr("aggregate(__a, CAST(0 AS BIGINT), (a, e) -> a + e.__c)")
          .as("__nc"))
      // one CDF pass: per score, |cumB·nc − cumC·nb| with −s riding
      // the struct so array_max's lexicographic order breaks diff
      // ties toward the LOWEST score
      .select(col("__nb"), col("__nc"), array_max(expr("""aggregate(__a,
        struct(CAST(0 AS BIGINT) AS cb, CAST(0 AS BIGINT) AS cc,
               CAST(array() AS ARRAY<STRUCT<d: DECIMAL(38,0),
                 ns: BIGINT>>) AS ds),
        (acc, el) -> struct(acc.cb + el.__b AS cb, acc.cc + el.__c AS cc,
          array_append(acc.ds, struct(
            abs(CAST(acc.cb + el.__b AS DECIMAL(38,0)) * __nc
              - CAST(acc.cc + el.__c AS DECIMAL(38,0)) * __nb) AS d,
            -el.__s AS ns)) AS ds)).ds""")).as("__m"))
      .select(col("__nb").as("n_base"), col("__nc").as("n_cur"),
        expr("""CASE WHEN __nb > 0 AND __nc > 0
                  THEN CAST((1000000 * __m.d) div
                    (CAST(__nb AS DECIMAL(38,0)) * __nc) AS BIGINT)
                END""").as("ks_micro"),
        expr("CASE WHEN __nb > 0 AND __nc > 0 THEN -__m.ns END")
          .as("ks_at_score"))
  }

  /** Cumulative gains / lift table (E81 — the campaign-targeting and
    * ranking-quality view under every scored list, completing the
    * eval family: [[calibrationBins]] says what scores MEAN,
    * [[aucScore]] whether they ORDER, this says what acting on the
    * top k/N EARNS): rows ranked by score DESCENDING into `nBins`
    * equi-depth bins (bin 0 = highest scores; a distinct score
    * belongs WHOLLY to the bin of its exclusive-prefix position — the
    * [[equidepth_histogram]] rule, so duplicates never split), each
    * bin reporting its own and cumulative rows/positives plus
    * `gain_permille = 1000·cum_pos div total_pos` and
    * `lift_permille = (1000·cum_pos·n) div (cum_rows·total_pos)`
    * (DECIMAL(38,0) products; zero positives → both null).
    *
    * Scale shape: one score-keyed aggregation, then the binning and
    * BOTH cumulative passes ride HOF folds over the collected
    * distribution / the ≤nBins bin frame — the corpus never sorts and
    * no window appears anywhere.
    */
  def liftCurve(df: DataFrame, scorePermilleCol: String, labelCol: String,
                nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val perScore = df.groupBy(col(scorePermilleCol).cast("long").as("__s"))
      .agg(count(lit(1)).as("__n"),
           sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"))
    perScore
      // sort key −s: ascending array_sort = descending score
      .agg(array_sort(collect_list(struct((-col("__s")).as("__ds"),
        col("__n"), col("__p")))).as("__a"))
      .select(col("__a"),
        expr("aggregate(__a, CAST(0 AS BIGINT), (a, e) -> a + e.__n)")
          .as("__t"),
        expr("aggregate(__a, CAST(0 AS BIGINT), (a, e) -> a + e.__p)")
          .as("__pt"))
      .select(col("__t"), col("__pt"), explode(expr(s"""aggregate(__a,
        struct(CAST(0 AS BIGINT) AS cum0,
               CAST(array() AS ARRAY<STRUCT<bin: BIGINT, n: BIGINT,
                 p: BIGINT>>) AS bs),
        (acc, el) -> struct(acc.cum0 + el.__n AS cum0,
          array_append(acc.bs, struct(
            acc.cum0 * ${nBins}L div __t AS bin,
            el.__n AS n, el.__p AS p)) AS bs)).bs""")).as("__e"))
      .groupBy(col("__e.bin").as("bin"))
      .agg(first(col("__t")).as("__t"), first(col("__pt")).as("__pt"),
           sum(col("__e.n")).as("n_rows"), sum(col("__e.p")).as("n_pos"))
      // cumulative over the ≤nBins bin frame: collect + fold again
      .agg(array_sort(collect_list(struct(col("bin"), col("__t"),
        col("__pt"), col("n_rows"), col("n_pos")))).as("__b"))
      .select(explode(expr("""aggregate(__b,
        struct(CAST(0 AS BIGINT) AS cr, CAST(0 AS BIGINT) AS cp,
               CAST(array() AS ARRAY<STRUCT<bin: BIGINT, n_rows: BIGINT,
                 n_pos: BIGINT, cum_rows: BIGINT, cum_pos: BIGINT,
                 t: BIGINT, pt: BIGINT>>) AS out),
        (acc, el) -> struct(acc.cr + el.n_rows AS cr,
          acc.cp + el.n_pos AS cp,
          array_append(acc.out, struct(el.bin AS bin,
            el.n_rows AS n_rows, el.n_pos AS n_pos,
            acc.cr + el.n_rows AS cum_rows, acc.cp + el.n_pos AS cum_pos,
            el.__t AS t, el.__pt AS pt)) AS out)).out""")).as("__r"))
      .select(col("__r.bin").as("bin"), col("__r.n_rows").as("n_rows"),
        col("__r.n_pos").as("n_pos"), col("__r.cum_rows").as("cum_rows"),
        col("__r.cum_pos").as("cum_pos"),
        expr("""CASE WHEN __r.pt > 0
                  THEN (1000 * __r.cum_pos) div __r.pt END""")
          .as("gain_permille"),
        expr("""CASE WHEN __r.pt > 0
                  THEN CAST((1000 * CAST(__r.cum_pos AS DECIMAL(38,0))
                    * __r.t) div (CAST(__r.cum_rows AS DECIMAL(38,0))
                    * __r.pt) AS BIGINT) END""").as("lift_permille"))
  }

  /** Smoothed target encoding (C88 — the standard high-cardinality
    * categorical feature for tabular ML): each category's target mean
    * shrunk toward the global mean by pseudo-count `m`
    * (`enc = (Σy_c + m·ȳ) / (n_c + m)`) — rare categories read as the
    * prior instead of memorizing their handful of labels. Exact
    * integers: the prior is the truncating global milli-mean, the
    * encoding `sign-trunc(Σy_c + m·prior_milli·?, n_c + m)` — all in
    * milli target units, sign-explicit truncation, engine-identical.
    * Leave-one-out/CV variants compose upstream (filter the fold out
    * before calling). Scale shape: one category-keyed aggregation
    * (map-side combined) + ONE global row broadcast back over the
    * category-sized frame — the fact table shuffles once.
    */
  def targetEncode(df: DataFrame, catCol: String, targetMilliCol: String,
                   pseudoCount: Long): DataFrame = {
    require(pseudoCount >= 0, s"pseudoCount must be >= 0, got $pseudoCount")
    val y = col(targetMilliCol).cast("long")
    val perCat = df.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n"), sum(y).as("__sy"))
    val global = df.agg(count(lit(1)).as("__gn"), sum(y).as("__gy"))
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    perCat.crossJoin(broadcast(global))
      .withColumn("prior_milli", expr(strunc("__gy", "__gn")))
      .withColumn("enc_milli", expr(strunc(
        s"__sy + ${pseudoCount}L * prior_milli",
        s"n + ${pseudoCount}L")))
      .select(col("category"), col("n"), col("prior_milli"),
              col("enc_milli"))
  }

  /** Seasonal-naive forecast backtest (C89 — the baseline every
    * forecasting pipeline must beat, and the cheapest drift alarm):
    * forecast each day as the value `period` days earlier and score
    * the residuals per key — `n_scored` days with both observations,
    * `mae_milli = trunc(1000·Σ|x_t − x_{t−p}| / n)`, and signed
    * `bias_milli` (systematic growth reads positive). Exact integer
    * arithmetic; sign-explicit truncation on the bias.
    *
    * Scale shape: one co-partitioned (key, day) self-join of the
    * calendar-sized daily frame + one key-grain aggregation — the
    * same shape as [[acfLags]] at a single lag. No windows.
    */
  def forecastBaseline(daily: DataFrame, keyCols: Seq[String],
                       dayCol: String, valueCol: String,
                       period: Long): DataFrame = {
    require(period >= 1, s"period must be >= 1, got $period")
    val base = daily.select((keyCols.map(col) :+
      col(dayCol).cast("long").as("__d") :+
      col(valueCol).cast("long").as("__x")): _*)
    val prior = base.select((keyCols.map(col) :+
      (col("__d") + period).as("__d") :+ col("__x").as("__f")): _*)
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    base.join(prior, keyCols :+ "__d")
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_scored"),
           sum(abs(col("__x") - col("__f"))).as("__sae"),
           sum(col("__x") - col("__f")).as("__sbias"))
      .withColumn("mae_milli", expr("(1000L * __sae) div n_scored"))
      .withColumn("bias_milli",
        expr(strunc("1000L * __sbias", "n_scored")))
      .select((keyCols.map(col) ++ Seq(col("n_scored"), col("mae_milli"),
        col("bias_milli"))): _*)
  }

  /** CUPED variance reduction (C86, Deng et al. 2013 — the standard
    * pre-experiment-covariate adjustment): per unit, a pre-period
    * covariate `x` predicts the experiment metric `y`; subtracting
    * `θ·(x − x̄)` with `θ = cov(x,y)/var(x)` removes the covariate's
    * share of the variance, shrinking confidence intervals without
    * touching the treatment effect (the covariate predates
    * assignment). Completes the experimentation family: [[srmCheck]]
    * gates the assignment, [[abTest]] reads significance, this makes
    * the metric testable at smaller n.
    *
    * Exact-integer discipline: pooled moments clear the rational
    * means (`Sxy = n·Σxy − Σx·Σy`, `Sxx`, `Syy` likewise — all
    * longs), `theta_permyriad = sign-trunc(10⁴·Sxy / Sxx)`, and the
    * variance-reduction readout is the QUANTIZED composition
    * `rho2_permyriad = trunc(10²·Sxy/Sxx) · trunc(10²·Sxy/Syy)` (≥ 0:
    * both factors carry Sxy's sign) — a documented estimator, not the
    * unquantized ρ², so no Sxy² ever forms. Per-variant adjusted mean
    * applies the already-quantized θ: `adj = mean_y_milli −
    * sign-trunc(θ_pm·(n·Σx_v − n_v·Σx)·1000 / (10⁴·n_v·n))`. All
    * divisions are sign-explicit truncate-toward-zero, identical both
    * engines. Magnitude contract: `10⁴·|Sxy|` and `θ_pm·n·Σx_v·1000`
    * must fit a long — counts or pre-scaled metrics, like [[acfLags]].
    *
    * Scale shape: one unit-grain aggregation upstream of the caller,
    * then ONE global moment row (map-side combined) broadcast back
    * over a variant-sized frame — nothing unit-sized shuffles twice.
    * Units with zero covariate variance pool-wide (Sxx or Syy = 0)
    * make adjustment meaningless: the result is empty by contract.
    */
  def cupedAdjust(units: DataFrame, variantCol: String, preCol: String,
                  postCol: String): DataFrame = {
    val base = units.select(col(variantCol).cast("long").as("variant"),
      col(preCol).cast("long").as("__x"),
      col(postCol).cast("long").as("__y"))
    val pooled = base.agg(
      count(lit(1)).as("__n"), sum("__x").as("__sx"), sum("__y").as("__sy"),
      sum(expr("__x * __x")).as("__sxx_r"),
      sum(expr("__y * __y")).as("__syy_r"),
      sum(expr("__x * __y")).as("__sxy_r"))
      .withColumn("__sxx", expr("__n * __sxx_r - __sx * __sx"))
      .withColumn("__syy", expr("__n * __syy_r - __sy * __sy"))
      .withColumn("__sxy", expr("__n * __sxy_r - __sx * __sy"))
      .filter(col("__sxx") > 0 && col("__syy") > 0)
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    val perVariant = base.groupBy("variant").agg(
      count(lit(1)).as("n_units"),
      sum("__x").as("__sxv"), sum("__y").as("__syv"))
    perVariant.crossJoin(broadcast(pooled))
      .withColumn("theta_permyriad",
        expr(strunc("10000L * __sxy", "__sxx")))
      .withColumn("rho2_permyriad",
        expr(strunc("100L * __sxy", "__sxx")) *
          expr(strunc("100L * __sxy", "__syy")))
      .withColumn("mean_post_milli",
        expr(strunc("1000L * __syv", "n_units")))
      .withColumn("adj_mean_post_milli",
        col("mean_post_milli") - expr(strunc(
          "theta_permyriad * (__n * __sxv - n_units * __sx) * 1000L",
          "10000L * n_units * __n")))
      .select(col("variant"), col("n_units"), col("mean_post_milli"),
        col("adj_mean_post_milli"), col("theta_permyriad"),
        col("rho2_permyriad"))
  }

  /** Day-of-week seasonality index (C76) — the calendar-shape
    * companion of [[ewmaSmooth]]/[[cusumChangepoints]]: per key and
    * weekday, how that weekday's mean daily volume compares to the
    * key's overall mean, in integer permille (1000 = a flat week).
    * Exact integer cross-ratio — `(dow_total · n_days · 1000) div
    * (total · dow_days)` — so no floating mean ever materializes;
    * truncating division on non-negative operands.
    *
    * Scale shape: one daily-grain aggregation (map-side combined),
    * one (key, dow) aggregation over the calendar-sized daily frame,
    * one key-level total broadcast back. Weekday numbering is epoch
    * `day mod 7` (day 0 = Thursday) — a pure function of the day
    * integer, engine-identical with no timezone/locale surface.
    */
  def seasonalityDow(daily: DataFrame, keyCols: Seq[String],
                     dayCol: String, valueCol: String): DataFrame = {
    val byDow = daily
      .select((keyCols.map(col) :+ (col(dayCol) % 7).cast("long").as("dow") :+
        col(valueCol).cast("long").as("__x")): _*)
      .groupBy((keyCols.map(col) :+ col("dow")): _*)
      .agg(count(lit(1)).as("dow_days"), sum("__x").as("dow_total"))
    val totals = daily
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_days"),
           sum(col(valueCol).cast("long")).as("total"))
    byDow.join(broadcast(totals), keyCols)
      .filter(col("total") > 0)
      .withColumn("index_permille",
        expr("dow_total * n_days * 1000L div (total * dow_days)"))
      .select((keyCols.map(col) ++ Seq(col("dow"), col("dow_days"),
        col("dow_total"), col("index_permille"))): _*)
  }

  /** Per-key autocorrelation function (C85) — sample ACF at lags
    * 1..`maxLag` over each key's daily series: THE seasonality/
    * persistence detector under [[seasonalityDow]] (which assumes the
    * period is 7; ACF finds the period) and the memory diagnostic
    * behind anomaly thresholds. `r_h = Σ(x_t−x̄)(x_{t+h}−x̄) / Σ(x_t−x̄)²`
    * — computed in exact integers by clearing the rational mean:
    * centered values ride as `c_t = n·x_t − T` (so `r_h = Σ c_t·c_{t+h}
    * div Σ c_t²` exactly), and the permille applies truncate-toward-
    * zero division to |num| with the sign re-attached, a form both
    * engines agree on for negative correlations. Lag pairs are
    * OBSERVED days (d, d+h) — a missing day simply contributes no
    * pair; the denominator sums over all observed days (the standard
    * biased estimator). Magnitude contract: `1000·Σc²` must fit a
    * long — fine for daily counts (|c| ≤ n·max(x)); pre-scale values
    * if n·max(x) exceeds ~3e6.
    *
    * Scale shape: one daily-grain aggregation upstream, one key-sized
    * totals broadcast back, then the lag self-join on (key, day) —
    * co-partitioned equi-join of calendar-sized frames (maxLag rows
    * per observed day on the probe side), and two key-grain
    * aggregations. Nothing event-sized shuffles twice, no windows.
    */
  def acfLags(daily: DataFrame, keyCols: Seq[String], dayCol: String,
              valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val base = daily.select((keyCols.map(col) :+
      col(dayCol).cast("long").as("__d") :+
      col(valueCol).cast("long").as("__x")): _*)
    val totals = base.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum("__x").as("__T"))
    val centered = base.join(broadcast(totals), keyCols)
      .withColumn("__c", expr("__n * __x - __T"))
      .select((keyCols.map(col) :+ col("__d") :+ col("__c")): _*)
    val den = centered.groupBy(keyCols.map(col): _*)
      .agg(sum(expr("__c * __c")).as("__den"))
      .filter(col("__den") > 0)
    val probe = centered
      .withColumn("lag", explode(expr(s"sequence(1L, ${maxLag}L)")))
      .withColumn("__d2", col("__d") + col("lag"))
      .select((keyCols.map(col) :+ col("lag") :+ col("__d2") :+
        col("__c").as("__cl")): _*)
    val build = centered.select((keyCols.map(col) :+
      col("__d").as("__d2") :+ col("__c").as("__cr")): _*)
    probe.join(build, keyCols :+ "__d2")
      .groupBy((keyCols.map(col) :+ col("lag")): _*)
      .agg(count(lit(1)).as("n_pairs"),
           sum(expr("__cl * __cr")).as("__num"))
      .join(broadcast(den), keyCols)
      .withColumn("acf_permille",
        expr("""CASE WHEN __num < 0
                  THEN -((-__num) * 1000L div __den)
                  ELSE (__num * 1000L) div __den END"""))
      .select((keyCols.map(col) ++ Seq(col("lag"), col("n_pairs"),
        col("acf_permille"))): _*)
  }

  /** Per-key CUSUM drift detection (C75) — the sustained-shift
    * complement of [[anomalyZscore]] (point outliers) and
    * [[ewmaSmooth]] (trend): the classic one-sided pair
    * `s⁺_i = max(0, s⁺_{i−1} + (x_i − μ − slack))` /
    * `s⁻_i = max(0, s⁻_{i−1} + (μ − x_i − slack))` accumulates only
    * CONSISTENT drift above/below the reference mean — a single spike
    * resets, a level shift integrates until the threshold trips.
    *
    * Exact integer arithmetic throughout: values ride in millis, the
    * reference mean is the first `refDays` observed days' truncating
    * integer mean (a causal reference window, not a peek at the whole
    * series), and both recurrences are max/add on longs — the
    * trajectory is engine-exact and the oracle unrolls it as a
    * recursive CTE. Same scale shape as [[ewmaSmooth]]: sequential by
    * nature, so the fold runs over each key's COLLECTED calendar-sized
    * daily series; events aggregate to daily grain first.
    */
  def cusumChangepoints(daily: DataFrame, keyCols: Seq[String],
                        dayCol: String, valueCol: String, refDays: Int,
                        slackMilli: Long, thresholdMilli: Long): DataFrame = {
    require(refDays >= 1, s"refDays must be >= 1, got $refDays")
    val sorted = daily.groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(
        col(dayCol).cast("long").as("day"),
        col(valueCol).cast("long").as("x")))).as("__s"))
      .withColumn("__mu", expr(
        s"""aggregate(slice(__s, 1, $refDays), 0L, (a, e) -> a + e.x)
            * 1000L div least(size(__s), $refDays)"""))
    val folded = sorted.withColumn("__c", expr(s"""aggregate(__s,
      struct(CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sn,
             CAST(array() AS ARRAY<STRUCT<day: BIGINT, x: BIGINT,
                                          sp: BIGINT, sn: BIGINT>>) AS out),
      (acc, el) -> struct(
        greatest(0L, acc.sp + el.x * 1000L - __mu - ${slackMilli}L) AS sp,
        greatest(0L, acc.sn + __mu - el.x * 1000L - ${slackMilli}L) AS sn,
        array_append(acc.out, struct(el.day AS day, el.x AS x,
          greatest(0L, acc.sp + el.x * 1000L - __mu - ${slackMilli}L) AS sp,
          greatest(0L, acc.sn + __mu - el.x * 1000L - ${slackMilli}L) AS sn))
          AS out))"""))
    folded.select((keyCols.map(col) ++ Seq(col("__mu").as("mu_milli"),
        explode(col("__c.out")).as("__r"))): _*)
      .select((keyCols.map(col) ++ Seq(
        col("__r.day").as("day"), col("__r.x").as("x"),
        col("mu_milli"),
        col("__r.sp").as("cusum_up_milli"),
        col("__r.sn").as("cusum_down_milli"),
        (col("__r.sp") > thresholdMilli).as("shift_up"),
        (col("__r.sn") > thresholdMilli).as("shift_down"))): _*)
  }

  def ewmaSmooth(daily: DataFrame, keyCols: Seq[String], dayCol: String,
                 valueCol: String, alphaPermille: Long): DataFrame = {
    require(alphaPermille >= 0 && alphaPermille <= 1000,
      s"alphaPermille must be in [0,1000], got $alphaPermille")
    val a = alphaPermille
    val sorted = daily.groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(
        col(dayCol).cast("long").as("day"),
        col(valueCol).cast("long").as("x")))).as("__s"))
    val folded = sorted.withColumn("__e",
      expr(s"""aggregate(__s,
        CAST(array() AS ARRAY<STRUCT<day: BIGINT, ewma_milli: BIGINT>>),
        (acc, el) -> array_append(acc, struct(el.day AS day,
          CASE WHEN size(acc) = 0 THEN el.x * 1000L
               ELSE ($a * el.x * 1000L +
                     ${1000 - a} * element_at(acc, -1).ewma_milli) div 1000L
          END AS ewma_milli)))"""))
    folded.select((keyCols.map(col) :+ explode(col("__e")).as("__r")): _*)
      .select((keyCols.map(col) ++ Seq(col("__r.day").as("day"),
        col("__r.ewma_milli").as("ewma_milli"))): _*)
  }

  /** Holt double exponential smoothing (C101 — the trend-aware member
    * of the smoothing family: [[ewmaSmooth]] tracks level only and
    * lags any trending series by design; Holt carries level AND trend
    * state so the one-step forecast `level + trend` stays on a ramp —
    * the standard next rung before full Holt-Winters). Exact integer
    * recurrences in milli units with α, β as permilles:
    * `l_t = strunc(α·x_t·1000 + (1000−α)·(l_{t−1}+b_{t−1}), 1000)`,
    * `b_t = strunc(β·(l_t−l_{t−1}) + (1000−β)·b_{t−1}, 1000)` —
    * trend is legitimately negative on declining series, so every
    * division is sign-explicit (engine-identical under DuckDB's
    * flooring `//`); init `l_1 = x_1·1000, b_1 = 0` (stated).
    * `forecast_milli = l_t + b_t` (the one-step-ahead prediction made
    * AT t) rides along.
    *
    * Scale shape: the [[ewmaSmooth]] contract — one key-partitioned
    * aggregation collects each key's day-grain series (calendar-
    * bounded domain), the recurrence rides the HOF fold. No windows.
    */
  def holtSmooth(daily: DataFrame, keyCols: Seq[String], dayCol: String,
                 valueCol: String, alphaPermille: Long,
                 betaPermille: Long): DataFrame = {
    require(alphaPermille >= 0 && alphaPermille <= 1000,
      s"alphaPermille must be in [0,1000], got $alphaPermille")
    require(betaPermille >= 0 && betaPermille <= 1000,
      s"betaPermille must be in [0,1000], got $betaPermille")
    val a = alphaPermille; val b = betaPermille
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    // the new level, phrased over the fold accumulator — referenced
    // twice below (a struct field cannot see its sibling), duplicated
    // identically in the oracle
    val lvl = strunc(
      s"$a * el.x * 1000L + ${1000 - a} * (element_at(acc, -1).level_milli"
        + " + element_at(acc, -1).trend_milli)", "1000L")
    val sorted = daily.groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(
        col(dayCol).cast("long").as("day"),
        col(valueCol).cast("long").as("x")))).as("__s"))
    val folded = sorted.withColumn("__e",
      expr(s"""aggregate(__s,
        CAST(array() AS ARRAY<STRUCT<day: BIGINT, level_milli: BIGINT,
          trend_milli: BIGINT>>),
        (acc, el) -> array_append(acc, CASE WHEN size(acc) = 0
          THEN struct(el.day AS day, el.x * 1000L AS level_milli,
                      CAST(0 AS BIGINT) AS trend_milli)
          ELSE struct(el.day AS day, ($lvl) AS level_milli,
            (${strunc(
              s"$b * (($lvl) - element_at(acc, -1).level_milli) + " +
                s"${1000 - b} * element_at(acc, -1).trend_milli",
              "1000L")}) AS trend_milli)
          END))"""))
    folded.select((keyCols.map(col) :+ explode(col("__e")).as("__r")): _*)
      .select((keyCols.map(col) ++ Seq(col("__r.day").as("day"),
        col("__r.level_milli").as("level_milli"),
        col("__r.trend_milli").as("trend_milli"),
        (col("__r.level_milli") + col("__r.trend_milli"))
          .as("forecast_milli"))): _*)
  }

  /** B-cubed cluster-vs-truth evaluation (E88 — the clustering-quality
    * number for the dedup family: [[near_dup_eval]] scores PAIR
    * retrieval, this scores the final PARTITION against labeled truth
    * — per element, what fraction of its cluster shares its class
    * (precision) and what fraction of its class shares its cluster
    * (recall), averaged; the standard entity-resolution/dedup metric
    * because, unlike pair-F1, singletons and giant clusters are
    * weighted by the elements they actually contain). Per-element
    * ratios are quantized on the micro device — `q(a,b) = (10⁶·a) div
    * b` per (cluster,class) CELL (every element in a cell shares both
    * ratios, so the per-element average is the cell-weighted average —
    * exact), then `b3_*_micro = sign-free div by N`;
    * `b3_f1_micro = (2·P·R) div (P+R)` from the stated quantized P, R.
    * DECIMAL(38,0) cross-products throughout.
    *
    * Scale shape: ONE (cluster, class) cell aggregation over the
    * labeled frame; cluster/class sizes and the final sums run on the
    * cell-sized frame (broadcast joins). Nothing corpus-sized sorts.
    */
  def clusterEval(df: DataFrame, clusterCol: String,
                  truthCol: String): DataFrame = {
    val cells = df.groupBy(col(clusterCol).cast("string").as("__c"),
        col(truthCol).cast("string").as("__t"))
      .agg(count(lit(1)).as("__n"))
    val cs = cells.groupBy("__c").agg(sum("__n").as("__nc"))
    val ts = cells.groupBy("__t").agg(sum("__n").as("__nt"))
    cells.join(broadcast(cs), Seq("__c")).join(broadcast(ts), Seq("__t"))
      .agg(sum("__n").as("n"),
        sum(expr("""CAST(__n AS DECIMAL(38,0))
          * ((1000000 * CAST(__n AS DECIMAL(38,0))) div __nc)"""))
          .as("__sp"),
        sum(expr("""CAST(__n AS DECIMAL(38,0))
          * ((1000000 * CAST(__n AS DECIMAL(38,0))) div __nt)"""))
          .as("__sr"))
      .select(col("n"),
        expr("CAST(__sp div n AS BIGINT)").as("b3_precision_micro"),
        expr("CAST(__sr div n AS BIGINT)").as("b3_recall_micro"),
        expr("""CASE WHEN (__sp div n) + (__sr div n) > 0 THEN
          CAST((2 * (__sp div n) * (__sr div n))
            div ((__sp div n) + (__sr div n)) AS BIGINT) END""")
          .as("b3_f1_micro"))
  }

  /** Market-basket association rules (C95 — the recommender /
    * assortment classic: "baskets with A also hold B"): for every
    * co-occurring item pair at support ≥ `minSupport`, BOTH directed
    * rules with `confidence_permille = 1000·n_both div n_ant` and
    * `lift_micro = (10⁶·n_both·n_baskets) div (n_ant·n_cons)`
    * (DECIMAL(38,0) products — lift > 10⁶ means A lifts B above its
    * base rate). Exact integers throughout.
    *
    * Scale shape: baskets dedupe in one (basket,item)-keyed shuffle;
    * pair generation is a basket-keyed self-join under `itemA <
    * itemB` — Σ C(|basket|,2) pairs, bounded because `maxBasketSize`
    * DROPS degenerate everything-baskets up front (a basket holding
    * the whole catalog generates quadratic pairs and zero signal —
    * same honesty contract as jaccard_neighbors' hub cap; the default
    * is a no-op at driver SFs). Item counts and the basket total are
    * item-sized / 1-row broadcasts; the pair frame is ≤|vocabulary|²
    * rows regardless of corpus size.
    */
  def basketRules(items: DataFrame, basketCol: String, itemCol: String,
                  minSupport: Long, maxBasketSize: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 2,
      s"maxBasketSize must be >= 2, got $maxBasketSize")
    val b0 = items.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
    val kept = b0.groupBy("__bk").agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize).select("__bk")
    val b = b0.join(kept, "__bk")
    val total = b.agg(countDistinct("__bk").as("__nb"))
    val itemCounts = b.groupBy(col("__it")).agg(count(lit(1)).as("__ni"))
    val pairs = b.as("x").join(b.as("y"),
        col("x.__bk") === col("y.__bk") && col("x.__it") < col("y.__it"))
      .groupBy(col("x.__it").as("__a"), col("y.__it").as("__b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    val directed = pairs.select(col("__a").as("antecedent"),
        col("__b").as("consequent"), col("n_both"))
      .unionAll(pairs.select(col("__b").as("antecedent"),
        col("__a").as("consequent"), col("n_both")))
    directed
      .join(broadcast(itemCounts).withColumnRenamed("__it", "antecedent")
        .withColumnRenamed("__ni", "n_ant"), "antecedent")
      .join(broadcast(itemCounts).withColumnRenamed("__it", "consequent")
        .withColumnRenamed("__ni", "n_cons"), "consequent")
      .crossJoin(broadcast(total))
      .select(col("antecedent"), col("consequent"), col("n_both"),
        col("n_ant"), col("n_cons"),
        expr("(1000 * n_both) div n_ant").as("confidence_permille"),
        expr("""CAST((1000000 * CAST(n_both AS DECIMAL(38,0)) * __nb)
                div (CAST(n_ant AS DECIMAL(38,0)) * n_cons) AS BIGINT)""")
          .as("lift_micro"))
  }

  /** Frequent sequential patterns (C97 — the "A then later B"
    * complement of [[basketRules]]' same-basket co-occurrence and
    * [[eventTransitions]]' CONSECUTIVE pairs): for every ordered type
    * pair, the number of users with SOME occurrence of `first_type`
    * strictly before SOME occurrence of `then_type` (the classic
    * 2-sequence support of GSP/PrefixSpan, which no adjacency or
    * session boundary can hide), pruned at `minSupport`, with
    * `support_permille` of the active-user base. Equal-timestamp
    * occurrences do NOT order (strict `<` — stated, engine-stable).
    *
    * The device that keeps it linear: "exists a < b" over full
    * histories collapses to `first_ts(A) < last_ts(B)` — so ONE
    * (user,type)-keyed min/max aggregation reduces each user to a
    * ≤|types|-row frame, the pair self-join runs user-keyed on that
    * compact frame (≤|types|² rows per user), and the support count
    * combines map-side. The event table shuffles once; nothing
    * corpus-sized ever pairs.
    */
  def sequentialPatterns(events: DataFrame, userCol: String,
                         tsUsCol: String, typeCol: String,
                         minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val ut = events.groupBy(col(userCol).as("__u"), col(typeCol).as("__t"))
      .agg(min(col(tsUsCol).cast("long")).as("__f"),
           max(col(tsUsCol).cast("long")).as("__l"))
    val total = ut.agg(countDistinct("__u").as("__nu"))
    ut.as("a").join(ut.as("b"),
        col("a.__u") === col("b.__u") &&
        col("a.__t") =!= col("b.__t") && col("a.__f") < col("b.__l"))
      .groupBy(col("a.__t").as("first_type"), col("b.__t").as("then_type"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .crossJoin(broadcast(total))
      .select(col("first_type"), col("then_type"), col("support"),
        expr("(1000 * support) div __nu").as("support_permille"))
  }

  /** Pairwise Pearson correlation matrix (C96 — the data-profiling /
    * feature-selection primitive): for every column pair, the sign
    * and the QUANTIZED squared correlation
    * `corr2_permyriad = trunc(100·Sxy div Sxx) · trunc(100·Sxy div
    * Syy)` over exact centered integer moments `Sxy = n·Σxy − Σx·Σy`
    * — the [[cupedAdjust]] ρ² device: no Sxy² ever forms (which would
    * overflow DECIMAL(38,0) at corpus scale) and no float sqrt
    * appears, so the number is bit-identical cross-engine. Zero
    * variance on either side → sign and corr² read null.
    *
    * Scale shape: ONE aggregation over the fact scan computes every
    * sum/square/cross-product moment (map-side combined, DECIMAL
    * (38,0) accumulators — headroom contract: |value| ≤ 10⁷ integer
    * units at ≤ 10¹⁰ rows keeps n·Σx² under 10³⁸); the pair unpivot
    * and ratio arithmetic run on the single moment row.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "duplicate columns")
    def d38(e: String) = s"CAST($e AS DECIMAL(38,0))"
    val base = df.select(cols.map(c => col(c).cast("long").as(c)): _*)
    val moments =
      Seq(count(lit(1)).cast("decimal(38,0)").as("__n")) ++
      cols.map(c => sum(expr(d38(c))).as(s"__s_$c")) ++
      cols.map(c => sum(expr(s"${d38(c)} * $c")).as(s"__ss_$c")) ++
      cols.combinations(2).map { case Seq(a, b) =>
        sum(expr(s"${d38(a)} * $b")).as(s"__sp_${a}_$b") }.toSeq
    val m = base.agg(moments.head, moments.tail: _*)
    val pairs = cols.combinations(2).toSeq
    val stackArgs = pairs.map { case Seq(a, b) =>
      s"'$a', '$b', __s_$a, __s_$b, __ss_$a, __ss_$b, __sp_${a}_$b"
    }.mkString(", ")
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    m.select(col("__n"), expr(s"""stack(${pairs.size}, $stackArgs)
        AS (col_a, col_b, __sa, __sb, __ssa, __ssb, __sab)"""))
      .withColumn("__sxx", expr("__n * __ssa - __sa * __sa"))
      .withColumn("__syy", expr("__n * __ssb - __sb * __sb"))
      .withColumn("__sxy", expr("__n * __sab - __sa * __sb"))
      .select(col("col_a"), col("col_b"), col("__n").cast("long").as("n"),
        expr("""CASE WHEN __sxx > 0 AND __syy > 0 THEN
                  CAST(sign(__sxy) AS BIGINT) END""").as("corr_sign"),
        expr(s"""CASE WHEN __sxx > 0 AND __syy > 0 THEN
                  CAST((${strunc("100 * __sxy", "__sxx")}) *
                       (${strunc("100 * __sxy", "__syy")}) AS BIGINT)
                END""").as("corr2_permyriad"))
  }

  /** Per-class classification report (E84 — the confusion-matrix view
    * completing the eval family: [[calibrationBins]] says what scores
    * MEAN, [[aucScore]] whether they ORDER, [[liftCurve]] what acting
    * on the top-k EARNS — this says where a HARD classifier actually
    * errs, class by class): for every class observed as truth or
    * prediction, `tp / fp / fn / support / pred_n` plus exact-integer
    * `precision_permille = (1000·tp) div pred_n` (null when never
    * predicted), `recall_permille = (1000·tp) div support` (null when
    * no true rows), and `f1_permille = (2000·tp) div (2·tp + fp + fn)`
    * — the harmonic mean computed WITHOUT forming precision/recall, so
    * no nested truncation. A final `__macro__` row carries the summed
    * counts (its recall is micro-accuracy) and the unweighted means of
    * the per-class permilles (absent sides as 0 — the sklearn
    * zero-division convention), `div`-truncated over the class count.
    *
    * Scale shape: ONE (truth, pred) cell aggregation (map-side
    * combined, ≤|classes|² rows); everything downstream — marginals,
    * the full-outer class union, the macro fold — runs on the
    * cell-sized frame. The corpus is scanned once, never sorted.
    */
  def classificationReport(df: DataFrame, truthCol: String,
                           predCol: String): DataFrame = {
    val cells = df.groupBy(col(truthCol).cast("string").as("__t"),
        col(predCol).cast("string").as("__p"))
      .agg(count(lit(1)).as("__n"))
    val byTruth = cells.groupBy(col("__t").as("cls"))
      .agg(sum("__n").as("support"),
           sum(when(col("__p") === col("__t"), col("__n"))
             .otherwise(0L)).as("tp"))
    val byPred = cells.groupBy(col("__p").as("cls"))
      .agg(sum("__n").as("pred_n"))
    val per = byTruth.join(byPred, Seq("cls"), "full")
      .na.fill(0L, Seq("support", "tp", "pred_n"))
      .withColumn("fp", col("pred_n") - col("tp"))
      .withColumn("fn", col("support") - col("tp"))
      .withColumn("precision_permille",
        expr("CASE WHEN pred_n > 0 THEN (1000 * tp) div pred_n END"))
      .withColumn("recall_permille",
        expr("CASE WHEN support > 0 THEN (1000 * tp) div support END"))
      .withColumn("f1_permille",
        expr("(2000 * tp) div (2 * tp + fp + fn)"))
    val macroRow = per.agg(
        count(lit(1)).as("__k"), sum("support").as("support"),
        sum("tp").as("tp"), sum("pred_n").as("pred_n"),
        sum("fp").as("fp"), sum("fn").as("fn"),
        sum(coalesce(col("precision_permille"), lit(0L))).as("__sp"),
        sum(coalesce(col("recall_permille"), lit(0L))).as("__sr"),
        sum(coalesce(col("f1_permille"), lit(0L))).as("__sf"))
      .select(lit("__macro__").as("cls"), col("support"), col("tp"),
        col("pred_n"), col("fp"), col("fn"),
        expr("__sp div __k").as("precision_permille"),
        expr("__sr div __k").as("recall_permille"),
        expr("__sf div __k").as("f1_permille"))
    per.select(col("cls"), col("support"), col("tp"), col("pred_n"),
        col("fp"), col("fn"), col("precision_permille"),
        col("recall_permille"), col("f1_permille"))
      .unionByName(macroRow)
  }

  /** Cohen's kappa (E85 — the inter-annotator agreement number every
    * labeling pipeline gates on before its labels are trusted:
    * raw agreement corrected for the agreement two raters would reach
    * BY CHANCE from their marginal label rates — two raters who both
    * answer 'en' 90% of the time agree 81% by luck alone): per
    * stratum, `kappa = (p_o − p_e) / (1 − p_e)` computed exactly in
    * integers as `kappa_permille = sign-trunc(1000·(N·agree − P),
    * N² − P)` with `P = Σ_label rowA_label·colB_label` in
    * DECIMAL(38,0) — kappa is legitimately NEGATIVE when raters agree
    * less than chance, so truncation is sign-explicit
    * (engine-identical under DuckDB's flooring `//`). Degenerate
    * `N² = P` (marginals fully concentrated) reads null; raw
    * `agree_permille` rides along.
    *
    * Scale shape: ONE (stratum, labelA, labelB) cell aggregation
    * (map-side combined); marginals, the chance-product join, and the
    * kappa arithmetic all run on the cell-sized frame joined
    * stratum+label-keyed. The corpus is scanned once.
    */
  def cohensKappa(df: DataFrame, stratumCol: String, raterACol: String,
                  raterBCol: String): DataFrame = {
    val cells = df.groupBy(col(stratumCol).as("stratum"),
        col(raterACol).cast("string").as("__a"),
        col(raterBCol).cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
    val ra = cells.groupBy(col("stratum"), col("__a").as("__lbl"))
      .agg(sum("__n").as("__na"))
    val rb = cells.groupBy(col("stratum"), col("__b").as("__lbl"))
      .agg(sum("__n").as("__nb"))
    val pe = ra.join(rb, Seq("stratum", "__lbl"))
      .groupBy("stratum")
      .agg(sum(expr("CAST(__na AS DECIMAL(38,0)) * __nb")).as("__pe"))
    val po = cells.groupBy("stratum")
      .agg(sum("__n").as("n"),
           sum(when(col("__a") === col("__b"), col("__n"))
             .otherwise(0L)).as("__agree"))
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    // left join: a stratum whose raters share NO label has P = 0 (the
    // chance product sums over shared labels only) — it must still
    // report, with kappa = 1000·agree/N (= 0, agreement is impossible)
    po.join(pe, Seq("stratum"), "left")
      .withColumn("__pe",
        coalesce(col("__pe"), lit(0L).cast("decimal(38,0)")))
      .select(col("stratum"), col("n"),
        expr("(1000 * __agree) div n").as("agree_permille"),
        expr(s"""CASE WHEN CAST(n AS DECIMAL(38,0)) * n > __pe THEN
                  CAST(${strunc(
                    "1000 * (CAST(n AS DECIMAL(38,0)) * __agree - __pe)",
                    "CAST(n AS DECIMAL(38,0)) * n - __pe")} AS BIGINT)
                END""").as("kappa_permille"))
  }

  /** Mutual information between a categorical feature and a label
    * (E86 — the feature-selection companion of [[corrMatrix]] for
    * CATEGORICAL columns, where Pearson is meaningless: how many nats
    * does knowing the feature tell you about the label?). Plugin MI
    * over observed cells, quantized on the repo's micro-nat device:
    * `mi_micronat = sign-trunc(Σ_cells c·round(ln(c·N/(c_x·c_y))·10⁶),
    * N)` — each cell's log-ratio forms from exact integer counts both
    * engines hold, so the one rounded log is engine-identical (the
    * psi_drift discipline); the quantized sum can dip epsilon-negative
    * near independence, hence sign-explicit truncation. Marginal
    * entropies `h_feature_micronat` / `h_label_micronat` ride along
    * (same device), so normalized MI is one division away.
    *
    * Scale shape: ONE (feature, label) cell aggregation; marginals
    * and the MI sum run on the cell-sized frame (broadcast 1-row
    * total). The corpus is scanned once, never sorted.
    */
  def featureMi(df: DataFrame, featureCol: String,
                labelCol: String): DataFrame = {
    val cells = df.groupBy(col(featureCol).cast("string").as("__x"),
        col(labelCol).cast("string").as("__y"))
      .agg(count(lit(1)).as("__n"))
    val mx = cells.groupBy("__x").agg(sum("__n").as("__nx"))
    val my = cells.groupBy("__y").agg(sum("__n").as("__ny"))
    val tot = cells.agg(sum("__n").as("__t"))
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    def hTerm(cnt: String) =
      s"""sum($cnt * CAST(round(ln(CAST($cnt AS DOUBLE) / __t) * 1e6)
            AS BIGINT))"""
    val h = mx.crossJoin(broadcast(tot))
      .agg(expr(s"${hTerm("__nx")}").as("__hx"), max("__t").as("__t"))
      .crossJoin(broadcast(my.crossJoin(broadcast(tot))
        .agg(expr(s"${hTerm("__ny")}").as("__hy"))))
    cells.join(broadcast(mx), Seq("__x")).join(broadcast(my), Seq("__y"))
      .crossJoin(broadcast(tot))
      .agg(sum(expr("""__n * CAST(round(ln(CAST(__n AS DOUBLE) * __t
            / (CAST(__nx AS DOUBLE) * __ny)) * 1e6) AS BIGINT)"""))
        .as("__mi"), count(lit(1)).as("n_cells"))
      .crossJoin(broadcast(h))
      .select(col("__t").as("n"), col("n_cells"),
        expr(s"CAST(${strunc("__mi", "__t")} AS BIGINT)")
          .as("mi_micronat"),
        expr(s"CAST(-(${strunc("__hx", "__t")}) AS BIGINT)")
          .as("h_feature_micronat"),
        expr(s"CAST(-(${strunc("__hy", "__t")}) AS BIGINT)")
          .as("h_label_micronat"))
  }

  /** Conversion-lag quartiles (C108 — the funnel TIMING view the
    * counting funnels (event_funnel, window_funnel) cannot answer:
    * not "how many users who viewed later purchased" but "how LONG
    * did it take" — the payback/activation-latency number): per
    * non-conversion event type, over users whose FIRST occurrence of
    * that type strictly precedes their FIRST conversion, the lag in
    * whole days — count and exact type-1 quartiles via the
    * distribution rule (`min(v where 4·cum ≥ n)` etc. — the
    * clip_outliers device, both engines share the convention).
    *
    * Scale shape: one (user, type) min aggregation + one user-keyed
    * conversion attach (same exchange), one (type, lag) distribution
    * aggregation with per-type distribution windows (bounded day
    * domain — the corpus never sorts).
    */
  def conversionLag(events: DataFrame, userCol: String, tsUsCol: String,
                    typeCol: String, convType: String): DataFrame = {
    val ev = events.select(col(userCol).as("__u"),
      col(tsUsCol).cast("long").as("__ts"), col(typeCol).as("__t"))
    val firstByType = ev.groupBy("__u", "__t")
      .agg(min("__ts").as("__ft"))
    val conv = firstByType.filter(col("__t") === convType)
      .select(col("__u"), col("__ft").as("__ct"))
    val lags = firstByType.filter(col("__t") =!= convType)
      .join(conv, Seq("__u"))
      .filter(col("__ft") < col("__ct"))
      .select(col("__t").as("event_type"),
        expr(s"(__ct - __ft) div $DayUs").as("__lag"))
    val dist = lags.groupBy("event_type", "__lag")
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("event_type").orderBy("__lag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dist
      .withColumn("__cum", sum("__c").over(w))
      .withColumn("__n",
        sum("__c").over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max("__n").as("n_converted"),
        min(when(col("__cum") * 4 >= col("__n"), col("__lag")))
          .as("q1_days"),
        min(when(col("__cum") * 2 >= col("__n"), col("__lag")))
          .as("median_days"),
        min(when(col("__cum") * 4 >= col("__n") * 3, col("__lag")))
          .as("q3_days"))
  }

  /** Ranked-list evaluation (E89 — the retrieval/recommender metrics
    * completing the search family: bm25/rrf PRODUCE rankings, this
    * SCORES one against graded relevance — nDCG@k, MRR, precision@k,
    * the numbers every ranking experiment reports): per query over the
    * top-k rows, `dcg_micro = Σ gain·d(rank)` with the standard
    * `1/log2(rank+1)` discount quantized once per position —
    * `d(i) = round(10⁶·ln 2 / ln(i+1))`, an IEEE-deterministic double
    * of an integer both engines hold (the isotonic discipline) —
    * `idcg_micro` over the SAME gain multiset sorted descending
    * (position ties carry equal discounts, so any stable order sums
    * identically), `ndcg_permille = (1000·dcg) div idcg` (null when no
    * relevant), `rr_micro = 10⁶ div first_relevant_rank` (exact; null
    * when none), `precision_at_k_permille = (1000·hits) div k`. Ranks
    * are expected unique per query (caller owns the contract).
    *
    * Scale shape: one query-keyed aggregation collects each query's
    * ≤k-row list; every sweep (DCG, ideal DCG, first-hit) rides HOF
    * folds over that bounded array. No corpus sort, no windows here —
    * the RANKING itself comes from upstream (heap top-k or a
    * query-partitioned window, both bounded).
    */
  def rankingEval(df: DataFrame, queryCol: String, rankCol: String,
                  gainCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1,1000], got $k")
    val disc = "CAST(round(1e6 * ln(CAST(2 AS DOUBLE)) / " +
      "ln(CAST(%s + 1 AS DOUBLE))) AS BIGINT)"
    df.filter(col(rankCol).cast("long") <= k.toLong)
      .select(col(queryCol).as("query"),
        col(rankCol).cast("long").as("__r"),
        col(gainCol).cast("long").as("__g"))
      .groupBy("query")
      .agg(array_sort(collect_list(struct(col("__r"), col("__g"))))
        .as("__a"))
      .select(col("query"),
        expr("CAST(size(__a) AS BIGINT)").as("n_ranked"),
        expr(s"""aggregate(__a, CAST(0 AS BIGINT),
          (acc, el) -> acc + el.__g * ${disc.format("el.__r")})""")
          .as("dcg_micro"),
        expr(s"""aggregate(
          reverse(array_sort(transform(__a, el -> el.__g))),
          struct(CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS s),
          (acc, el) -> struct(acc.i + 1 AS i,
            acc.s + el * ${disc.format("acc.i + 1")} AS s)).s""")
          .as("idcg_micro"),
        expr("""aggregate(__a, CAST(NULL AS BIGINT),
          (acc, el) -> CASE WHEN acc IS NOT NULL THEN acc
                            WHEN el.__g > 0 THEN el.__r END)""")
          .as("__fr"),
        expr("aggregate(__a, CAST(0 AS BIGINT), (acc, el) -> " +
          "acc + CASE WHEN el.__g > 0 THEN 1L ELSE 0L END)").as("__h"))
      .select(col("query"), col("n_ranked"), col("dcg_micro"),
        col("idcg_micro"),
        expr("""CASE WHEN idcg_micro > 0 THEN
          (1000 * dcg_micro) div idcg_micro END""").as("ndcg_permille"),
        expr("CASE WHEN __fr IS NOT NULL THEN 1000000L div __fr END")
          .as("rr_micro"),
        expr(s"(1000 * __h) div ${k}L").as("precision_at_k_permille"))
  }

  /** Isotonic calibration (E87 — the standard calibration FITTER
    * completing [[calibrationBins]]' diagnosis: pool-adjacent-
    * violators regression fits the best monotone map score → rate,
    * the step function every production calibrator (Platt's rival)
    * actually ships). Computed through the exact minimax identity
    * `fit_j = max_{i≤j} min_{k≥j} avg(pos, i..k)` over `nBins`
    * equi-width permille bins — O(d³) on the ≤nBins bin frame, zero
    * corpus cost. Determinism: the block averages are IEEE binary64
    * divisions of exact integer prefix-sums both engines hold —
    * bit-identical cross-engine (IEEE 754 specifies the quotient), and
    * min/max over VALUES need no tie rule; one final
    * `round(fit·1000)` quantization. Output is monotone by
    * construction; `raw_rate_permille` rides along so the violation
    * the fit repaired is visible.
    *
    * Scale shape: ONE bin-keyed corpus aggregation (map-side
    * combined), then prefix sums and the whole minimax ride HOF folds
    * over the collected ≤nBins distribution. The corpus never sorts.
    */
  def isotonicCalibrate(df: DataFrame, scorePermilleCol: String,
                        labelCol: String, nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 64,
      s"nBins must be in [2,64], got $nBins")
    val perBin = df.groupBy(
        expr(s"(CAST($scorePermilleCol AS BIGINT) * $nBins) div 1001")
          .as("bin"))
      .agg(count(lit(1)).as("n"),
           sum(when(col(labelCol), 1L).otherwise(0L)).as("p"))
    perBin
      .agg(array_sort(collect_list(struct(col("bin"), col("n"),
        col("p")))).as("__a"))
      .withColumn("__cn", expr("""aggregate(__a,
        array(CAST(0 AS BIGINT)),
        (acc, el) -> array_append(acc, element_at(acc, -1) + el.n))"""))
      .withColumn("__cp", expr("""aggregate(__a,
        array(CAST(0 AS BIGINT)),
        (acc, el) -> array_append(acc, element_at(acc, -1) + el.p))"""))
      .select(explode(expr("""transform(sequence(1, size(__a)),
        j -> struct(
          element_at(__a, j).bin AS bin,
          element_at(__a, j).n AS n,
          element_at(__a, j).p AS p,
          array_max(transform(sequence(1, j), i ->
            array_min(transform(sequence(j, size(__a)), k ->
              CAST(element_at(__cp, k + 1) - element_at(__cp, i)
                AS DOUBLE)
              / CAST(element_at(__cn, k + 1) - element_at(__cn, i)
                AS DOUBLE))))) AS fit))""")).as("__r"))
      .select(col("__r.bin").as("bin"), col("__r.n").as("n"),
        col("__r.p").as("p"),
        expr("(1000 * __r.p) div __r.n").as("raw_rate_permille"),
        expr("CAST(round(__r.fit * 1000) AS BIGINT)")
          .as("calibrated_permille"))
  }

  /** Kaplan-Meier survival curve (C98 — THE churn/retention estimator
    * under right-censoring: entities still alive at observation end
    * are not failures, and dropping them (or counting them as deaths)
    * biases every lifetime number — KM is the standard answer). Input
    * is one row per entity: duration + whether the terminal event was
    * OBSERVED (false = censored at that duration). At each distinct
    * duration with ≥1 observed event: entities at risk, events,
    * same-time censorings (at-risk AT their duration — the standard
    * censored-after-events-at-t convention), and the survival estimate
    * `S(t) = Π_{t_i ≤ t} (1 − d_i/n_i)` carried in log space on the
    * micro-nat device — `ln_surv_micro = Σ round(ln((n_i−d_i)/n_i)·
    * 10⁶)` (exact integer sum after the per-step quantized log of a
    * ratio both engines form from exact integers — the psi_drift
    * discipline), with `surv_permille` re-materialized by one quantized
    * exp. Everyone dying at a step (d = n) reads ln null /
    * surv_permille 0 — S hits exact zero, and no rows can follow.
    *
    * Scale shape: one (stratum, duration) distribution aggregation
    * (map-side combined), then the entire at-risk/cumulative-hazard
    * sweep rides a HOF fold over the collected per-stratum
    * distribution (durations are integer day grains — bounded domain
    * contract). The entity frame is scanned once, never sorted, and
    * nothing corpus-sized reaches the driver.
    */
  def survivalCurve(df: DataFrame, stratumCol: String, durationCol: String,
                    eventCol: String): DataFrame = {
    val dist = df.groupBy(col(stratumCol).as("stratum"),
        col(durationCol).cast("long").as("__t"))
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("__ev"),
           sum(when(col(eventCol), 0L).otherwise(1L)).as("__cn"))
    dist.groupBy("stratum")
      .agg(array_sort(collect_list(struct(col("__t"), col("__ev"),
        col("__cn")))).as("__a"),
        sum(expr("__ev + __cn")).as("__n"))
      // fold 1: carry the at-risk count down the sorted duration axis,
      // emitting one row per event-bearing duration with its quantized
      // per-step log-survival term (null = S hits exact zero)
      .select(col("stratum"), expr("""aggregate(__a,
        struct(__n AS risk,
               CAST(array() AS ARRAY<STRUCT<t: BIGINT, n_risk: BIGINT,
                 n_event: BIGINT, n_censored: BIGINT,
                 term: BIGINT>>) AS out),
        (acc, el) -> struct(acc.risk - el.__ev - el.__cn AS risk,
          CASE WHEN el.__ev > 0 THEN array_append(acc.out, struct(
            el.__t AS t, acc.risk AS n_risk, el.__ev AS n_event,
            el.__cn AS n_censored,
            CASE WHEN el.__ev < acc.risk THEN
              CAST(round(ln(CAST(acc.risk - el.__ev AS DOUBLE)
                / CAST(acc.risk AS DOUBLE)) * 1e6) AS BIGINT)
            END AS term)) ELSE acc.out END AS out)).out""").as("__rows"))
      // fold 2: cumulative log-survival over the event-time rows
      .select(col("stratum"), explode(expr("""aggregate(__rows,
        struct(CAST(0 AS BIGINT) AS lns,
               CAST(array() AS ARRAY<STRUCT<t: BIGINT, n_risk: BIGINT,
                 n_event: BIGINT, n_censored: BIGINT,
                 ln_surv_micro: BIGINT, surv_permille: BIGINT>>) AS out),
        (acc, el) -> struct(acc.lns + coalesce(el.term, 0L) AS lns,
          array_append(acc.out, struct(el.t AS t, el.n_risk AS n_risk,
            el.n_event AS n_event, el.n_censored AS n_censored,
            CASE WHEN el.term IS NOT NULL THEN acc.lns + el.term
            END AS ln_surv_micro,
            CASE WHEN el.term IS NULL THEN CAST(0 AS BIGINT)
                 ELSE CAST(round(exp(CAST(acc.lns + el.term AS DOUBLE)
                   / 1e6) * 1000) AS BIGINT)
            END AS surv_permille)) AS out)).out""")).as("__r"))
      .select(col("stratum"), col("__r.t").as("t"),
        col("__r.n_risk").as("n_risk"), col("__r.n_event").as("n_event"),
        col("__r.n_censored").as("n_censored"),
        col("__r.ln_surv_micro").as("ln_surv_micro"),
        col("__r.surv_permille").as("surv_permille"))
  }

  /** Average precision / PR-AUC (E93 — [[aucScore]]'s class-imbalance
    * sibling: ROC-AUC saturates when negatives dominate — the usual
    * shape of quality-filter and retrieval labels — while the
    * precision-recall curve keeps discriminating; AP is its standard
    * one-number summary). Step-interpolated AP with ties grouped per
    * distinct score, EXACT under a stated quantization: descending
    * the score axis, each score block with `p_s > 0` positives
    * contributes `term = (10⁶·p_s·cumP) div (cumP+cumN)` (cum counts
    * INCLUSIVE of the block — the "precision at this threshold" of
    * the step curve), and `ap_micro = (Σ terms) div n_pos`. The floor
    * per threshold is the engine rule (both engines replay the same
    * integer ops), error ≤ 1 micro per distinct score. Zero positives
    * → ap_micro null.
    *
    * Same bounded-score-domain contract as [[aucScore]]: one
    * corpus-sized score-keyed aggregation, then the cumulative sweep
    * rides the HOF fold over the collected ≤|domain|-row distribution
    * — never a corpus ranking window. Products stay ≤ 10⁶·n² in
    * DECIMAL(38,0): exact to n ~ 10¹⁶ rows.
    */
  def prAuc(df: DataFrame, scorePermilleCol: String,
            labelCol: String): DataFrame = {
    val perScore = df.groupBy(col(scorePermilleCol).cast("long").as("__s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"),
           sum(when(col(labelCol), 0L).otherwise(1L)).as("__n"))
    perScore
      // sort key −s: ascending array_sort = descending score
      .agg(array_sort(collect_list(struct((-col("__s")).as("__ds"),
        col("__p"), col("__n")))).as("__a"))
      .select(expr("""aggregate(__a,
        struct(CAST(0 AS DECIMAL(38,0)) AS cp, CAST(0 AS DECIMAL(38,0)) AS cn,
               CAST(0 AS DECIMAL(38,0)) AS terms),
        (acc, el) -> struct(acc.cp + el.__p AS cp, acc.cn + el.__n AS cn,
          acc.terms + CASE WHEN el.__p > 0 THEN
            (CAST(1000000 AS DECIMAL(38,0)) * el.__p * (acc.cp + el.__p))
              div (acc.cp + el.__p + acc.cn + el.__n)
            ELSE CAST(0 AS DECIMAL(38,0)) END AS terms))""").as("__r"))
      .select(expr("CAST(__r.cp AS BIGINT)").as("n_pos"),
        expr("CAST(__r.cn AS BIGINT)").as("n_neg"),
        expr("""CASE WHEN __r.cp > 0
                  THEN CAST(__r.terms div __r.cp AS BIGINT) END""")
          .as("ap_micro"))
  }

  /** Brier score + expected calibration error in ONE report (E94 —
    * the two scalar calibration numbers under [[calibrationBins]]'
    * table: Brier is the proper scoring rule every probabilistic
    * classifier optimizes against, ECE the number calibration papers
    * headline; together with [[aucScore]] they close the
    * scalar-eval triple ORDER / MEAN / SHARPNESS). Exact integers:
    * scores are permille probabilities, so `(s − 1000·y)²` is the
    * squared error in micro (10⁻⁶) probability² units and
    * `brier_micro = Σ(s−1000y)² div n`; ECE reuses the EXACT
    * [[calibrationBins]] equi-depth binning (same fold, same
    * exclusive-prefix rule) and reads
    * `ece_micro = (1000·Σ_b n_b·|obs_b − mean_s_b|) div n` off the
    * per-bin permille gaps. Empty input → one row of nulls.
    *
    * Scale shape: Brier is one map-side scalar aggregation; ECE runs
    * on [[calibrationBins]]' output (≤ nBins rows); the two 1-row
    * frames broadcast-join. Nothing new touches the corpus.
    */
  def brierEce(df: DataFrame, scorePermilleCol: String, labelCol: String,
               nBins: Int): DataFrame = {
    val brier = df.agg(
      count(lit(1)).as("__n"),
      sum(expr(s"""CAST(($scorePermilleCol - 1000 *
        CASE WHEN $labelCol THEN 1 ELSE 0 END) AS DECIMAL(38,0)) *
        ($scorePermilleCol - 1000 *
        CASE WHEN $labelCol THEN 1 ELSE 0 END)""")).as("__se"))
    val ece = calibrationBins(df, scorePermilleCol, labelCol, nBins)
      .agg(sum(expr("n_rows * abs(gap_permille)")).as("__gaps"))
    brier.crossJoin(broadcast(ece))
      .select(col("__n").as("n"),
        expr("""CASE WHEN __n > 0
                  THEN CAST(__se div __n AS BIGINT) END""").as("brier_micro"),
        expr("""CASE WHEN __n > 0 THEN
          CAST((1000 * CAST(__gaps AS DECIMAL(38,0))) div __n AS BIGINT)
        END""").as("ece_micro"))
  }

  /** McNemar's paired test (E95 — the model-COMPARISON member of the
    * eval family: accuracy deltas on a shared eval set are paired
    * data, and the discordant-pair test is the standard significance
    * check before declaring model B better than model A; comparing
    * two unpaired accuracy CIs is the classic mistake this replaces).
    * Counts the 2×2 agreement table exactly — `b` = A right / B
    * wrong, `c` = A wrong / B right — and the continuity-corrected
    * statistic in milli: `chi2_milli = (1000·(|b−c|−1)²) div (b+c)`
    * (0 when |b−c| ≤ 1; null when b+c = 0 — the models never
    * disagree, no evidence either way). `significant` compares
    * against the χ²₍₁₎ 5% critical value on the same milli grid
    * (3841: both engines compare the identical integers).
    *
    * Scale shape: one map-side scalar aggregation over the paired
    * predictions — the cheapest operator in the family.
    */
  def mcnemarCheck(df: DataFrame, labelCol: String, predACol: String,
                   predBCol: String): DataFrame = {
    val aOk = s"($predACol) = ($labelCol)"
    val bOk = s"($predBCol) = ($labelCol)"
    df.agg(
        count(lit(1)).as("n"),
        sum(expr(s"CASE WHEN $aOk AND $bOk THEN 1L ELSE 0L END"))
          .as("both_right"),
        sum(expr(s"CASE WHEN $aOk AND NOT ($bOk) THEN 1L ELSE 0L END"))
          .as("b_only_wrong"),
        sum(expr(s"CASE WHEN NOT ($aOk) AND $bOk THEN 1L ELSE 0L END"))
          .as("a_only_wrong"),
        sum(expr(s"CASE WHEN NOT ($aOk) AND NOT ($bOk) THEN 1L ELSE 0L END"))
          .as("both_wrong"))
      .withColumn("chi2_milli", expr(
        """CASE WHEN b_only_wrong + a_only_wrong = 0 THEN NULL
                WHEN abs(b_only_wrong - a_only_wrong) <= 1 THEN 0L
                ELSE (1000 * (abs(b_only_wrong - a_only_wrong) - 1)
                      * (abs(b_only_wrong - a_only_wrong) - 1))
                     div (b_only_wrong + a_only_wrong) END"""))
      .withColumn("significant",
        expr("coalesce(chi2_milli > 3841, false)"))
  }

  /** Mann-Whitney U rank-sum test (C111 — the experimentation
    * family's NON-parametric leg: [[abTest]]'s mean test assumes the
    * metric averages well, but revenue/latency-style metrics are
    * heavy-tailed and the rank test is what a stats reviewer asks for
    * next; it is also exactly the statistic under [[aucScore]], which
    * this reuses). Over a bounded-domain integer metric (the repo's
    * quantization contract): `u2 = 2U_A = Σ_v a_v·(2·b_below(v) +
    * b_at(v))` exact via the same distribution fold as [[aucScore]],
    * effect size `auc_permille = (1000·u2) div (2·n_a·n_b)`, and the
    * tie-corrected normal-approximation z² in micro:
    * `z2_micro = ((3·10⁶·d²) div (n_a·n_b) · (n·(n−1))) div
    * ((n+1)·n·(n−1) − T)` where `d = u2 − n_a·n_b` (= 2(U−μ)) and
    * `T = Σ_ties (t³−t)`; `significant` compares z2_micro > 3841459
    * (1.96² on the micro grid). Stated envelope: the staged products
    * stay inside DECIMAL(38,0) for per-test n ≲ 8·10⁷ rows — beyond
    * that pre-aggregate the metric (the z approximation saturated
    * long before). All-tied data (T = full correction) → z2 null.
    *
    * Scale shape: one corpus-sized value-keyed aggregation, then the
    * whole test rides a HOF fold over the collected distribution —
    * [[aucScore]]'s shape with the variance fold added.
    */
  def mannWhitney(df: DataFrame, isACol: String,
                  valueCol: String): DataFrame = {
    val perValue = df.groupBy(col(valueCol).cast("long").as("__v"))
      .agg(sum(when(col(isACol), 1L).otherwise(0L)).as("__a"),
           sum(when(col(isACol), 0L).otherwise(1L)).as("__b"))
    perValue
      .agg(array_sort(collect_list(struct(col("__v"), col("__a"),
        col("__b")))).as("__d"))
      .select(expr("""aggregate(__d,
        struct(CAST(0 AS BIGINT) AS blt, CAST(0 AS DECIMAL(38,0)) AS u2,
               CAST(0 AS BIGINT) AS na, CAST(0 AS BIGINT) AS nb,
               CAST(0 AS DECIMAL(38,0)) AS ties),
        (acc, el) -> struct(acc.blt + el.__b AS blt,
          acc.u2 + CAST(el.__a AS DECIMAL(38,0))
            * (2 * acc.blt + el.__b) AS u2,
          acc.na + el.__a AS na, acc.nb + el.__b AS nb,
          acc.ties + CAST(el.__a + el.__b AS DECIMAL(38,0))
            * (el.__a + el.__b) * (el.__a + el.__b)
            - (el.__a + el.__b) AS ties))""").as("__r"))
      .select(col("__r.na").as("n_a"), col("__r.nb").as("n_b"),
        expr("CAST(__r.u2 AS BIGINT)").as("u2"),
        expr("""CASE WHEN __r.na > 0 AND __r.nb > 0 THEN
          CAST((1000 * __r.u2) div
            (2 * CAST(__r.na AS DECIMAL(38,0)) * __r.nb) AS BIGINT)
        END""").as("auc_permille"),
        expr("""CASE WHEN __r.na > 0 AND __r.nb > 0 AND
            (__r.na + __r.nb + 1) * CAST(__r.na + __r.nb AS DECIMAL(38,0))
              * (__r.na + __r.nb - 1) - __r.ties > 0 THEN
          CAST(((CAST(3000000 AS DECIMAL(38,0))
              * (__r.u2 - CAST(__r.na AS DECIMAL(38,0)) * __r.nb)
              * (__r.u2 - CAST(__r.na AS DECIMAL(38,0)) * __r.nb))
            div (CAST(__r.na AS DECIMAL(38,0)) * __r.nb)
            * (CAST(__r.na + __r.nb AS DECIMAL(38,0))
               * (__r.na + __r.nb - 1)))
          div ((__r.na + __r.nb + 1)
               * CAST(__r.na + __r.nb AS DECIMAL(38,0))
               * (__r.na + __r.nb - 1) - __r.ties) AS BIGINT)
        END""").as("z2_micro"))
      .withColumn("significant", expr("coalesce(z2_micro > 3841459, false)"))
  }

  /** Pearson chi-square independence test over two categorical
    * columns (C110 — the contingency question under segmentation
    * dashboards: does status depend on priority / does variant depend
    * on platform — and the categorical sibling of [[srmCheck]]'s
    * goodness-of-fit). EXACT integer statistic under the stated
    * per-cell quantization: with cell counts `n_ij`, margins `r_i`,
    * `c_j`, total `N`, present cells contribute
    * `(10⁶·(n_ij·N − r_i·c_j)²) div (N·r_i·c_j)` each, and the ABSENT
    * cells of row i (n_ij = 0, expected-only mass) contribute their
    * row's complement in ONE term:
    * `(10⁶·r_i·(N − Σ_{j present in i} c_j)) div N` — no R×C
    * densification ever materializes, and the floor-per-present-cell
    * / floor-per-row-complement split is the stated engine rule (both
    * engines replay it; error ≤ 1 micro per term). Reports
    * dof = (R−1)(C−1); significance is the caller's dof-dependent
    * threshold (not folded in — no χ² inverse on the integer grid).
    *
    * Scale shape: one (a,b) cell aggregation (map-side combined),
    * margins as two ≤|domain| aggregations broadcast back, one
    * row-grouped fold on the ≤|cells| frame, one final scalar agg.
    * Envelope: products ≤ 10⁶·N⁴ ⇒ exact in DECIMAL(38,0) to
    * N ~ 10⁸ rows per tested pair (contingency tests live far below;
    * pre-aggregate beyond).
    */
  def chiSquareIndep(df: DataFrame, aCol: String,
                     bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rowM = cells.groupBy("__a").agg(sum("__n").as("__r"))
    val colM = cells.groupBy("__b").agg(sum("__n").as("__c"))
    val tot = cells.agg(sum("__n").as("__t"),
      countDistinct(col("__a")).as("n_rows_a"),
      countDistinct(col("__b")).as("n_cols_b"))
    cells
      .join(broadcast(rowM), "__a")
      .join(broadcast(colM), "__b")
      .crossJoin(broadcast(tot))
      .groupBy("__a")
      .agg(
        sum(expr("""(CAST(1000000 AS DECIMAL(38,0))
            * (CAST(__n AS DECIMAL(38,0)) * __t
               - CAST(__r AS DECIMAL(38,0)) * __c)
            * (CAST(__n AS DECIMAL(38,0)) * __t
               - CAST(__r AS DECIMAL(38,0)) * __c))
          div (CAST(__t AS DECIMAL(38,0)) * __r * __c)"""))
          .as("__present"),
        sum(col("__c")).as("__cpres"),
        first(col("__r")).as("__r"), first(col("__t")).as("__t"),
        first(col("n_rows_a")).as("n_rows_a"),
        first(col("n_cols_b")).as("n_cols_b"))
      .withColumn("__absent", expr(
        """(CAST(1000000 AS DECIMAL(38,0)) * __r * (__t - __cpres))
           div __t"""))
      .agg(sum(expr("__present + __absent")).as("__chi2"),
        first(col("__t")).as("__t"),
        first(col("n_rows_a")).as("n_rows_a"),
        first(col("n_cols_b")).as("n_cols_b"))
      .select(col("__t").cast("long").as("n"),
        col("n_rows_a"), col("n_cols_b"),
        expr("(n_rows_a - 1) * (n_cols_b - 1)").as("dof"),
        expr("CAST(__chi2 AS BIGINT)").as("chi2_micro"))
  }

  /** Spearman rank correlation (C116 — [[corrMatrix]]'s ROBUST
    * sibling: Pearson on heavy-tailed metrics is driven by the tail;
    * rank correlation answers the monotone-association question every
    * metric pair actually poses and is the number reviewers ask for
    * next to Pearson). Computed EXACTLY on tie-averaged ranks over a
    * bounded-domain integer pair (the repo's quantization contract):
    * DOUBLED ranks keep tie averages integral
    * (`2·rank_avg(v) = 2·cum_before(v) + t_v + 1`), then Pearson's
    * formula on the doubled ranks with DECIMAL(38,0) moment products
    * and the [[corrMatrix]] reporting device — `rho_sign` plus
    * `rho2_permyriad = sign-trunc(100·Sxy/Sxx)·sign-trunc(100·Sxy/
    * Syy)` (the square avoids the irrational sqrt; sign carried
    * separately). Constant columns (zero rank variance) read null.
    *
    * Scale shape: one (x,y) cell aggregation (map-side combined —
    * corpus touched ONCE), marginal rank tables as two ≤|domain|
    * folds broadcast back onto the cell frame, one scalar moment agg.
    * The corpus never sorts — ranks come from the distribution, not
    * a ranking window.
    */
  def spearmanCorr(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .agg(count(lit(1)).as("__c"))
    def rankTable(vc: String) = cells
      .groupBy(col(vc).as("__v")).agg(sum("__c").as("__t"))
      .agg(array_sort(collect_list(struct(col("__v"), col("__t"))))
        .as("__a"))
      .select(explode(expr("""aggregate(__a,
        struct(CAST(0 AS BIGINT) AS cum,
               CAST(array() AS ARRAY<STRUCT<v: BIGINT, r2: BIGINT>>)
                 AS out),
        (acc, el) -> struct(acc.cum + el.__t AS cum,
          array_append(acc.out, struct(el.__v AS v,
            2 * acc.cum + el.__t + 1 AS r2)) AS out)).out""")).as("__r"))
      .select(col("__r.v").as("__v"), col("__r.r2").as("__r2"))
    val rx = rankTable("__x").withColumnRenamed("__v", "__x")
      .withColumnRenamed("__r2", "__rx")
    val ry = rankTable("__y").withColumnRenamed("__v", "__y")
      .withColumnRenamed("__r2", "__ry")
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    cells
      .join(broadcast(rx), "__x")
      .join(broadcast(ry), "__y")
      .agg(sum("__c").cast("decimal(38,0)").as("__n"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __rx")).as("__sx"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __ry")).as("__sy"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __rx * __rx")).as("__sxx0"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __ry * __ry")).as("__syy0"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __rx * __ry")).as("__sxy0"))
      .withColumn("__sxx", expr("__n * __sxx0 - __sx * __sx"))
      .withColumn("__syy", expr("__n * __syy0 - __sy * __sy"))
      .withColumn("__sxy", expr("__n * __sxy0 - __sx * __sy"))
      .select(col("__n").cast("long").as("n"),
        expr("""CASE WHEN __sxx > 0 AND __syy > 0 THEN
                  CAST(sign(__sxy) AS BIGINT) END""").as("rho_sign"),
        expr(s"""CASE WHEN __sxx > 0 AND __syy > 0 THEN
                  CAST((${strunc("100 * __sxy", "__sxx")}) *
                       (${strunc("100 * __sxy", "__syy")}) AS BIGINT)
                END""").as("rho2_permyriad"))
  }

  /** Welch's unequal-variance t-test (C117 — the parametric leg
    * beside [[mannWhitney]]: when the metric DOES average well,
    * Welch is the default two-sample mean test — Student's
    * equal-variance assumption is never checked in practice, so
    * Welch IS the test). Exact integer moments per group
    * (DECIMAL(38,0) S1/S2), then a STATED three-floor cascade on the
    * micro grid: per-group squared standard error
    * `se2_micro_g = (10⁶·(n_g·S2_g − S1_g²)) div (n_g²·(n_g−1))`,
    * mean difference `md_micro = sign-trunc(10⁶·(S1_a·n_b − S1_b·n_a),
    * n_a·n_b)`, `t2_micro = md_micro² div (se2a+se2b)`, and the
    * Welch-Satterthwaite dof on the same grid
    * `dof_milli = (1000·(se2a+se2b)²) div (se2a² div (n_a−1) +
    * se2b² div (n_b−1))`. Significance compares t² > 1.96² micro —
    * the large-sample normal cut (the dof-exact t quantile has no
    * integer-grid form; dof_milli is reported so a caller can apply
    * a stricter small-sample cut). Zero pooled variance or a
    * sub-2-row group reads null.
    *
    * Scale shape: ONE map-side scalar aggregation — the [[abTest]]
    * shape. Envelope: products ≤ 10⁶·n·S2 stay in DECIMAL(38,0) for
    * any realistic permille metric (n ≲ 10¹³).
    */
  def welchTtest(df: DataFrame, isACol: String,
                 valueCol: String): DataFrame = {
    val v = s"CAST($valueCol AS DECIMAL(38,0))"
    df.agg(
        sum(when(col(isACol), 1L).otherwise(0L)).as("__na"),
        sum(when(col(isACol), 0L).otherwise(1L)).as("__nb"),
        sum(expr(s"CASE WHEN $isACol THEN $v ELSE CAST(0 AS " +
          "DECIMAL(38,0)) END")).as("__s1a"),
        sum(expr(s"CASE WHEN $isACol THEN CAST(0 AS DECIMAL(38,0)) " +
          s"ELSE $v END")).as("__s1b"),
        sum(expr(s"CASE WHEN $isACol THEN $v * $valueCol ELSE " +
          "CAST(0 AS DECIMAL(38,0)) END")).as("__s2a"),
        sum(expr(s"CASE WHEN $isACol THEN CAST(0 AS DECIMAL(38,0)) " +
          s"ELSE $v * $valueCol END")).as("__s2b"))
      .withColumn("__se2a", expr(
        """CASE WHEN __na >= 2 THEN (1000000 * (__na * __s2a
             - __s1a * __s1a))
           div (CAST(__na AS DECIMAL(38,0)) * __na * (__na - 1)) END"""))
      .withColumn("__se2b", expr(
        """CASE WHEN __nb >= 2 THEN (1000000 * (__nb * __s2b
             - __s1b * __s1b))
           div (CAST(__nb AS DECIMAL(38,0)) * __nb * (__nb - 1)) END"""))
      .withColumn("__mdn", expr("__s1a * __nb - __s1b * __na"))
      .withColumn("md_micro", expr(
        """CASE WHEN __na > 0 AND __nb > 0 THEN
             CASE WHEN __mdn < 0
               THEN -((-(1000000 * __mdn))
                      div (CAST(__na AS DECIMAL(38,0)) * __nb))
               ELSE (1000000 * __mdn)
                    div (CAST(__na AS DECIMAL(38,0)) * __nb) END
           END"""))
      .withColumn("t2_micro", expr(
        """CASE WHEN __se2a IS NOT NULL AND __se2b IS NOT NULL
                AND __se2a + __se2b > 0 THEN
             (md_micro * CAST(md_micro AS DECIMAL(38,0)))
               div (__se2a + __se2b) END"""))
      // se2 values reach 10¹² for permille metrics — their squares
      // overflow int64, so every square rides DECIMAL(38,0)
      .withColumn("dof_milli", expr(
        """CASE WHEN t2_micro IS NOT NULL
                AND (CAST(__se2a AS DECIMAL(38,0)) * __se2a)
                    div (__na - 1)
                  + (CAST(__se2b AS DECIMAL(38,0)) * __se2b)
                    div (__nb - 1) > 0 THEN
             (1000 * (CAST(__se2a AS DECIMAL(38,0)) + __se2b)
                   * (CAST(__se2a AS DECIMAL(38,0)) + __se2b))
               div ((CAST(__se2a AS DECIMAL(38,0)) * __se2a)
                      div (__na - 1)
                    + (CAST(__se2b AS DECIMAL(38,0)) * __se2b)
                      div (__nb - 1)) END"""))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        col("md_micro"), col("t2_micro"), col("dof_milli"),
        expr("coalesce(t2_micro > 3841459, false)").as("significant"))
  }

  /** Jensen-Shannon drift (C118 — closing the drift triple beside
    * psi_drift and [[ksDrift]]: PSI needs a bin choice and explodes
    * on empty bins, KS sees only the worst single point; JSD is the
    * bounded symmetric whole-distribution divergence — and it needs
    * NO smoothing, because `m = (p+q)/2 > 0` wherever either side
    * has mass, with `0·ln 0 = 0` exact). Over a bounded-domain
    * integer value (category or quantized score): micro proportions
    * `p = (10⁶·n_p) div N_p` per side, per-value terms
    * `p·round(ln(2p/(p+q))·10⁶)` on the micro-nat quantized-log
    * device (one IEEE log of an integer ratio both engines hold —
    * the psi_drift discipline), `jsd_micro = (Σ_p terms + Σ_q terms)
    * div (2·10⁶)`; 0 ≤ JSD ≤ ln 2 ≈ 693147 micro-nats. `drift` flags
    * jsd_micro above `thresholdMicro`.
    *
    * Scale shape: one value-keyed aggregation (map-side combined),
    * the ≤|domain| distribution carries everything else — one
    * broadcast of the two totals, one scalar agg. The psi shape
    * without the binning.
    */
  def jsDivergence(df: DataFrame, valueCol: String, baseCol: String,
                   thresholdMicro: Long = 100000L): DataFrame = {
    val perValue = df.groupBy(col(valueCol).cast("long").as("__v"))
      .agg(sum(when(col(baseCol), 1L).otherwise(0L)).as("__b"),
           sum(when(col(baseCol), 0L).otherwise(1L)).as("__c"))
    val totals = perValue.agg(sum("__b").as("__tb"), sum("__c").as("__tc"))
    perValue.crossJoin(broadcast(totals))
      .withColumn("__p", expr("CASE WHEN __tb > 0 THEN " +
        "(1000000 * __b) div __tb ELSE 0L END"))
      .withColumn("__q", expr("CASE WHEN __tc > 0 THEN " +
        "(1000000 * __c) div __tc ELSE 0L END"))
      .withColumn("__lnp", when(col("__p") > 0,
        round(log(col("__p").cast("double") * 2.0d /
          (col("__p") + col("__q")).cast("double")) * 1e6).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("__lnq", when(col("__q") > 0,
        round(log(col("__q").cast("double") * 2.0d /
          (col("__p") + col("__q")).cast("double")) * 1e6).cast("long"))
        .otherwise(lit(0L)))
      .agg(first("__tb").as("n_base"), first("__tc").as("n_cur"),
        sum(expr("CAST(__p AS DECIMAL(38,0)) * __lnp + " +
          "CAST(__q AS DECIMAL(38,0)) * __lnq")).as("__s"))
      // true JSD ≥ 0; the micro quantization can dip the sum a hair
      // negative near 0 — clamp so the div never sees a negative
      // (trunc-direction mismatch territory) and 0 reads 0
      .select(col("n_base"), col("n_cur"),
        expr("""CAST(greatest(CAST(0 AS DECIMAL(38,0)), __s)
          div 2000000 AS BIGINT)""").as("jsd_micro"))
      .withColumn("drift", col("jsd_micro") > lit(thresholdMicro))
  }

  /** Forecast-quality report (E100 — the regression/forecast leg of
    * the eval family: classification has report/AUC/calibration here,
    * but a DEMAND or LATENCY forecast ships with a point estimate AND
    * an interval, and the numbers every forecasting benchmark reports
    * are MAE, pinball loss, and interval coverage/width — this closes
    * all three in one grouped pass). Per group, exact integers over
    * milli-unit actuals/predictions:
    * `mae_milli = Σ|a−mid| div n`,
    * `pinball_q_micro = Σ(q·(a−mid) if a ≥ mid else (1000−q)·(mid−a))
    * div n` for q = 500 and 900 (the interior floor is the stated
    * rule; q500 pinball = MAE/2 exactly), `coverage_permille =
    * (1000·#(lo ≤ a ≤ hi)) div n`, and `mean_width_milli =
    * Σ(hi−lo) div n`. Degenerate intervals (hi < lo) count uncovered
    * and their negative widths are NOT clamped — visible badness by
    * design.
    *
    * Scale shape: ONE group-keyed aggregation, all terms map-side —
    * the cheapest family shape.
    */
  def forecastEval(df: DataFrame, groupCol: String, actualCol: String,
                   loCol: String, midCol: String,
                   hiCol: String): DataFrame = {
    def pin(q: Long) =
      s"""CASE WHEN $actualCol >= $midCol
            THEN $q * CAST($actualCol - $midCol AS DECIMAL(38,0))
            ELSE ${1000 - q} * CAST($midCol - $actualCol
              AS DECIMAL(38,0)) END"""
    df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(expr(s"abs(CAST($actualCol - $midCol AS DECIMAL(38,0)))"))
          .as("__ae"),
        sum(expr(pin(500))).as("__p500"),
        sum(expr(pin(900))).as("__p900"),
        sum(expr(s"""CASE WHEN $actualCol >= $loCol
          AND $actualCol <= $hiCol THEN 1L ELSE 0L END""")).as("__cov"),
        sum(expr(s"CAST($hiCol - $loCol AS DECIMAL(38,0))")).as("__w"))
      .select(col("grp"), col("n"),
        expr("CAST(__ae div n AS BIGINT)").as("mae_milli"),
        expr("CAST(__p500 div n AS BIGINT)").as("pinball500_micro"),
        expr("CAST(__p900 div n AS BIGINT)").as("pinball900_micro"),
        expr("(1000 * __cov) div n").as("coverage_permille"),
        expr("""CASE WHEN __w < 0 THEN -CAST((-__w) div n AS BIGINT)
                ELSE CAST(__w div n AS BIGINT) END""")
          .as("mean_width_milli"))
  }

  /** Leave-one-stratum-out jackknife (C120 — the deterministic
    * uncertainty estimate the experimentation family was missing:
    * bootstrap needs RNG, but the delete-one jackknife over STRATA
    * (days, shards, sources) is a pure function of the data and the
    * standard way to put an SE on a corpus-level mean when rows
    * within a stratum correlate). Per stratum: the leave-that-
    * stratum-out global mean `loo_mean_micro = strunc(10⁶·(S−S_g),
    * N−n_g)` and its influence vs the overall mean; plus ONE
    * `__jack__` summary row carrying the jackknife variance of the
    * mean `jk_var_micro2 = ((G−1)·Σ(loo_g − mean_loo)²) div G`
    * (micro² units; mean_loo is the unweighted mean of the loo
    * means, `div`-truncated — the classification_report macro
    * convention). A single-stratum input reads a null-variance
    * summary (nothing to delete). Strata are a BOUNDED-group
    * contract (days/shards — not user ids).
    *
    * Scale shape: one stratum aggregation (map-side) + a 1-row
    * global broadcast; the variance pass runs on the ≤G-row frame.
    */
  def jackknifeMeans(df: DataFrame, stratumCol: String,
                     valueCol: String): DataFrame = {
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    val per = df.groupBy(col(stratumCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n_rows"),
           sum(col(valueCol).cast("decimal(38,0)")).as("__s"))
    val tot = per.agg(sum("n_rows").as("__nn"), sum("__s").as("__ss"),
      count(lit(1)).as("__g"))
    val loo = per.crossJoin(broadcast(tot))
      .withColumn("loo_mean_micro", expr(
        s"""CASE WHEN __nn > n_rows THEN
              CAST(${strunc("1000000 * (__ss - __s)", "__nn - n_rows")}
                AS BIGINT) END"""))
      .withColumn("__om", expr(
        s"CAST(${strunc("1000000 * __ss", "__nn")} AS BIGINT)"))
      .select(col("stratum"), col("n_rows"), col("loo_mean_micro"),
        (col("loo_mean_micro") - col("__om")).as("influence_micro"),
        col("__g"))
    val meanLoo = loo.agg(
      sum("loo_mean_micro").as("__sl"), count(lit(1)).as("__gg"))
      .select(expr(s"CAST(${strunc("__sl", "__gg")} AS BIGINT)")
        .as("__ml"))
    val summary = loo.crossJoin(broadcast(meanLoo))
      .agg(first(col("__g")).as("__g"),
        sum(expr("""CAST(loo_mean_micro - __ml AS DECIMAL(38,0))
          * (loo_mean_micro - __ml)""")).as("__sq"),
        sum("n_rows").as("n_rows"))
      .select(lit("__jack__").as("stratum"), col("n_rows"),
        lit(null).cast("long").as("loo_mean_micro"),
        lit(null).cast("long").as("influence_micro"),
        expr("""CASE WHEN __g >= 2 THEN
          CAST(((__g - 1) * __sq) div __g AS BIGINT) END""")
          .as("jk_var_micro2"))
    loo.drop("__g")
      .withColumn("jk_var_micro2", lit(null).cast("long"))
      .unionByName(summary)
  }

  /** Inverse-propensity off-policy evaluation (E97 — the
    * counterfactual question under every logged-interaction corpus:
    * what would THIS policy have earned on traffic logged under
    * ANOTHER — the standard before any recommender/ranker ships;
    * pairs with [[abTest]], which answers it only AFTER shipping).
    * Behavior propensities are the log's own empirical frequencies
    * `p̂(a|x) = max(1, (1000·n_xa) div n_x)` (integer permille,
    * floor-clipped at 1 — the standard CLIPPED-IPS device: an action
    * logged under a sub-permille propensity would otherwise carry
    * unbounded weight, and the clip also keeps the integer division
    * total); the target policy is a `(context, action)` frame. Exact
    * staged integers: per (context, action) CELL
    * `Σw·r = (1000·Σr_milli) div p̂_permille` (one floor per cell —
    * cells share p̂, so this beats per-row flooring, stated),
    * `ips_milli = Σ div n` (the unmatched
    * contribute 0 — the IPS estimator), and self-normalized
    * `snips_milli = (Σ floor-weighted rewards · 10³) div Σ w_milli`
    * with `w_milli = (1000·1000) div p̂_permille` (SNIPS divides by
    * realized weight mass — the lower-variance estimator both
    * reported). Empty intersection → nulls.
    *
    * Scale shape: one (context, action) propensity aggregation
    * joined back context-keyed (reuses the exchange), the policy
    * frame broadcast, one scalar agg. The log is scanned once.
    */
  def ipsEval(logged: DataFrame, contextCol: String, actionCol: String,
              rewardMilliCol: String, policy: DataFrame,
              policyContextCol: String,
              policyActionCol: String): DataFrame = {
    val byCtxAct = logged.groupBy(col(contextCol).as("__ctx"),
        col(actionCol).as("__act"))
      .agg(count(lit(1)).as("__nxa"),
           sum(col(rewardMilliCol).cast("long")).as("__r"))
    val byCtx = byCtxAct.groupBy("__ctx").agg(sum("__nxa").as("__nx"))
    val pol = policy.select(col(policyContextCol).as("__ctx"),
      col(policyActionCol).as("__pact"))
    byCtxAct
      .join(byCtx, "__ctx") // ctx-keyed: reuses the exchange
      .join(broadcast(pol), "__ctx")
      .withColumn("__phat", expr("greatest(1L, (1000 * __nxa) div __nx)"))
      // rewards may be negative: every ratio is sign-trunc'd (the
      // bleuPairs device) so both engines truncate toward zero
      .withColumn("__wr", expr(
        """CASE WHEN __act = __pact THEN
             CASE WHEN __r < 0 THEN -((-(1000 * __r)) div __phat)
                  ELSE (1000 * __r) div __phat END
           ELSE 0L END"""))
      .withColumn("__w", expr(
        """CASE WHEN __act = __pact
             THEN (1000000 div __phat) * __nxa ELSE 0L END"""))
      .agg(sum("__nxa").as("n"),
        sum(expr("CASE WHEN __act = __pact THEN __nxa ELSE 0L END"))
          .as("n_matched"),
        sum("__wr").as("__swr"), sum("__w").as("__sw"))
      .select(col("n"), col("n_matched"),
        expr("""CASE WHEN n > 0 THEN
             CASE WHEN __swr < 0 THEN -((-__swr) div n)
                  ELSE __swr div n END END""").as("ips_milli"),
        expr("""CASE WHEN __sw > 0 THEN
             CASE WHEN __swr < 0
               THEN -((-(1000 * CAST(__swr AS DECIMAL(38,0)))) div __sw)
               ELSE (1000 * CAST(__swr AS DECIMAL(38,0))) div __sw END
           END""").cast("long").as("snips_milli"))
  }

  /** Holt-Winters additive seasonal smoothing (C133 — [[holtSmooth]]
    * grown a weekly SEASON: level+trend alone lag a day-of-week
    * cycle by construction; the third recurrence learns the cycle and
    * the forecast adds it back — the standard ops-forecast upgrade).
    * Fixed integer coefficients α=300/β=200/γ=300 permille, season
    * m=7, engine-exact in integer MILLI with a sign-trunc'd floor at
    * every step (values go negative: deseasonalized gaps): at row t
    * (1-based, day-ordered per key), with `sm = s[(t−1) mod 7]`,
    *   `lvl_t = strunc(300·(x_t·1000 − sm) + 700·(lvl+tr), 1000)`
    *   `tr_t = strunc(200·(lvl_t − lvl) + 800·tr, 1000)`
    *   `s[(t−1) mod 7] ← strunc(300·(x_t·1000 − lvl_t) + 700·sm,
    *     1000)`
    *   `forecast_t = lvl_t + tr_t + s[t mod 7]` (next day's seasonal
    * slot, read BEFORE this row's write — distinct slots for m > 1).
    * Stated init (the [[holtSmooth]] convention): row 1 sets
    * `lvl = x·1000, tr = 0`, seasonal array starts all-zero — the
    * first cycle behaves like Holt while the seasonal slots fill.
    * Slots index by ROW POSITION mod 7, not calendar DOW (gapped
    * days shift the cycle — dense daily series assumed, stated).
    *
    * Scale shape: one (key, day) pre-aggregation, then the
    * [[ewmaSmooth]] fold discipline — per-key sorted fold over the
    * CALENDAR-sized series (the state carries the 7-slot array);
    * event volume only touches the first agg. The DuckDB oracle
    * replays the identical recurrence as a recursive CTE with the
    * seven slots as columns.
    */
  def hwSeasonal(daily: DataFrame, keyCols: Seq[String], dayCol: String,
                 valueCol: String): DataFrame = {
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    val sm = "element_at(acc.s, CAST(acc.i % 7 AS INT) + 1)"
    val lvl = strunc(
      s"300 * (el.x * 1000 - $sm) + 700 * (acc.lvl + acc.tr)", "1000")
    val tr = strunc(s"200 * (($lvl) - acc.lvl) + 800 * acc.tr", "1000")
    val snew = strunc(
      s"300 * (el.x * 1000 - ($lvl)) + 700 * $sm", "1000")
    val sorted = daily.groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(
        col(dayCol).cast("long").as("day"),
        col(valueCol).cast("long").as("x")))).as("__s"))
    val folded = sorted.withColumn("__e",
      expr(s"""aggregate(__s,
        struct(CAST(0 AS BIGINT) AS lvl, CAST(0 AS BIGINT) AS tr,
          array_repeat(CAST(0 AS BIGINT), 7) AS s,
          CAST(0 AS BIGINT) AS i,
          CAST(array() AS ARRAY<STRUCT<day: BIGINT, lvl: BIGINT,
            tr: BIGINT, sea: BIGINT, fc: BIGINT>>) AS out),
        (acc, el) -> CASE WHEN acc.i = 0 THEN
            struct(el.x * 1000 AS lvl, CAST(0 AS BIGINT) AS tr,
              acc.s AS s, CAST(1 AS BIGINT) AS i,
              array_append(acc.out, struct(el.day AS day,
                el.x * 1000 AS lvl, CAST(0 AS BIGINT) AS tr,
                CAST(0 AS BIGINT) AS sea, el.x * 1000 AS fc)) AS out)
          ELSE
            struct(CAST(($lvl) AS BIGINT) AS lvl,
              CAST(($tr) AS BIGINT) AS tr,
              transform(acc.s, (v, j) ->
                CASE WHEN j = CAST(acc.i % 7 AS INT) THEN
                  CAST(($snew) AS BIGINT) ELSE v END) AS s,
              acc.i + 1 AS i,
              array_append(acc.out, struct(el.day AS day,
                CAST(($lvl) AS BIGINT) AS lvl,
                CAST(($tr) AS BIGINT) AS tr,
                CAST(($snew) AS BIGINT) AS sea,
                CAST(($lvl) + ($tr) + element_at(acc.s,
                  CAST((acc.i + 1) % 7 AS INT) + 1) AS BIGINT) AS fc))
                AS out)
          END,
        acc -> acc.out)"""))
    folded.select((keyCols.map(col) :+ explode(col("__e")).as("__r")): _*)
      .select((keyCols.map(col) ++ Seq(col("__r.day").as("day"),
        col("__r.lvl").as("level_milli"),
        col("__r.tr").as("trend_milli"),
        col("__r.sea").as("seasonal_milli"),
        col("__r.fc").as("forecast_milli"))): _*)
  }

  /** Additive seasonal decomposition (C134 — the DESCRIPTIVE sibling
    * of [[hwSeasonal]]: before fitting a forecaster, every series
    * review starts with trend/seasonal/residual panels — the classic
    * moving-average decomposition, exact on the integer milli grid).
    * Per key and day: `trend_milli = (1000·Σ_{|d'−d|≤3} x) div 7`,
    * defined only where ALL SEVEN calendar days exist in the window
    * (RANGE-framed on the day value, so gaps disable trend rather
    * than contaminating it); `det = x·1000 − trend`;
    * `seasonal_milli(key, dow) = strunc(Σ det, n_det)` over the
    * trend-defined rows of that epoch-day-mod-7 slot;
    * `resid_milli = det − seasonal`. Rows without a defined trend
    * drop (the decomposition's standard edge loss).
    *
    * Scale shape: one (key, day) pre-aggregation, a key-partitioned
    * RANGE window over the calendar-sized series, one (key, dow)
    * agg broadcast back. No corpus-wide sort.
    */
  def seasonalDecompose(daily: DataFrame, keyCols: Seq[String],
                        dayCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("day")).rangeBetween(-3, 3)
    val base = daily.select((keyCols.map(col) ++ Seq(
      col(dayCol).cast("long").as("day"),
      col(valueCol).cast("long").as("x"))): _*)
    val trended = base
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__sum", sum(col("x")).over(w))
      .withColumn("trend_milli",
        when(col("__cnt") === 7, expr("(1000 * __sum) div 7")))
      .withColumn("__det", col("x") * 1000 - col("trend_milli"))
      .withColumn("__dow", expr("day % 7"))
    val seasonal = trended.filter(col("__det").isNotNull)
      .groupBy((keyCols.map(col) :+ col("__dow")): _*)
      .agg(sum("__det").as("__sd"), count(lit(1)).as("__nd"))
      .select((keyCols.map(col) ++ Seq(col("__dow"),
        expr("""CASE WHEN __sd < 0 THEN -((-__sd) div __nd)
                     ELSE __sd div __nd END""").as("seasonal_milli"))): _*)
    trended.filter(col("trend_milli").isNotNull)
      // (key × 7)-sized model frame — broadcast by construction, not
      // by estimate (which rides the corpus size and flipped to SMJ
      // at sf10)
      .join(broadcast(seasonal), keyCols :+ "__dow")
      .select((keyCols.map(col) ++ Seq(col("day"), col("x"),
        col("trend_milli"), col("seasonal_milli"),
        (col("__det") - col("seasonal_milli")).as("resid_milli"))): _*)
  }

  /** Lead-lag cross-correlation (C132 — the causality-shaped question
    * under every pair of ops metrics: "do views LEAD purchases, and
    * by how many days?" — computed as Pearson r between x_t and
    * y_{t+lag} for each lag 0..maxLag over the daily series). The
    * corpus collapses map-side to the calendar-sized daily frame
    * first; each lag pairs days (t, t+lag) BOTH present (inner join —
    * gapped days contribute no pair, stated). Exact DECIMAL(38,0)
    * moments per lag, reported on the corr_matrix sign/square device:
    * `r_sign` + `r2_permyriad = strunc(100·Sxy', Sxx')·strunc(100·
    * Sxy', Syy')`. Lags with < 2 pairs or zero variance read null.
    * STATED LIMIT of the sign/square device here: each factor floors
    * at `100·|Sxy| < S**`, so when the two series' standard
    * deviations differ by more than ~100× (daily views vs rare
    * purchases), one factor truncates to 0 and r2 reads 0 even for
    * perfectly correlated series — pre-scale the smaller series onto
    * a comparable grid (e.g. ×1000) before calling if the ratio can
    * exceed that.
    *
    * Scale shape: one calendar-sized self-join per lag (the lag table
    * broadcasts onto the daily frame; the join key is day+lag), one
    * ≤maxLag+1-row moment agg. Event volume only touches the first
    * daily aggregation.
    */
  def crossCorr(daily: DataFrame, dayCol: String, xCol: String,
                yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0 && maxLag <= 90, s"maxLag in [0,90], got $maxLag")
    val d = daily.select(col(dayCol).cast("long").as("__d"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val lags = daily.sparkSession.range(0, maxLag + 1)
      .select(col("id").as("lag"))
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    val dx = d.select(col("__d"), col("__x")).crossJoin(broadcast(lags))
    val dy = d.select(col("__d").as("__dy"), col("__y"))
    // calendar-bounded side broadcast explicitly (the mannKendall
    // estimate-artifact lesson): the daily frame never outgrows a
    // broadcast no matter the event volume under it
    dx.join(broadcast(dy), dx("__d") + dx("lag") === dy("__dy"))
      .groupBy("lag")
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(expr("CAST(__x AS DECIMAL(38,0))")).as("__sx"),
        sum(expr("CAST(__y AS DECIMAL(38,0))")).as("__sy"),
        sum(expr("CAST(__x AS DECIMAL(38,0)) * __x")).as("__sxx0"),
        sum(expr("CAST(__y AS DECIMAL(38,0)) * __y")).as("__syy0"),
        sum(expr("CAST(__x AS DECIMAL(38,0)) * __y")).as("__sxy0"))
      .withColumn("__sxx", expr("__n * __sxx0 - __sx * __sx"))
      .withColumn("__syy", expr("__n * __syy0 - __sy * __sy"))
      .withColumn("__sxy", expr("__n * __sxy0 - __sx * __sy"))
      .select(col("lag"), col("__n").cast("long").as("n_pairs"),
        expr("""CASE WHEN __sxx > 0 AND __syy > 0 THEN
                  CAST(sign(__sxy) AS BIGINT) END""").as("r_sign"),
        expr(s"""CASE WHEN __sxx > 0 AND __syy > 0 THEN
                  CAST((${strunc("100 * __sxy", "__sxx")}) *
                       (${strunc("100 * __sxy", "__syy")}) AS BIGINT)
                END""").as("r2_permyriad"))
  }

  /** Kendall's tau-b rank correlation (C122 — the third leg of the
    * association triple beside [[Relational]] corr_matrix (Pearson)
    * and [[spearmanCorr]]: tau is the concordance probability
    * reviewers quote for ordinal pairs, and its tie treatment (tau-b)
    * is the one contingency-shaped data actually needs). EXACT over a
    * BOUNDED QUANTIZED GRID — the stated contract: both inputs arrive
    * quantized to ≤ B buckets (B ≲ 64), the corpus collapses map-side
    * to ≤ B² cells, and S = Σ_{cells a,b: a.x < b.x} c_a·c_b·
    * sign(b.y − a.y) comes from the CELL-pair join — Θ(B⁴) constant
    * work independent of n (16M ops at B = 64; never a row-pair
    * join). Tie terms from the margins: n0 = n(n−1)/2,
    * n1 = Σ_x t(t−1)/2, n2 = Σ_y t(t−1)/2;
    * tau_b = S/√((n0−n1)(n0−n2)) reports on the [[spearmanCorr]]
    * device — `tau_sign` plus `tau2_permyriad = (10⁴·S²) div
    * ((n0−n1)(n0−n2))` (no irrational sqrt on the integer grid).
    * All-tied axes (zero denominator) read null.
    *
    * Scale shape: one (x,y) cell aggregation (map-side combined —
    * the corpus is touched once), a broadcast cell-pair join bounded
    * by the grid, two ≤B margin aggs, one scalar agg. The grid
    * contract is EXECUTABLE: `maxCells` (default 4096 = the stated
    * B = 64 grid) rides a 1-row guard that `raise_error`s before the
    * cell-pair join can go quadratic on unquantized input.
    */
  def kendallTau(df: DataFrame, xCol: String, yCol: String,
                 maxCells: Long = 4096L): DataFrame = {
    require(maxCells >= 1, s"maxCells must be >= 1, got $maxCells")
    val cells = df.groupBy(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .agg(count(lit(1)).as("__c"))
    val a = cells.select(col("__x").as("__xa"), col("__y").as("__ya"),
      col("__c").as("__ca"))
    // guard the BROADCAST side only: the error fires while the
    // broadcast relation builds — before an unbounded cell table can
    // reach the driver — and the other cell uses stay single-scan
    val b = withCellGuard(cells, maxCells,
      s"kendallTau: cell count exceeds maxCells=$maxCells — inputs " +
        "must be quantized to the bounded grid (B <= 64 stated); " +
        "quantize upstream or raise maxCells knowingly")
      .select(col("__x").as("__xb"), col("__y").as("__yb"),
        col("__c").as("__cb"))
    val s = a.join(broadcast(b), col("__xa") < col("__xb"))
      .agg(coalesce(sum(expr(
        """CAST(__ca AS DECIMAL(38,0)) * __cb *
           CASE WHEN __yb > __ya THEN 1 WHEN __yb < __ya THEN -1
                ELSE 0 END""")), lit(0).cast("decimal(38,0)")).as("__s"))
    val margins = cells.agg(
      sum("__c").cast("decimal(38,0)").as("__n"))
    val tx = cells.groupBy("__x").agg(sum("__c").as("__t"))
      .agg(sum(expr("CAST(__t AS DECIMAL(38,0)) * (__t - 1)")).as("__t1"))
    val ty = cells.groupBy("__y").agg(sum("__c").as("__t"))
      .agg(sum(expr("CAST(__t AS DECIMAL(38,0)) * (__t - 1)")).as("__t2"))
    s.crossJoin(broadcast(margins)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      // doubled pair counts (t(t-1), not /2) keep everything integral:
      // d1 = 2(n0-n1), d2 = 2(n0-n2), denom = d1*d2 = 4(n0-n1)(n0-n2)
      .withColumn("__d1", expr("__n * (__n - 1) - __t1"))
      .withColumn("__d2", expr("__n * (__n - 1) - __t2"))
      .select(col("__n").cast("long").as("n"),
        expr("""CASE WHEN __d1 > 0 AND __d2 > 0 THEN
                  CAST(sign(__s) AS BIGINT) END""").as("tau_sign"),
        expr("""CASE WHEN __d1 > 0 AND __d2 > 0 THEN
                  CAST((40000 * __s * __s) div (__d1 * __d2) AS BIGINT)
                END""").as("tau2_permyriad"))
  }

  /** Kruskal-Wallis H test (C123 — [[mannWhitney]] generalized to
    * k groups: the one-way layout's rank test, the robust sibling of
    * [[anovaF]] exactly as mann_whitney is [[welchTtest]]'s). EXACT
    * on tie-averaged DOUBLED ranks from the value distribution (the
    * [[spearmanCorr]] device — `2·rank_avg(v) = 2·cum_before + t + 1`
    * keeps tie averages integral; the corpus never sorts): per-group
    * doubled rank sums T_g, then with R_g = T_g/2,
    * H = 3·Σ T_g²/n_g / (n(n+1)) − 3(n+1), tie-corrected by
    * H_c = H·(n³−n)/((n³−n) − Σ(t³−t)). Stated floor cascade on the
    * micro grid: `q_g = (10⁶·T_g²) div n_g` per group,
    * `h_raw = (3·Σq_g) div (n(n+1)) − 3·10⁶·(n+1)`, `h_micro =
    * (h_raw·(n³−n)) div ((n³−n) − ties)`. All-tied data (corrector
    * ≤ 0) or n < 2 reads null; dof = k−1 reported for the caller's
    * χ² cut (no integer-grid χ² inverse — the [[chiSquareIndep]]
    * convention).
    *
    * Scale shape: one (group, value) cell aggregation (map-side
    * combined), the rank table as one ≤|domain| fold broadcast back,
    * one k-row group agg, one scalar agg.
    */
  def kruskalWallis(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val rank = cells.groupBy("__v").agg(sum("__c").as("__t"))
      .agg(array_sort(collect_list(struct(col("__v"), col("__t"))))
        .as("__a"))
      .select(explode(expr("""aggregate(__a,
        struct(CAST(0 AS BIGINT) AS cum,
               CAST(array() AS ARRAY<STRUCT<v: BIGINT, r2: BIGINT>>)
                 AS out),
        (acc, el) -> struct(acc.cum + el.__t AS cum,
          array_append(acc.out, struct(el.__v AS v,
            2 * acc.cum + el.__t + 1 AS r2)) AS out)).out""")).as("__r"))
      .select(col("__r.v").as("__v"), col("__r.r2").as("__r2"))
    val ties = cells.groupBy("__v").agg(sum("__c").as("__t"))
      .agg(sum(expr(
        """CAST(__t AS DECIMAL(38,0)) * __t * __t - __t""")).as("__ties"))
    cells.join(broadcast(rank), "__v")
      .groupBy("__g")
      .agg(sum("__c").as("__ng"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __r2")).as("__t2"))
      .agg(count(lit(1)).as("k"),
        sum("__ng").cast("decimal(38,0)").as("__n"),
        sum(expr("(1000000 * __t2 * __t2) div __ng")).as("__q"))
      .crossJoin(broadcast(ties))
      // doubled ranks: Σ T2_g²/n_g = 4·Σ R_g²/n_g, and 12/4 = 3 —
      // the doubling folds the classic 12 down to the 3 below
      .withColumn("__hraw", expr(
        """CASE WHEN __n >= 2 THEN
             (3 * __q) div (__n * (__n + 1))
               - 3000000 * (__n + 1) END"""))
      .withColumn("__corr", expr("__n * __n * __n - __n - __ties"))
      .select(col("__n").cast("long").as("n"), col("k"),
        expr("k - 1").as("dof"),
        expr("""CASE WHEN __hraw IS NOT NULL AND __corr > 0 THEN
             CAST(CASE WHEN __hraw < 0
               THEN -((-(__hraw * (__n * __n * __n - __n))) div __corr)
               ELSE (__hraw * (__n * __n * __n - __n)) div __corr END
             AS BIGINT) END""").as("h_micro"))
  }

  /** Cramér's V (C124 — the EFFECT SIZE beside [[chiSquareIndep]]'s
    * significance: χ² grows with n, so a dashboard comparing
    * association strength across segments of different sizes needs
    * the normalized V² = χ²/(n·min(R−1,C−1)) ∈ [0,1], not raw χ²).
    * Composes the chi-square frame (same exact integer statistic,
    * same quantization contract) and adds one stated floor:
    * `v2_permyriad = chi2_micro div (100·n·min(R−1,C−1))` (10⁴/10⁶
    * = 1/100). Degenerate tables (single row or column) read null.
    *
    * Scale shape: [[chiSquareIndep]]'s — the extra column is free.
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame =
    chiSquareIndep(df, aCol, bCol)
      .withColumn("v2_permyriad", expr(
        """CASE WHEN least(n_rows_a - 1, n_cols_b - 1) > 0 THEN
             chi2_micro div (100 * n * least(n_rows_a - 1, n_cols_b - 1))
           END"""))

  /** One-way ANOVA F (C125 — the k-group parametric leg: welch covers
    * two groups, [[kruskalWallis]] covers ranks; when a metric
    * averages well across k segments, the F ratio IS the variance
    * decomposition every analysis starts from — and η² beside it, the
    * effect size reviewers ask for next to F). EXACT integer moments
    * per group (DECIMAL(38,0) n_g/S1_g/S2_g), then the stated floor
    * cascade on the micro grid: per-group `q_g = (10⁶·S1_g²) div
    * n_g`, `ssb = Σq_g − (10⁶·S1²) div n`,
    * `ssw = 10⁶·S2 − Σq_g`, `f_milli = (1000·ssb·(n−k)) div
    * (ssw·(k−1))`, `eta2_permyriad = (10⁴·ssb) div (ssb + ssw)`.
    * Zero within-variance or n ≤ k reads null F; the micro floors
    * can dip ssb a hair negative at zero between-variance — clamped
    * to 0 (the [[jsDivergence]] convention).
    *
    * Scale shape: ONE k-row group aggregation (map-side combined)
    * + one scalar agg — the cheapest family shape.
    */
  def anovaF(df: DataFrame, groupCol: String,
             valueCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    anovaFromCells(cells)
  }

  /** The moment cascade shared by [[anovaF]] and [[leveneTest]] —
    * input is the weighted (group, value, count) cell frame. */
  private[operators] def anovaFromCells(cells: DataFrame): DataFrame =
    cells.groupBy("__g")
      .agg(sum("__c").as("__ng"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __v")).as("__s1"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __v * __v")).as("__s2"))
      .agg(count(lit(1)).as("k"),
        sum("__ng").cast("decimal(38,0)").as("__n"),
        sum(expr("CAST(__s1 AS DECIMAL(38,0))")).as("__s1t"),
        sum(expr("CAST(__s2 AS DECIMAL(38,0))")).as("__s2t"),
        sum(expr("(1000000 * __s1 * __s1) div __ng")).as("__q"))
      .withColumn("__ssb", expr(
        """greatest(CAST(0 AS DECIMAL(38,0)),
             __q - (1000000 * __s1t * __s1t) div __n)"""))
      .withColumn("__ssw", expr(
        "greatest(CAST(0 AS DECIMAL(38,0)), 1000000 * __s2t - __q)"))
      .select(col("__n").cast("long").as("n"), col("k"),
        expr("k - 1").as("dof_between"),
        expr("CAST(__n AS BIGINT) - k").as("dof_within"),
        expr("""CASE WHEN __ssw > 0 AND __n > k AND k >= 2 THEN
             CAST((1000 * __ssb * (__n - k)) div (__ssw * (k - 1))
               AS BIGINT) END""").as("f_milli"),
        expr("""CASE WHEN __ssb + __ssw > 0 THEN
             CAST((10000 * __ssb) div (__ssb + __ssw) AS BIGINT)
           END""").as("eta2_permyriad"))

  /** Brown-Forsythe / Levene variance-homogeneity test (C126 — the
    * gate in FRONT of [[anovaF]]: classic ANOVA assumes equal group
    * variances, and the median-centered Levene statistic is the
    * standard check — an F test on |x − median_g|, robust because
    * the center is the exact group MEDIAN, not the mean). Group
    * medians are exact lower order statistics from the per-group
    * value distribution (fold over the sorted cell list — the repo's
    * no-corpus-sort contract: `med_g` = smallest v with
    * cum ≥ (n_g+1) div 2), deviations stay integral
    * (`|v − med_g|` on the quantized grid, weighted by the cell
    * count), and the same [[anovaFromCells]] cascade reports
    * F/η² over the deviations.
    *
    * Scale shape: one (group, value) cell aggregation, one k-row
    * median fold, a broadcast join of medians back onto the ≤|cells|
    * frame, then the [[anovaF]] shape.
    */
  def leveneTest(df: DataFrame, groupCol: String,
                 valueCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val med = cells
      .groupBy("__g")
      .agg(array_sort(collect_list(struct(col("__v"), col("__c"))))
        .as("__a"), sum("__c").as("__ng"))
      .select(col("__g"), expr("""aggregate(__a,
        struct(CAST(0 AS BIGINT) AS cum, CAST(NULL AS BIGINT) AS med),
        (acc, el) -> struct(acc.cum + el.__c AS cum,
          CASE WHEN acc.med IS NULL
                AND acc.cum + el.__c >= (__ng + 1) div 2
            THEN el.__v ELSE acc.med END AS med)).med""").as("__med"))
    val dev = cells.join(broadcast(med), "__g")
      .select(col("__g"), expr("abs(__v - __med)").as("__v"),
        col("__c"))
      .groupBy("__g", "__v").agg(sum("__c").as("__c"))
    anovaFromCells(dev)
  }

  /** Group-fairness report (C127 — the RESPONSIBLE-AI leg of the eval
    * family: classification_report scores the model, this scores its
    * PARITY — the three gaps every fairness audit opens with:
    * demographic parity (selection-rate spread), equalized-odds TPR
    * spread, and FPR spread across protected groups). Per group,
    * exact integer rates on the permille grid: `sr = (1000·#pred)
    * div n_g`, `tpr = (1000·#(pred∧label)) div #label`,
    * `fpr = (1000·#(pred∧¬label)) div #¬label` (groups with an empty
    * denominator drop out of that gap, stated); each gap is
    * max − min over contributing groups. One row: visible parity at
    * a glance, with the group count so a 2-group gap reads
    * differently from a 20-group one.
    *
    * Scale shape: ONE group aggregation (map-side combined) + one
    * scalar agg — the [[forecastEval]] shape.
    */
  def fairnessReport(df: DataFrame, groupCol: String, labelCol: String,
                     predCol: String): DataFrame =
    df.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(predCol), 1L).otherwise(0L)).as("__p"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__l"),
        sum(when(col(labelCol) && col(predCol), 1L).otherwise(0L))
          .as("__tp"),
        sum(when(!col(labelCol) && col(predCol), 1L).otherwise(0L))
          .as("__fp"))
      .withColumn("__sr", expr("(1000 * __p) div __n"))
      .withColumn("__tpr", expr(
        "CASE WHEN __l > 0 THEN (1000 * __tp) div __l END"))
      .withColumn("__fpr", expr(
        "CASE WHEN __n - __l > 0 THEN (1000 * __fp) div (__n - __l) END"))
      .agg(sum("__n").as("n"), count(lit(1)).as("n_groups"),
        (max("__sr") - min("__sr")).as("dp_gap_permille"),
        (max("__tpr") - min("__tpr")).as("tpr_gap_permille"),
        (max("__fpr") - min("__fpr")).as("fpr_gap_permille"))

  /** Mann-Kendall monotone trend test + Theil-Sen slope (C136 — the
    * TREND question under every ops/metric series, asked robustly:
    * "is this KPI drifting, and how fast?" — regression slopes are
    * dragged by outliers and assume linearity; the MK S statistic
    * counts concordant-minus-discordant day pairs and the Sen slope
    * is the MEDIAN pairwise slope, the standard pre-alert pair on
    * monitoring series). Exact integers end-to-end: the corpus
    * collapses to the calendar daily frame first, `S = Σ_{i<j}
    * sign(x_j − x_i)` from the day-pair self-join (calendar², the
    * [[crossCorr]] bound — never event-pairs), tie-corrected
    * `var18 = n(n−1)(2n+5) − Σ_v t_v(t_v−1)(2t_v+5)` (= 18·Var(S))
    * from the value distribution, significance at 5% two-sided with
    * the continuity correction and NO normal inverse on the integer
    * grid: `180000·(|S|−1)² > 38416·var18` (z² > 1.96² with both
    * sides ×18·10⁴ — engines compare identical integers; S = 0 is
    * never significant). `sen_slope_milli` = LOWER MEDIAN (type-1,
    * stated) of per-pair `strunc(1000·(x_j−x_i), d_j−d_i)` quantized
    * slopes, via the distribution fold — the pairs never sort.
    *
    * Scale shape: one daily pre-agg, one calendar self-join, one
    * slope-distribution agg + fold, two scalar aggs. Event volume
    * touches only the first aggregation.
    */
  def mannKendall(daily: DataFrame, dayCol: String,
                  valueCol: String, maxDays: Long = 5000L): DataFrame = {
    require(maxDays >= 1, s"maxDays must be >= 1, got $maxDays")
    val d = daily.select(col(dayCol).cast("long").as("__d"),
      col(valueCol).cast("long").as("__x"))
    val a = d.select(col("__d").as("__da"), col("__x").as("__xa"))
    // the calendar² contract is EXECUTABLE (the kendallTau guard
    // discipline): `maxDays` (default 5000 ≈ 13.7 years — 25M pairs)
    // rides the shared raise_error guard on the broadcast side, so a
    // caller who feeds an unaggregated or mis-grained frame fails
    // fast instead of detonating a quadratic pair join — and the
    // guard counts DISTINCT days, so a duplicate-day frame (the
    // mis-grain the row count alone can't see) also fails instead of
    // silently double-counting pairs
    val b = withDailyGuard(d, maxDays, "mannKendall")
      .select(col("__d").as("__db"), col("__x").as("__xb"))
    // the daily frame is CALENDAR-bounded by construction, but its
    // static size estimate rides the event volume — at sf10 the
    // planner dropped to a CartesianProduct (r9 ScalePlanCheck).
    // Broadcast explicitly: the right plan at any volume.
    val pairs = a.join(broadcast(b), col("__da") < col("__db"))
    val sRow = pairs.agg(
      coalesce(sum(expr(
        """CASE WHEN __xb > __xa THEN 1
                WHEN __xb < __xa THEN -1 ELSE 0 END""")), lit(0L))
        .cast("decimal(38,0)").as("__s"),
      count(lit(1)).as("__np"))
    val nTies = d.groupBy("__x").agg(count(lit(1)).as("__t"))
      .agg(coalesce(sum(expr(
        """CAST(__t AS DECIMAL(38,0)) * (__t - 1) * (2 * __t + 5)""")),
        lit(0).cast("decimal(38,0)")).as("__tt"),
        sum("__t").cast("decimal(38,0)").as("__n"))
    // lower-median Sen slope from the quantized-slope distribution
    val slopes = pairs
      .select(expr("""CASE WHEN __xb - __xa < 0
          THEN -((-(1000 * (__xb - __xa))) div (__db - __da))
          ELSE (1000 * (__xb - __xa)) div (__db - __da) END""").as("__sl"))
      .groupBy("__sl").agg(count(lit(1)).as("__c"))
      .agg(array_sort(collect_list(struct(col("__sl"), col("__c"))))
        .as("__a"))
      .select(expr("""aggregate(__a,
        struct(CAST(0 AS BIGINT) AS cum, CAST(NULL AS BIGINT) AS med,
               CAST(aggregate(__a, CAST(0 AS BIGINT),
                 (s, e) -> s + e.__c) AS BIGINT) AS np),
        (acc, el) -> struct(acc.cum + el.__c AS cum,
          CASE WHEN acc.med IS NULL AND 2 * (acc.cum + el.__c) >= acc.np
            THEN el.__sl ELSE acc.med END AS med,
          acc.np AS np)).med""").as("sen_slope_milli"))
    sRow.crossJoin(broadcast(nTies)).crossJoin(broadcast(slopes))
      .select(
        col("__n").cast("long").as("n_days"),
        col("__s").cast("long").as("s"),
        expr("""CAST(__n * (__n - 1) * (2 * __n + 5) - __tt AS BIGINT)""")
          .as("var18"),
        expr("CAST(sign(__s) AS BIGINT)").as("trend_sign"),
        expr("""CASE WHEN __s = 0 THEN false ELSE
          180000 * (abs(__s) - 1) * (abs(__s) - 1)
            > 38416 * (__n * (__n - 1) * (2 * __n + 5) - __tt)
          END""").as("significant"),
        col("sen_slope_milli"))
  }

  /** Benjamini-Hochberg FDR correction (C137 — the
    * multiple-comparisons gate the experiment family needs the moment
    * anyone runs a BATTERY of tests: at α = 5%, 100 true-null metrics
    * produce ~5 "significant" results; BH caps the expected FALSE
    * DISCOVERY rate instead of the per-test error). Over a frame of
    * (test_id, p_micro): reject every test with `p ≤ p_(k*)` where
    * k* is the LARGEST rank k with `p_(k) ≤ α·k/m` — computed
    * exactly on integers: ranks come from the p-value distribution's
    * cumulative fold (the clip_outliers device — the test table
    * never sorts; for tied p the largest rank among ties is the
    * binding one, which the cum count IS), the candidate test is
    * `1000·m·p_micro ≤ alphaPermille·cum·10⁶` in DECIMAL(38,0), the
    * cutoff is the max candidate p, broadcast back. No test passes ⇒
    * nothing rejected (cutoff null, stated).
    *
    * Scale shape: one p-distribution agg + fold, one 1-row broadcast
    * join back — Θ(distinct p) beyond the first agg.
    */
  def bhFdr(tests: DataFrame, idCol: String, pCol: String,
            alphaPermille: Long = 50L): DataFrame = {
    require(alphaPermille >= 1 && alphaPermille <= 1000,
      s"alphaPermille in [1,1000], got $alphaPermille")
    val t = tests.select(col(idCol).as("test_id"),
      col(pCol).cast("long").as("p_micro"))
    val dist = t.groupBy("p_micro").agg(count(lit(1)).as("__c"))
      .agg(array_sort(collect_list(struct(col("p_micro"), col("__c"))))
        .as("__a"))
      .select(expr(s"""aggregate(__a,
        struct(CAST(0 AS BIGINT) AS cum, CAST(NULL AS BIGINT) AS cut,
               CAST(aggregate(__a, CAST(0 AS BIGINT),
                 (s, e) -> s + e.__c) AS BIGINT) AS m),
        (acc, el) -> struct(acc.cum + el.__c AS cum,
          CASE WHEN CAST(1000 AS DECIMAL(38,0)) * acc.m * el.p_micro
                 <= CAST($alphaPermille AS DECIMAL(38,0))
                    * (acc.cum + el.__c) * 1000000
            THEN el.p_micro ELSE acc.cut END AS cut,
          acc.m AS m)).cut""").as("__cut"))
    t.crossJoin(broadcast(dist))
      .select(col("test_id"), col("p_micro"),
        coalesce(col("p_micro") <= col("__cut"), lit(false))
          .as("rejected"))
  }

  /** Fleiss' kappa (E105 — [[cohensKappa]] grown past two raters:
    * RLHF/eval annotation runs with 3+ raters per item need the
    * multi-rater chance-corrected agreement number before any label
    * ships; Fleiss' generalization is the standard). Contract: one
    * VOTE per (item, rater) — duplicate (item, rater) rows collapse
    * to the MIN label deterministically, never to two raters — and
    * every kept item rated by EXACTLY `nRaters` raters (items with
    * any other count DROP, stated — the statistic is undefined for
    * ragged panels). Exact integers:
    * `A = Σ_i (Σ_j n_ij² − n)` (so P̄ = A/(N·n·(n−1))),
    * `E = Σ_j (Σ_i n_ij)²` (so P̄e = E/(N²n²)), and the closed form
    * `kappa_permyriad = strunc(10⁴·(A·N·n − E·(n−1)),
    * (n−1)·(N²n² − E))` in DECIMAL(38,0); the all-one-label
    * degenerate (N²n² = E) reads null.
    *
    * Scale shape: one (item, label) cell agg, one item agg (the kept
    * filter + A), one label agg (E) — everything map-side combined,
    * scalars broadcast. The corpus never sorts.
    */
  def fleissKappa(ratings: DataFrame, itemCol: String, raterCol: String,
                  labelCol: String, nRaters: Int): DataFrame = {
    require(nRaters >= 2, s"nRaters must be >= 2, got $nRaters")
    // each (item, rater) contributes exactly ONE vote: a rater who
    // rates an item twice collapses to the MIN label (deterministic)
    // instead of counting as two raters — without this, a duplicated
    // row can wrongly pass (or fail) the exact-nRaters panel filter
    val votes = ratings
      .groupBy(col(itemCol).as("__i"), col(raterCol).as("__r"))
      .agg(min(col(labelCol)).as("__l"))
    val cells = votes
      .groupBy(col("__i"), col("__l"))
      .agg(count(lit(1)).as("__nij"))
    fleissKappaFromCells(cells, "__i", "__l", "__nij", nRaters)
  }

  /** [[fleissKappa]]'s report tail over PRE-BUILT (item, label, n)
    * vote cells — shared with the D33 streaming twin
    * ([[graft.streaming.Streams.streamFleissCells]] maintains the
    * cells; this rebuilds kappa from the latest emission whenever
    * asked), the [[graft.operators.TextAnalysis.tokenKeynessFromCells]]
    * split. Same exact-integer closed form and exactly-`nRaters`
    * panel filter as the batch operator.
    */
  def fleissKappaFromCells(cellsIn: DataFrame, itemCol: String,
                           labelCol: String, nCol: String,
                           nRaters: Int): DataFrame = {
    require(nRaters >= 2, s"nRaters must be >= 2, got $nRaters")
    val cells = cellsIn.select(col(itemCol).as("__i"),
      col(labelCol).as("__l"), col(nCol).as("__nij"))
    val itemTot = cells.groupBy("__i")
      .agg(sum("__nij").as("__ni"),
        sum(expr("CAST(__nij AS DECIMAL(38,0)) * __nij")).as("__sq"))
      .filter(col("__ni") === nRaters)
    val aRow = itemTot.agg(
      count(lit(1)).cast("decimal(38,0)").as("__N"),
      coalesce(sum(expr(s"__sq - $nRaters")),
        lit(0).cast("decimal(38,0)")).as("__A"))
    val eRow = cells.join(itemTot.select("__i"), "__i")
      .groupBy("__l").agg(sum("__nij").as("__lj"))
      .agg(coalesce(sum(expr(
        "CAST(__lj AS DECIMAL(38,0)) * __lj")),
        lit(0).cast("decimal(38,0)")).as("__E"),
        count(lit(1)).as("n_labels"))
    val n = nRaters.toLong
    aRow.crossJoin(broadcast(eRow))
      .select(
        col("__N").cast("long").as("n_items"),
        lit(n).as("n_raters"), col("n_labels"),
        expr(s"""CASE WHEN __N > 0
          THEN CAST((10000 * __A) div (__N * $n * ${n - 1}) AS BIGINT)
          END""").as("p_bar_permyriad"),
        expr(s"""CASE WHEN __N > 0
          THEN CAST((10000 * __E) div (__N * __N * $n * $n) AS BIGINT)
          END""").as("pe_permyriad"),
        expr(s"""CASE WHEN __N > 0
                  AND __N * __N * $n * $n - __E <> 0 THEN
          CAST(CASE WHEN 10000 * (__A * __N * $n - __E * ${n - 1}) < 0
            THEN -((-(10000 * (__A * __N * $n - __E * ${n - 1})))
                   div (${n - 1} * (__N * __N * $n * $n - __E)))
            ELSE (10000 * (__A * __N * $n - __E * ${n - 1}))
                 div (${n - 1} * (__N * __N * $n * $n - __E))
            END AS BIGINT) END""").as("kappa_permyriad"))
  }

  /** Inter-arrival burstiness profile (C138 — the arrival-process
    * diagnostic beside the time-series trio: anomaly/trend/shift
    * detectors all assume SOME regularity of arrivals; CV² of the
    * inter-event gaps says whether a stream is Poisson-like (CV² ≈ 1),
    * clock-regular (≪ 1), or bursty (≫ 1) — the number that decides
    * whether rate alerts are even meaningful, and at corpus scale the
    * bot-vs-human tell on event streams). Per group: consecutive
    * same-user gaps (seconds) from a user-partitioned lag — the C42
    * key-partitioned-window discipline, never a global sort — then
    * exact DECIMAL(38,0) gap moments per group and the stated floors
    * `mean_gap_milli = (1000·Σg) div n`, `cv2_permyriad =
    * (10⁴·(n·Σg² − (Σg)²)) div (Σg)²` (variance/mean² with the n's
    * cleared — integer-exact; zero-mean groups read null; groups with
    * < 2 gaps drop).
    *
    * Scale shape: one user-partitioned lag window (single shuffle on
    * user), one group agg — map-side combined.
    */
  def burstiness(events: DataFrame, userCol: String, tsSecCol: String,
                 groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // secondary sort on the group makes same-instant attribution
    // deterministic (two same-ts events of different types: the gap
    // VALUE is order-free, but which group OWNS it is not without
    // the tiebreak)
    val w = Window.partitionBy(col("__u")).orderBy(col("__t"), col("grp"))
    val gaps = events
      .select(col(groupCol).as("grp"), col(userCol).as("__u"),
        col(tsSecCol).cast("long").as("__t"))
      .withColumn("__gap", col("__t") - lag(col("__t"), 1).over(w))
      .filter(col("__gap").isNotNull)
    burstinessFromGaps(gaps.select(col("grp"), col("__gap")))
  }

  /** [[burstiness]]'s report tail over a PRE-DERIVED (grp, __gap)
    * frame — shared with the D32 streaming twin
    * ([[graft.streaming.Streams.streamUserGaps]] derives the gaps
    * with per-user frontier state; this rebuilds the CV² report from
    * the gap log whenever asked). Same exact DECIMAL moments and
    * stated floors as the batch operator.
    */
  def burstinessFromGaps(gaps: DataFrame): DataFrame =
    gaps
      .groupBy("grp")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__gap").cast("decimal(38,0)")).as("__s"),
        sum(expr("CAST(__gap AS DECIMAL(38,0)) * __gap")).as("__s2"))
      .filter(col("n_gaps") >= 2)
      .select(col("grp"), col("n_gaps"),
        expr("CAST((1000 * __s) div n_gaps AS BIGINT)")
          .as("mean_gap_milli"),
        expr("""CASE WHEN __s > 0 THEN
            CAST((10000 * (n_gaps * __s2 - __s * __s)) div (__s * __s)
              AS BIGINT) END""").as("cv2_permyriad"))

  /** Single-changepoint detection by binary segmentation (C139 — the
    * OFFLINE complement of [[cusumChangepoints]]' online detector:
    * after a drift alarm fires, "WHEN did the level shift?" is the
    * first follow-up, and the binary-segmentation split — maximize
    * the between-segment sum of squares over all split points — is
    * the classic estimator). The CONTRACT is the QUANTIZED objective
    * (stated): `score_micro(t) = (10⁶·(n·S_t − n_t·S)²) div
    * (n²·n_t·(n−n_t))` over prefix sums of the daily series, argmax
    * by (score desc, split day asc) — both engines walk identical
    * integers, so the split is engine-exact even at objective ties.
    * The split day is the LAST day of the left segment. Series with
    * < 2 days read null.
    *
    * Scale shape: one daily pre-agg, one distribution fold over the
    * calendar-sized series (prefix sums + running argmax in one HOF
    * pass — the corpus never sorts), one scalar row out. The
    * single-array fold makes the daily contract LOAD-BEARING, so it
    * is executable: [[withDailyGuard]] (`maxDays`, default 5000 —
    * the [[mannKendall]] bound) fails an oversized or duplicate-day
    * frame fast instead of materializing a corpus-sized array in one
    * task.
    */
  def changepointDetect(daily: DataFrame, dayCol: String,
                        valueCol: String, maxDays: Long = 5000L): DataFrame = {
    require(maxDays >= 1, s"maxDays must be >= 1, got $maxDays")
    val d = withDailyGuard(
      daily.select(col(dayCol).cast("long").as("__d"),
        col(valueCol).cast("long").as("__x")),
      maxDays, "changepointDetect")
    d.agg(array_sort(collect_list(struct(col("__d"), col("__x"))))
        .as("__a"))
      .select(expr("""aggregate(__a,
        struct(CAST(0 AS BIGINT) AS i, CAST(0 AS DECIMAL(38,0)) AS st,
               CAST(NULL AS BIGINT) AS day, CAST(NULL AS BIGINT) AS best,
               CAST(size(__a) AS DECIMAL(38,0)) AS n,
               CAST(aggregate(__a, CAST(0 AS DECIMAL(38,0)),
                 (s, e) -> s + e.__x) AS DECIMAL(38,0)) AS s),
        (acc, el) -> struct(acc.i + 1L AS i, acc.st + el.__x AS st,
          CASE WHEN acc.i + 1L < CAST(acc.n AS BIGINT) AND (acc.best IS NULL
                 OR CAST((1000000 * (acc.n * (acc.st + el.__x)
                      - (acc.i + 1) * acc.s)
                      * (acc.n * (acc.st + el.__x) - (acc.i + 1) * acc.s))
                    div (acc.n * acc.n * (acc.i + 1)
                      * (acc.n - acc.i - 1)) AS BIGINT) > acc.best)
            THEN el.__d ELSE acc.day END AS day,
          CASE WHEN acc.i + 1L < CAST(acc.n AS BIGINT) AND (acc.best IS NULL
                 OR CAST((1000000 * (acc.n * (acc.st + el.__x)
                      - (acc.i + 1) * acc.s)
                      * (acc.n * (acc.st + el.__x) - (acc.i + 1) * acc.s))
                    div (acc.n * acc.n * (acc.i + 1)
                      * (acc.n - acc.i - 1)) AS BIGINT) > acc.best)
            THEN CAST((1000000 * (acc.n * (acc.st + el.__x)
                   - (acc.i + 1) * acc.s)
                   * (acc.n * (acc.st + el.__x) - (acc.i + 1) * acc.s))
                 div (acc.n * acc.n * (acc.i + 1)
                   * (acc.n - acc.i - 1)) AS BIGINT)
            ELSE acc.best END AS best,
          acc.n AS n, acc.s AS s))""").as("__r"))
      .select(
        expr("CAST(__r.n AS BIGINT)").as("n_days"),
        col("__r.day").as("split_day"),
        col("__r.best").as("score_micro"))
  }

  /** Krippendorff's alpha, nominal data (E110 — [[fleissKappa]]'s
    * missing-data sibling: REAL annotation runs are ragged — raters
    * abstain, time out, get sampled — and Fleiss drops every ragged
    * item by contract; Krippendorff's alpha is the standard
    * agreement statistic that KEEPS them, weighting each unit's
    * disagreement by its own panel size). Contract: one VOTE per
    * (item, rater) — duplicates collapse to the MIN label, the
    * [[fleissKappa]] rule — units kept iff ≥ 2 votes (alpha is
    * undefined below). The CONTRACT is the QUANTIZED objective
    * (stated, the [[changepointDetect]] precedent): per-unit
    * disagreement `U_micro = strunc(10⁶·(m_u² − Σ_c n_uc²), m_u−1)`,
    * `S = Σ_u U_micro`, expected-side `E = n² − Σ_c n_c²` over the
    * kept units' label totals, and `alpha_permyriad =
    * strunc(10⁴·(10⁶·E − (n−1)·S), 10⁶·E)` in DECIMAL(38,0) — both
    * engines walk identical integers (alpha can be NEGATIVE —
    * systematic disagreement — so the signed floor is explicit).
    * All-one-label degenerate (E = 0) reads null.
    *
    * Scale shape: one (item, label) cell agg, one item agg (panel
    * filter + disagreement), one label agg — all map-side combined,
    * scalars broadcast. The corpus never sorts.
    */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
                        raterCol: String, labelCol: String): DataFrame = {
    val votes = ratings
      .groupBy(col(itemCol).as("__i"), col(raterCol).as("__r"))
      .agg(min(col(labelCol)).as("__l"))
    val cells = votes
      .groupBy(col("__i"), col("__l"))
      .agg(count(lit(1)).as("__nuc"))
    krippendorffAlphaFromCells(cells, "__i", "__l", "__nuc")
  }

  /** [[krippendorffAlpha]]'s report tail over PRE-BUILT (item, label,
    * n) vote cells — alpha is a pure function of the SAME cells the
    * D33 stream ([[graft.streaming.Streams.streamFleissCells]])
    * already maintains, so one maintained cell store serves BOTH
    * agreement reports (kappa via [[fleissKappaFromCells]], alpha
    * via this) with no extra state.
    */
  def krippendorffAlphaFromCells(cellsIn: DataFrame, itemCol: String,
                                 labelCol: String,
                                 nCol: String): DataFrame = {
    val cells = cellsIn.select(col(itemCol).as("__i"),
      col(labelCol).as("__l"), col(nCol).as("__nuc"))
    val itemTot = cells.groupBy("__i")
      .agg(sum("__nuc").as("__m"),
        sum(expr("CAST(__nuc AS DECIMAL(38,0)) * __nuc")).as("__sq"))
      .filter(col("__m") >= 2)
    val sRow = itemTot.agg(
      count(lit(1)).as("n_units"),
      coalesce(sum("__m"), lit(0)).cast("decimal(38,0)").as("__n"),
      coalesce(sum(expr(
        """(1000000 * (CAST(__m AS DECIMAL(38,0)) * __m - __sq))
           div (__m - 1)""")), lit(0).cast("decimal(38,0)")).as("__s"))
    val eRow = cells.join(itemTot.select("__i"), "__i")
      .groupBy("__l").agg(sum("__nuc").as("__ncl"))
      .agg(count(lit(1)).as("n_labels"),
        coalesce(sum(expr("CAST(__ncl AS DECIMAL(38,0)) * __ncl")),
          lit(0).cast("decimal(38,0)")).as("__sq2"))
    sRow.crossJoin(broadcast(eRow))
      .select(col("n_units"),
        col("__n").cast("long").as("n_ratings"), col("n_labels"),
        expr("""CASE WHEN n_units > 0
                  AND __n * __n - __sq2 > 0 THEN
          CAST(CASE
            WHEN 10000 * (1000000 * (__n * __n - __sq2)
                          - (__n - 1) * __s) < 0
            THEN -((-(10000 * (1000000 * (__n * __n - __sq2)
                               - (__n - 1) * __s)))
                   div (1000000 * (__n * __n - __sq2)))
            ELSE (10000 * (1000000 * (__n * __n - __sq2)
                           - (__n - 1) * __s))
                 div (1000000 * (__n * __n - __sq2))
            END AS BIGINT) END""").as("alpha_permyriad"))
  }

  /** Cochran's Q test (C140 — the k-treatment generalization of
    * [[mcnemarCheck]]'s paired binary test: "do these k binary
    * treatments — model variants, gate configurations, prompt
    * templates — have equal success rates over the SAME subjects?"
    * is the matched-battery question the pairwise test can't answer
    * without k² comparisons and an FDR bill). Contract: one
    * observation per (subject, treatment) — duplicates collapse by
    * OR (any success counts, stated) — subjects kept iff observed
    * under EXACTLY the k distinct treatments present (incomplete
    * blocks drop; the statistic requires complete blocks). Exact
    * integers: with row sums R_i, column sums T_j, S = ΣR_i,
    * `q_milli = strunc(1000·(k−1)·Σ_j(k·T_j − S)²,
    * k·(k·S − ΣR_i²))` in DECIMAL(38,0); the degenerate
    * all-0/all-k panel (denominator 0) reads null. Significance at
    * 5% on the integer grid: `1000·(k−1)·Σ(kT_j−S)² >
    * crit_milli(df)·(k·(kS − ΣR²))` with the χ²₀.₀₅ critical values
    * embedded in MILLI for df 1..10 — no float inverse-CDF in either
    * engine.
    *
    * Scale shape: one (subject, treatment) collapse, one subject
    * agg (block filter + R moments), one treatment agg (T) — all
    * map-side combined, scalars broadcast.
    */
  def cochranQ(obs: DataFrame, subjectCol: String, treatmentCol: String,
               successCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 11, s"k in [2,11] (df 1..10), got $k")
    // χ²₀.₀₅ critical values, milli, df 1..10
    val critMilli = Seq(3841L, 5991L, 7815L, 9488L, 11070L, 12592L,
      14067L, 15507L, 16919L, 18307L)(k - 2)
    val cells = obs
      .groupBy(col(subjectCol).as("__s"), col(treatmentCol).as("__t"))
      .agg(max(col(successCol).cast("boolean")).cast("long").as("__x"))
    val subj = cells.groupBy("__s")
      .agg(count(lit(1)).as("__nt"), sum("__x").as("__r"))
      .filter(col("__nt") === k)
    val rRow = subj.agg(
      count(lit(1)).as("n_subjects"),
      coalesce(sum("__r"), lit(0)).cast("decimal(38,0)").as("__S"),
      coalesce(sum(expr("CAST(__r AS DECIMAL(38,0)) * __r")),
        lit(0).cast("decimal(38,0)")).as("__r2"))
    val tRow = cells.join(subj.select("__s"), "__s")
      .groupBy("__t").agg(sum("__x").as("__tj"))
      .agg(count(lit(1)).as("n_treatments"),
        coalesce(sum(expr("CAST(__tj AS DECIMAL(38,0)) * __tj")),
          lit(0).cast("decimal(38,0)")).as("__t2"),
        coalesce(sum("__tj"), lit(0)).cast("decimal(38,0)").as("__ts"))
    rRow.crossJoin(broadcast(tRow))
      .select(col("n_subjects"), lit(k.toLong).as("k"),
        lit(k - 1L).as("df"),
        // Σ(k·T_j − S)² = k²·ΣT² − 2kS·ΣT + k·S² ; ΣT = S over the
        // kept blocks, so it folds to k²·ΣT² − k·S²
        expr(s"""CASE WHEN n_subjects > 0 AND n_treatments = $k
                   AND $k * __S - __r2 > 0 THEN
          CAST((1000 * ${k - 1} * ($k * $k * __t2 - $k * __S * __S))
               div ($k * ($k * __S - __r2)) AS BIGINT) END""")
          .as("q_milli"),
        expr(s"""CASE WHEN n_subjects > 0 AND n_treatments = $k
                   AND $k * __S - __r2 > 0 THEN
          1000 * ${k - 1} * ($k * $k * __t2 - $k * __S * __S)
            > $critMilli * ($k * ($k * __S - __r2))
          END""").as("significant"))
  }

  /** Wald-Wolfowitz runs test (C141 — the RANDOMNESS check under the
    * time-series family: trend says "is it drifting", changepoint
    * says "where did it shift", the runs test says "is this binary
    * daily sequence even RANDOM, or does it clump/alternate?" — the
    * cheapest autocorrelation alarm on a gate/flag series). Over a
    * daily boolean series ([[withDailyGuard]], the calendar
    * contract): `runs R = 1 + Σ 1[x_d ≠ x_prev]` from the sorted
    * fold (the corpus never sorts — one distribution fold), n₁/n₂
    * the positive/negative day counts, and 5% two-sided significance
    * with NO normal inverse on the integer grid:
    * `10⁴·(R·n − n − 2n₁n₂)²·(n−1) > 38416·2n₁n₂·(2n₁n₂ − n)`
    * (z² > 1.96² with both sides cleared of denominators —
    * identical integers in both engines). One-sided degenerates
    * (n₁ = 0 or n₂ = 0) and zero-variance panels read null.
    */
  def runsTest(daily: DataFrame, dayCol: String, boolCol: String,
               maxDays: Long = 5000L): DataFrame = {
    require(maxDays >= 1, s"maxDays must be >= 1, got $maxDays")
    val d = withDailyGuard(
      daily.select(col(dayCol).cast("long").as("__d"),
        col(boolCol).cast("boolean").cast("long").as("__x")),
      maxDays, "runsTest")
    d.agg(array_sort(collect_list(struct(col("__d"), col("__x"))))
        .as("__a"))
      .select(expr("""aggregate(__a,
        struct(CAST(NULL AS BIGINT) AS prev, CAST(0 AS BIGINT) AS runs,
               CAST(0 AS BIGINT) AS n1, CAST(0 AS BIGINT) AS n2),
        (acc, el) -> struct(el.__x AS prev,
          acc.runs + CASE WHEN acc.prev IS NULL
                          OR acc.prev <> el.__x THEN 1 ELSE 0 END AS runs,
          acc.n1 + CASE WHEN el.__x = 1 THEN 1 ELSE 0 END AS n1,
          acc.n2 + CASE WHEN el.__x = 0 THEN 1 ELSE 0 END AS n2))""")
        .as("__r"))
      .select(
        expr("__r.n1 + __r.n2").as("n_days"),
        col("__r.n1").as("n_pos"), col("__r.n2").as("n_neg"),
        col("__r.runs").as("runs"),
        expr("""CASE WHEN __r.n1 > 0 AND __r.n2 > 0
                  AND 2 * __r.n1 * __r.n2 > __r.n1 + __r.n2 THEN
          10000 * CAST(__r.runs * (__r.n1 + __r.n2) - (__r.n1 + __r.n2)
                       - 2 * __r.n1 * __r.n2 AS DECIMAL(38,0))
                * (__r.runs * (__r.n1 + __r.n2) - (__r.n1 + __r.n2)
                   - 2 * __r.n1 * __r.n2)
                * (__r.n1 + __r.n2 - 1)
            > CAST(38416 AS DECIMAL(38,0)) * 2 * __r.n1 * __r.n2
                * (2 * __r.n1 * __r.n2 - (__r.n1 + __r.n2))
          END""").as("significant"))
  }

  /** Friedman test (C142 — [[cochranQ]] grown from binary to ORDINAL
    * responses: "do these k treatments — model variants, prompt
    * templates, ranker configs — produce the same response
    * DISTRIBUTION over the same subjects?" when the response is a
    * count/score rather than pass-fail; the non-parametric repeated-
    * measures ANOVA). Contract: one observation per (subject,
    * treatment) — duplicates collapse to the MIN value (stated,
    * deterministic) — subjects kept iff observed under EXACTLY the k
    * global treatments (incomplete blocks drop). Within each block
    * values become DOUBLED average ranks (`r2 = 2·#less + #eq + 1`,
    * integer by construction — ties carry the standard average rank
    * with no floats), and the TIE-CORRECTED statistic rides exact
    * integers with denominators cleared: with `R2_j = Σ_i r2_ij`,
    * `A2 = Σ_ij r2_ij²`,
    * `q_milli = strunc(1000·(k−1)·(ΣR2_j² − n²k(k+1)²),
    * A2 − nk(k+1)²)` (both sides provably ≥ 0; the all-tied panel —
    * denominator 0 — reads null). Significance at 5% on the integer
    * grid vs the χ²₀.₀₅(k−1) critical values embedded in MILLI — no
    * float inverse-CDF in either engine.
    *
    * Scale shape: one (subject, treatment) collapse, one subject agg
    * (block assembly — k ≤ 11 cells per block, the rank HOF is k²
    * inside one row), one treatment agg over exploded ranks — all
    * map-side combined, scalars broadcast; nothing event-sized
    * shuffles twice.
    */
  def friedmanTest(obs: DataFrame, subjectCol: String, treatmentCol: String,
                   valueCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 11, s"k in [2,11] (df 1..10), got $k")
    val critMilli = Seq(3841L, 5991L, 7815L, 9488L, 11070L, 12592L,
      14067L, 15507L, 16919L, 18307L)(k - 2)
    val cells = obs
      .groupBy(col(subjectCol).as("__s"), col(treatmentCol).as("__t"))
      .agg(min(col(valueCol).cast("long")).as("__v"))
    // complete blocks only; doubled average ranks inside the block:
    // r2 = 2·(#strictly-less) + (#equal incl. self) + 1
    val blocks = cells.groupBy("__s")
      .agg(collect_list(struct(col("__t"), col("__v"))).as("__b"))
      .filter(size(col("__b")) === k)
      .withColumn("__r", expr(
        """transform(__b, e -> struct(e.__t AS t,
             CAST(2 * size(filter(__b, y -> y.__v < e.__v))
                  + size(filter(__b, y -> y.__v = e.__v)) + 1
                  AS BIGINT) AS r2))"""))
      .withColumn("__a2", expr(
        "aggregate(__r, CAST(0 AS BIGINT), (a, e) -> a + e.r2 * e.r2)"))
    val sRow = blocks.agg(count(lit(1)).as("n_subjects"),
      coalesce(sum("__a2"), lit(0)).cast("decimal(38,0)").as("__A2"))
    val tRow = blocks.select(explode(col("__r")).as("__e"))
      .groupBy(col("__e.t").as("__t"))
      .agg(sum(col("__e.r2")).as("__R2"))
      .agg(count(lit(1)).as("n_treatments"),
        coalesce(sum(expr("CAST(__R2 AS DECIMAL(38,0)) * __R2")),
          lit(0).cast("decimal(38,0)")).as("__rr"))
    val kk1 = (k + 1L) * (k + 1L) // (k+1)² — clears the rank mean
    sRow.crossJoin(broadcast(tRow))
      .select(col("n_subjects"), lit(k.toLong).as("k"),
        lit(k - 1L).as("df"),
        expr(s"""CASE WHEN n_subjects > 0 AND n_treatments = $k
                   AND __A2 - CAST(n_subjects AS DECIMAL(38,0))
                       * $k * $kk1 > 0 THEN
          CAST((1000 * ${k - 1}
                * (__rr - CAST(n_subjects AS DECIMAL(38,0))
                          * n_subjects * $k * $kk1))
               div (__A2 - CAST(n_subjects AS DECIMAL(38,0))
                           * $k * $kk1) AS BIGINT) END""").as("q_milli"),
        expr(s"""CASE WHEN n_subjects > 0 AND n_treatments = $k
                   AND __A2 - CAST(n_subjects AS DECIMAL(38,0))
                       * $k * $kk1 > 0 THEN
          1000 * ${k - 1} * (__rr - CAST(n_subjects AS DECIMAL(38,0))
                                    * n_subjects * $k * $kk1)
            > $critMilli * (__A2 - CAST(n_subjects AS DECIMAL(38,0))
                                   * $k * $kk1) END""").as("significant"))
  }

  /** Ljung-Box portmanteau test (C143 — the WHITE-NOISE check closing
    * the series triage: [[mannKendall]] says "is it drifting",
    * [[changepointDetect]] says "where did it shift", [[runsTest]]
    * says "does the binary series clump" — Ljung-Box asks the
    * numeric series "is ANY autocorrelation left in the first m
    * lags?", the standard residual-diagnostics gate). Over a daily
    * series under the shared [[withDailyGuard]] calendar contract,
    * lags are POSITIONS in the day-sorted observed series (gaps
    * close up — stated; [[acfLags]] is the calendar-lag view). The
    * CONTRACT is the QUANTIZED objective (the changepoint
    * precedent): with scaled deviations `c_i = n·x_i − S` (clears
    * the rational mean), `den = Σc²`, `num_h = Σ_i c_i·c_{i+h}`,
    * `rho_h = strunc(10⁶·|num_h|, den)` (|num_h| ≤ den by
    * Cauchy-Schwarz so rho ≤ 10⁶), `term_h = strunc(10⁶·rho_h²,
    * n−h)`, and `q_milli = strunc(1000·n·(n+2)·Σterm, 10¹⁸)` —
    * both engines walk identical integers. Significance at 5% on the
    * same grid vs χ²₀.₀₅(m) embedded in MILLI. Series with n ≤ m or
    * zero variance read null; `rho1_micro` carries lag-1 with its
    * sign for direction.
    *
    * Scale shape: one daily fold (the guard bounds the array), all
    * m·n lag products inside ONE row via HOFs — the corpus never
    * sorts, nothing quadratic in events.
    */
  def ljungBox(daily: DataFrame, dayCol: String, valueCol: String,
               maxLag: Int, maxDays: Long = 5000L): DataFrame = {
    require(maxLag >= 1 && maxLag <= 10,
      s"maxLag in [1,10] (embedded chi-square grid), got $maxLag")
    val critMilli = Seq(3841L, 5991L, 7815L, 9488L, 11070L, 12592L,
      14067L, 15507L, 16919L, 18307L)(maxLag - 1)
    val d = withDailyGuard(
      daily.select(col(dayCol).cast("long").as("__d"),
        col(valueCol).cast("long").as("__x")),
      maxDays, "ljungBox")
    d.agg(array_sort(collect_list(struct(col("__d"), col("__x"))))
        .as("__a"))
      .select(expr("transform(__a, e -> e.__x)").as("__v"))
      .select(col("__v"), size(col("__v")).cast("long").as("__n"),
        expr("aggregate(__v, CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("__S"))
      .select(col("__n"),
        expr("transform(__v, x -> __n * x - __S)").as("__c"))
      .select(col("__n"), col("__c"),
        expr("""aggregate(__c, CAST(0 AS DECIMAL(38,0)),
          (a, x) -> CAST(a + CAST(x AS DECIMAL(38,0)) * x
                         AS DECIMAL(38,0)))""").as("__den"))
      .select(col("__n"), col("__den"),
        expr(s"""CASE WHEN __n > $maxLag AND __den > 0 THEN
          transform(sequence(1, $maxLag), h ->
            aggregate(sequence(1, CAST(__n - h AS INT)),
              CAST(0 AS DECIMAL(38,0)),
              (a, i) -> CAST(a + CAST(element_at(__c, i)
                                      AS DECIMAL(38,0))
                             * element_at(__c, i + h)
                             AS DECIMAL(38,0)))) END""").as("__num"))
      .select(col("__n"), col("__den"), col("__num"),
        expr("""CASE WHEN __num IS NOT NULL THEN
          transform(__num, v ->
            (1000000 * abs(v)) div __den) END""").as("__rho"))
      .select(col("__n"),
        expr("""CASE WHEN __num IS NOT NULL THEN
          CASE WHEN element_at(__num, 1) < 0
               THEN -element_at(__rho, 1)
               ELSE element_at(__rho, 1) END END""").as("rho1_micro"),
        expr(s"""CASE WHEN __num IS NOT NULL THEN
          aggregate(sequence(1, $maxLag), CAST(0 AS DECIMAL(38,0)),
            (a, h) -> CAST(a + (1000000
                * element_at(__rho, h) * element_at(__rho, h))
                div (__n - h) AS DECIMAL(38,0))) END""").as("__qs"))
      .select(col("__n").as("n_days"), lit(maxLag.toLong).as("df"),
        col("rho1_micro"),
        expr("""CASE WHEN __qs IS NOT NULL THEN
          CAST((1000 * CAST(__n AS DECIMAL(38,0)) * (__n + 2) * __qs)
               div CAST(1000000000000000000 AS DECIMAL(38,0))
               AS BIGINT) END""").as("q_milli"),
        expr(s"""CASE WHEN __qs IS NOT NULL THEN
          1000 * CAST(__n AS DECIMAL(38,0)) * (__n + 2) * __qs
            > $critMilli
              * CAST(1000000000000000000 AS DECIMAL(38,0)) END""")
          .as("significant"))
  }

  /** Wilcoxon signed-rank test (C144 — the PAIRED two-sample ordinal
    * test completing the matched-design battery: [[mcnemarCheck]] is
    * paired BINARY, [[friedmanTest]] is k-treatment ordinal,
    * [[mannWhitney]]-style rank tests are UNPAIRED — "did model B
    * score higher than model A on the SAME prompts?" needs the
    * signed-rank test on per-subject differences, the standard
    * paired model-eval significance check). Contract: one row per
    * pair with both values; zero differences DROP (standard);
    * |d| ranks are DOUBLED average ranks from the |d|-value
    * DISTRIBUTION (`r2 = 2·#less + #eq + 1` — the [[friedmanTest]]
    * rank device over a value histogram instead of a block), so the
    * corpus never sorts — Θ(distinct |d|) beyond one keyed agg (the
    * [[bhFdr]] fold class). Exact integers with denominators
    * cleared: `W2⁺ = Σ r2·1[d>0]`, `num = 2·W2⁺ − n(n+1)` (4× the
    * centered W⁺), tie term `T = Σ_g(c_g³ − c_g)`,
    * `var48 = 2n(n+1)(2n+1) − T` (48× the tie-corrected variance,
    * > 0 whenever n ≥ 1), `z2_milli = strunc(3000·num², var48)`,
    * and 5% two-sided significance `3·10⁴·num² > 38416·var48`
    * (z² > 1.96², identical integers both engines — no normal
    * inverse, no continuity correction, stated). Empty panels read
    * null.
    *
    * Scale shape: one map-side pair projection, one |d|-histogram
    * agg (map-side combined), one single-row fold over the sorted
    * distinct-|d| frame — nothing pair-sized shuffles twice, no
    * windows. The fold is Θ(distinct |d|), which for an UNQUANTIZED
    * wide-domain metric approaches n_pairs, so the §6 single-array
    * discipline applies: [[withCellGuard]] bounds the histogram at
    * `maxDistinctDiffs` (default 2¹⁶) BEFORE the collect_list —
    * a wide-domain caller fails fast with the quantize-upstream
    * remediation instead of materializing a corpus-sized array in
    * one task.
    */
  def wilcoxonSignedRank(pairs: DataFrame, aCol: String,
                         bCol: String,
                         maxDistinctDiffs: Long = 1L << 16): DataFrame = {
    val d = pairs.select(
      (col(aCol).cast("long") - col(bCol).cast("long")).as("__d"))
      .filter(col("__d") =!= 0)
      .select(abs(col("__d")).as("__g"),
        (col("__d") > 0).cast("long").as("__p"))
    val hist = d.groupBy("__g")
      .agg(count(lit(1)).as("__c"), sum("__p").as("__np"))
    // the maxDistinctDiffs bound rides the SAME scalar aggregation as
    // the rank fold (r12; r11 verdict item 9): the [[withCellGuard]]
    // crossJoin formulation re-aggregated the histogram lineage into a
    // second broadcast branch, tripling a sub-second key. Here the
    // cell count is one extra agg expression and the raise_error gates
    // the array before the fold reads it — same error contract
    // (R11FixesSpec), one pass.
    val msg = "wilcoxonSignedRank: the |d| magnitude histogram must " +
      s"hold at most maxDistinctDiffs=$maxDistinctDiffs distinct " +
      "magnitudes before the single-array rank fold; quantize the " +
      "metric upstream or raise maxDistinctDiffs knowingly"
    hist
      .agg(count(lit(1)).as("__ncells"), array_sort(collect_list(
        struct(col("__g"), col("__c"), col("__np")))).as("__a0"))
      .select(when(col("__ncells") <= maxDistinctDiffs, col("__a0"))
        .otherwise(raise_error(concat(lit(msg + " (got "),
          col("__ncells").cast("string"), lit(" cells)")))).as("__a"))
      .select(expr("""aggregate(__a,
        struct(CAST(0 AS BIGINT) AS cum,
               CAST(0 AS DECIMAL(38,0)) AS w2p,
               CAST(0 AS DECIMAL(38,0)) AS ties),
        (acc, el) -> struct(acc.cum + el.__c AS cum,
          CAST(acc.w2p + CAST(2 * acc.cum + el.__c + 1
                              AS DECIMAL(38,0)) * el.__np
               AS DECIMAL(38,0)) AS w2p,
          CAST(acc.ties + CAST(el.__c AS DECIMAL(38,0)) * el.__c
                          * el.__c - el.__c
               AS DECIMAL(38,0)) AS ties))""").as("__r"))
      .select(col("__r.cum").as("n_pairs"),
        expr("CAST(__r.w2p AS BIGINT)").as("w2_plus"),
        col("__r.w2p").as("__w"), col("__r.ties").as("__t"))
      .select(col("n_pairs"), col("w2_plus"),
        expr("""CASE WHEN n_pairs > 0 THEN
          2 * __w - CAST(n_pairs AS DECIMAL(38,0)) * (n_pairs + 1)
          END""").as("__num"),
        expr("""CASE WHEN n_pairs > 0 THEN
          2 * CAST(n_pairs AS DECIMAL(38,0)) * (n_pairs + 1)
            * (2 * n_pairs + 1) - __t END""").as("__v48"))
      .select(col("n_pairs"), col("w2_plus"),
        expr("""CASE WHEN __v48 > 0 THEN
          CAST((3000 * __num * __num) div __v48 AS BIGINT)
          END""").as("z2_milli"),
        expr("""CASE WHEN __v48 > 0 THEN
          30000 * __num * __num > 38416 * __v48 END""")
          .as("significant"))
  }

  /** Executable bounded-grid contract shared by the cell-join
    * operators ([[kendallTau]], [[Relational.skyline2d]]): the grid
    * bound becomes a 1-row `raise_error` guard crossed onto the cell
    * frame, so an UNQUANTIZED caller fails fast with the contract in
    * the message instead of silently detonating a B² broadcast join.
    * Cost: one extra scalar agg over the cell derivation; the guard
    * row broadcasts and the filter keeps the error expression alive
    * through column pruning.
    */
  private[operators] def withCellGuard(cells: DataFrame, maxCells: Long,
                                       msg: String): DataFrame = {
    val n = cells.agg(count(lit(1)).as("__ncells"))
    val ok = broadcast(n.select(
      when(col("__ncells") <= maxCells, lit(1L))
        .otherwise(raise_error(concat(lit(msg + " (got "),
          col("__ncells").cast("string"), lit(" cells)"))))
        .as("__cellguard")))
    cells.crossJoin(ok).filter(col("__cellguard") === 1L)
      .drop("__cellguard")
  }

  /** Executable DAILY-SERIES contract shared by the calendar-fold
    * operators ([[mannKendall]], [[changepointDetect]]): the input
    * must be one row per day (`__d`) with at most `maxDays` days —
    * both halves are load-bearing (the pair join is calendar-
    * quadratic; the single-array fold is calendar-sized; a
    * duplicate-day frame double-counts pairs / splits days without
    * either engine noticing). One scalar agg computes (rows,
    * distinct days); a violation raises with the contract in the
    * message, the [[withCellGuard]] broadcast-guard device.
    */
  private[operators] def withDailyGuard(d: DataFrame, maxDays: Long,
                                        op: String): DataFrame = {
    val n = d.agg(count(lit(1)).as("__n"),
      countDistinct(col("__d")).as("__nd"))
    val ok = broadcast(n.select(
      when(col("__n") <= maxDays && col("__n") === col("__nd"), lit(1L))
        .otherwise(raise_error(concat(
          lit(s"$op: the input must be a DAILY-AGGREGATED series " +
            s"with at most maxDays=$maxDays distinct days and no " +
            "duplicate days; aggregate upstream or raise maxDays " +
            "knowingly (got "),
          col("__n").cast("string"), lit(" rows over "),
          col("__nd").cast("string"), lit(" days)"))))
        .as("__dayguard")))
    d.crossJoin(ok).filter(col("__dayguard") === 1L).drop("__dayguard")
  }
}
