package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Behavior, Relational}

/** Fuzzed invariants for the behavioral-analytics family over a
  * deterministic pseudo-random corpus (LCG-derived, no RNG object —
  * the house reproducibility rule): conservation laws that must hold
  * for ANY input, complementing the hand-computed value specs.
  */
class BehaviorPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic corpus: 800 events, 37 users, 4 types, ts spread
  // over ~5 weeks with collisions (same-ts rows exercise tiebreaks)
  private lazy val ev = {
    var x = 88172645463325252L
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    Seq.tabulate(800) { i =>
      val u = math.floorMod(next(), 37L)
      val ts = math.floorMod(next(), 5L * 7 * 86400) * 1000000L
      val t = Seq("view", "click", "purchase", "error")(
        math.floorMod(next(), 4L).toInt)
      val v = math.floorMod(next(), 100000L)
      (u, i.toLong, ts, t, v)
    }.toDF("user_id", "event_id", "ts_us", "event_type", "value_milli")
      .cache()
  }

  test("eventTransitions conservation: Σn = rows − users; permille " +
       "per from_type in (1000 − #to, 1000]") {
    val tr = Behavior.eventTransitions(ev, "user_id", "ts_us", "event_id",
      "event_type").cache()
    val totalTransitions = tr.agg(sum("n")).as[Long].head()
    val rows = ev.count()
    val users = ev.select("user_id").distinct().count()
    assert(totalTransitions == rows - users)
    val shares = tr.groupBy("from_type")
      .agg(sum("permille").as("s"), count(lit(1)).as("k"))
      .as[(String, Long, Long)].collect()
    shares.foreach { case (f, s, k) =>
      assert(s > 1000L - k && s <= 1000L, s"$f: $s over $k cells")
    }
  }

  test("pathTrigrams conservation: Σn = Σ max(len_u − 2, 0)") {
    val tri = Behavior.pathTrigrams(ev, "user_id", "ts_us", "event_id",
      "event_type")
    val total = tri.agg(coalesce(sum("n"), lit(0L))).as[Long].head()
    val expect = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(sum(greatest(col("c") - 2, lit(0L)))).as[Long].head()
    assert(total == expect)
  }

  test("retentionCohorts: offset-0 cells partition the user base; " +
       "every cell bounded by its cohort size") {
    val rc = Behavior.retentionCohorts(ev, "user_id", "ts_us").cache()
    val users = ev.select("user_id").distinct().count()
    val atZero = rc.filter(col("week_offset") === 0)
      .agg(sum("n_users")).as[Long].head()
    assert(atZero == users)
    val bad = rc.as("r").join(
        rc.filter(col("week_offset") === 0)
          .select(col("cohort_week"), col("n_users").as("size0")),
        "cohort_week")
      .filter(col("n_users") > col("size0"))
    assert(bad.count() == 0L)
  }

  test("activeUsersRolling: dau ≤ wau ≤ mau; dau equals exact per-day " +
       "distinct in the exact regime") {
    val au = Behavior.activeUsersRolling(ev, "user_id", "ts_us", 1 << 12)
      .cache()
    assert(au.filter(col("dau") > col("wau_7d") ||
      col("wau_7d") > col("mau_28d")).count() == 0L)
    val exact = ev.select(expr("ts_us div 86400000000L").as("day"),
        col("user_id"))
      .groupBy("day").agg(countDistinct("user_id").as("x"))
    assert(au.join(exact, "day").filter(col("dau") =!= col("x"))
      .count() == 0L)
  }

  test("windowFunnel is bounded above by the unbounded funnel") {
    val bounded = Relational.windowFunnel(ev, "user_id", "ts_us",
        "event_type", Seq("view", "click", "purchase"), windowUs = 86400000000L)
      .select(col("user_id"), col("level"))
    val unbounded = Relational.funnelSteps(ev, "user_id", "ts_us",
        "event_type", Seq("view", "click", "purchase"))
      .select(col("user_id"),
        (when(col("view_ts").isNotNull, 1).otherwise(0) +
         when(col("click_ts").isNotNull, 1).otherwise(0) +
         when(col("purchase_ts").isNotNull, 1).otherwise(0)).as("ulevel"))
    val joined = bounded.join(unbounded, "user_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("level") > col("ulevel")).count() == 0L)
  }

  test("rfmSegments: quartile scores in 1..4 and ascending in the metric") {
    val orders = ev.select(col("user_id").as("cust"),
      col("ts_us").as("order_us"), col("value_milli").as("cents"))
    val rfm = Behavior.rfmSegments(orders, "cust", "order_us", "cents")
      .cache()
    Seq("r_q", "f_q", "m_q").foreach { c =>
      assert(rfm.filter(col(c) < 1 || col(c) > 4).count() == 0L, c)
    }
    // monotone: a strictly larger frequency never gets a lower f_q
    val f = rfm.select(col("frequency").as("fa"), col("f_q").as("qa"))
      .crossJoin(rfm.select(col("frequency").as("fb"), col("f_q").as("qb")))
      .filter(col("fa") > col("fb") && col("qa") < col("qb"))
    assert(f.count() == 0L)
  }
}
