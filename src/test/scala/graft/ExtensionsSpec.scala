package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The injected Catalyst rule: a naive interval-containment join must
  * come out as a bucketed equi-join (no nested-loop), with identical
  * results.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def naiveRangeJoin() = {
    val t = Tables(spark, sf)
    val bands = t.nation.select(
      col("n_nationkey").as("band_id"),
      (col("n_nationkey") * 8000).cast("double").as("lo"),
      (col("n_nationkey") * 8000 + 15999).cast("double").as("hi"))
    t.orders.select(col("o_orderkey"), col("o_totalprice"))
      .join(bands, col("o_totalprice") >= col("lo") &&
                   col("o_totalprice") <= col("hi"))
      .select(col("o_orderkey"), col("band_id"))
  }

  test("RewriteRangeJoin: nested-loop range join becomes a bucketed equi-join") {
    // expected result computed WITHOUT the rule (nested-loop plan)
    val expected = naiveRangeJoin().as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RewriteRangeJoin
    try {
      spark.conf.set(graft.plans.RewriteRangeJoin.BucketSizeKey, "4000")
      val df = naiveRangeJoin()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"range join still nested-loop:\n$plan")
      assert(plan.contains("__graft"), s"bucket rewrite missing:\n$plan")
      assert(df.as[(Long, Long)].collect().toSet == expected)
    } finally {
      spark.experimental.extraOptimizations = spark.experimental
        .extraOptimizations.filterNot(_ eq graft.plans.RewriteRangeJoin)
      spark.conf.unset(graft.plans.RewriteRangeJoin.BucketSizeKey)
    }
  }

  test("RewriteRangeJoin leaves equi-joins and non-range conditions alone") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RewriteRangeJoin
    try {
      val t = Tables(spark, sf)
      // equi-join: must not be touched
      val equi = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft"))
      // equi + range residual: still an equi-join, untouched
      val mixed = t.orders.join(t.customer,
        col("o_custkey") === col("c_custkey") &&
        col("o_totalprice") >= col("c_acctbal") * 0 &&
        col("o_totalprice") <= col("c_acctbal") * 1000)
      assert(!mixed.queryExecution.optimizedPlan.toString.contains("__graft"))
      assert(mixed.count() > 0)
    } finally {
      spark.experimental.extraOptimizations = spark.experimental
        .extraOptimizations.filterNot(_ eq graft.plans.RewriteRangeJoin)
    }
  }

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RewriteRangeJoin
    try body finally {
      spark.experimental.extraOptimizations = spark.experimental
        .extraOptimizations.filterNot(_ eq graft.plans.RewriteRangeJoin)
      spark.conf.unset(graft.plans.RewriteRangeJoin.BucketSizeKey)
    }
  }

  test("RewriteRangeJoin: interval-overlap join becomes a double-exploded equi-join") {
    val left = Seq((1L, 0.0, 10.0), (2L, 5.0, 25.0), (3L, 100.0, 120.0),
                   (4L, 42.0, 42.0))
      .toDF("lid", "l_lo", "l_hi")
    val right = Seq((10L, 8.0, 12.0), (20L, 30.0, 41.0), (30L, 110.0, 300.0),
                    (40L, 40.0, 44.0))
      .toDF("rid", "r_lo", "r_hi")
    def overlapJoin() = left.join(right,
      col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select(col("lid"), col("rid"))
    val expected = overlapJoin().as[(Long, Long)].collect().toSet
    assert(expected == Set((1L, 10L), (2L, 10L), (3L, 30L), (4L, 40L)))
    withRule {
      spark.conf.set(graft.plans.RewriteRangeJoin.BucketSizeKey, "10")
      val df = overlapJoin()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"overlap join still nested-loop:\n$plan")
      assert(plan.contains("__graft_ibl") && plan.contains("__graft_ibr"),
        s"double-exploded rewrite missing:\n$plan")
      // exactly one copy of each pair (the dedup-bucket condition)
      val rows = df.as[(Long, Long)].collect().toSeq
      assert(rows.size == rows.toSet.size, s"duplicated pairs: $rows")
      assert(rows.toSet == expected)
    }
  }

  test("RewriteRangeJoin overlap: dirty lo>hi rows keep raw-predicate semantics") {
    // raw predicates match (5<=10 && 0<=1) even though the left
    // interval is inverted — the normalized-span explosion must keep it
    val left = Seq((1L, 5.0, 1.0), (2L, 60.0, 50.0),
                   (3L, Double.NaN, Double.NaN))
      .toDF("lid", "l_lo", "l_hi").filter(!isnan(col("l_lo")))
    val right = Seq((10L, 0.0, 10.0), (20L, 45.0, 70.0),
                    (30L, Double.NaN, Double.NaN))
      .toDF("rid", "r_lo", "r_hi").filter(!isnan(col("r_lo")))
    def overlapJoin() = left.join(right,
      col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select(col("lid"), col("rid"))
    val expected = overlapJoin().as[(Long, Long)].collect().toSet
    assert(expected.contains((1L, 10L)) && expected.contains((2L, 20L)))
    withRule {
      spark.conf.set(graft.plans.RewriteRangeJoin.BucketSizeKey, "7")
      val got = overlapJoin().as[(Long, Long)].collect()
      assert(got.size == got.toSet.size)
      assert(got.toSet == expected)
    }
  }

  test("RewriteRangeJoin: bucket size derives from local interval stats when conf unset") {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    // widths 4,6,8 → median 6 drives the derived bucket width
    val intervals = Seq((1L, 0.0, 4.0), (2L, 10.0, 16.0), (3L, 30.0, 38.0))
      .toDF("iid", "lo", "hi")
    val plan = intervals.queryExecution.optimizedPlan
    val lo = plan.output.find(_.name == "lo").get.asInstanceOf[AttributeReference]
    val hi = plan.output.find(_.name == "hi").get.asInstanceOf[AttributeReference]
    val derived = graft.plans.RewriteRangeJoin.derivedBucketSize(plan, lo, hi)
    assert(derived.contains(6.0), s"derived=$derived")
    // and the rewrite still fires + stays correct with no conf set
    val points = Seq(2.0, 15.0, 35.0, 99.0).toDF("p")
    withRule {
      val joined = points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"))
        .select(col("p"), col("iid"))
      val plan2 = joined.queryExecution.executedPlan.toString
      assert(plan2.contains("__graft") &&
             !plan2.contains("BroadcastNestedLoopJoin"))
      assert(joined.as[(Double, Long)].collect().toSet ==
        Set((2.0, 1L), (15.0, 2L), (35.0, 3L)))
    }
  }

  test("RewriteRangeJoin: CBO column stats drive bucket sizing for catalog tables") {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val loc = java.nio.file.Files.createTempDirectory("cbo_intervals_").toString
    spark.sql("DROP TABLE IF EXISTS graft_cbo_intervals")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      Seq((1L, 0.0, 100.0), (2L, 500.0, 700.0), (3L, 3000.0, 4096.0))
        .toDF("iid", "lo", "hi").write.option("path", loc)
        .saveAsTable("graft_cbo_intervals")
      spark.sql(
        "ANALYZE TABLE graft_cbo_intervals COMPUTE STATISTICS FOR COLUMNS lo, hi")
      val plan = spark.table("graft_cbo_intervals").queryExecution.optimizedPlan
      val lo = plan.output.find(_.name == "lo").get.asInstanceOf[AttributeReference]
      val hi = plan.output.find(_.name == "hi").get.asInstanceOf[AttributeReference]
      // span = max(hi) - min(lo) = 4096; default targetBuckets 4096 → 1.0
      val derived = graft.plans.RewriteRangeJoin.derivedBucketSize(plan, lo, hi)
      assert(derived.contains(1.0), s"derived=$derived")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cbo_intervals")
      spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("RewriteRangeJoin: inverted (lo > hi) and null intervals match nothing, never crash") {
    // pre-rewrite nested-loop semantics: a dirty interval with lo > hi
    // (or a null bound) simply matches no points; the rewrite's
    // Sequence(loBucket, hiBucket, 1) would throw on it without the
    // interval-validity filter
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RewriteRangeJoin
    try {
      spark.conf.set(graft.plans.RewriteRangeJoin.BucketSizeKey, "10")
      val points = Seq(5.0, 25.0, 45.0).toDF("p")
      val intervals = Seq(
        (1L, Option(0.0), Option(9.0)),   // valid → catches 5
        (2L, Option(50.0), Option(10.0)), // inverted → matches nothing
        (3L, Option(40.0), Option(49.0)), // valid → catches 45
        (4L, Option.empty[Double], Option(9.0))) // null lo → matches nothing
        .toDF("iid", "lo", "hi")
      val joined = points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("__graft"), s"rewrite missing:\n$plan")
      assert(joined.select(col("p"), col("iid")).as[(Double, Long)]
        .collect().toSet == Set((5.0, 1L), (45.0, 3L)))
    } finally {
      spark.experimental.extraOptimizations = spark.experimental
        .extraOptimizations.filterNot(_ eq graft.plans.RewriteRangeJoin)
      spark.conf.unset(graft.plans.RewriteRangeJoin.BucketSizeKey)
    }
  }
}
