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
