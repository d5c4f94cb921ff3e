package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GroupedTopKAgg
import graft.operators.TextAnalysis

/** GroupedTopKAgg + stratifiedSampleK: hand-checked selection, window
  * equivalence, layout invariance, and the no-window plan guarantee.
  */
class GroupedTopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("keeps the k smallest (key, payload) pairs per group, ascending") {
    val df = Seq(
      ("a", 5L, 50L), ("a", 1L, 10L), ("a", 3L, 30L), ("a", 1L, 9L),
      ("b", 7L, 70L)).toDF("g", "key", "pay")
    val out = df.groupBy("g")
      .agg(GroupedTopKAgg(col("key"), col("pay"), 2).as("top"))
      .orderBy("g")
      .as[(String, Seq[(Long, Long)])].collect().toSeq
    // group a: (1,9) < (1,10) < (3,30) < (5,50) → top-2 with payload tiebreak
    assert(out == Seq(("a", Seq((1L, 9L), (1L, 10L))), ("b", Seq((7L, 70L)))))
  }

  test("stratifiedSampleK equals the window formulation and is layout-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaAgg = TextAnalysis.stratifiedSampleK(docs, "lang", "doc_id", "text", 7)
      .orderBy("lang", "rank")
      .as[(String, Long, Long, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("fp"), col("doc_id"))
    val viaWindow = docs
      .select(col("lang"), col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7)
      .orderBy("lang", "rank")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(viaAgg == viaWindow)
    val repart = TextAnalysis.stratifiedSampleK(
        docs.repartition(7), "lang", "doc_id", "text", 7)
      .orderBy("lang", "rank")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(repart == viaAgg, "grouped top-k must be layout-independent")
  }

  test("plan has no WindowExec and state stays bounded below k") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = TextAnalysis.stratifiedSampleK(docs, "lang", "doc_id", "text", 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    // every stratum has > 5 docs → exactly 5 rows each
    val counts = df.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 5L), counts.toString)
  }
}
