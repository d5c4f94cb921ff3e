package graft


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** scorePercentile: hand-computed permilles (ties, singleton stratum),
  * and the corpus never passes through a window.
  */
class ScorePercentileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // en: scores 10,20,20,40 → below = 0,1,1,3; n=4 → permille 0,333,333,1000
  // de: single doc → 0
  private val docs = Seq(
    (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 20L), (4L, "en", 40L),
    (5L, "de", 7L)).toDF("doc_id", "lang", "s")

  test("hand-computed permilles with ties and singleton stratum") {
    val got = TextAnalysis.scorePercentile(docs, "lang", "doc_id", col("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 0L, 2L -> 333L, 3L -> 333L, 4L -> 1000L,
                       5L -> 0L))
  }

  test("windows run over the distribution table, not the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = TextAnalysis.scorePercentile(docs, "lang", "doc_id", col("s"))
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    // every window sits above the (stratum, score) aggregate — its input
    // row count is bounded by score cardinality, not corpus size
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"window not above an aggregate:\n$w")
    }
  }

  test("permille cut keeps the same fraction of every stratum") {
    val big = (1 to 100).map(i => (i.toLong, "en", i.toLong)) ++
      (1 to 50).map(i => (100L + i, "de", (i * 3).toLong))
    val df = big.toDF("doc_id", "lang", "s")
    val res = TextAnalysis.scorePercentile(df, "lang", "doc_id", col("s"))
    val kept = res.filter(col("permille") >= 500)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // distinct scores ⇒ exactly the top half (±1 on the boundary)
    assert(kept("en") === 50L && kept("de") === 25L)
  }
}
