package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** weightedSample: exact key re-derivation, layout invariance,
  * zero-weight exclusion.
  */
class WeightedSampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "one two"),
    (3L, "a much longer document with many more tokens than the others here"),
    (4L, "short text"),
    (5L, "medium length document of six tokens"),
    (6L, "")).toDF("doc_id", "text")

  private def wcol = size(filter(split(trim(col("text")), "\\s+"),
    w => length(w) > 0)).cast("long")

  /** Independent re-derivation of the E-S key in plain Scala. */
  private def expectedKey(text: String): (Long, Long) = {
    val fp = text.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val u = fp % 1000000L + 1
    val lnU = math.round(1000.0 * math.log(u.toDouble))
    val w = text.trim.split("\\s+").count(_.nonEmpty).toLong
    (w, if (w > 0) (13816L - lnU) * 1000000L / w else -1L)
  }

  test("keys match an independent fold re-derivation; k smallest win") {
    val exp = docs.collect().map { r =>
      val (w, key) = expectedKey(r.getString(1))
      (r.getLong(0), w, key)
    }.filter(_._2 > 0).sortBy(t => (t._3, t._1)).take(4)
    val got = TextAnalysis.weightedSample(docs, "doc_id", "text", wcol, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    assert(got.toSeq === exp.toSeq)
  }

  test("sample is a pure function of the corpus (layout invariance)") {
    val a = TextAnalysis.weightedSample(docs.repartition(7), "doc_id", "text",
      wcol, k = 3).collect().map(_.toSeq).sortBy(_.toString)
    val b = TextAnalysis.weightedSample(docs.repartition(1), "doc_id", "text",
      wcol, k = 3).collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("zero-weight documents are never sampled, even with k > n") {
    val ids = TextAnalysis.weightedSample(docs, "doc_id", "text", wcol, k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 3L, 4L, 5L)) // doc 6 (empty) excluded
  }
}
