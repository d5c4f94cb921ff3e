package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** importanceWeights: exact micro-nat sums vs an independent Scala
  * re-derivation; target-like docs score higher.
  */
class ImportanceWeightsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog sat"),
    (3L, "de", "der hund sitzt"),
    (4L, "de", "der hund der katze"),
    (5L, "de", "the cat der hund")).toDF("doc_id", "lang", "text")

  /** Plain-Scala twin of unigramLm + the DSIR ratio. */
  private def expected: Map[Long, (Long, Long)] = {
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    def lm(texts: Seq[String]): (Map[String, Long], Long) = {
      val counts = texts.flatMap(toks).groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val n = counts.values.sum
      val v = counts.size.toLong
      val lp = counts.map { case (w, c) =>
        w -> math.round(-math.log((c + 1).toDouble / (n + v)) * 1e6) }
      (lp, math.round(math.log((n + v).toDouble) * 1e6))
    }
    val (lpB, _) = lm(all.map(_._3).toSeq)
    val (lpT, lpU) = lm(all.filter(_._2 == "en").map(_._3).toSeq)
    all.map { case (id, _, t) =>
      val ws = toks(t)
      id -> (ws.size.toLong,
        ws.map(w => lpB(w) - lpT.getOrElse(w, lpU)).sum)
    }.toMap
  }

  test("exact micro-nat log ratios vs independent re-derivation") {
    val got = TextAnalysis.importanceWeights(docs, "doc_id", "text",
        col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
  }

  test("target-distribution docs outrank off-target docs per token") {
    val got = TextAnalysis.importanceWeights(docs, "doc_id", "text",
        col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2).toDouble / r.getLong(1))
      .toMap
    // every pure-en doc carries a higher per-token ratio than every
    // pure-de doc; the mixed doc 5 sits strictly between the extremes
    val en = Seq(1L, 2L).map(got)
    val de = Seq(3L, 4L).map(got)
    assert(en.min > de.max)
    assert(got(5L) > de.min && got(5L) < en.max)
  }
}
