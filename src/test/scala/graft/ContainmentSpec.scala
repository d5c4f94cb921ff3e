package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** containmentPairs: directional quote detection that symmetric
  * Jaccard misses; exact values; minShingles floor.
  */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // doc 1: 20 unique words w1..w20 → 18 distinct 3-shingles
  // doc 2: words w5..w12 (8 tokens) → 6 shingles, ALL windows of doc 1
  // doc 3: unrelated; doc 4: too short (< 5 shingles)
  private val long1 = (1 to 20).map("w" + _).mkString(" ")
  private val quote = (5 to 12).map("w" + _).mkString(" ")
  private val docs = Seq(
    (1L, long1), (2L, quote),
    (3L, (1 to 10).map("x" + _).mkString(" ")),
    (4L, "y1 y2 y3 y4 y5")).toDF("doc_id", "text")

  test("quote is contained in its source, not the reverse") {
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.8, minShingles = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((2L, 1L, 1.0)))
    // the same pair is invisible to symmetric Jaccard at its threshold:
    // J(doc1, doc2) = 6/18 = 0.33 < 0.7 (verified exactly, not via LSH)
    val j = 6.0 / 18.0
    assert(j < 0.7)
  }

  test("docs under the shingle floor never pair") {
    // doc 4 has 5 tokens → 3 shingles < minShingles
    val ids = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.8, minShingles = 5)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!ids.contains(4L))
  }

  test("df-ordered and lexicographic prefixes emit the SAME pairs " +
       "(any canonical order is lossless; verify is exact)") {
    val docs = (1L to 60L).map { i =>
      val words = (0 until 30).map(j => s"w${(i * 7 + j * 3) % 17}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    // planted excerpt: doc 200 = first half of doc 1
    val withQuote = docs.unionByName(
      docs.filter(col("doc_id") === 1L)
        .select(lit(200L).as("doc_id"),
          expr("array_join(slice(split(text, ' '), 1, 15), ' ')").as("text")))
    def pairs(dfOrdered: Boolean) =
      Dedup.containmentPairs(withQuote, "doc_id", "text",
          shingleN = 3, threshold = 0.8, minShingles = 5,
          dfOrderedPrefix = dfOrdered)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val a = pairs(true)
    val b = pairs(false)
    assert(a == b)
    assert(a.exists { case (l, r, c) => l == 200L && r == 1L && c >= 0.8 })
  }

  test("partial overlap scores the exact intersection ratio") {
    // doc 5 = w1..w6 + z1..z4: shingles 1..4 of doc 1 present, 4 of 8
    val d5 = ((1 to 6).map("w" + _) ++ (1 to 4).map("z" + _)).mkString(" ")
    val df = docs.union(Seq((5L, d5)).toDF("doc_id", "text"))
    val got = Dedup.containmentPairs(df, "doc_id", "text",
        shingleN = 3, threshold = 0.2, minShingles = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // |sh(d5) ∩ sh(d1)| = 4 (windows fully inside w1..w6), |sh(d5)| = 8
    assert(got((5L, 1L)) === 0.5)
    assert(got((1L, 5L)) === 0.222222) // round(4/18, 6)
  }
}
