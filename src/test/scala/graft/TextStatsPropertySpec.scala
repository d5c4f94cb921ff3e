package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Property fuzzing of the native one-pass repetition expression
  * against a naive Scala re-derivation: ANY token sequence (including
  * repeated, multibyte and single-token documents) must produce
  * identical ratios.
  */
class TextStatsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def forAll[A](gen: Gen[A])(check: A => Unit): Unit = {
    var seed = Seed(20260812L)
    val params = Gen.Parameters.default
    (1 to 120).foreach { _ =>
      gen.apply(params, seed).foreach(check)
      seed = seed.next
    }
  }

  // small vocab → frequent collisions, exercising every count path
  private val genDoc: Gen[List[String]] =
    Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "中文", "é", "x")))

  /** Naive quadratic reference implementation. */
  private def naive(toks: List[String]): (Double, Double, Double) = {
    val n = toks.length
    val ttr = toks.distinct.size.toDouble / n
    val bi = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toList
    val top = if (bi.isEmpty) 0.0
      else bi.groupBy(identity).values.map(_.size).max.toDouble / bi.size
    val tri = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toList
    val dup = if (tri.isEmpty) 0.0
      else {
        val counts = tri.groupBy(identity).values.map(_.size)
        counts.filter(_ > 1).sum.toDouble / tri.size
      }
    (ttr, top, dup)
  }

  test("repetition stats ≡ naive reference on random token sequences") {
    val docs = scala.collection.mutable.ListBuffer[(Long, String)]()
    var id = 0L
    forAll(genDoc) { toks =>
      docs += ((id, toks.mkString(" ")))
      id += 1
    }
    val expected = docs.map { case (i, text) =>
      i -> naive(text.split(" ", -1).toList)
    }.toMap
    val got = TextAnalysis.repetitionStats(
        docs.toSeq.toDF("doc_id", "text"), "text", "doc_id")
      .collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (ttr, top, dup) = expected(r.getLong(0))
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == r6(ttr), s"ttr doc ${r.getLong(0)}")
      assert(r.getDouble(3) == r6(top), s"top_bigram doc ${r.getLong(0)}")
      assert(r.getDouble(4) == r6(dup), s"dup_trigram doc ${r.getLong(0)}")
    }
  }
}
