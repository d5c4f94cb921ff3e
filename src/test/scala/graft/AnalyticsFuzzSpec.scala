package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Behavior, Relational}

/** Property fuzz for the round-6 integer-exact analytics devices:
  * each operator is compared, column by column, against a NAIVE
  * in-memory reference that implements the textbook definition
  * directly (sorted lists, direct "exists a < b" scans, BigInt
  * arithmetic) under a seeded random corpus of many strata — the
  * same quantization rules (HALF_UP rounding of the one quantized
  * log/exp, truncating integer division) so any divergence is a real
  * defect in the distributed shape, not in the rounding convention.
  */
class AnalyticsFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def halfUp(x: Double): Long =
    new JBD(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  test("concentrationReport fuzz: exact Gini + top shares vs the " +
       "sorted-list definition over 40 random strata") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 40).flatMap { s =>
      // stratum 0 large enough to exercise the top-1% path
      val n = if (s == 0) 150 else 1 + rnd.nextInt(30)
      (0 until n).map(_ => (s"s$s", rnd.nextInt(21).toDouble))
    }
    val got = Relational.concentrationReport(
        rows.toDF("stratum", "value"), "stratum", "value")
      .collect().map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (s, vs) =>
      val milli = vs.map(v => v._2.toLong * 1000).sorted
      val n = milli.size.toLong
      val total = milli.sum
      // gini: direct sorted-index identity
      val gnum = milli.zipWithIndex.map { case (x, i) =>
        BigInt(x) * (2L * (i + 1) - n - 1) }.sum
      val r = got(s)
      assert(r.getLong(1) == n && r.getLong(2) == total, s)
      if (total > 0)
        assert(BigInt(r.getLong(3)) == (BigInt(10000) * gnum) /
          (BigInt(n) * total), s)
      else assert(r.isNullAt(3), s)
      def topShare(k: Long): Option[Long] =
        if (k < 1 || total == 0) None
        else Some((BigInt(1000) * BigInt(
          milli.reverse.take(k.toInt).sum)) / BigInt(total) match {
            case b => b.toLong })
      val t1 = if (n >= 100) topShare(n / 100) else None
      val t10 = if (n >= 10) topShare(n / 10) else None
      assert((if (r.isNullAt(4)) None else Some(r.getLong(4))) == t1, s)
      assert((if (r.isNullAt(5)) None else Some(r.getLong(5))) == t10, s)
    }
  }

  test("survivalCurve fuzz: KM steps vs the direct risk-set scan " +
       "over 30 random cohorts (same quantized ln/exp)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 30).flatMap { s =>
      val n = 1 + rnd.nextInt(25)
      (0 until n).map(_ => (s"c$s", rnd.nextInt(8).toLong,
        rnd.nextBoolean()))
    }
    val got = Behavior.survivalCurve(rows.toDF("c", "d", "e"),
        "c", "d", "e")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    rows.groupBy(_._1).foreach { case (s, vs) =>
      var remaining = vs.size.toLong
      var lns = 0L
      vs.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (t, at) =>
        val ev = at.count(_._3).toLong
        val cn = at.size - ev
        if (ev > 0) {
          val r = got((s, t))
          assert(r.getLong(2) == remaining && r.getLong(3) == ev &&
            r.getLong(4) == cn, s"$s t=$t")
          if (ev < remaining) {
            lns += halfUp(math.log(
              (remaining - ev).toDouble / remaining) * 1e6)
            assert(r.getLong(5) == lns, s"$s t=$t")
            assert(r.getLong(6) == halfUp(
              math.exp(lns.toDouble / 1e6) * 1000), s"$s t=$t")
          } else {
            assert(r.isNullAt(5) && r.getLong(6) == 0L, s"$s t=$t")
          }
        }
        remaining -= at.size
      }
    }
  }

  test("sequentialPatterns fuzz: the first<last collapse equals the " +
       "direct 'exists a strictly before b' scan on random histories") {
    val rnd = new scala.util.Random(11)
    val types = Seq("A", "B", "C", "D")
    val rows = (0 until 60).flatMap { u =>
      val n = 1 + rnd.nextInt(12)
      (0 until n).map(_ => (u.toLong, rnd.nextInt(10).toLong,
        types(rnd.nextInt(types.size))))
    }
    val got = Behavior.sequentialPatterns(
        rows.toDF("u", "ts", "t"), "u", "ts", "t", minSupport = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2),
        r.getLong(3))).toMap
    val byUser = rows.groupBy(_._1)
    val nUsers = byUser.size.toLong
    val expected = (for {
      a <- types; b <- types if a != b
      support = byUser.values.count { h =>
        h.exists(x => x._3 == a &&
          h.exists(y => y._3 == b && x._2 < y._2))
      }.toLong
      if support >= 1
    } yield (a, b) -> (support, 1000L * support / nUsers)).toMap
    assert(got == expected)
  }

  test("cohensKappa fuzz: chance-corrected agreement vs direct BigInt " +
       "arithmetic over 25 random strata") {
    val rnd = new scala.util.Random(23)
    val labels = Seq("x", "y", "z")
    val rows = (0 until 25).flatMap { s =>
      val n = 1 + rnd.nextInt(40)
      (0 until n).map(_ => (s"s$s", labels(rnd.nextInt(3)),
        labels(rnd.nextInt(3))))
    }
    val got = Behavior.cohensKappa(rows.toDF("s", "a", "b"),
        "s", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (s, vs) =>
      val n = BigInt(vs.size)
      val agree = BigInt(vs.count(v => v._2 == v._3))
      val p = labels.map(l => BigInt(vs.count(_._2 == l)) *
        BigInt(vs.count(_._3 == l))).sum
      val r = got(s)
      assert(BigInt(r.getLong(1)) == n, s)
      assert(BigInt(r.getLong(2)) == BigInt(1000) * agree / n, s)
      if (n * n > p) {
        val num = BigInt(1000) * (n * agree - p)
        val den = n * n - p
        val k = if (num < 0) -((-num) / den) else num / den
        assert(BigInt(r.getLong(3)) == k, s)
      } else assert(r.isNullAt(3), s)
    }
  }

  test("rankingEval fuzz: nDCG/MRR/precision vs the direct per-query " +
       "scan (same quantized discounts) over 40 random queries") {
    val rnd = new scala.util.Random(31)
    val k = 5
    val rows = (0 until 40).flatMap { q =>
      val n = 1 + rnd.nextInt(9)
      (1 to n).map(i => (s"q$q", i.toLong, rnd.nextInt(4).toLong))
    }
    def disc(i: Long): Long =
      halfUp(1e6 * math.log(2.0) / math.log((i + 1).toDouble))
    val got = Behavior.rankingEval(rows.toDF("q", "r", "g"),
        "q", "r", "g", k = k)
      .collect().map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (q, vs0) =>
      val vs = vs0.filter(_._2 <= k).sortBy(_._2)
      val dcg = vs.map(v => v._3 * disc(v._2)).sum
      val idcg = vs.map(_._3).sorted.reverse.zipWithIndex
        .map { case (g, i) => g * disc(i + 1L) }.sum
      val hits = vs.count(_._3 > 0).toLong
      val fr = vs.find(_._3 > 0).map(_._2)
      val r = got(q)
      assert(r.getLong(1) == vs.size.toLong, q)
      assert(r.getLong(2) == dcg && r.getLong(3) == idcg, q)
      if (idcg > 0) assert(r.getLong(4) == 1000L * dcg / idcg, q)
      else assert(r.isNullAt(4), q)
      fr match {
        case Some(x) => assert(r.getLong(5) == 1000000L / x, q)
        case None => assert(r.isNullAt(5), q)
      }
      assert(r.getLong(6) == 1000L * hits / k, q)
    }
  }
}
