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

  test("isotonicCalibrate fuzz: the minimax identity equals a classic " +
       "pool-adjacent-violators STACK on every random input (the two " +
       "constructions are independent)") {
    val rnd = new scala.util.Random(53)
    (0 until 12).foreach { round =>
      val rows = (0 until (20 + rnd.nextInt(120))).map { _ =>
        (rnd.nextInt(1001).toLong, rnd.nextBoolean()) }
      val nBins = 4 + rnd.nextInt(12)
      val got = Behavior.isotonicCalibrate(
          rows.toDF("score", "label"), "score", "label", nBins)
        .orderBy("bin")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      // reference: PAV merge stack over the same bins, exact rationals
      val bins = rows.groupBy(r => r._1 * nBins / 1001).toSeq.sortBy(_._1)
        .map { case (b, vs) =>
          (b, vs.size.toLong, vs.count(_._2).toLong) }
      val stack = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Int)] // (p, n, binCount)
      bins.foreach { case (_, n, p) =>
        stack += ((p, n, 1))
        while (stack.size >= 2 && {
          val (p2, n2, _) = stack(stack.size - 1)
          val (p1, n1, _) = stack(stack.size - 2)
          BigInt(p1) * n2 >= BigInt(p2) * n1 // prev avg >= cur avg
        }) {
          val (p2, n2, c2) = stack.remove(stack.size - 1)
          val (p1, n1, c1) = stack.remove(stack.size - 1)
          stack += ((p1 + p2, n1 + n2, c1 + c2))
        }
      }
      val fits = stack.flatMap { case (p, n, c) =>
        Seq.fill(c)(halfUp(p.toDouble / n.toDouble * 1000)) }
      assert(got.map(_._5) == fits.toSeq, s"round $round")
      assert(got.map(g => (g._1, g._2, g._3)) ==
        bins.map(b => (b._1, b._2, b._3)), s"round $round")
      // monotone by construction
      assert(got.map(_._5) == got.map(_._5).sorted, s"round $round")
    }
  }

  test("bleuPairs fuzz: clipped n-gram precisions vs direct counting " +
       "over random tiny-vocab pairs") {
    val rnd = new scala.util.Random(61)
    val vocab = Seq("a", "b", "c", "d")
    def sentence(): String =
      (0 until (1 + rnd.nextInt(12)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val rows = (0 until 80).map(i => (i.toLong, sentence(), sentence()))
    val got = graft.operators.TextAnalysis.bleuPairs(
        rows.toDF("id", "cand", "ref"), "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    def grams(t: Seq[String], n: Int): Seq[String] =
      if (t.size < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq
    def clip(c: Seq[String], r: Seq[String]): Long = {
      val rc = r.groupBy(identity).map { case (k, v) => k -> v.size }
      c.groupBy(identity).map { case (k, v) =>
        math.min(v.size, rc.getOrElse(k, 0)) }.sum.toLong
    }
    rows.foreach { case (id, cand, ref) =>
      val ct = cand.split("\\s+").toSeq.filter(_.nonEmpty)
      val rt = ref.split("\\s+").toSeq.filter(_.nonEmpty)
      val c1 = clip(grams(ct, 1), grams(rt, 1))
      val c2 = clip(grams(ct, 2), grams(rt, 2))
      val r = got(id)
      assert(r.getLong(1) == ct.size.toLong &&
        r.getLong(2) == rt.size.toLong, id)
      assert(r.getLong(3) == c1 && r.getLong(4) == c2, id)
      if (c1 > 0 && c2 > 0) {
        val lnp1 = halfUp(math.log(c1.toDouble / ct.size) * 1e6)
        val lnp2 = halfUp(math.log(c2.toDouble / (ct.size - 1)) * 1e6)
        val lnbp = if (ct.size >= rt.size) 0L
          else -(1000000L * (rt.size - ct.size) / ct.size)
        val sum = lnp1 + lnp2
        val ln = lnbp + (if (sum < 0) -((-sum) / 2) else sum / 2)
        assert(r.getLong(7) == ln, id)
        assert(r.getLong(8) ==
          halfUp(math.exp(ln.toDouble / 1e6) * 1000), id)
      } else {
        assert(r.isNullAt(7) && r.getLong(8) == 0L, id)
      }
    }
  }

  test("holtSmooth fuzz: the fold equals the direct level/trend " +
       "recurrence on random series") {
    val rnd = new scala.util.Random(71)
    def strunc(num: Long, den: Long): Long =
      if (num < 0) -((-num) / den) else num / den
    (0 until 8).foreach { round =>
      val a = rnd.nextInt(1001).toLong; val b = rnd.nextInt(1001).toLong
      val series = (1 to (2 + rnd.nextInt(20)))
        .map(d => (d.toLong, rnd.nextInt(200).toLong))
      val got = Behavior.holtSmooth(
          series.map { case (d, x) => ("k", d, x) }.toDF("k", "d", "x"),
          Seq("k"), "d", "x", a, b)
        .orderBy("day").as[(String, Long, Long, Long, Long)]
        .collect().toSeq
      var l = series.head._2 * 1000L; var t = 0L
      val exp = series.zipWithIndex.map { case ((d, x), i) =>
        if (i > 0) {
          val nl = strunc(a * x * 1000L + (1000 - a) * (l + t), 1000L)
          t = strunc(b * (nl - l) + (1000 - b) * t, 1000L)
          l = nl
        }
        ("k", d, l, t, l + t)
      }
      assert(got == exp, s"round $round alpha=$a beta=$b")
    }
  }

  test("classificationReport + featureMi fuzz: confusion counts, " +
       "permilles, macro row, MI micro-nats vs direct references") {
    val rnd = new scala.util.Random(83)
    val cls = Seq("p", "q", "r", "s")
    val rows = (0 until 300).map(_ =>
      (cls(rnd.nextInt(4)), cls(rnd.nextInt(4))))
    val rep = Behavior.classificationReport(
        rows.toDF("truth", "pred"), "truth", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    val classes = (rows.map(_._1) ++ rows.map(_._2)).distinct
    var sp = 0L; var sr = 0L; var sf = 0L
    classes.foreach { c =>
      val support = rows.count(_._1 == c).toLong
      val predN = rows.count(_._2 == c).toLong
      val tp = rows.count(v => v._1 == c && v._2 == c).toLong
      val r = rep(c)
      assert(r.getLong(1) == support && r.getLong(2) == tp &&
        r.getLong(3) == predN, c)
      val p = if (predN > 0) Some(1000 * tp / predN) else None
      val rr = if (support > 0) Some(1000 * tp / support) else None
      val f = 2000 * tp / (2 * tp + (predN - tp) + (support - tp))
      assert((if (r.isNullAt(6)) None else Some(r.getLong(6))) == p, c)
      assert((if (r.isNullAt(7)) None else Some(r.getLong(7))) == rr, c)
      assert(r.getLong(8) == f, c)
      sp += p.getOrElse(0L); sr += rr.getOrElse(0L); sf += f
    }
    val m = rep("__macro__")
    assert(m.getLong(6) == sp / classes.size &&
      m.getLong(7) == sr / classes.size &&
      m.getLong(8) == sf / classes.size)
    // featureMi on the same frame: MI + entropies vs direct sums
    val mi = Behavior.featureMi(rows.toDF("f", "l"), "f", "l")
      .as[(Long, Long, Long, Long, Long)].head()
    val n = rows.size.toLong
    val cellsRef = rows.groupBy(identity).map { case ((x, y), v) =>
      (x, y, v.size.toLong) }.toSeq
    val nx = rows.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val ny = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    def struncL(num: Long, den: Long): Long =
      if (num < 0) -((-num) / den) else num / den
    val miSum = cellsRef.map { case (x, y, c) =>
      c * halfUp(math.log(c.toDouble * n / (nx(x).toDouble * ny(y)))
        * 1e6) }.sum
    val hx = nx.values.map(c =>
      c * halfUp(math.log(c.toDouble / n) * 1e6)).sum
    val hy = ny.values.map(c =>
      c * halfUp(math.log(c.toDouble / n) * 1e6)).sum
    assert(mi == ((n, cellsRef.size.toLong, struncL(miSum, n),
      -struncL(hx, n), -struncL(hy, n))))
  }

  test("gapFill fuzz: LOCF densify vs the direct scan — every span " +
       "day present exactly once, gaps carry the last observation") {
    val rnd = new scala.util.Random(97)
    val rows = (0 until 25).flatMap { k =>
      val days = rnd.shuffle((0 to 20).toList).take(1 + rnd.nextInt(8))
      days.map(d => (s"k$k", d.toLong, rnd.nextInt(100).toLong))
    }
    val got = Relational.gapFill(rows.toDF("k", "day", "v"),
        Seq("k"), "day", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val obs = vs.map(v => v._2 -> v._3).toMap
      val lo = obs.keys.min; val hi = obs.keys.max
      var last = 0L
      (lo to hi).foreach { d =>
        if (obs.contains(d)) last = obs(d)
        assert(got((k, d)) == ((last, !obs.contains(d))), s"$k day $d")
      }
      assert(got.keys.count(_._1 == k) == (hi - lo + 1), k)
    }
  }

  test("conversionLag fuzz: quartiles vs the direct first-touch scan " +
       "over random user histories") {
    val rnd = new scala.util.Random(101)
    val D = 86400000000L
    val types = Seq("view", "click", "buy")
    val rows = (0 until 80).flatMap { u =>
      (0 until (1 + rnd.nextInt(10))).map(_ =>
        (u.toLong, rnd.nextInt(30).toLong * D + rnd.nextInt(1000),
          types(rnd.nextInt(3))))
    }
    val got = Behavior.conversionLag(rows.toDF("u", "ts", "t"),
        "u", "ts", "t", "buy")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val byUser = rows.groupBy(_._1)
    Seq("view", "click").foreach { t =>
      val lags = byUser.values.toSeq.flatMap { h =>
        val ft = h.filter(_._3 == t).map(_._2).minOption
        val ct = h.filter(_._3 == "buy").map(_._2).minOption
        (ft, ct) match {
          case (Some(f), Some(c)) if f < c => Some((c - f) / D)
          case _ => None
        }
      }.sorted
      if (lags.isEmpty) assert(!got.contains(t), t)
      else {
        val n = lags.size.toLong
        def q(mult: Long, of: Long): Long =
          lags(lags.indices.find(i =>
            (i + 1).toLong * mult >= n * of).get)
        assert(got(t) == ((n, q(4, 1), q(2, 1), q(4, 3))), t)
      }
    }
  }

  test("labelPropagation fuzz: the distributed rounds equal a direct " +
       "synchronous simulation on random graphs") {
    val rnd = new scala.util.Random(113)
    (0 until 6).foreach { round =>
      val nNodes = 8 + rnd.nextInt(12)
      val edges = (0 until (nNodes * 2)).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val rounds = 1 + rnd.nextInt(4)
        val got = graft.operators.Graph.labelPropagation(
            edges.toDF("a", "b"), "a", "b", rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // direct synchronous simulation
        val adj = (edges ++ edges.map(_.swap)).distinct
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        var lbl = adj.keys.map(n => n -> n).toMap
        (1 to rounds).foreach { _ =>
          lbl = adj.map { case (n, nbrs) =>
            val counts = nbrs.groupBy(lbl).map { case (l, v) =>
              l -> v.size }
            val best = counts.toSeq.map { case (l, c) => (-c, l) }.min._2
            n -> best
          }
        }
        assert(got == lbl, s"round $round rounds=$rounds")
      }
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
