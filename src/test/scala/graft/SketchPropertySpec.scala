package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KllBuffer
import graft.streaming.Streams

/** Property fuzz for the sketch primitives under the store/stream
  * contracts: KLL exact-regime equality and bound honesty under
  * ARBITRARY partial splits and merge orders; Misra-Gries bound
  * honesty and canonical-state purity under arbitrary streams.
  * (Plain-JVM truth checks — the Spark-side layout invariance of the
  * same sketches is covered by QuantileStoreSpec/DistinctStoreSpec.)
  */
class SketchPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], cases: Int = 200)(check: A => Unit): Unit = {
    var seed = Seed(1234L)
    val params = Gen.Parameters.default
    (1 to cases).foreach { _ =>
      gen.apply(params, seed).foreach(check)
      seed = seed.next
    }
  }

  private val genValues: Gen[List[Long]] =
    Gen.chooseNum(1, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000000L, 1000000L)))

  /** Split a list into 1..6 contiguous partials. */
  private val genSplit: Gen[(List[Long], List[Int])] = for {
    vs <- genValues
    k <- Gen.chooseNum(1, 6)
    cuts <- Gen.listOfN(k - 1, Gen.chooseNum(0, vs.length))
  } yield (vs, cuts.sorted)

  private def partials[A](vs: List[A], cuts: List[Int]): List[List[A]] = {
    val bounds = (0 :: cuts) :+ vs.length
    bounds.zip(bounds.tail).map { case (a, b) => vs.slice(a, b) }
  }

  private def exactQ(vs: Seq[Long], p: Double): Long = {
    val s = vs.sorted
    val r = math.max(0L, math.ceil(p * s.length).toLong - 1L)
    s(math.min(r, s.length - 1L).toInt)
  }

  test("KLL exact regime: any split + any merge order == sorted truth") {
    forAll(genSplit) { case (vs, cuts) =>
      val parts = partials(vs, cuts).filter(_.nonEmpty)
      if (parts.nonEmpty) {
        // build each partial, merge in reversed order (≠ build order)
        val bufs = parts.map { p =>
          val b = new KllBuffer(1024); p.foreach(b.insert); b
        }
        val acc = bufs.reverse.reduce { (a, b) => a.mergeIn(b); a }
        assert(acc.n == vs.length.toLong)
        assert(acc.errBound == 0L, "k >= n: no compaction may fire")
        for (p <- Seq(0.1, 0.5, 0.9))
          assert(KllBuffer.quantiles(acc, Seq(p)).head == exactQ(vs, p))
      }
    }
  }

  test("KLL compacting regime: err bound honest on every quantile") {
    forAll(genValues, cases = 100) { vs0 =>
      val vs = vs0 ++ vs0 ++ vs0 // length up to 1200, force compaction
      val b = new KllBuffer(16)
      vs.foreach(b.insert)
      val sorted = vs.sorted
      for (p <- Seq(0.25, 0.5, 0.75, 0.99)) {
        val q = KllBuffer.quantiles(b, Seq(p)).head
        val target = math.max(0L, math.ceil(p * vs.length).toLong - 1L)
        val lo = sorted.indexWhere(_ == q)
        val hi = sorted.lastIndexWhere(_ == q)
        assert(lo >= 0, s"answer $q must be a stream value")
        assert(lo - b.errBound <= target && target <= hi + b.errBound,
          s"p=$p q=$q ranks [$lo,$hi] target $target bound ${b.errBound}")
      }
    }
  }

  private val genTokens: Gen[List[String]] =
    Gen.chooseNum(1, 500).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 60).map(i => s"t$i")))

  test("Misra-Gries fold: every estimate within [true - decs, true]; " +
       "missing items have true count <= decs; state canonical") {
    forAll(genTokens) { toks =>
      val st = Streams.mgFold(
        Streams.MgState(0L, 0L, Array.empty, Array.empty),
        toks.toArray, capacity = 8)
      val truth = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      assert(st.n == toks.length.toLong)
      assert(st.tokens.length <= 8)
      assert(st.tokens.sorted.sameElements(st.tokens), "token-sorted state")
      st.tokens.zip(st.counts).foreach { case (t, c) =>
        assert(c <= truth(t) && c >= truth(t) - st.decs, s"token $t")
      }
      (truth.keySet -- st.tokens.toSet).foreach { t =>
        assert(truth(t) <= st.decs, s"dropped token $t had ${truth(t)} > decs")
      }
    }
  }

  test("Misra-Gries fold split across batches == decisions consistent " +
       "(same guarantees hold through any checkpoint boundary)") {
    forAll(genSplit, cases = 100) { case (vs, cuts) =>
      val toks = vs.map(v => s"t${math.abs(v) % 40}")
      val parts = partials(toks, cuts)
      var st = Streams.MgState(0L, 0L, Array.empty, Array.empty)
      parts.foreach(p => st = Streams.mgFold(st, p.toArray, capacity = 8))
      val truth = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      assert(st.n == toks.length.toLong)
      st.tokens.zip(st.counts).foreach { case (t, c) =>
        assert(c <= truth(t) && c >= truth(t) - st.decs, s"token $t")
      }
    }
  }
}
