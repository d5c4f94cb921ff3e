package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** D12 streaming per-key heavy hitters: exact-regime ≡ batch counts,
  * identical state under replay, capacity-bounded state with an
  * honest error bound in the decrementing regime. */
class StreamTopTokensSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stream ≡ exact per-key counts after every batch (capacity ≥ distinct)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_tt").toFile.getAbsolutePath
    val input = MemoryStream[Streams.TokenObs]
    val q = Streams.streamTopTokens(input.toDS(), capacity = 64, k = 3)
      .writeStream.outputMode("update").format("memory")
      .queryName("tt_out").option("checkpointLocation", ckpt).start()
    try {
      input.addData(Streams.TokenObs("a", "x"), Streams.TokenObs("a", "y"),
        Streams.TokenObs("a", "x"), Streams.TokenObs("b", "z"))
      q.processAllAvailable()
      val after1 = spark.table("tt_out").as[Streams.KeyTopTokens]
        .collect().map(r => r.key -> r).toMap
      assert(after1("a").top_tokens == Seq("x", "y") &&
             after1("a").est_counts == Seq(2L, 1L) &&
             after1("a").err_bound == 0L)
      assert(after1("b").top_tokens == Seq("z") &&
             after1("b").est_counts == Seq(1L))

      input.addData(Streams.TokenObs("a", "y"), Streams.TokenObs("a", "y"),
        Streams.TokenObs("a", "w"), Streams.TokenObs("b", "z"))
      q.processAllAvailable()
      val after2 = spark.table("tt_out").as[Streams.KeyTopTokens]
        .collect().groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.n) }
      // a: x=2, y=3, w=1 → top-3 by (count desc, token asc)
      assert(after2("a").n == 6L &&
             after2("a").top_tokens == Seq("y", "x", "w") &&
             after2("a").est_counts == Seq(3L, 2L, 1L))
      assert(after2("b").n == 2L && after2("b").est_counts == Seq(2L))
    } finally q.stop()
  }

  test("replayed batch rebuilds an identical state (deterministic fold)") {
    val b1 = Array.tabulate(200)(i => s"t${(i * 37) % 23}")
    val b2 = Array.tabulate(150)(i => s"t${(i * 91) % 31}")
    val empty = Streams.MgState(0L, 0L, Array.empty, Array.empty)
    val after1 = Streams.mgFold(empty, b1, capacity = 8)
    val r1 = Streams.mgFold(after1, b2, capacity = 8)
    val r2 = Streams.mgFold(after1, b2, capacity = 8)
    assert(r1.n == r2.n && r1.decs == r2.decs)
    assert(r1.tokens.sameElements(r2.tokens))
    assert(r1.counts.sameElements(r2.counts))
    // canonical layout: token-sorted arrays
    assert(r1.tokens.sorted.sameElements(r1.tokens))
    // the fold did change state
    assert(r1.n != after1.n)
  }

  test("decrementing regime: state capacity-bounded, bound honest") {
    val cap = 16
    // heavy token every 3rd obs, 400 distinct light tokens
    val batch = Array.tabulate(1200)(i =>
      if (i % 3 == 0) "heavy" else s"light${i}")
    val st = Streams.mgFold(
      Streams.MgState(0L, 0L, Array.empty, Array.empty), batch, cap)
    assert(st.tokens.length <= cap)
    assert(st.n == 1200L)
    // any item's undercount is bounded by the decrement-round count,
    // and decs itself obeys the classic N/(capacity+1) bound
    assert(st.decs > 0L && st.decs <= 1200L / (cap + 1))
    val trueHeavy = 400L
    val idx = st.tokens.indexOf("heavy")
    assert(idx >= 0, "heavy hitter must survive decrements")
    assert(st.counts(idx) <= trueHeavy &&
           st.counts(idx) >= trueHeavy - st.decs)
  }
}
