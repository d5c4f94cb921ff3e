package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Behavior
import graft.streaming.Streams

/** Round-11 discipline closures: the wilcoxonSignedRank magnitude-
  * histogram bound (the §6 single-array rule applied to VALUE
  * histograms), the streamUserGaps frontier TTL, and the
  * streamLjungBox batch-parity failure message.
  */
class R11FixesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- wilcoxonSignedRank: |d| histogram guard -------------------------------

  test("wilcoxonSignedRank: an unquantized wide-domain metric fails fast " +
       "at maxDistinctDiffs instead of materializing a corpus-sized fold") {
    val p = (1L to 40L).map(i => (i * i, 0L)).toDF("a", "b")
    val ex = intercept[Exception] {
      Behavior.wilcoxonSignedRank(p, "a", "b", maxDistinctDiffs = 10L)
        .collect()
    }
    assert(ex.getMessage.contains("wilcoxonSignedRank") &&
      ex.getMessage.contains("maxDistinctDiffs=10") &&
      ex.getMessage.contains("quantize"))
  }

  test("wilcoxonSignedRank: a quantized panel under the bound still " +
       "computes exactly (guard is pass-through)") {
    // same panel as the R10 hand-computed case: d in {2,2,2,-1,3},
    // |d| histogram {1:1, 2:3, 3:1} = 3 distinct magnitudes
    val p = Seq((3L, 1L), (5L, 3L), (9L, 7L), (4L, 5L), (10L, 7L))
      .toDF("a", "b")
    val r = Behavior.wilcoxonSignedRank(p, "a", "b", maxDistinctDiffs = 3L)
      .as[(Long, Long, Option[Long], Option[Boolean])].collect()(0)
    val unguarded = Behavior.wilcoxonSignedRank(p, "a", "b")
      .as[(Long, Long, Option[Long], Option[Boolean])].collect()(0)
    assert(r == unguarded && r._1 == 5L)
  }

  // --- streamUserGaps: frontier TTL ------------------------------------------

  /** Poll until `cond` holds (deadline-bounded). ProcessingTimeTimeout
    * makes `processAllAvailable` unusable: with a registered
    * processing-time timeout, `shouldRunAnotherBatch` is
    * unconditionally true, so the no-new-data flag that call waits on
    * is never set (empty timeout batches run continuously instead —
    * which also means the timeout fires without any driving traffic).
    */
  private def awaitCond(deadlineMs: Long)(cond: => Boolean): Boolean = {
    val end = System.nanoTime() + deadlineMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < end) { Thread.sleep(100L); ok = cond }
    ok
  }

  test("streamUserGaps (D32): with frontierTtlMs a departed user's state " +
       "expires (state count decays to zero) and a post-TTL re-arrival " +
       "re-seeds silently") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.GapEvent]
    val q = input.toDS()
      .transform(ds => Streams.streamUserGaps(ds, frontierTtlMs = Some(5000L)))
      .writeStream.format("memory").queryName("gap_ttl_sink")
      .outputMode("update").start()
    try {
      input.addData(Streams.GapEvent(1L, "g", 0L),
        Streams.GapEvent(1L, "g", 10L))
      assert(awaitCond(30000L)(
        spark.table("gap_ttl_sink").count() == 1L)) // gap 10 emitted
      // the timeout batches run by themselves (5 s TTL, 30 s deadline):
      // user 1's frontier expires
      // and the state store drains to zero rows with NO driving traffic
      assert(awaitCond(30000L)(Option(q.lastProgress)
        .exists(_.stateOperators(0).numRowsTotal == 0L)),
        "state rows never decayed to 0")
      // user 1 returns after expiry: the first event re-seeds a fresh
      // frontier (state row back) and emits NOTHING (the documented
      // dropped-long-gap cost)
      input.addData(Streams.GapEvent(1L, "g", 5000L))
      assert(awaitCond(30000L)(Option(q.lastProgress)
        .exists(_.stateOperators(0).numRowsTotal == 1L)))
      assert(spark.table("gap_ttl_sink")
        .filter($"user" === 1L).count() == 1L) // still only the pre-TTL gap
      // ...but the NEXT event emits a gap from the re-seeded frontier
      input.addData(Streams.GapEvent(1L, "g", 5007L))
      assert(awaitCond(30000L)(spark.table("gap_ttl_sink")
        .filter($"user" === 1L).count() == 2L))
      val u1 = spark.table("gap_ttl_sink").filter($"user" === 1L)
        .select($"gap").as[Long].collect().toSet
      assert(u1 == Set(10L, 7L), s"got $u1")
    } finally q.stop()
  }

  // --- streamLjungBox: batch-parity contract message -------------------------

  test("streamLjungBox (D35): past maxDays the stream fails with the " +
       "batch guard's DAILY-AGGREGATED message (contracts fail identically)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.DailyMetric]
    val q = input.toDS()
      .transform(ds => Streams.streamLjungBox(ds, maxLag = 1, maxDays = 2L))
      .writeStream.format("memory").queryName("lb_guard_sink")
      .outputMode("update").start()
    val ex = intercept[Exception] {
      try {
        input.addData(Streams.DailyMetric("k", 1L, 5L),
          Streams.DailyMetric("k", 2L, 7L))
        q.processAllAvailable()
        input.addData(Streams.DailyMetric("k", 3L, 6L))
        q.processAllAvailable()
      } finally q.stop()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).filter(_ != null).mkString(" | ")
    assert(msgs.contains("ljungBox") && msgs.contains("DAILY-AGGREGATED") &&
      msgs.contains("maxDays=2") &&
      msgs.contains("aggregate upstream or raise maxDays"), msgs)
  }
}
