package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, max}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Behavior, TextAnalysis}
import graft.streaming.Streams

/** Round-11 streaming twins: D36 streamPairDiffs (wilcoxon's stream
  * half), D37 streamFriedmanBlocks (friedman/cochran cell store),
  * D38 streamDupNgramRatio (the stateless degenerate twin). Each
  * pins stream ≡ batch, replay silence, and the stated state bound.
  */
class R11StreamTwinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- D36: streaming paired diffs → batch wilcoxon tail ---------------------

  test("streamPairDiffs (D36): first pair per subject wins, replays and " +
       "re-observations emit nothing, and the batch wilcoxon tail over " +
       "the diff log equals the batch operator over the pair frame") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.PairObs]
    val q = input.toDS()
      .transform(ds => Streams.streamPairDiffs(ds))
      .writeStream.format("memory").queryName("pd_sink")
      .outputMode("update").start()
    // the R10 hand panel: d in {2,2,2,-1,3}
    val pairs = Seq(
      Streams.PairObs(1L, 3L, 1L), Streams.PairObs(2L, 5L, 3L),
      Streams.PairObs(3L, 9L, 7L), Streams.PairObs(4L, 4L, 5L),
      Streams.PairObs(5L, 10L, 7L))
    try {
      input.addData(pairs.take(2): _*); q.processAllAvailable()
      input.addData(pairs.drop(2): _*); q.processAllAvailable()
      assert(spark.table("pd_sink").count() == 5L)
      // replay of batch 2 + a re-observation of subject 1: silent
      input.addData(pairs.drop(2) :+ Streams.PairObs(1L, 99L, 0L): _*)
      q.processAllAvailable()
      assert(spark.table("pd_sink").count() == 5L)
    } finally q.stop()
    val gotDiffs = spark.table("pd_sink")
      .select($"subject", $"d").as[(Long, Long)].collect().toMap
    assert(gotDiffs == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> -1L,
      5L -> 3L))
    // batch tail over the diff log as (d, 0) pairs ≡ batch over pairs
    val tail = Behavior.wilcoxonSignedRank(
      spark.table("pd_sink").select($"d".as("a"))
        .withColumn("b", org.apache.spark.sql.functions.lit(0L)),
      "a", "b")
      .select("n_pairs", "w2_plus", "z2_milli", "significant")
      .as[(Long, Long, Option[Long], Option[Boolean])].collect().toSeq
    val batch = Behavior.wilcoxonSignedRank(
      pairs.map(p => (p.a, p.b)).toDF("a", "b"), "a", "b")
      .select("n_pairs", "w2_plus", "z2_milli", "significant")
      .as[(Long, Long, Option[Long], Option[Boolean])].collect().toSeq
    assert(tail == batch && tail.head._1 == 5L)
  }

  /** Deadline poll — ProcessingTimeTimeout makes processAllAvailable
    * unusable (shouldRunAnotherBatch is unconditionally true, so the
    * no-new-data flag never sets; see R11FixesSpec).
    */
  private def awaitCond(deadlineMs: Long)(cond: => Boolean): Boolean = {
    val end = System.nanoTime() + deadlineMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < end) { Thread.sleep(100L); ok = cond }
    ok
  }

  test("streamPairDiffs (D36): with seenTtlMs a departed subject's seen " +
       "marker expires (state rows decay) and a post-expiry replay " +
       "re-emits (the stated TTL cost)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.PairObs]
    val q = input.toDS()
      .transform(ds => Streams.streamPairDiffs(ds, seenTtlMs = Some(5000L)))
      .writeStream.format("memory").queryName("pd_ttl_sink")
      .outputMode("update").start()
    try {
      input.addData(Streams.PairObs(1L, 7L, 3L))
      assert(awaitCond(30000L)(spark.table("pd_ttl_sink").count() == 1L))
      // empty timeout batches run by themselves: the marker expires
      assert(awaitCond(30000L)(Option(q.lastProgress)
        .exists(_.stateOperators(0).numRowsTotal == 0L)),
        "state rows never decayed to 0")
      // post-expiry replay re-emits (the stated TTL cost)
      input.addData(Streams.PairObs(1L, 7L, 3L))
      assert(awaitCond(30000L)(spark.table("pd_ttl_sink")
        .filter($"subject" === 1L).count() == 2L))
    } finally q.stop()
  }

  // --- D37: streaming friedman block cells -----------------------------------

  test("streamFriedmanBlocks (D37): the battery rebuilt from latest " +
       "cells equals batch friedmanTest AND batch cochranQ on 0/1 " +
       "values — one store, two matched-design reports; replays silent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.FTObs]
    val q = input.toDS()
      .transform(ds => Streams.streamFriedmanBlocks(ds, k = 3))
      .writeStream.format("memory").queryName("ft_sink")
      .outputMode("update").start()
    // four complete 3-treatment blocks of 0/1 values (cochran-compatible)
    def o(s: Long, t: String, v: Long) = Streams.FTObs(s, t, v)
    val b1 = Seq(o(1, "t1", 1), o(1, "t2", 0), o(2, "t1", 1))
    val b2 = Seq(o(1, "t3", 0), o(2, "t2", 1), o(2, "t3", 0),
      o(3, "t1", 0), o(3, "t2", 0), o(3, "t3", 1),
      o(4, "t1", 1), o(4, "t2", 0), o(4, "t3", 0))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val before = spark.table("ft_sink").count()
      // full replay + a re-vote on an existing cell: nothing emits
      input.addData(b2 :+ o(1, "t1", 0): _*); q.processAllAvailable()
      assert(spark.table("ft_sink").count() == before)
    } finally q.stop()
    val cells = spark.table("ft_sink")
      .groupBy("subject", "treatment").agg(max("value").as("value"))
    val obs = (b1 ++ b2).map(x => (x.subject, x.treatment, x.value))
      .toDF("subject", "treatment", "value")
    val gotF = Behavior.friedmanTest(cells, "subject", "treatment",
      "value", k = 3).collect().toSeq
    val wantF = Behavior.friedmanTest(obs, "subject", "treatment",
      "value", k = 3).collect().toSeq
    assert(gotF == wantF && gotF.nonEmpty)
    val gotQ = Behavior.cochranQ(cells, "subject", "treatment",
      "value", k = 3).collect().toSeq
    val wantQ = Behavior.cochranQ(obs, "subject", "treatment",
      "value", k = 3).collect().toSeq
    assert(gotQ == wantQ && gotQ.nonEmpty)
  }

  test("streamFriedmanBlocks (D37): a block past k cells emits the " +
       "overflow sentinel, collapses to a tombstone (bounded state, " +
       "later cells silent), and the exactly-k filter drops it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.FTObs]
    val q = input.toDS()
      .transform(ds => Streams.streamFriedmanBlocks(ds, k = 2))
      .writeStream.format("memory").queryName("ft_ovf_sink")
      .outputMode("update").start()
    def o(s: Long, t: String, v: Long) = Streams.FTObs(s, t, v)
    try {
      // subject 1 overflows ACROSS batches; subject 2 overflows WITHIN
      // one batch; subject 3 stays a complete 2-block
      input.addData(o(1, "a", 1), o(1, "b", 2), o(3, "a", 5))
      q.processAllAvailable()
      input.addData(o(1, "c", 3), o(3, "b", 6),
        o(2, "a", 1), o(2, "b", 2), o(2, "c", 3))
      q.processAllAvailable()
      val afterOverflow = spark.table("ft_ovf_sink").count()
      // tombstoned: a 4th treatment for either subject emits nothing
      input.addData(o(1, "d", 9), o(2, "d", 9)); q.processAllAvailable()
      assert(spark.table("ft_ovf_sink").count() == afterOverflow)
    } finally q.stop()
    val cells = spark.table("ft_ovf_sink")
      .groupBy("subject", "treatment").agg(max("value").as("value"))
    // both overflowed blocks carry the sentinel and > k cells
    assert(cells.filter(col("treatment") ===
      Streams.FriedmanOverflowSentinel).select("subject")
      .as[Long].collect().toSet == Set(1L, 2L))
    assert(cells.filter($"subject" === 1L).count() >= 3L)
    assert(cells.filter($"subject" === 2L).count() >= 3L)
    // the battery keeps ONLY subject 3's exactly-k block
    val f = Behavior.friedmanTest(cells, "subject", "treatment", "value",
      k = 2).select("n_subjects").as[Long].collect()(0)
    assert(f == 1L)
  }

  // --- D38: stateless dup-ngram stream ----------------------------------------

  test("streamDupNgramRatio (D38): append-mode emissions equal the " +
       "batch operator row for row (stateless map, zero state stores)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.DocObs]
    val q = input.toDS()
      .transform(ds => Streams.streamDupNgramRatio(ds, n = 2))
      .writeStream.format("memory").queryName("dng_sink")
      .outputMode("append").start()
    val docs = Seq(
      Streams.DocObs(1L, "the cat sat on the cat sat again"),
      Streams.DocObs(2L, "all distinct words here now"),
      Streams.DocObs(3L, "x"))
    try {
      input.addData(docs.take(1): _*); q.processAllAvailable()
      assert(Option(q.lastProgress)
        .forall(_.stateOperators.isEmpty)) // genuinely stateless
      input.addData(docs.drop(1): _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dng_sink")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    val want = TextAnalysis.dupNgramRatio(
      docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
      "doc_id", "text", n = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == want && got.size == 3)
  }
}
