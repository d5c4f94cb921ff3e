package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KllBuffer
import graft.streaming.Streams

/** D11 streaming per-key quantiles: stream ≡ exact prefix answers in
  * the k ≥ n regime, byte-identical state under replay, sketch-sized
  * state in the compacting regime. */
class StreamQuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val phis = Seq(0.5, 0.9, 0.99)

  private def exactQs(vals: Seq[Long]): Seq[Long] = {
    val sorted = vals.sorted
    phis.map { p =>
      val r = math.max(0L, math.ceil(p * sorted.length).toLong - 1L)
      sorted(math.min(r, sorted.length - 1L).toInt)
    }
  }

  test("stream ≡ exact per-key quantiles after every batch (k ≥ n regime)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_sq").toFile.getAbsolutePath
    val input = MemoryStream[Streams.Measure]
    val q = Streams.streamQuantiles(input.toDS(), k = 1024, phis)
      .writeStream.outputMode("update").format("memory")
      .queryName("sq_out").option("checkpointLocation", ckpt).start()
    val b1 = Seq("a" -> 10L, "a" -> 30L, "a" -> 20L, "b" -> 5L)
    val b2 = Seq("a" -> 40L, "b" -> 1L, "b" -> 9L)
    try {
      input.addData(b1.map { case (k, v) => Streams.Measure(k, v) }: _*)
      q.processAllAvailable()
      val after1 = spark.table("sq_out")
        .as[Streams.KeyQuantiles].collect().map(r => r.key -> r).toMap
      assert(after1("a").qs == exactQs(Seq(10L, 30L, 20L)))
      assert(after1("b").qs == exactQs(Seq(5L)))
      assert(after1.values.forall(_.err_bound == 0L))

      input.addData(b2.map { case (k, v) => Streams.Measure(k, v) }: _*)
      q.processAllAvailable()
      // memory sink appends per batch: latest row per key = largest n
      val after2 = spark.table("sq_out").as[Streams.KeyQuantiles].collect()
        .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.n) }
      assert(after2("a").n == 4L &&
        after2("a").qs == exactQs(Seq(10L, 30L, 20L, 40L)))
      assert(after2("b").n == 3L &&
        after2("b").qs == exactQs(Seq(5L, 1L, 9L)))
    } finally q.stop()
  }

  test("replayed batch rebuilds byte-identical state (deterministic fold)") {
    val b1 = Array.tabulate(500)(i => (i * 37L) % 1000L)
    val b2 = Array.tabulate(300)(i => (i * 91L) % 1000L)
    def fold(buf: KllBuffer, batch: Array[Long]): KllBuffer = {
      val s = batch.clone(); java.util.Arrays.sort(s)
      s.foreach(buf.insert); buf
    }
    val afterB1 = KllBuffer.toBytes(fold(new KllBuffer(64), b1))
    // two independent replays of batch 2 from the same checkpointed state
    val r1 = KllBuffer.toBytes(fold(KllBuffer.fromBytes(afterB1), b2))
    val r2 = KllBuffer.toBytes(fold(KllBuffer.fromBytes(afterB1), b2))
    assert(java.util.Arrays.equals(r1, r2))
    // and the replayed state differs from pre-batch state (it did fold)
    assert(!java.util.Arrays.equals(afterB1, r1))
  }

  test("streamQuantileMaintain (D13): streamed batches land as store " +
       "partials; read ≡ exact quantiles; mid-stream compaction folds") {
    implicit val sqlCtx = spark.sqlContext
    val store = Files.createTempDirectory("graft_sqstore").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_sqckpt").toFile.getAbsolutePath
    val input = MemoryStream[Streams.Measure]
    // compactEvery = 2: after batch 1 commits, batch 0 folds to -1
    val q = Streams.streamQuantileMaintain(input.toDS(), store, ckpt,
      k = 4096, compactEvery = Some(2))
    val b1 = Seq("a" -> 10L, "a" -> 30L, "b" -> 5L)
    val b2 = Seq("a" -> 20L, "b" -> 1L, "b" -> 9L, "a" -> 40L)
    try {
      input.addData(b1.map { case (k, v) => Streams.Measure(k, v) }: _*)
      q.processAllAvailable()
      input.addData(b2.map { case (k, v) => Streams.Measure(k, v) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.operators.Relational
      .readQuantileStore(spark, store, Seq("key"), 4096, phis)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    val all = (b1 ++ b2).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2) }
    for ((k, vs) <- all) {
      val (n, err, qs) = got(k)
      assert(n == vs.length && err == 0L && qs == exactQs(vs), s"key $k")
    }
    // compaction ran: batch 0's partials folded into batch_id = -1
    val batches = spark.read.parquet(s"$store/kll")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(batches == Set(-1L, 1L), batches.toString)
  }

  test("state stays sketch-sized while compacting (never the history)") {
    val buf = new KllBuffer(64)
    var x = 12345L
    (1 to 50000).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      buf.insert(math.abs(x % 1000000L))
    }
    val bytes = KllBuffer.toBytes(buf)
    // 50k longs of history would be 400KB; the sketch holds k·levels
    assert(bytes.length < 16 * 1024, s"state ${bytes.length}B")
    // theory: errBound ≈ n·log2(n/k)/k = 50000·9.6/64 ≈ 7500
    assert(buf.errBound > 0L && buf.errBound < 10000L)
    // answers still exist and are within plausible range
    val qs = KllBuffer.quantiles(buf, phis)
    assert(qs.length == 3 && qs.forall(v => v >= 0L && v < 1000000L))
  }
}
