package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** C50 persisted distinct-count store: exact-regime set truth, free
  * byte-purity of KMV partials, compaction fold identity, honest
  * estimate past k. */
class DistinctStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_dstore").toFile.getAbsolutePath

  test("extend + read ≡ exact distinct over the union of batches") {
    val dir = freshDir()
    // overlapping values across batches: distinct must not double-count
    val b0 = Seq.tabulate(300)(i => (if (i % 3 == 0) "a" else "b", (i % 90).toLong))
    val b1 = Seq.tabulate(200)(i => (if (i % 2 == 0) "a" else "c", (i % 130).toLong))
    Relational.extendDistinctStore(b0.toDF("k", "v"), dir, Seq("k"), "v", 1 << 10, 0L)
    Relational.extendDistinctStore(b1.toDF("k", "v"), dir, Seq("k"), "v", 1 << 10, 1L)
    val got = Relational.readDistinctStore(spark, dir, Seq("k"), 1 << 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    val truth = (b0 ++ b1).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).distinct.size.toLong }
    assert(got.keySet == truth.keySet)
    for ((k, n) <- truth) assert(got(k) == ((n, true)), s"key $k")
  }

  test("KMV partials are byte-pure for free; replay dedups exactly") {
    val rows = Seq.tabulate(400)(i => ("x", (i * 7 % 250).toLong))
    val dir = freshDir()
    Relational.extendDistinctStore(rows.toDF("k", "v"), dir, Seq("k"), "v", 1 << 10, 0L)
    Relational.extendDistinctStore(rows.reverse.toDF("k", "v").repartition(7),
      dir, Seq("k"), "v", 1 << 10, 0L)
    val stored = spark.read.parquet(s"$dir/kmv").collect()
    assert(stored.length == 2)
    assert(stored.map(_.getSeq[Long](1)).distinct.size == 1) // identical sketch
    val got = Relational.readDistinctStore(spark, dir, Seq("k"), 1 << 10)
      .collect().head
    assert(got.getLong(1) == rows.map(_._2).distinct.size.toLong)
  }

  test("compaction folds committed batches; read result unchanged") {
    val dir = freshDir()
    val batches = Seq.tabulate(4)(b =>
      Seq.tabulate(150)(i => (if ((i + b) % 3 == 0) "a" else "b",
        ((i * 11 + b * 37) % 400).toLong)))
    batches.zipWithIndex.foreach { case (b, i) =>
      Relational.extendDistinctStore(b.toDF("k", "v"), dir, Seq("k"), "v",
        1 << 10, i.toLong)
    }
    val before = Relational.readDistinctStore(spark, dir, Seq("k"), 1 << 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Relational.compactDistinctStore(spark, dir, Seq("k"), 1 << 10, beforeBatch = 3L)
    val storedBatches = spark.read.parquet(s"$dir/kmv")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(storedBatches == Set(-1L, 3L))
    val after = Relational.readDistinctStore(spark, dir, Seq("k"), 1 << 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before)
  }

  test("past k the estimate is flagged inexact and lands near truth") {
    val dir = freshDir()
    val n = 20000
    val rows = Seq.tabulate(n)(i => ("k", i.toLong))
    Relational.extendDistinctStore(rows.toDF("k", "v"), dir, Seq("k"), "v", 64, 0L)
    val got = Relational.readDistinctStore(spark, dir, Seq("k"), 64)
      .collect().head
    assert(!got.getBoolean(2))
    val est = got.getLong(1).toDouble
    assert(math.abs(est / n - 1.0) < 0.5, s"estimate $est vs $n")
  }

  test("streamDistinctMaintain (D15): streamed batches land as store " +
       "partials; read ≡ exact distinct; mid-stream compaction folds") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    val store = freshDir()
    val ckpt = Files.createTempDirectory("graft_dsckpt").toFile.getAbsolutePath
    val input = MemoryStream[Streams.Measure]
    // compactEvery = 2: after batch 1 commits, batch 0 folds to -1
    val q = Streams.streamDistinctMaintain(input.toDS(), store, ckpt,
      k = 64, compactEvery = Some(2))
    val b1 = Seq("a" -> 10L, "a" -> 30L, "a" -> 10L, "b" -> 5L)
    val b2 = Seq("a" -> 30L, "b" -> 1L, "b" -> 5L, "a" -> 40L)
    try {
      input.addData(b1.map { case (k, v) => Streams.Measure(k, v) }: _*)
      q.processAllAvailable()
      input.addData(b2.map { case (k, v) => Streams.Measure(k, v) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.operators.Relational
      .readDistinctStore(spark, store, Seq("key"), 64)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    // exact regime: distinct over the UNION of both batches
    assert(got == Map("a" -> ((3L, true)), "b" -> ((2L, true))))
    // compaction ran: batch 0's partials folded into batch_id = -1
    val batches = spark.read.parquet(s"$store/kmv")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(batches == Set(-1L, 1L), batches.toString)
  }
}
