package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CmSketch
import graft.streaming.Streams

/** Persisted count-min store (E101b) + its streaming twin: merged
  * counters equal the one-shot sketch over the union of batches,
  * replay dedups exactly, compaction folds without changing reads,
  * crash states recover, and stream ≡ batch.
  */
class CmStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(p: String) =
    Files.createTempDirectory(p).toFile.getAbsolutePath

  private def counterMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("extend + read ≡ one-shot counters over the union of batches") {
    val dir = tmpDir("graft_cmstore")
    val b0 = Seq.tabulate(500)(i => (i % 37).toLong).toDF("k")
    val b1 = Seq.tabulate(300)(i => (i % 53).toLong).toDF("k")
    CmSketch.extendCmStore(b0, dir, "k", w = 64, batchId = 0L)
    CmSketch.extendCmStore(b1, dir, "k", w = 64, batchId = 1L)
    val merged = counterMap(CmSketch.readCmStore(spark, dir))
    val oneShot = counterMap(
      CmSketch.counters(b0.unionAll(b1), "k", w = 64))
    assert(merged === oneShot)
  }

  test("replayed batch partial is collapsed by (row,bucket,batch_id) dedup") {
    val dir = tmpDir("graft_cmreplay")
    val b = Seq.tabulate(400)(i => (i % 19).toLong).toDF("k")
    CmSketch.extendCmStore(b, dir, "k", w = 64, batchId = 0L)
    // at-least-once: same batch re-executes with same id, different layout
    CmSketch.extendCmStore(b.repartition(7), dir, "k", w = 64, batchId = 0L)
    val merged = counterMap(CmSketch.readCmStore(spark, dir))
    val oneShot = counterMap(CmSketch.counters(b, "k", w = 64))
    assert(merged === oneShot)
  }

  test("compaction folds committed batches; reads and estimates unchanged") {
    val dir = tmpDir("graft_cmcompact")
    val batches = Seq.tabulate(4)(bi =>
      Seq.tabulate(200)(i => ((i * 7 + bi * 11) % 61).toLong).toDF("k"))
    batches.zipWithIndex.foreach { case (b, i) =>
      CmSketch.extendCmStore(b, dir, "k", w = 64, batchId = i.toLong)
    }
    val before = counterMap(CmSketch.readCmStore(spark, dir))
    CmSketch.compactCmStore(spark, dir, beforeBatch = 3L)
    val stored = spark.read.parquet(s"$dir/cm")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(stored === Set(-1L, 3L))
    assert(counterMap(CmSketch.readCmStore(spark, dir)) === before)
    // estimates off the merged frame: est >= true for every key
    val truth = batches.map(_.withColumnRenamed("k", "key"))
      .reduce(_ unionAll _).groupBy("key").agg(count(lit(1)).as("true_n"))
    val est = CmSketch.estimate(CmSketch.readCmStore(spark, dir),
        truth, "key", w = 64)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty && est.forall { case (t, e) => e >= t })
  }

  test("both crash states of a mid-compaction swap recover") {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    def build(): String = {
      val dir = tmpDir("graft_cmcrash")
      val b = Seq.tabulate(150)(i => (i % 13).toLong).toDF("k")
      CmSketch.extendCmStore(b, dir, "k", w = 32, batchId = 0L)
      CmSketch.extendCmStore(b, dir, "k", w = 32, batchId = 1L)
      dir
    }
    val clean = counterMap(CmSketch.readCmStore(spark, build()))
    // crash state 1: live AND tmp (before the delete) — tmp is orphan
    val d1 = build()
    val fs = new Path(d1).getFileSystem(conf)
    fs.mkdirs(new Path(s"$d1/cm.compact.tmp"))
    CmSketch.compactCmStore(spark, d1, beforeBatch = 1L) // recovers first
    assert(counterMap(CmSketch.readCmStore(spark, d1)) === clean)
    // crash state 2: tmp ONLY (between delete and rename)
    val d2 = build()
    val fs2 = new Path(d2).getFileSystem(conf)
    fs2.rename(new Path(s"$d2/cm"), new Path(s"$d2/cm.compact.tmp"))
    CmSketch.compactCmStore(spark, d2, beforeBatch = 1L)
    assert(counterMap(CmSketch.readCmStore(spark, d2)) === clean)
  }

  test("streamCmMaintain ≡ batch: merged counters equal the one-shot sketch") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmpDir("graft_cmstream")
    val ckpt = tmpDir("graft_cmckpt")
    val input = MemoryStream[Streams.Fact]
    val q = Streams.streamCmMaintain(input.toDS(), store, ckpt, w = 64,
      compactEvery = Some(2))
    try {
      input.addData(Seq.tabulate(120)(i => Streams.Fact((i % 11).toLong, 0.0)): _*)
      q.processAllAvailable()
      input.addData(Seq.tabulate(80)(i => Streams.Fact((i % 23).toLong, 0.0)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val all = Seq.tabulate(120)(i => (i % 11).toLong) ++
      Seq.tabulate(80)(i => (i % 23).toLong)
    val oneShot = counterMap(CmSketch.counters(all.toDF("key"), "key", w = 64))
    assert(counterMap(CmSketch.readCmStore(spark, store)) === oneShot)
    // compactEvery=2 fired after batch 1: committed batch 0 folded
    val stored = spark.read.parquet(s"$store/cm")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(stored === Set(-1L, 1L))
  }
}
