package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** C48 persisted quantile store: deterministic KLL partials, replay
  * dedup exactness, compaction fold identity, layout-independence. */
class QuantileStoreSpec extends AnyFunSuite {
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

  private def freshDir(): String =
    Files.createTempDirectory("graft_qstore").toFile.getAbsolutePath

  private def batchDf(rows: Seq[(String, Long)]) =
    rows.toDF("k", "v")

  test("extend + read ≡ exact quantiles over the union of batches") {
    val dir = freshDir()
    val b0 = Seq.tabulate(400)(i => (if (i % 3 == 0) "a" else "b", (i * 37L) % 997L))
    val b1 = Seq.tabulate(300)(i => (if (i % 2 == 0) "a" else "c", (i * 91L) % 997L))
    Relational.extendQuantileStore(batchDf(b0), dir, Seq("k"), "v", 1 << 12, 0L)
    Relational.extendQuantileStore(batchDf(b1), dir, Seq("k"), "v", 1 << 12, 1L)
    val got = Relational.readQuantileStore(spark, dir, Seq("k"), 1 << 12, phis)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
    val all = (b0 ++ b1).groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    for ((k, vs) <- all) {
      val (n, err, qs) = got(k)
      assert(n == vs.length, s"key $k n")
      assert(err == 0L, s"key $k exact regime")
      assert(qs == exactQs(vs), s"key $k quantiles")
    }
    assert(got.keySet == all.keySet)
  }

  test("partials are byte-pure: replay rows identical, layout-invariant") {
    val rows = Seq.tabulate(500)(i => (if (i % 4 == 0) "x" else "y", (i * 53L) % 733L))
    val p1 = Relational.kllPartials(batchDf(rows), Seq("k"), "v", 1 << 12)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    // different incoming layout: reversed order, different partition count
    val p2 = Relational.kllPartials(
        batchDf(rows.reverse).repartition(7), Seq("k"), "v", 1 << 12)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(p1 == p2)

    // replayed batch appends a byte-identical row; read dedups it exactly
    val dir = freshDir()
    Relational.extendQuantileStore(batchDf(rows), dir, Seq("k"), "v", 1 << 12, 0L)
    Relational.extendQuantileStore(batchDf(rows), dir, Seq("k"), "v", 1 << 12, 0L)
    val stored = spark.read.parquet(s"$dir/kll").collect()
    assert(stored.length == 4) // 2 keys × 2 writes
    val byKey = stored.groupBy(_.getString(0))
    for ((_, rs) <- byKey)
      assert(rs.map(_.getAs[Array[Byte]]("sketch").toSeq).distinct.size == 1)
    val got = Relational.readQuantileStore(spark, dir, Seq("k"), 1 << 12, phis)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("x") == rows.count(_._1 == "x") &&
           got("y") == rows.count(_._1 == "y"))
  }

  test("compaction folds committed batches; read result unchanged") {
    val dir = freshDir()
    val batches = Seq.tabulate(4) { b =>
      Seq.tabulate(200)(i => (if ((i + b) % 3 == 0) "a" else "b",
        (i * 17L + b * 101L) % 499L))
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      Relational.extendQuantileStore(batchDf(b), dir, Seq("k"), "v", 1 << 12, i.toLong)
    }
    val before = Relational.readQuantileStore(spark, dir, Seq("k"), 1 << 12, phis)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Long](3)))).toMap
    // fold batches 0-2 (committed); 3 is in flight
    Relational.compactQuantileStore(spark, dir, Seq("k"), 1 << 12, beforeBatch = 3L)
    val storedBatches = spark.read.parquet(s"$dir/kll")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(storedBatches == Set(-1L, 3L))
    val after = Relational.readQuantileStore(spark, dir, Seq("k"), 1 << 12, phis)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Long](3)))).toMap
    assert(after == before)
    // replay of the in-flight batch AFTER compaction still dedups
    Relational.extendQuantileStore(batchDf(batches(3)), dir, Seq("k"), "v",
      1 << 12, 3L)
    val replayed = Relational.readQuantileStore(spark, dir, Seq("k"), 1 << 12, phis)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Long](3)))).toMap
    assert(replayed == before)
  }

  test("compacting regime: err_bound honest, answers within the bound") {
    val dir = freshDir()
    val n = 20000
    val rows = Seq.tabulate(n)(i => ("k", ((i * 2654435761L) % 1000003L)))
    Relational.extendQuantileStore(batchDf(rows), dir, Seq("k"), "v", 64, 0L)
    val row = Relational.readQuantileStore(spark, dir, Seq("k"), 64, phis)
      .select(col("k"), col("n"), col("err_bound"), col("qs"))
      .collect().head
    val (got_n, err, qs) = (row.getLong(1), row.getLong(2), row.getSeq[Long](3))
    assert(got_n == n.toLong)
    assert(err > 0L && err < n.toLong) // compacted, but the bound is useful
    val sorted = rows.map(_._2).sorted
    phis.zip(qs).foreach { case (p, q) =>
      val target = math.max(0L, math.ceil(p * n).toLong - 1L)
      // true rank range of the answered value
      val lo = sorted.indexWhere(_ == q)
      val hi = sorted.lastIndexWhere(_ == q)
      assert(lo - err <= target && target <= hi + err,
        s"phi=$p answer rank [$lo,$hi] vs target $target with bound $err")
    }
  }
}
