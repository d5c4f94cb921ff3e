package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KllQuantilesAgg

/** The deterministic KLL/MRL quantile sketch: exact in the k ≥ n
  * regime under any partition layout, and never worse than its own
  * carried error bound when compacting. */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val phis = Seq(0.5, 0.9, 0.99)

  /** DuckDB quantile_disc / inverse-CDF rank: max(0, ceil(phi·n)−1). */
  private def exactQs(sorted: Array[Long]): Seq[Long] =
    phis.map { p =>
      val r = math.max(0L, math.ceil(p * sorted.length).toLong - 1L)
      sorted(math.min(r, sorted.length - 1L).toInt)
    }

  // deterministic LCG — reproducible data without Random
  private def lcg(seed: Long, n: Int): Array[Long] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      math.abs(x % 1000000L)
    }
  }

  test("exact regime: k >= n gives exact type-1 quantiles, err_bound 0, " +
       "under 1, 7 and 32 partitions") {
    val vals = lcg(42L, 5000)
    val sorted = vals.sorted
    for (parts <- Seq(1, 7, 32)) {
      val out = vals.toSeq.toDF("v").repartition(parts)
        .agg(KllQuantilesAgg(col("v"), 8192, phis).as("s"))
        .select("s.n", "s.err_bound", "s.qs").head()
      assert(out.getLong(0) == 5000L)
      assert(out.getLong(1) == 0L, s"parts=$parts err=${out.getLong(1)}")
      assert(out.getSeq[Long](2) == exactQs(sorted), s"parts=$parts")
    }
  }

  test("sketch regime: carried err_bound is honest — true rank of each " +
       "answer within err_bound of target, across layouts") {
    val n = 200000
    val vals = lcg(7L, n)
    val sorted = vals.sorted
    def rankOf(v: Long): Long = {
      // rank range of v in sorted data: any index holding v is a true rank
      var lo = java.util.Arrays.binarySearch(sorted, v)
      assert(lo >= 0, s"sketch invented value $v")
      var hi = lo
      while (lo > 0 && sorted(lo - 1) == v) lo -= 1
      while (hi < n - 1 && sorted(hi + 1) == v) hi += 1
      (lo.toLong << 32) | hi.toLong
    }
    for (parts <- Seq(1, 32)) {
      val out = vals.toSeq.toDF("v").repartition(parts)
        .agg(KllQuantilesAgg(col("v"), 256, phis).as("s"))
        .select("s.n", "s.err_bound", "s.qs").head()
      assert(out.getLong(0) == n.toLong)
      val err = out.getLong(1)
      // bound is real compaction accounting: positive, far below n
      assert(err > 0L && err < n / 10, s"err_bound=$err")
      val qs = out.getSeq[Long](2)
      phis.zip(qs).foreach { case (p, v) =>
        val target = math.max(0L, math.ceil(p * n).toLong - 1L)
        val lohi = rankOf(v)
        val lo = lohi >> 32; val hi = lohi & 0xffffffffL
        val dist = if (target < lo) lo - target
                   else if (target > hi) target - hi else 0L
        assert(dist <= err,
          s"parts=$parts phi=$p value=$v rank∈[$lo,$hi] target=$target " +
          s"dist=$dist > err_bound=$err")
      }
    }
  }

  test("nulls are skipped; empty input yields n=0 and empty qs") {
    val out = Seq[(java.lang.Long, Int)]((1L, 0), (null, 0), (3L, 0), (2L, 0))
      .toDF("v", "g")
      .agg(KllQuantilesAgg(col("v"), 64, phis).as("s"))
      .select("s.n", "s.qs").head()
    assert(out.getLong(0) == 3L)
    assert(out.getSeq[Long](1) == Seq(2L, 3L, 3L))
    val empty = spark.range(0).select(col("id").as("v"))
      .agg(KllQuantilesAgg(col("v"), 64, phis).as("s"))
      .select("s.n", "s.err_bound", "s.qs").head()
    assert(empty.getLong(0) == 0L && empty.getSeq[Long](2).isEmpty)
  }

  test("grouped: per-group sketches are independent and exact in regime") {
    val df = (0 until 3).flatMap { g =>
      lcg(g + 1L, 1000).map(v => (s"g$g", v))
    }.toDF("g", "v").repartition(16)
    val rows = df.groupBy("g")
      .agg(KllQuantilesAgg(col("v"), 2048, phis).as("s"))
      .select(col("g"), col("s.qs")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    (0 until 3).foreach { g =>
      assert(rows(s"g$g") == exactQs(lcg(g + 1L, 1000).sorted), s"g$g")
    }
  }

  test("SQL registry: graft_quantile_sketch ≡ Column API") {
    spark.range(1000).select((col("id") * 7 % 1000).as("v"))
      .createOrReplaceTempView("qs_sql")
    val viaSql = spark.sql(
      "SELECT graft_quantile_sketch(v, 2048, array(0.5D, 0.9D, 0.99D)) AS s " +
      "FROM qs_sql").select("s.qs").head().getSeq[Long](0)
    val viaCol = spark.table("qs_sql")
      .agg(KllQuantilesAgg(col("v"), 2048, phis).as("s"))
      .select("s.qs").head().getSeq[Long](0)
    assert(viaSql == viaCol)
    val bad = intercept[Exception] {
      spark.sql("SELECT graft_quantile_sketch(v, v, array(0.5D)) FROM qs_sql")
        .collect()
    }
    assert(bad.getMessage.contains("literal"), bad.getMessage)
  }
}
