package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvSketchAgg
import graft.operators.SetSketch

/** KMV theta sketch: exact-regime equality with COUNT(DISTINCT) and
  * set algebra, estimate-regime error bound, layout invariance.
  */
class SetSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exact regime: distinct counts, union, intersection equal set truth") {
    val rows = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 3L), ("a", 4L),
      ("b", 3L), ("b", 4L), ("b", 5L),
      ("c", 9L))
    val df = rows.toDF("grp", "v")
    val out = SetSketch.audienceOverlap(df, "grp", "v", k = 64)
      .orderBy("grp_a", "grp_b")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 4L, 3L, 5L, 2L), // {1,2,3,4} vs {3,4,5}
      ("a", "c", 4L, 1L, 5L, 0L),
      ("b", "c", 3L, 1L, 4L, 0L)))
  }

  test("estimate regime: relative error within the KMV bound") {
    val k = 256
    val n = 20000L
    val sk = spark.range(n).select(KmvSketchAgg(col("id"), k).as("s"))
      .as[Seq[Long]].head()
    assert(sk.length == k, "sketch must be capped at k")
    val est = SetSketch.fromSeq(k, sk).estimate
    val relErr = math.abs(est - n).toDouble / n
    // σ ≈ 1/√k ≈ 6.25%; 4σ guard (deterministic input → stable number)
    assert(relErr < 0.25, s"est=$est for n=$n (relErr=$relErr)")
  }

  test("sketch is bit-identical across partition layouts") {
    val df = spark.range(5000).select((col("id") % 1777).as("v"))
    val s1 = df.repartition(1).select(KmvSketchAgg(col("v"), 128).as("s"))
      .as[Seq[Long]].head()
    val s7 = df.repartition(7).select(KmvSketchAgg(col("v"), 128).as("s"))
      .as[Seq[Long]].head()
    assert(s1 == s7, "KMV retention must be layout-independent")
    assert(s1.length == 128)
    assert(s1 == s1.sorted, "hashes must come out ascending")
  }

  test("string values hash and sketch; nulls are ignored") {
    val df = Seq(Some("x"), Some("y"), Some("x"), None, Some("z"))
      .toDF("v")
    val sk = df.select(KmvSketchAgg(col("v"), 16).as("s")).as[Seq[Long]].head()
    assert(sk.length == 3)
  }

  test("intersection scales by theta when one side leaves the exact regime") {
    val k = 128
    // A = 0..9999 (estimate regime), B = 0..49 (exact): true overlap 50
    val a = SetSketch.fromSeq(k,
      spark.range(10000).select(KmvSketchAgg(col("id"), k).as("s"))
        .as[Seq[Long]].head())
    val b = SetSketch.fromSeq(k,
      spark.range(50).select(KmvSketchAgg(col("id"), k).as("s"))
        .as[Seq[Long]].head())
    assert(b.isExact && !a.isExact)
    val est = a.intersect(b)
    // only ~k/10000 of B's hashes fall under θ → high variance; just
    // require the right order of magnitude (deterministic input)
    assert(est >= 0 && est <= 200, s"intersect est=$est (true 50)")
  }

  // --- HLL ---------------------------------------------------------------

  test("hll: merged partials equal the union sketch byte-identically " +
       "across partition layouts") {
    import graft.functions.HllSketch
    val a = spark.range(0, 3000)
    val b = spark.range(2000, 5000) // overlap 1000
    val direct = a.union(b).repartition(7)
      .agg(HllSketch.sketch(col("id"), 8).as("r")).as[Seq[Long]].head()
    val pa = a.repartition(3).agg(HllSketch.sketch(col("id"), 8).as("r"))
      .as[Seq[Long]].head()
    val pb = b.coalesce(1).agg(HllSketch.sketch(col("id"), 8).as("r"))
      .as[Seq[Long]].head()
    val merged = Seq(pa, pb).toDF("r")
      .agg(HllSketch.merge(col("r"), 8).as("r")).as[Seq[Long]].head()
    assert(merged == direct)
  }

  test("hll: estimate within the m=256 error envelope on the raw " +
       "branch, linear counting near-exact on the small branch") {
    import graft.functions.HllSketch
    def est(n: Long) = spark.range(n)
      .agg(HllSketch.sketch(col("id"), 8).as("r"))
      .select(HllSketch.estimateExpr("r", 8).as("e"))
      .as[Long].head()
    val big = est(5000) // sigma ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(big - 5000) <= 1000, s"hll est $big for 5000")
    val small = est(50) // LC at 20% fill: near-exact
    assert(math.abs(small - 50) <= 8, s"lc est $small for 50")
    // empty register array -> V = m -> ln(1) = 0 -> estimate 0
    val none = spark.range(0)
      .agg(HllSketch.sketch(col("id"), 8).as("r"))
      .select(HllSketch.estimateExpr("r", 8).as("e")).as[Long].head()
    assert(none == 0L)
  }
}
