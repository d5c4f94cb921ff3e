package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

/** PCA: planted-subspace recovery, orthonormality, exact layout
  * invariance of the integer-moment fit, residual behavior.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def plantedFrame() = {
    // rank-2 data in 6 dims: x = a·u + b·w, u/w orthonormal, a,b from
    // a deterministic integer grid, plus a fixed offset (tests mean
    // removal). No noise → eigenvalues 3..6 must be ~0.
    val u = Array(0.6, 0.0, 0.8, 0.0, 0.0, 0.0)
    val w = Array(0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
    val off = Array(0.5, -0.25, 0.125, 1.0, -1.0, 0.0)
    val rows = for (ai <- -5 to 5; bi <- -3 to 3) yield {
      val a = ai / 2.0; val b = bi / 1.5
      val vec = Array.tabulate(6)(i => (a * u(i) + b * w(i) + off(i)).toFloat)
      (ai * 100L + bi, vec)
    }
    (rows.toDF("vec_id", "embedding"), u, w, off)
  }

  test("planted rank-2 subspace is recovered exactly (top-2 spans {u,w})") {
    val (df, u, w, _) = plantedFrame()
    val m = Pca.fit(df, "embedding", k = 4, scaleBits = 14)
    // eigenvalues descending, rank-2: λ3, λ4 ≈ 0 (quantization-bounded)
    assert(m.eigenvalues(0) >= m.eigenvalues(1))
    assert(m.eigenvalues(1) > 0.1, m.eigenvalues.mkString(","))
    assert(math.abs(m.eigenvalues(2)) < 1e-6 && math.abs(m.eigenvalues(3)) < 1e-6)
    // u and w lie in the span of the top-2 components: projecting onto
    // the span preserves their length
    for (dir <- Seq(u, w)) {
      val projSq = m.components.take(2).map(c =>
        c.zip(dir).map { case (x, y) => x * y }.sum).map(p => p * p).sum
      val lenSq = dir.map(x => x * x).sum
      assert(math.abs(projSq - lenSq) < 1e-4,
        s"direction not in top-2 span: $projSq vs $lenSq")
    }
  }

  test("components are orthonormal and the mean is recovered") {
    val (df, _, _, off) = plantedFrame()
    val m = Pca.fit(df, "embedding", k = 4, scaleBits = 14)
    for (i <- 0 until 4; j <- i until 4) {
      val dot = m.components(i).zip(m.components(j)).map { case (x, y) => x * y }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"V[$i]·V[$j] = $dot")
    }
    // grid means: a over -2.5..2.5 → 0, b over -2..2 → 0 ⇒ mean = off
    m.mean.zip(off).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-3, s"mean $got vs $want")
    }
  }

  test("fit is bit-identical across partition layouts (exact integer moments)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m1 = Pca.fit(docs.repartition(1), "embedding", k = 8)
    val m7 = Pca.fit(docs.repartition(7), "embedding", k = 8)
    assert(m1.n == m7.n)
    assert(m1.mean.sameElements(m7.mean), "means differ across layouts")
    assert(m1.eigenvalues.sameElements(m7.eigenvalues), "eigenvalues differ")
    assert(m1.components.zip(m7.components).forall { case (a, b) => a.sameElements(b) },
      "components differ across layouts")
  }

  test("transform: residual shrinks as k grows; full-rank residual ~0 on planted data") {
    val (df, _, _, _) = plantedFrame()
    val resid = (k: Int) => {
      val m = Pca.fit(df, "embedding", k, scaleBits = 14)
      Pca.transform(df, "vec_id", "embedding", m)
        .agg(sum(col("residual"))).as[Double].head()
    }
    val r1 = resid(1); val r2 = resid(2); val r6 = resid(6)
    assert(r1 > r2, s"residual must shrink: k1=$r1 k2=$r2")
    // data is exactly rank 2 (+ quantization noise in the fitted basis)
    assert(r2 < 1e-2, s"rank-2 residual should be ~0, got $r2")
    assert(r6 <= r2 + 1e-9)
    // explained variance at k=2 is ~100%
    val m2 = Pca.fit(df, "embedding", 2, scaleBits = 14)
    assert(m2.explainedVariance > 0.9999)
  }

  test("corpus fit: eigenvalue of PC1 matches the projection variance") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Pca.fit(docs, "embedding", k = 4)
    val pc1 = Pca.transform(docs, "vec_id", "embedding", m, roundTo = 9)
      .select(col("pc1")).as[Double].collect()
    val mu = pc1.sum / pc1.length
    val popVar = pc1.map(x => (x - mu) * (x - mu)).sum / pc1.length
    // fitted on micro-unit-quantized vectors, projected on raw floats:
    // agreement to quantization noise
    assert(math.abs(popVar - m.eigenvalues(0)) < 1e-3 * math.max(1.0, m.eigenvalues(0)),
      s"var(pc1)=$popVar λ1=${m.eigenvalues(0)}")
  }
}
