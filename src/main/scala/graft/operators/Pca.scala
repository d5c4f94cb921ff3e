package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{PcaProjectExpr, VectorMomentsAgg}

/** Distributed PCA over an embedding column — the dimensionality-
  * reduction / whitening preprocessing step ANN and clustering
  * pipelines run before indexing (OPQ-style rotation training, CCNet
  * embedding compression).
  *
  * Scale shape (the Lloyd/codebook contract): the ONLY corpus-scale
  * work is one [[VectorMomentsAgg]] pass — O(dim²) integer state per
  * partial, associative merges, one model-sized row to the driver.
  * The eigensolve runs on the driver over the dim×dim covariance
  * (64×64 here; still trivial at dim=4096), and projection ships the
  * k×dim component matrix back as a codegen reference object
  * ([[PcaProjectExpr]]) — map-side, zero shuffle, no UDF.
  *
  * Determinism: moments are exact integers under any layout (see
  * VectorMomentsAgg), the cyclic Jacobi sweep order is fixed, and
  * each eigenvector's sign is canonicalized (largest-|component|
  * coordinate made positive, first index on ties) — so the fitted
  * model is bit-identical across runs, partitionings, and engines.
  */
object Pca {

  /** Fitted model: top-k eigenpairs of the covariance, descending. */
  final case class PcaModel(
      dim: Int,
      n: Long,
      mean: Array[Double],
      components: Array[Array[Double]], // k rows × dim
      eigenvalues: Array[Double],       // top-k, descending
      totalVariance: Double) {          // trace of the covariance
    def k: Int = components.length
    def explainedVariance: Double =
      if (totalVariance > 0) eigenvalues.sum / totalVariance else 1.0
  }

  /** One corpus pass → exact integer moments → driver eigensolve. */
  def fit(vectors: DataFrame, vecCol: String, k: Int,
          scaleBits: Int = 10): PcaModel = {
    val dim = vectors.select(size(col(vecCol))).first().getInt(0)
    require(k > 0 && k <= dim, s"k=$k must be in [1, $dim]")
    val moments = vectors
      .select(VectorMomentsAgg(col(vecCol), dim, scaleBits).as("m"))
      .first().getSeq[Long](0).toArray
    val n = moments(0)
    require(n > 1, s"need at least 2 vectors to fit PCA, got $n")
    val scale = (1L << scaleBits).toDouble

    val mean = new Array[Double](dim)
    var i = 0
    while (i < dim) { mean(i) = moments(1 + i) / n.toDouble / scale; i += 1 }

    // covariance C_ij = E[x_i x_j] − μ_i μ_j from the exact sums
    val cov = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val exy = moments(t) / n.toDouble / (scale * scale)
        val c = exy - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    var trace = 0.0
    i = 0
    while (i < dim) { trace += cov(i)(i); i += 1 }

    val (eigVals, eigVecs) = jacobiEigen(cov)
    // order: eigenvalue desc, original column index asc on exact ties
    val order = (0 until dim).sortBy(c => (-eigVals(c), c))
    val comps = new Array[Array[Double]](k)
    val vals = new Array[Double](k)
    var r = 0
    while (r < k) {
      val c = order(r)
      val v = new Array[Double](dim)
      i = 0
      while (i < dim) { v(i) = eigVecs(i)(c); i += 1 }
      signFix(v)
      comps(r) = v
      vals(r) = eigVals(c)
      r += 1
    }
    PcaModel(dim, n, mean, comps, vals, trace)
  }

  /** `array<double>` of `[p_1..p_k, residual_l2]` for each vector. */
  def projectWithResidual(v: Column, model: PcaModel): Column =
    PcaProjectExpr(v, model.mean.toSeq, model.components.map(_.toSeq).toSeq)

  /** Project a vector frame: id, k projection columns, residual. */
  def transform(vectors: DataFrame, idCol: String, vecCol: String,
                model: PcaModel, roundTo: Int = 6): DataFrame = {
    val proj = projectWithResidual(col(vecCol), model)
    val withP = vectors.select(col(idCol), proj.as("__p"))
    val pcCols = (0 until model.k).map(c =>
      round(element_at(col("__p"), c + 1), roundTo).as(s"pc${c + 1}"))
    withP.select(col(idCol) +: pcCols :+
      round(element_at(col("__p"), model.k + 1), roundTo).as("residual"): _*)
  }

  /** Canonical sign: the largest-|v| coordinate (first on ties) is
    * made positive, killing the eigenvector sign ambiguity.
    */
  private def signFix(v: Array[Double]): Unit = {
    var best = 0
    var i = 1
    while (i < v.length) {
      if (math.abs(v(i)) > math.abs(v(best))) best = i
      i += 1
    }
    if (v(best) < 0) {
      i = 0
      while (i < v.length) { v(i) = -v(i); i += 1 }
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: fixed
    * (p,q) sweep order, rotations until the off-diagonal mass is
    * ~machine-zero relative to the diagonal — deterministic for a
    * deterministic input. Returns (eigenvalues, eigenvector columns).
    */
  private[operators] def jacobiEigen(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    val maxSweeps = 64
    var converged = false
    while (!converged && sweep < maxSweeps) {
      var off = 0.0
      var diag = 0.0
      var i = 0
      while (i < d) {
        diag += a(i)(i) * a(i)(i)
        var j = i + 1
        while (j < d) { off += 2.0 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      if (off <= 1e-26 * (diag + off) || off == 0.0) converged = true
      else {
        var p = 0
        while (p < d - 1) {
          var q = p + 1
          while (q < d) {
            val apq = a(p)(q)
            if (apq != 0.0) {
              val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
              val tt = math.signum(theta) match {
                case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
                case s   => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              }
              val c = 1.0 / math.sqrt(tt * tt + 1.0)
              val s = tt * c
              var r = 0
              while (r < d) {
                val arp = a(r)(p); val arq = a(r)(q)
                a(r)(p) = c * arp - s * arq
                a(r)(q) = s * arp + c * arq
                r += 1
              }
              r = 0
              while (r < d) {
                val apr = a(p)(r); val aqr = a(q)(r)
                a(p)(r) = c * apr - s * aqr
                a(q)(r) = s * apr + c * aqr
                r += 1
              }
              r = 0
              while (r < d) {
                val vrp = v(r)(p); val vrq = v(r)(q)
                v(r)(p) = c * vrp - s * vrq
                v(r)(q) = s * vrp + c * vrq
                r += 1
              }
            }
            q += 1
          }
          p += 1
        }
        sweep += 1
      }
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
