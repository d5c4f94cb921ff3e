package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression quality classifier — the trained
  * quality-filter stage of a training-data pipeline (the role fastText
  * quality classifiers play in CCNet/RefinedWeb-style curation),
  * expressed entirely as DataFrame plans.
  *
  * Fit is full-batch gradient descent with the SAME scale contract as
  * the trained IVF quantizer ([[Similarity.fitIvfCentroids]]): each
  * iteration is ONE map-side gradient aggregation over the corpus —
  * sigmoid, residual and per-feature products are codegen'd column
  * expressions — and only `nFeatures + 1` doubles ever reach the
  * driver. No collect of data, no mllib, no driver-side loops over
  * rows; 100 TB changes the iteration's wall-clock, not its shape.
  *
  * Determinism note: the gradient means are double sums whose shuffle
  * order varies run to run, so refit weights can wiggle at the last
  * ulp. That is inherent to distributed GD (the IVF trainer shares it);
  * scoring therefore rounds, and the driver key is rows-only (the
  * oracle SQL cannot express an iterative fit).
  */
object QualityClassifier {

  /** Model-sized result: one weight per feature plus a bias. */
  final case class Model(features: Seq[String], weights: Array[Double],
                         bias: Double) {
    require(features.length == weights.length)
  }

  /** Per-document feature vector for quality classification: the
    * [[TextAnalysis.quality]] ratios joined (map-side, same pass) with
    * the native repetition statistics and a log-length term. All
    * map-side column math over one scan.
    */
  def features(docs: DataFrame, textCol: String, idCol: String,
               extra: Seq[(String, Column)] = Nil): DataFrame = {
    // coalesce once so EVERY feature is null-free: a null text would
    // otherwise null the repetition stats and log_len (only alpha_ratio
    // is null-safe on its own), dropping the row asymmetrically from
    // per-column gradient averages and scoring it null
    val t = coalesce(col(textCol), lit(""))
    val toks = split(t, " ")
    val stats = graft.functions.RepetitionStatsExpr(toks)
    // not fanned out (r11 A/B: quality_classifier 3.47s -> 4.62s with
    // the rebalance — features are one native expression per row, too
    // light to amortize an exchange on both the fit and score passes)
    docs.select(Seq(
      col(idCol),
      TextAnalysis.alphaRatioRaw(t).as("alpha_ratio"),
      stats.getItem(0).as("distinct_token_ratio"),
      stats.getItem(1).as("top_bigram_frac"),
      (log(length(t).cast("double") + 1.0) / 10.0).as("log_len"))
      // rider columns computed in the SAME pass (e.g. a sampling gate
      // over the raw text, which this projection otherwise drops)
      ++ extra.map { case (n, c) => c.as(n) }: _*)
  }

  private def margin(featCols: Seq[String], w: Array[Double], b: Double): Column =
    featCols.zipWithIndex.map { case (f, i) => col(f) * lit(w(i)) }
      .reduce(_ + _) + lit(b)

  /** σ(w·x + b) as a codegen column expression. */
  private def sigmoid(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))

  /** Full-batch GD fit of `labelCol` (0/1) on `featCols`. One
    * aggregation job per iteration; gradient = mean((σ(w·x+b) − y)·x).
    */
  def fit(train: DataFrame, featCols: Seq[String], labelCol: String,
          iterations: Int = 50, learningRate: Double = 1.0): Model = {
    // every iteration re-reads the training frame — persist the narrow
    // (features+label) projection once instead of recomputing its
    // lineage `iterations` times (MEMORY_AND_DISK: spills, never OOMs)
    val proj = train.select((featCols :+ labelCol).map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fitCached(proj, featCols, labelCol, iterations, learningRate)
    finally proj.unpersist(blocking = false)
  }

  /** Bounded-cost fit for corpus-scale training frames: a DETERMINISTIC
    * fingerprint-gated subsample (the [[TextAnalysis.stratifiedSample]]
    * device — `pmod(gate, 1000) < permille`, no RNG) ahead of the
    * full-batch GD, so fit cost is `permille/1000 × corpus` per
    * iteration instead of the whole corpus. The same documents are
    * chosen on every run, engine and cluster layout, so refits are
    * reproducible; `gate` is any deterministic per-row long — pass
    * `TextAnalysis.fingerprint(col(textCol))` (content-gated: a
    * re-partitioned or re-ordered corpus fits on the identical sample).
    * For a model this size a subsample loses nothing (spec-asserted:
    * sampled-fit log-loss within ε of the full-batch fit); keep
    * [[fit]] as the exact oracle.
    */
  def fitSampled(train: DataFrame, featCols: Seq[String], labelCol: String,
                 gate: Column, permille: Int,
                 iterations: Int = 50, learningRate: Double = 1.0): Model = {
    require(permille > 0 && permille <= 1000,
      s"permille=$permille must be in (0, 1000]")
    fit(train.filter(pmod(gate, lit(1000L)) < permille),
      featCols, labelCol, iterations, learningRate)
  }

  private def fitCached(train: DataFrame, featCols: Seq[String],
                        labelCol: String, iterations: Int,
                        learningRate: Double): Model = {
    val n = featCols.length
    var w = new Array[Double](n)
    var b = 0.0
    var it = 0
    while (it < iterations) {
      val resid = sigmoid(margin(featCols, w, b)) - col(labelCol).cast("double")
      val gradCols = featCols.zipWithIndex.map { case (f, i) =>
        avg(resid * col(f)).as(s"g$i") } :+ avg(resid).as("gb")
      val row = train.agg(gradCols.head, gradCols.tail: _*).head()
      val nw = new Array[Double](n)
      var i = 0
      while (i < n) { nw(i) = w(i) - learningRate * row.getDouble(i); i += 1 }
      b -= learningRate * row.getDouble(n)
      w = nw
      it += 1
    }
    Model(featCols, w, b)
  }

  /** Mean log-loss of a model over a labeled frame (for convergence
    * specs): one aggregation, clamped away from log(0).
    */
  def logLoss(df: DataFrame, model: Model, labelCol: String): Double = {
    val p0 = sigmoid(margin(model.features, model.weights, model.bias))
    val p = least(greatest(p0, lit(1e-12)), lit(1.0 - 1e-12))
    val y = col(labelCol).cast("double")
    df.agg(avg(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))))
      .head().getDouble(0)
  }

  /** Score documents with a fitted model: quality probability rounded
    * to 6 places plus the binary keep decision at `threshold`.
    * Map-side only — the model rides in the expression as literals.
    */
  def score(feats: DataFrame, model: Model, idCol: String,
            threshold: Double = 0.5): DataFrame =
    feats.select(col(idCol),
      round(sigmoid(margin(model.features, model.weights, model.bias)), 6)
        .as("quality_score"))
      .withColumn("keep", col("quality_score") >= threshold)
}
