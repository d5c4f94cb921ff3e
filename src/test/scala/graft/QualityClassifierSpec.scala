package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

/** Distributed logistic-regression fit: convergence on separable
  * planted data, scale shape (model-sized driver state, map-side
  * scoring), and the SparkEntry key's end-to-end behavior.
  */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Linearly separable synthetic features: label 1 clusters at
    * f1≈0.8, label 0 at f1≈0.2 (f2 is noise from a hash, not an RNG —
    * deterministic).
    */
  private def planted = {
    val rows = (0 until 400).map { i =>
      val y = i % 2
      val noise = ((i * 2654435761L) % 100) / 1000.0 // 0.000–0.099
      val f1 = (if (y == 1) 0.8 else 0.2) + noise
      val f2 = ((i * 40503L) % 100) / 100.0
      (i.toLong, f1, f2, y)
    }
    rows.toDF("id", "f1", "f2", "label")
  }

  test("GD fit converges: log-loss decreases and separates planted clusters") {
    val df = planted
    val feats = Seq("f1", "f2")
    val m0 = QualityClassifier.Model(feats, Array(0.0, 0.0), 0.0)
    val loss0 = QualityClassifier.logLoss(df, m0, "label")
    val m = QualityClassifier.fit(df, feats, "label",
      iterations = 60, learningRate = 2.0)
    val loss = QualityClassifier.logLoss(df, m, "label")
    assert(loss < loss0 / 2, s"no convergence: $loss0 -> $loss")

    val scored = QualityClassifier.score(df.withColumnRenamed("id", "doc_id"),
      m, "doc_id")
    val acc = scored.join(df.withColumnRenamed("id", "doc_id"), "doc_id")
      .select(avg((col("keep").cast("int") === col("label")).cast("double")))
      .as[Double].head()
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("the fitted weight points along the separating feature") {
    val m = QualityClassifier.fit(planted, Seq("f1", "f2"), "label",
      iterations = 60, learningRate = 2.0)
    assert(m.weights(0) > math.abs(m.weights(1)),
      s"w=${m.weights.toSeq} — f1 must dominate the noise feature")
  }

  test("fingerprint-gated sampled fit converges within ε of the full-batch fit") {
    // gate on a deterministic per-row long (id hash stands in for the
    // content fingerprint a text corpus would use); half the rows fit
    val df = planted
    val feats = Seq("f1", "f2")
    val full = QualityClassifier.fit(df, feats, "label",
      iterations = 60, learningRate = 2.0)
    val sampled = QualityClassifier.fitSampled(df, feats, "label",
      xxhash64(col("id")), permille = 500,
      iterations = 60, learningRate = 2.0)
    // both models evaluated on the FULL frame — the sampled fit must
    // generalize, not just fit its own subsample
    val lFull = QualityClassifier.logLoss(df, full, "label")
    val lSampled = QualityClassifier.logLoss(df, sampled, "label")
    info(f"log-loss full=$lFull%.4f sampled(500‰)=$lSampled%.4f")
    assert(math.abs(lSampled - lFull) < 0.05,
      s"sampled fit drifted: full=$lFull sampled=$lSampled")
    // determinism: the same gate picks the same ROWS every refit (the
    // gradient doubles may wiggle at the last ulp — inherent to
    // distributed GD — so compare at 1e-9, not bit-exact)
    val again = QualityClassifier.fitSampled(df, feats, "label",
      xxhash64(col("id")), permille = 500,
      iterations = 60, learningRate = 2.0)
    assert(math.abs(again.bias - sampled.bias) < 1e-9)
    sampled.weights.zip(again.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"refit drift: $a vs $b") }
  }

  test("scoring is map-side only (model rides as literals, no shuffle)") {
    val m = QualityClassifier.Model(Seq("f1", "f2"), Array(1.0, -1.0), 0.1)
    val plan = QualityClassifier.score(
        planted.withColumnRenamed("id", "doc_id"), m, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("empty documents get 0.0 features and a real score, never null") {
    val docs = Seq((1L, ""), (2L, "some real text")).toDF("doc_id", "text")
    val feats = QualityClassifier.features(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(!feats(0).anyNull, s"null feature for empty doc: ${feats(0)}")
    assert(feats(0).getDouble(1) == 0.0) // alpha_ratio
    val m = QualityClassifier.Model(
      Seq("alpha_ratio", "distinct_token_ratio", "top_bigram_frac", "log_len"),
      Array(1.0, 1.0, -1.0, 0.5), -0.5)
    val scored = QualityClassifier.score(
      QualityClassifier.features(docs, "text", "doc_id"), m, "doc_id")
    assert(scored.filter(col("quality_score").isNull ||
      col("keep").isNull).count() == 0)
  }

  test("quality_classifier key: scores every document, keep is thresholded") {
    val out = SparkEntry.queries("quality_classifier")(
      spark, "/root/testdata/sf0.001").cache()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(out.count() == docs.count())
    val bad = out.filter(
      (col("quality_score") >= 0.5) =!= col("keep")).count()
    assert(bad == 0)
    assert(out.agg(min("quality_score")).as[Double].head() >= 0.0)
    assert(out.agg(max("quality_score")).as[Double].head() <= 1.0)
    out.unpersist()
  }
}
