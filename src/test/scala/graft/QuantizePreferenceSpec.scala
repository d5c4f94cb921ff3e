package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Similarity, TextAnalysis}

/** Specs for int8 embedding quantization and preference-pair mining. */
class QuantizePreferenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- quantizeInt8 ------------------------------------------------------

  test("quantizeInt8: per-dim scaling, symmetric range, zero dim") {
    // dim 0 max|x| = 4 → codes x*127/4; dim 1 all zero → code 0;
    // dim 2 max|x| = 1 from a NEGATIVE value → |-1| drives the scale
    val df = Seq(
      (1L, Array(4.0f, 0.0f, -1.0f)),
      (2L, Array(-2.0f, 0.0f, 0.5f)),
      (3L, Array(1.0f, 0.0f, 0.25f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect()
      .map { case (id, d, c) => (id, d) -> c }.toMap
    assert(out((1L, 0L)) == 127L)     // 4/4 * 127
    assert(out((2L, 0L)) == -63L)     // -2/4*127 = -63.5 → floor(-63) = -63
    assert(out((3L, 0L)) == 32L)      // 1/4*127 = 31.75 → 32
    assert(out((1L, 1L)) == 0L && out((2L, 1L)) == 0L) // all-zero dim
    assert(out((1L, 2L)) == -127L)    // negative extreme hits -127
    assert(out((2L, 2L)) == 64L)      // 0.5*127 = 63.5 → round-half-up 64
  }

  test("quantizeInt8 codes bounded and reconstruction error < scale/2") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val codes = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    val mm = codes.agg(min("code"), max("code")).as[(Long, Long)].head()
    assert(mm._1 >= -127L && mm._2 <= 127L)
    // round-trip: |x - code*mx/127| <= mx/254 + eps for every element
    val flat = emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
              col("x").cast("double").as("x"))
    val mx = flat.groupBy("dim").agg(max(abs(col("x"))).as("mx"))
    val bad = codes.join(flat, Seq("vec_id", "dim")).join(mx, "dim")
      .filter(col("mx") > 0.0 &&
        abs(col("x") - col("code") * col("mx") / 127.0) >
          col("mx") / 254.0 + 1e-12)
      .count()
    assert(bad == 0L)
  }

  // --- lengthBatches -----------------------------------------------------

  test("lengthBatches: bucket grouping, batch deal, id order, invariance") {
    // widths: bucket 0 (<4 tokens) and bucket 1 (4-7 tokens)
    val docs = Seq(
      (1L, "a b c"), (2L, "a"), (3L, "a b"),          // bucket 0
      (4L, "a b c d"), (5L, "a b c d e"))             // bucket 1
      .toDF("doc_id", "text")
    val out = TextAnalysis.lengthBatches(docs, "text", "doc_id",
        bucketWidth = 4L, batchSize = 2)
      .select("doc_id", "bucket", "batch_ix", "pos_in_batch")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 0L, 0L), (2L, 0L, 0L, 1L), (3L, 0L, 1L, 0L),
      (4L, 1L, 0L, 0L), (5L, 1L, 0L, 1L)))
    // layout independence: different input partitioning, same batches
    val re = TextAnalysis.lengthBatches(docs.repartition(5), "text",
        "doc_id", bucketWidth = 4L, batchSize = 2)
      .select("doc_id", "bucket", "batch_ix", "pos_in_batch")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(re == out)
  }

  test("lengthBatches bounds per-batch padding to the bucket width") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val batches = TextAnalysis.lengthBatches(docs, "text", "doc_id",
      bucketWidth = 32L, batchSize = 8)
    // within any batch, max-min token count < bucketWidth — the
    // padding bound batching exists to provide
    val spread = batches.groupBy("bucket", "batch_ix")
      .agg((max("n_tokens") - min("n_tokens")).as("spread"))
      .agg(max("spread")).as[Long].head()
    assert(spread < 32L, s"padding spread $spread escaped the bucket")
  }

  // --- preferencePairs ---------------------------------------------------

  test("preferencePairs: extremes paired, ties dropped, id tiebreak") {
    val docs = Seq(
      // stratum "en": scores 10,7,7,3,1 → pairs (10,1),(7,3),(7,7 dropped)
      (1L, "en", 10L), (2L, "en", 7L), (3L, "en", 7L),
      (4L, "en", 3L), (5L, "en", 1L),
      // stratum "fr": all equal → no pairs survive the margin filter
      (6L, "fr", 5L), (7L, "fr", 5L),
      // stratum "de": singleton → pairs itself, dropped (no margin)
      (8L, "de", 9L))
      .toDF("doc_id", "lang", "score")
    val out = TextAnalysis.preferencePairs(docs, "lang", "doc_id", "score", 3)
      .select("lang", "pair_ix", "chosen_id", "rejected_id")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("en", 1L, 1L, 5L),   // top 10 vs bottom 1
      ("en", 2L, 2L, 4L)))  // 7 (id 2 beats id 3 on tiebreak) vs 3
  }

  test("preferencePairs is partition-layout independent") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars").as("score"))
    def run(parts: Int) =
      TextAnalysis.preferencePairs(docs.repartition(parts),
          "lang", "doc_id", "score", 5)
        .collect().map(_.toSeq).toSet
    assert(run(1) == run(13))
  }

  test("knnOutliers: kSigma-below-mean flags via the exact integer " +
       "moment rule; rank filter; single-vector corpus never flags") {
    import graft.operators.Similarity
    // k=2: kth cos 0.9, 0.9, 0.9, 0.1 -> only the 0.1 is 1 sigma low
    // (rank-1 rows are decoys the rank filter must skip)
    val nbrs = Seq(
      (1L, 11L, 0.99, 1L), (1L, 12L, 0.9, 2L),
      (2L, 11L, 0.99, 1L), (2L, 13L, 0.9, 2L),
      (3L, 11L, 0.99, 1L), (3L, 14L, 0.9, 2L),
      (4L, 11L, 0.15, 1L), (4L, 15L, 0.1, 2L))
      .toDF("query_id", "neighbor_id", "cos", "rank")
    val got = Similarity.knnOutliers(nbrs, k = 2, kSigma = 1)
      .orderBy("vec_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 900000L, false), (2L, 900000L, false),
      (3L, 900000L, false), (4L, 100000L, true)))
    // kSigma=2 tightens: with n=4 the outlier inflates sigma past the
    // deviation, nothing flags (hand-checked: 5.76e12 < 4*1.92e12)
    assert(Similarity.knnOutliers(nbrs, k = 2, kSigma = 2)
      .filter(col("is_outlier")).count() == 0L)
    val single = Seq((1L, 11L, 0.2, 1L))
      .toDF("query_id", "neighbor_id", "cos", "rank")
    assert(Similarity.knnOutliers(single, k = 1, kSigma = 1)
      .filter(col("is_outlier")).count() == 0L)
  }

  test("knnOutliers composes over annIvf (the 100 TB path): full-probe " +
       "IVF graph flags the isolated vectors identically to the exact " +
       "graph") {
    import graft.operators.Similarity
    // 40 near-identical cluster vectors + 3 isolated near-orthogonal
    // ones: each isolated vector's 3rd neighbor is far, the cluster's
    // is ~1.0
    val rnd = new scala.util.Random(7)
    val cluster = (0 until 40).map { i =>
      val base = Array.fill(8)(0f); base(0) = 1f
      base(1 + i % 4) = 0.02f * (i % 5)
      (i.toLong, base)
    }
    val isolated = Seq(
      (100L, Array(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)),
      (101L, Array(0f, 0f, 0f, 0f, 0f, 1f, 0.1f, 0f)),
      (102L, Array(0f, 0f, 0f, 0f, 0f, 0f, 0f, 1f)))
    val e = (cluster ++ isolated).toDF("vec_id", "embedding")
    def flags(nbrs: org.apache.spark.sql.DataFrame) =
      Similarity.knnOutliers(nbrs, k = 3, kSigma = 1)
        .filter(col("is_outlier")).select("vec_id")
        .as[Long].collect().toSet
    val exact = flags(
      Similarity.annBruteForceBlocked(e, e, "vec_id", "embedding", k = 3))
    // nprobe = nlist probes every cell: IVF plumbing, exact recall
    val ann = flags(
      Similarity.annIvf(e, e, "vec_id", "embedding", k = 3,
        nlist = 4, nprobe = 4, lloydIters = 2))
    assert(exact == Set(100L, 101L, 102L))
    assert(ann == exact)
  }
}
