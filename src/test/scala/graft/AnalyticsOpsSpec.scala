package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Similarity, TextAnalysis}

/** Specs for the funnel / mutual-kNN / Zipf / split additions —
  * hand-checked cascades and independent driver-side re-derivations.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  // --- funnelSteps -------------------------------------------------------

  test("funnelSteps: cascade mins, ordering constraint, null propagation") {
    val ev = Seq(
      // u1 completes the funnel, with a click BEFORE the first view that
      // must NOT count (ts 5 < first view at 10)
      (1L, "view", 10L), (1L, "click", 5L), (1L, "click", 20L),
      (1L, "purchase", 30L), (1L, "view", 8L), // second view earlier: min view = 8
      // u2 views, clicks, never purchases
      (2L, "view", 100L), (2L, "click", 150L),
      // u3 purchases without ever viewing → excluded (never reached step 1)
      (3L, "purchase", 7L),
      // u4 same-instant view+click (>= admits it), purchase earlier → null
      (4L, "view", 50L), (4L, "click", 50L), (4L, "purchase", 40L))
      .toDF("user_id", "event_type", "ts")
    val out = Relational.funnelSteps(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq(
      // u1: view 8, click ≥8 → 20 (the ts-5 click is before the funnel), purchase 30
      (1L, Some(8L), Some(20L), Some(30L)),
      (2L, Some(100L), Some(150L), None),
      (4L, Some(50L), Some(50L), None)))
  }

  test("funnelSteps: a user failing step 2 cannot attain step 3") {
    val ev = Seq((9L, "view", 1L), (9L, "purchase", 2L))
      .toDF("user_id", "event_type", "ts")
    val out = Relational.funnelSteps(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq((9L, Some(1L), None, None)))
  }

  // --- mutualKnn ---------------------------------------------------------

  test("mutualKnn keeps only reciprocal pairs, once, with both ranks") {
    val nbrs = Seq(
      // 1↔2 mutual; 1→3 one-way (3's list lacks 1); 2↔3 mutual
      (1L, 2L, 0.9, 1L), (1L, 3L, 0.8, 2L),
      (2L, 1L, 0.9, 1L), (2L, 3L, 0.7, 2L),
      (3L, 2L, 0.7, 1L), (3L, 4L, 0.5, 2L),
      (4L, 5L, 0.4, 1L))
      .toDF("query_id", "neighbor_id", "cos", "rank")
    val out = Similarity.mutualKnn(nbrs).orderBy("a", "b")
      .as[(Long, Long, Double, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 0.9, 1L, 1L), (2L, 3L, 0.7, 2L, 1L)))
  }

  test("mutual_knn key: every edge is in both endpoints' exact top-5") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val nbrs = Similarity.annBruteForce(e, e, "vec_id", "embedding", k = 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val edges = SparkEntry.queries("mutual_knn")(spark, sf)
      .as[(Long, Long, Double, Long, Long)].collect().toSeq
    assert(edges.nonEmpty)
    assert(edges.forall { case (a, b, _, _, _) =>
      a < b && nbrs((a, b)) && nbrs((b, a)) })
  }

  test("matryoshkaRecall: full width recalls 1000; prefix-separable " +
       "clusters recall 1000 at the separating width") {
    // 2D prefix separates the two clusters; dims beyond carry noise
    // that never flips the top-1 (margins are wide)
    val vecs = Seq(
      (1L, Array(10f, 0f, 0.1f, 0.2f)), (2L, Array(9f, 1f, -0.2f, 0.1f)),
      (3L, Array(0f, 10f, 0.3f, -0.1f)), (4L, Array(1f, 9f, 0.1f, 0.3f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.matryoshkaRecall(vecs, vecs, "vec_id", "embedding",
        k = 1, dims = Seq(2, 4))
      .orderBy("dims").as[(Int, Long, Long, Long)].collect().toSeq
    // top-1 of each: its cluster partner, at every width ≥ 2
    assert(out == Seq((2, 4L, 4L, 1000L), (4, 4L, 4L, 1000L)))
  }

  test("matryoshkaRecall: a hostile prefix can lose neighbors (recall < 1000)") {
    // first dim is ANTI-correlated with the true neighborhood
    val vecs = Seq(
      (1L, Array(1f, 10f, 10f)), (2L, Array(-1f, 10f, 10f)),
      (3L, Array(1f, -10f, -10f)), (4L, Array(-1f, -10f, -10f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.matryoshkaRecall(vecs, vecs, "vec_id", "embedding",
        k = 1, dims = Seq(1, 3))
      .orderBy("dims").as[(Int, Long, Long, Long)].collect().toSeq
    // at width 1, vec 1's nearest is 3 (same sign) not its true
    // partner 2 → every query misses; full width restores 1000
    assert(out.head._1 == 1 && out.head._4 == 0L)
    assert(out.last == ((3, 4L, 4L, 1000L)))
  }

  // --- zipfFit -----------------------------------------------------------

  test("zipfFit matches an independent driver-side regression") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = TextAnalysis.zipfFit(docs, "lang", "text")
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

    // independent re-derivation: tokenize/count/rank in plain Scala
    val texts = docs.select($"lang", $"text").as[(String, String)].collect()
    val counts = texts.groupBy(_._1).map { case (lang, ds) =>
      val words = ds.flatMap(_._2.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      lang -> words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    for ((lang, wc) <- counts) {
      val ranked = wc.toSeq.sortBy { case (w, n) => (-n, w) }.zipWithIndex
      val q = ranked.map { case ((_, n), i) =>
        (math.round(1000.0 * math.log(i + 1.0)), math.round(1000.0 * math.log(n.toDouble))) }
      val m = q.size.toLong
      val sx = q.map(_._1).sum; val sy = q.map(_._2).sum
      val sxx = q.map(p => p._1 * p._1).sum
      val sxy = q.map(p => p._1 * p._2).sum
      val num = (m * sxy - sx * sy).toDouble
      val den = (m * sxx - sx * sx).toDouble
      val slope = num / den
      val (_, vocab, total, gotSlope, gotIcept, gotR2) = out(lang)
      assert(vocab == m && total == wc.values.sum)
      assert(math.abs(gotSlope - slope) < 1e-6, s"$lang slope $gotSlope vs $slope")
      // structural bounds (synthetic corpora can be near-uniform → low r2,
      // but a frequency curve always slopes down and r² ∈ [0,1])
      assert(gotSlope < 0 && gotR2 >= 0 && gotR2 <= 1,
        s"$lang slope=$gotSlope r2=$gotR2")
      assert(math.abs(gotIcept - (sy.toDouble - slope * sx) / m / 1000.0) < 1e-6)
    }
  }

  // --- datasetSplit ------------------------------------------------------

  test("datasetSplit: content-keyed assignment, dup co-assignment, leak audit") {
    val docs = Seq(
      (1L, "Alpha Beta Gamma"), (2L, "Alpha Beta Gamma"), // exact dups
      (3L, "alpha  beta GAMMA"), // same normalized form, different bytes
      (4L, "something else entirely"), (5L, "yet another document"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.datasetSplit(docs, "doc_id", "text",
        valPermille = 300, testPermille = 300) // big buckets so strata differ
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // independent fp re-derivation (codepoint polynomial hash)
    def fp(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    def splitOf(s: String): String = {
      val b = fp(s) % 1000
      if (b < 400) "train" else if (b < 700) "val" else "test"
    }
    def norm(s: String): String = s.trim.replaceAll("\\s+", " ").toLowerCase
    assert(out.size == 5)
    for ((id, text) <- Seq(1L -> "Alpha Beta Gamma", 2L -> "Alpha Beta Gamma",
                           3L -> "alpha  beta GAMMA", 4L -> "something else entirely",
                           5L -> "yet another document")) {
      assert(out(id)._1 == splitOf(text), s"doc $id split")
    }
    // exact dups 1,2 always co-assigned (split is a function of text)
    assert(out(1L) == out(2L))
    // leak flag = normalized group spans >1 split (data-dependent, derived)
    val expectLeak12 = splitOf("Alpha Beta Gamma") != splitOf("alpha  beta GAMMA")
    assert(norm("Alpha Beta Gamma") == norm("alpha  beta GAMMA"))
    assert(out(1L)._2 == expectLeak12 && out(3L)._2 == expectLeak12)
    assert(!out(4L)._2 && !out(5L)._2)
  }

  test("dataset_split key: splits exhaustive and ~98/1/1 at sf0.001") {
    val out = SparkEntry.queries("dataset_split")(spark, sf)
    val n = out.count()
    val bysplit = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bysplit.values.sum == n)
    assert(bysplit("train") > n * 9 / 10, bysplit.toString)
  }
}
