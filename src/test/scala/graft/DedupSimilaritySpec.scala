package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, LangId, Similarity, TextAnalysis}

/** Planted-duplicate recovery specs for the hash-seeded operators that
  * have no SQL oracle (SURVEY.md §2 E-group).
  */
class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("minhash LSH recovers planted near- and exact duplicates") {
    val out = SparkEntry.queries("dedup_minhash")(spark, sf)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ids = docs.select("doc_id").as[Long].collect().toSet
    val planted =
      ids.filter(_ % 7 == 0).map(i => (i, i + 1000000L)) ++
      ids.filter(_ % 11 == 0).map(i => (i, i + 2000000L)) ++
      ids.filter(i => i % 7 == 0 && i % 11 == 0).map(i => (i + 1000000L, i + 2000000L))
    // the base corpus contains some genuine near-dups (verified against
    // the exhaustive DuckDB pair scan) — require recall of the planted
    // set, not exact equality
    assert(planted.subsetOf(out),
      s"missed planted pairs: ${planted -- out}")
  }

  test("dedup clusters: planted stars collapse to the original doc id") {
    val out = SparkEntry.queries("dedup_clusters")(spark, sf)
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").as[Long].collect().toSet
    // every planted copy resolves to its base doc (or lower, if the
    // base itself is a genuine near-dup of an earlier doc)
    ids.filter(_ % 7 == 0).foreach(i => assert(out(i + 1000000L) <= i))
    ids.filter(_ % 11 == 0).foreach(i => assert(out(i + 2000000L) <= i))
    // a doc with no planted or genuine dup is absent (singleton) or
    // labeled by itself
    assert(out.forall { case (id, keep) => keep <= id })
  }

  test("connectedComponents converges on long chains (pointer jumping)") {
    // a 60-node path graph: diameter 59, must converge in O(log n)
    val pairs = (0L until 59L).map(i => (i, i + 1)).toDF("left_id", "right_id")
    val out = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out.size == 60)
    assert(out.values.forall(_ == 0L), s"unconverged labels: ${out.filter(_._2 != 0L)}")
  }

  test("simhash finds planted exact copies at hamming 0") {
    val out = SparkEntry.queries("dedup_simhash")(spark, sf)
    val exact = out.filter($"hamming" === 0)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ids = docs.select("doc_id").as[Long].collect().toSet
    val planted = ids.filter(_ % 11 == 0).map(i => (i, i + 2000000L))
    assert(planted.subsetOf(exact))
    // everything reported respects the hamming budget
    assert(out.filter($"hamming" > 3).count() == 0)
  }

  test("embedding near-dup finds exactly the planted perturbed pairs") {
    val out = SparkEntry.queries("embedding_neardup")(spark, sf)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    val ids = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id").as[Long].collect().toSet
    val expected = ids.filter(_ % 10 == 0).map(i => (i, i + 1000000L))
    assert(out == expected)
  }

  test("ann_lsh returns the planted twin as the top neighbor for every query") {
    val out = SparkEntry.queries("ann_lsh")(spark, sf)
      .filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val ids = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id").as[Long].collect().toSet
    val queries = ids.filter(_ % 10 == 0)
    assert(out.keySet == queries)
    assert(queries.forall(q => out(q) == q + 1000000L))
  }

  test("ann_bruteforce: k neighbors per query, correctly ranked") {
    val out = SparkEntry.queries("ann_bruteforce")(spark, sf)
    val byQuery = out.select("query_id", "rank", "cos")
      .as[(Long, Long, Double)].collect().groupBy(_._1)
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rows.length))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-(_: Double)).toSeq)
    }
  }

  // sf0.001 has 500 docs of ~25 tokens — the per-lang multinomial gap is
  // small, so naive Bayes tops out near 0.44 here; chance is 0.2.
  test("lang_id recovers the word-distribution signal (accuracy > 0.35)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pred = LangId.selfLabelled(docs, "doc_id", "text", "lang")
    val joined = pred.join(docs.select($"doc_id", $"lang"), "doc_id")
    val acc = joined.filter($"lang_pred" === $"lang").count().toDouble /
      joined.count()
    assert(acc > 0.35, s"lang_id accuracy $acc")
  }

  test("fingerprint matches a reference fold implementation") {
    val fp = Seq(("ab", 0L)).toDF("text", "ignore")
      .select(TextAnalysis.fingerprint($"text").as("fp")).as[Long].head()
    // ((0*31 + 97) % p)*31 + 98) % p
    assert(fp == (97L * 31 + 98) % 1000000007L)
    val empty = Seq(("", 0L)).toDF("text", "ignore")
      .select(TextAnalysis.fingerprint($"text").as("fp")).as[Long].head()
    assert(empty == 0L)
  }

  test("persisted IVF index reproduces the inline annIvf results") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 10 === 0)
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", dir,
      nlist = 32, lloydIters = 2)
    // index artifacts exist and the centroid matrix is model-sized
    assert(spark.read.parquet(s"$dir/centroids").count() == 32)
    val indexed = Similarity.annIvfIndexed(queries, dir, "vec_id", "embedding",
        k = 3, nprobe = 4)
      .select("query_id", "neighbor_id", "cos", "rank")
      .collect().map(_.toSeq).toSet
    val inline = Similarity.annIvf(emb, queries, "vec_id", "embedding",
        k = 3, nlist = 32, nprobe = 4, lloydIters = 2)
      .select("query_id", "neighbor_id", "cos", "rank")
      .collect().map(_.toSeq).toSet
    assert(indexed == inline,
      s"indexed-vs-inline diff: ${(indexed diff inline) ++ (inline diff indexed)}")
  }

  test("sharedSpanPairs: stride-aligned verbatim window found, short/partial docs emit none") {
    val t = (1 to 20).map(i => s"t$i")
    val a = t.mkString(" ")                       // windows @0 (t1-15), @5 (t6-20)
    val b = ((1 to 5).map(i => s"x$i") ++ t.drop(5)).mkString(" ") // @5 == a@5
    val c = (1 to 20).map(i => s"c$i").mkString(" ")               // unrelated
    val short = t.take(14).mkString(" ")          // < spanTokens: no windows
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, short))
      .toDF("doc_id", "text")
    val out = Dedup.sharedSpanPairs(docs, "doc_id", "text",
        spanTokens = 15, stride = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 1L)), out.toString)
  }

  test("sharedSpanPairs matches a brute-force reference on pseudo-random docs") {
    // deterministic corpus (seeded LCG): 40 docs over a 6-word vocab,
    // lengths 5-40 — 6^4 possible windows vs ~400 emitted forces real
    // cross-doc window collisions
    var seed = 0x5DEECE66DL
    def next(n: Int) = { seed = seed * 6364136223846793005L + 1442695040888963407L
      (math.abs(seed >>> 16) % n).toInt }
    val docs = (1L to 40L).map { id =>
      val len = 5 + next(36)
      id -> (1 to len).map(_ => s"w${next(6)}").mkString(" ")
    }
    val (span, stride) = (4, 2)
    // brute force: per doc, the set of full stride-aligned windows
    def windows(t: String): Set[String] = {
      val w = t.trim.split("\\s+").filter(_.nonEmpty)
      if (w.length < span) Set.empty
      else (0 to (w.length - span) / stride)
        .map(i => w.slice(i * stride, i * stride + span).mkString(" ")).toSet
    }
    val expected = (for {
      (la, ta) <- docs; (lb, tb) <- docs if la < lb
      shared = (windows(ta) intersect windows(tb)).size if shared > 0
    } yield (la, lb, shared.toLong)).toSet
    val got = Dedup.sharedSpanPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text", span, stride)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected,
      s"diff: ${(got diff expected) ++ (expected diff got)}")
    assert(expected.nonEmpty, "fixture produced no shared windows — weaken vocab")
  }

  test("semanticDedup: a 3-member near-identical family collapses to one canonical") {
    val base = Array.tabulate(64)(i => math.sin(i + 1.0).toFloat)
    def pert(seed: Int) = base.zipWithIndex.map { case (x, i) =>
      x + ((seed * 31 + i) % 7) * 1e-4f }
    val vecs = Seq(
      (10L, base), (11L, pert(1)), (12L, pert(2)),
      (99L, base.map(x => -x))) // anti-parallel: cosine -1, never a dup
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding",
        dim = 64, threshold = 0.999)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 10L, 11L -> 10L, 12L -> 10L), out.toString)
  }

  test("recallAtK: hand-computed overlaps, absent queries count as zero") {
    // q1: exact {1,2,3}, approx {1,3,9}   → 2/3
    // q2: exact {4,5},   approx {5,4}     → 1.0 (order-free)
    // q3: exact {7},     approx absent    → 0.0 (must not inflate)
    val exact = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (3L, 7L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 1L), (1L, 3L), (1L, 9L), (2L, 5L), (2L, 4L))
      .toDF("query_id", "neighbor_id")
    val r = Similarity.recallAtK(approx, exact)
    assert(math.abs(r - (2.0 / 3 + 1.0 + 0.0) / 3) < 1e-12, s"recall $r")
  }

  test("ANN recall@10 against brute-force ground truth on the sf corpus") {
    // realistic-distribution recall (the planted-twin keys only prove
    // exact-copy recovery): 50 corpus vectors as queries, exact top-10
    // as ground truth, the two approximate paths + the persisted index
    // measured against it. Floors are measured values minus margin —
    // numbers recorded in SURVEY §5.
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.annBruteForce(emb, queries, "vec_id", "embedding",
      k = 10).cache()
    assert(exact.select("query_id").distinct().count() == 50)

    // this corpus is NEAR-UNIFORM random vectors — the ANN worst case
    // (no cluster structure, so recall tracks the scanned fraction;
    // measured sweep in graft.Debug / SURVEY §5: IVF nprobe 4/8/16/32
    // of nlist=32 → 0.47/0.64/0.84/1.00). Every path is deterministic
    // (fixed hyperplane seed, deterministic Lloyd), so floors sit just
    // under the measured values, not wide noise margins.
    def ivfAt(nprobe: Int) = Similarity.recallAtK(
      Similarity.annIvf(emb, queries, "vec_id", "embedding",
        k = 10, nlist = 32, nprobe = nprobe, lloydIters = 2), exact)
    val r8 = ivfAt(8); val r16 = ivfAt(16); val r32 = ivfAt(32)
    info(f"ivf recall@10: nprobe8=$r8%.4f nprobe16=$r16%.4f nprobe32=$r32%.4f")
    assert(r8 >= 0.60, s"ivf nprobe=8 recall@10 $r8 (measured 0.636)")
    assert(r16 >= 0.80, s"ivf nprobe=16 recall@10 $r16 (measured 0.838)")
    assert(r32 >= 0.999, s"ivf nprobe=nlist must be exhaustive-exact, got $r32")
    assert(r8 < r16 && r16 < r32, "recall must grow with nprobe")

    // LSH at the wide-bucket setting (16 tables × 4 bits): ~0.896
    val rLsh = Similarity.recallAtK(
      Similarity.annLsh(emb, queries, "vec_id", "embedding",
        dim = 64, k = 10, tables = 16, bits = 4), exact)
    info(f"lsh(16×4) recall@10: $rLsh%.4f")
    assert(rLsh >= 0.85, s"ann_lsh(16,4) recall@10 $rLsh (measured 0.896)")

    // PQ ADC + exact re-rank: recall tracks code budget × rerank
    // budget (graft.Debug sweep: m8/k16/r64=0.75, m16/k16/r64=0.89,
    // m16/k64/r64=0.996, m16/k16/r128=0.978)
    val rPq = Similarity.recallAtK(
      Similarity.annPq(emb, queries, "vec_id", "embedding",
        k = 10, m = 16, ksub = 16, lloydIters = 2, rerank = 64), exact)
    info(f"pq(16x16, rerank=64) recall@10: $rPq%.4f")
    assert(rPq >= 0.85, s"ann_pq recall@10 $rPq (measured 0.892)")
    val rPq64 = Similarity.recallAtK(
      Similarity.annPq(emb, queries, "vec_id", "embedding",
        k = 10, m = 16, ksub = 64, lloydIters = 2, rerank = 64), exact)
    info(f"pq(16x64, rerank=64) recall@10: $rPq64%.4f")
    assert(rPq64 >= 0.95, s"ann_pq(16x64) recall@10 $rPq64 (measured 0.996)")

    // IVF-PQ persisted index: probe bounds recall like IVF (the cell
    // pruning dominates on this uniform corpus); ADC stage must not
    // lose what the probe kept when rerank covers the probed fraction
    val pqDir = java.nio.file.Files.createTempDirectory("ivfpq_recall").toString
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", pqDir,
      nlist = 32, m = 16, ksub = 64, lloydIters = 2)
    val rIvfPq = Similarity.recallAtK(
      Similarity.annIvfPq(queries, pqDir, "vec_id", "embedding",
        k = 10, nprobe = 16, rerank = 128), exact)
    info(f"ivfpq(nprobe=16, 16x64, rerank=128) recall@10: $rIvfPq%.4f")
    assert(rIvfPq >= 0.80, s"ann_ivfpq recall@10 $rIvfPq")

    // persisted index reproduces inline IVF recall bit-for-bit
    val dir = java.nio.file.Files.createTempDirectory("ivf_recall").toString
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", dir,
      nlist = 32, lloydIters = 2)
    val rIdx = Similarity.recallAtK(
      Similarity.annIvfIndexed(queries, dir, "vec_id", "embedding",
        k = 10, nprobe = 16), exact)
    assert(rIdx == r16, s"indexed recall $rIdx != inline $r16")
    exact.unpersist()
  }

  test("mutual-kNN composed over ANN: executable scale path, pinned edge recall") {
    // the 100 TB composition (mutualKnn over annIvf instead of the
    // exact blocked scan), measured as EDGE recall against the exact
    // mutual graph — an edge needs BOTH directions to survive the
    // cell probe, so this sits below the one-direction recall@k.
    // Deterministic (fixed seeds, Lloyd-trained quantizer): the floor
    // sits just under the measured value; number recorded in SURVEY §5.
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = Similarity.mutualKnn(
        Similarity.annBruteForceBlocked(emb, emb, "vec_id", "embedding", k = 5))
      .select(col("a").as("query_id"), col("b").as("neighbor_id")).cache()
    assert(exact.count() > 0)
    def edgeRecall(nprobe: Int): Double = Similarity.recallAtK(
      Similarity.mutualKnn(
          Similarity.annIvf(emb, emb, "vec_id", "embedding",
            k = 5, nlist = 32, nprobe = nprobe, lloydIters = 2))
        .select(col("a").as("query_id"), col("b").as("neighbor_id")),
      exact)
    val r8 = edgeRecall(8)
    val r16 = edgeRecall(16)
    info(f"mutual-kNN(annIvf) edge recall vs exact graph: nprobe8=$r8%.4f nprobe16=$r16%.4f")
    // measured 0.431 / 0.752 — almost exactly the SQUARE of the
    // one-direction recall@k (0.636 / 0.838 above): an edge survives
    // iff both endpoints' probes keep it, and probe misses are
    // near-independent on this uniform corpus
    assert(r8 >= 0.42, s"mutual-kNN edge recall at nprobe=8: $r8 (measured 0.431)")
    assert(r16 >= 0.72, s"mutual-kNN edge recall at nprobe=16: $r16 (measured 0.752)")
    assert(r8 <= r16, "edge recall must not shrink with a wider probe")
    exact.unpersist()
  }

  test("semanticDecontaminate: flags exactly the near-copied train docs, " +
       "eval broadcast, corpus never shuffles before the heap agg") {
    import graft.operators.Similarity
    val train = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.6f, 0.8f, 0.0f))).toDF("vec_id", "embedding")
    val eval = Seq(
      (100L, Seq(0.01f, 0.999f, 0.0f)), // near-copy of train 2
      (101L, Seq(0.0f, 0.0f, 1.0f)))    // orthogonal to everything
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(
        train, eval, "vec_id", "embedding", 0.99)
      .select("train_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 100L)))
    // raising the bar past the best match (cos(2,100) ≈ 0.99995) flags
    // nothing
    assert(Similarity.semanticDecontaminate(
      train, eval, "vec_id", "embedding", 0.99999).count() == 0L)
    // empty eval set: nothing flagged, no crash
    assert(Similarity.semanticDecontaminate(
      train, eval.limit(0), "vec_id", "embedding", 0.5).count() == 0L)
    // plan: eval rides a broadcast; no shuffle below the top-1 heap agg
    val plan = Similarity.semanticDecontaminate(
        train, eval, "vec_id", "embedding", 0.99)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
           plan.contains("BroadcastExchange"), plan)
    // the planted sf corpus end-to-end: flagged = every 10th vec
    val sfOut = SparkEntry.queries("semantic_decontaminate")(spark, sf)
      .as[(Long, Long)].collect().toSet
    val want = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id").as[Long].collect().filter(_ % 10 == 0)
      .map(i => (i, i + 1000000L)).toSet
    assert(sfOut == want)
  }

  test("embedding_clusters: every vector assigned, non-trivial spread, " +
       "bit-identical under partition-layout change") {
    val out = SparkEntry.queries("embedding_clusters")(spark, sf)
    val rows = out.as[(Long, Long)].collect().sortBy(_._1)
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length.toLong == nVecs)
    assert(rows.forall { case (_, c) => c >= 0L && c < 16L })
    assert(rows.map(_._2).distinct.length > 4, "degenerate clustering")
    // deterministic fit + assignment: a different partition layout
    // yields the identical assignment table
    val t = graft.sources.Tables(spark, sf)
    val e3 = t.embeddings.select(col("vec_id"), col("embedding")).repartition(3)
    val cent3 = graft.operators.Similarity.trainCentroidsLloyd(
      e3, "vec_id", "embedding", nlist = 16, iters = 3)
    val rows3 = e3.select(col("vec_id"),
        element_at(graft.functions.NearestCells(col("embedding"), cent3, 1), 1)
          .cast("long").as("cell"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(rows3.toSeq == rows.toSeq)
  }

  test("pack_sequences: offsets tile each shard's token stream exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = TextAnalysis.packSequences(docs, "doc_id",
      pmod(col("doc_id"), lit(4)), size(split(trim(col("text")), "\\s+")),
      contextLen = 256)
    val rows = out.orderBy("shard", "doc_id")
      .select("shard", "n_tokens", "seq_id", "seq_offset", "crosses_cut")
      .collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, shard) =>
      var cum = 0L
      shard.foreach { r =>
        assert(r.getLong(2) == cum / 256, "seq_id is the cut containing cum")
        assert(r.getLong(3) == cum % 256, "offset is cum within the cut")
        assert(r.getBoolean(4) == (cum % 256 + r.getLong(1) > 256))
        cum += r.getLong(1)
      }
    }
  }

  test("trim punctuation expression matches reference fixpoint semantics") {
    import graft.marc.TrimPunctuation
    val cases = Seq(
      "Title of work ;"   -> "Title of work",
      "Title, ,;:"        -> "Title",
      "[Some place]"      -> "Some place",
      "by Author."        -> "by Author",
      "A.B."              -> "A.B.",   // <3 word chars before '.' kept
      "."                 -> "",
      "plain"             -> "plain")
    cases.foreach { case (in, want) =>
      assert(TrimPunctuation.trim(in) == want, s"input '$in'")
    }
  }

  test("jaccardPairsExact: lossless prefix filter finds exactly the " +
       "above-threshold pairs; pairSetEval arithmetic") {
    import graft.operators.Dedup
    // doc1/doc2: 4-word overlap of 5 distinct words each ->
    // word-jaccard = 4/6 = 0.667 < 0.7; doc1/doc3 identical -> 1.0;
    // doc4 disjoint
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d f"), (3L, "a b c d e"),
      (4L, "x y z w q")).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairsExact(docs, "doc_id", "text",
        shingleN = 1, threshold = 0.7)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L)))
    // lower threshold admits the 2/3-overlap pairs
    val loose = Dedup.jaccardPairsExact(docs, "doc_id", "text", 1, 0.6)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(loose == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // eval: predicted has 1 hit, 1 miss-pair, truth has 2
    val pred = Seq((3L, 1L), (9L, 8L)).toDF("left_id", "right_id")
    val truth = Seq((1L, 3L), (5L, 6L)).toDF("left_id", "right_id")
    val ev = Dedup.pairSetEval(pred, truth)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(ev == ((2L, 2L, 1L, 500L, 500L)))
    // empty prediction: precision 0, no division error
    val e0 = Dedup.pairSetEval(pred.filter(col("left_id") < 0), truth)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(e0 == ((0L, 2L, 0L, 0L, 0L)))
  }
}
