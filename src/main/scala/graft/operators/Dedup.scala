package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for large-scale training-data pipelines:
  * MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Scale design: signatures are pure per-row Column expressions
  * (built-in HOFs — stays in whole-stage codegen, embarrassingly
  * parallel). The ONLY shuffle is the band-bucket self-join; pair
  * verification happens inside buckets, never via cross join. At 100 TB
  * the band hash is high-cardinality, so buckets stay small and AQE
  * handles stragglers.
  */
object Dedup {

  /** shiftright/shiftleft with a Column shift amount (the `functions._`
    * overloads only take Int).
    */
  private[operators] def shr(c: Column, n: Column): Column =
    call_function("shiftright", c, n)
  private[operators] def shl(c: Column, n: Column): Column =
    call_function("shiftleft", c, n)

  /** Distinct word n-gram shingles of the whitespace-normalized text
    * (native one-pass expression — the HOF slice/concat_ws composition
    * is interpreted and re-inlined per reference by CollapseProject).
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.ShinglesExpr(split(TextAnalysis.normalizeText(text), " "), n)

  /** MinHash/LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Plan shape: map-side signature → posexplode to (band, bucket) →
    * self-join on the bucket key (the one shuffle) → distinct candidate
    * pairs → join texts back → shingle-set Jaccard filter.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, k: Int = 64, bands: Int = 16,
                   threshold: Double = 0.7): DataFrame = {
    // fan the signature compute out across the machine BEFORE the
    // per-row MinHash work (Par.fanOut is a no-op once the scan itself
    // is parallel) — only (id, text) rides the rebalance exchange
    // r12 (guide §5): withSig feeds FOUR sites — both aliases of the
    // bucket self-join and both verify join-backs. As lazy lineage the
    // shingle pass ran 4× and the MinHash signatures 2× per call; the
    // eager checkpoint computes each once (blocks are reclaimed with
    // the RDD, so no cache-entry leak from a lazily-returned frame)
    val withSig = Par.fanOut(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("text")),
        col("doc_id"))
      .select(col("doc_id"),
              shingles(col("text"), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("bands",
        graft.functions.MinHashBandsExpr(col("sh"), k, bands))
      .localCheckpoint(true)

    val buckets = withSig.select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band_ix", "band_hash")))
    val a = buckets.alias("a")
    val b = buckets.alias("b")
    val candidates = a.join(b,
        col("a.band_ix") === col("b.band_ix") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("left_id"), col("b.doc_id").as("right_id"))
      .distinct()

    val sh = withSig.select(col("doc_id"), col("sh"))
    candidates
      .join(sh.select(col("doc_id").as("left_id"), col("sh").as("sh_l")), "left_id")
      .join(sh.select(col("doc_id").as("right_id"), col("sh").as("sh_r")), "right_id")
      .select(col("left_id"), col("right_id"),
        round(size(array_intersect(col("sh_l"), col("sh_r"))).cast("double") /
              size(array_union(col("sh_l"), col("sh_r"))), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("left_id"), col("right_id"), col("jaccard"))
  }

  /** Asymmetric CONTAINMENT pairs — `|A∩B| / |A| ≥ t` over distinct
    * shingle sets: the quote/excerpt/subset complement to
    * [[minhashPairs]]' symmetric Jaccard (a short document quoted
    * inside a long one has containment ≈ 1 but Jaccard ≈ |A|/|B| —
    * banded MinHash recalls Jaccard-similar pairs and MISSES these, so
    * containment needs its own join, not a threshold change).
    *
    * Exact prefix-filtered join (the AllPairs/PPJoin device the
    * minhash oracle already trusts): with shingles in a canonical
    * order, A can only be t-contained in B if one of A's first
    * `|A| − ⌈t·|A|⌉ + 1` shingles appears in B (pigeonhole) — so only
    * that prefix of the PROBE side explodes against the full shingle
    * index, and survivors verify with the exact intersection. Lossless
    * (100% recall), no hash randomness, SQL-re-derivable bit for bit.
    *
    * Scale shape: one shingle-keyed shuffle (prefix × index join),
    * map-side distinct on candidates, verification joins the two
    * shingle arrays back by doc id. The canonical prefix order is
    * ASCENDING DOCUMENT FREQUENCY (ties lexicographic — still fully
    * deterministic): prefixes hold each document's RAREST shingles,
    * so the index join never buckets on stop-shingles — on a
    * low-diversity corpus (think boilerplate-heavy web text; the
    * 31-word bench vocabulary is the stress case) lexicographic
    * prefixes load common shingles and candidates blow up toward n².
    * ANY canonical order is lossless (the pigeonhole argument never
    * names an order and the verify is exact), so the OUTPUT is
    * identical either way (spec-asserted) — only the candidate count
    * changes; `dfOrderedPrefix = false` restores the df-free
    * two-shuffle plan for selective corpora. Honest measurement (sf1
    * rehearsal, SURVEY §5): 48.1 → 46.3s only — the 10×-replicated
    * rehearsal corpus gives every document 9 near-identical siblings,
    * so candidates there are dominated by TRUE pairs, which no
    * lossless filter can prune; the ordering pays on corpora where
    * stop-shingle collisions, not genuine containment, drive the
    * candidate count.
    *
    * Sequencing contract at corpus scale (r7 sf10 finding): with
    * duplication FAMILIES of size k, true pairs are Θ(Σ k²) and the
    * candidate/verify traffic scales with them — at 100 clones per
    * family the sf10 rehearsal's gram-join shuffle exceeded local
    * disk. That is the corpus's actual pair structure (output-bound),
    * so no lossy df cap is added (clone families share even their
    * RARE prefix grams — a cap would silently drop true pairs).
    * Production sequencing: run near-dup CLUSTERING first
    * ([[minhashPairs]] → [[dedupClusters]], which handled the same
    * density at sf10) and feed containment the family
    * REPRESENTATIVES.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, threshold: Double = 0.8,
                       minShingles: Int = 5,
                       dfOrderedPrefix: Boolean = true): DataFrame = {
    // r12 (guide §5): sh feeds up to four sites (prefix derivation,
    // the shingle index, both verify join-backs) — checkpoint the
    // shingle pass once instead of re-running it per site
    val sh = Par.fanOut(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
        col("doc_id"))
      .select(col("doc_id"),
              array_sort(shingles(col("__text"), shingleN)).as("sh"))
      .filter(size(col("sh")) >= minShingles)
      .localCheckpoint(true)
    val plen = greatest(
      size(col("sh")) - ceil(lit(threshold) * size(col("sh"))).cast("int") + 1,
      lit(1))
    val pref =
      if (!dfOrderedPrefix)
        sh.select(col("doc_id").as("inner_id"),
          explode(slice(col("sh"), lit(1), plen)).as("g"))
      else {
        val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
        val dfreq = ex.groupBy("g").agg(count(lit(1)).as("__df"))
        val ranked = ex.join(dfreq, "g")
          .groupBy("doc_id")
          .agg(array_sort(collect_list(struct(col("__df"), col("g"))))
            .as("rs"))
        val plenR = greatest(
          size(col("rs")) - ceil(lit(threshold) * size(col("rs")))
            .cast("int") + 1,
          lit(1))
        ranked.select(col("doc_id").as("inner_id"),
          explode(transform(slice(col("rs"), lit(1), plenR),
            s => s.getField("g"))).as("g"))
      }
    val index = sh.select(col("doc_id").as("outer_id"),
      explode(col("sh")).as("g"))
    val cand = pref.join(index, "g")
      .filter(col("inner_id") =!= col("outer_id"))
      .select(col("inner_id"), col("outer_id")).distinct()
    // r12 (r11 verdict item 5): the exact-intersection verify is the
    // compute-dense stage, and AQE's byte heuristic coalesced its
    // post-distinct input to ONE task (6.6 s single-task stage at
    // bench SF — bytes are small, the set intersections are not).
    // Par.fanOut pins each verify join at an explicit-N keyed
    // small-byte; at scale the pinned exchange simply replaces the
    // join's own EnsureRequirements shuffle (see Par.pin).
    val v1 = Par.pin(cand, col("inner_id"))
      .join(sh.select(col("doc_id").as("inner_id"), col("sh").as("sh_i")), "inner_id")
    Par.pin(v1, col("outer_id"))
      .join(sh.select(col("doc_id").as("outer_id"), col("sh").as("sh_o")), "outer_id")
      .select(col("inner_id"), col("outer_id"),
        round(size(array_intersect(col("sh_i"), col("sh_o"))).cast("double") /
              size(col("sh_i")), 6).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** EXACT Jaccard pairs via the lossless prefix filter (E73's truth
    * half, and the deterministic exact counterpart of
    * [[minhashPairs]]): every pair with shingle-set Jaccard ≥
    * `threshold`, no hashing anywhere. A pair at Jaccard ≥ t must
    * share a gram within the first `len − ⌈t·len⌉ + 1` SORTED grams
    * of each side, so the candidate join runs prefix-against-prefix
    * — the same device the dedup_minhash oracle uses, here as a
    * first-class Spark operator. One gram-keyed join over the
    * prefix frames, distinct pairs, exact verify.
    */
  def jaccardPairsExact(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold in (0,1], got $threshold")
    // r12 (guide §5): sh feeds the prefix derivation and both verify
    // join-backs — checkpoint the shingle pass once (see
    // [[containmentPairs]])
    val sh = Par.fanOut(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
        col("doc_id"))
      .select(col("doc_id"),
              array_sort(shingles(col("__text"), shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint(true)
    // prefixes in DOCUMENT-FREQUENCY-ascending order (the
    // containmentPairs lesson, measured again here: the lexicographic
    // prefix puts stop-words in every prefix and the candidate join
    // explodes — 88s → 2.3s at sf0.1 for the word-gram predictor):
    // any canonical order shared by both sides keeps the filter
    // lossless, so put the RAREST grams in the prefix; (df, gram) is
    // a deterministic total order both engines reproduce
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    val dfreq = ex.groupBy("g").agg(count(lit(1)).as("__df"))
    val ranked = ex.join(dfreq, "g")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("__df"), col("g"))))
        .as("rs"))
    val plen = greatest(
      size(col("rs")) - ceil(lit(threshold) * size(col("rs"))).cast("int") + 1,
      lit(1))
    val pref = ranked.select(col("doc_id"),
      explode(transform(slice(col("rs"), lit(1), plen),
        s => s.getField("g"))).as("g"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("left_id"), col("b.doc_id").as("right_id"))
      .distinct()
    // r12: pin the exact-verify joins above AQE's byte-based coalesce
    // (the containmentPairs verify fix — same compute-dense stage)
    val v1 = Par.pin(cand, col("left_id"))
      .join(sh.select(col("doc_id").as("left_id"), col("sh").as("sh_l")),
        "left_id")
    Par.pin(v1, col("right_id"))
      .join(sh.select(col("doc_id").as("right_id"), col("sh").as("sh_r")),
        "right_id")
      .select(col("left_id"), col("right_id"),
        round(size(array_intersect(col("sh_l"), col("sh_r"))).cast("double") /
          size(array_union(col("sh_l"), col("sh_r"))), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Pair-set evaluation (E73) — precision/recall of a predicted
    * pair set against a truth pair set in integer permille, the
    * dedup family's analogue of the retrieval family's
    * `rankMetrics`: does the CHEAP signal (word-set Jaccard, a
    * sketch, an ANN bucket) find the pairs the REAL metric defines?
    * Pairs canonicalize to (min, max) and dedupe before counting, so
    * orientation and duplicates cannot inflate either side. Three
    * counts + two truncating ratios; empty prediction sets read
    * precision 0, not a division error.
    */
  def pairSetEval(predicted: DataFrame, truth: DataFrame): DataFrame = {
    def canon(df: DataFrame) = df.select(
        least(col("left_id"), col("right_id")).as("a"),
        greatest(col("left_id"), col("right_id")).as("b"))
      .distinct()
    val p = canon(predicted); val t = canon(truth)
    val hits = p.join(t, Seq("a", "b"), "left_semi")
    p.agg(count(lit(1)).as("n_pred"))
      .crossJoin(t.agg(count(lit(1)).as("n_truth")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .withColumn("precision_permille",
        expr("CASE WHEN n_pred > 0 THEN n_hit * 1000L div n_pred " +
             "ELSE 0L END"))
      .withColumn("recall_permille",
        expr("CASE WHEN n_truth > 0 THEN n_hit * 1000L div n_truth " +
             "ELSE 0L END"))
  }

  /** 64-bit SimHash over the token multiset: per-bit vote of each
    * token's xxh64, sign → bit. Native one-pass expression
    * ([[graft.functions.SimHash64Expr]]).
    */
  def simhash64(text: Column): Column =
    graft.functions.SimHash64Expr(split(TextAnalysis.normalizeText(text), " "))

  /** SimHash candidate pairs within `maxHamming` bit flips.
    *
    * Pigeonhole blocking: split the 64-bit hash into `maxHamming+1`
    * blocks — any pair within the distance budget agrees on ≥1 whole
    * block, so equal-block join finds all of them without a cross join.
    * Final filter is an exact popcount on XOR.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val nBlocks = maxHamming + 1
    val width = 64 / nBlocks
    val sigs = Par.fanOut(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
        col("doc_id"))
      .select(col("doc_id"), simhash64(col("__text")).as("sig"))
    val blocks = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(nBlocks - 1)),
        b => shr(col("sig"), b * width)
               .bitwiseAND((1L << width) - 1))).as(Seq("block_ix", "block_val")))
    val a = blocks.alias("a")
    val b = blocks.alias("b")
    a.join(b,
        col("a.block_ix") === col("b.block_ix") &&
        col("a.block_val") === col("b.block_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("left_id"), col("b.doc_id").as("right_id"),
              bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over near-duplicate pairs: every document
    * gets the MIN doc id of its duplicate cluster as canonical label
    * (keep_id) — the step that turns pairwise dedup output into
    * "keep one per cluster".
    *
    * Iterative min-label propagation with pointer jumping: each round
    * propagates neighbor minima (one hop) and then compresses through
    * the label mapping itself (label := label-of-label), doubling the
    * effective distance per round — O(log n) rounds even for chain
    * graphs, not O(diameter). Driver-coordinated like any Spark
    * iterative algorithm; early-stops when no label moves.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 15): DataFrame = {
    // r12 (guide §2.4, "two operations keyed the same way share one
    // exchange"): the symmetric edge set is laid out BY src once, so
    // every round's propagation join reads the cache co-partitioned
    // instead of re-exchanging the edge list per round (r11 plan:
    // one edge-sized Exchange per round on a cached-but-mislaid frame)
    val edges = pairs.select(col("left_id").as("src"), col("right_id").as("dst"))
      .unionByName(pairs.select(col("right_id").as("src"), col("left_id").as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist()
    // seed checkpointed eagerly: id-partitioned (distinct output), so
    // round 1's joins are exchange-free on the label side too
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // one edge-sized exchange per round (the groupBy hop — inherent
      // to message passing); the edges side of the join is co-located
      // by the persist layout, the labels side by the checkpoint
      val candidate = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min(col("label")).as("nbr_label"))
      // pointer jumping through the PREVIOUS round's mapping (one
      // round stale): r11 jumped through the CURRENT propagated frame,
      // which — being un-materialized lineage — re-executed the whole
      // propagation subtree a second time inside every round's plan.
      // The stale jump reads the checkpoint instead (zero recompute,
      // node-sized exchange), still compresses paths superlinearly,
      // and has the identical fixpoint: least() is monotone toward the
      // component minimum and the convergence test only fires when no
      // label moves, i.e. at the plain hash-min fixpoint.
      val jumped = candidate
        .join(labels.select(col("id").as("nbr_label"),
          col("label").as("__parent")), Seq("nbr_label"), "left")
        .select(col("id"),
          least(col("nbr_label"), coalesce(col("__parent"), col("nbr_label")))
            .as("__nbr2"))
      // localCheckpoint: iterative joins grow the logical plan
      // geometrically — truncate lineage every round (tiny label frame,
      // eager materialization doubles as the convergence action); the
      // join on id leaves the checkpoint id-partitioned for round r+1
      val next = labels.withColumnRenamed("label", "__old")
        .join(jumped, Seq("id"), "left")
        .select(col("id"), col("__old"),
          least(col("__old"), coalesce(col("__nbr2"), col("__old"))).as("label"))
        .localCheckpoint(true)
      val moved =
        if (iter == 0) 1L
        else next.filter(col("label") =!= col("__old")).count()
      labels = next.drop("__old")
      converged = moved == 0
      iter += 1
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("keep_id"))
  }

  /** Near-verbatim shared-span detection — the partial-copy complement
    * to whole-document MinHash: two documents are reported when they
    * share at least one IDENTICAL `spanTokens`-token window (quoted
    * passages, boilerplate, template reuse — cases where the documents
    * differ overall, so their whole-doc Jaccard stays under any
    * threshold, but a long span is copied verbatim). The device behind
    * suffix-array substring dedup, bounded to stride-aligned windows
    * so it stays one relational pass.
    *
    * Windows advance by `stride` tokens; only FULL windows count (a
    * doc shorter than `spanTokens` emits none — partial windows would
    * let short fragments masquerade as long copies). Emits
    * (left_id, right_id, shared_spans).
    *
    * Scale shape: window slicing is a map-side explode; windows hash
    * to 64 bits so only the hash rides the shuffle (one groupBy-sized
    * exchange on the window hash); pair emission is bounded by real
    * collisions inside a hash bucket, never a cross join. Skew note:
    * a boilerplate span shared by k docs emits k(k-1)/2 pairs — that
    * is the answer's size, not an artifact; cap pathological buckets
    * upstream (stopword-like spans) if the corpus has them.
    */
  def sharedSpanPairs(docs: DataFrame, idCol: String, textCol: String,
                      spanTokens: Int = 50, stride: Int = 10): DataFrame = {
    val windows = spanWindows(docs, idCol, textCol, spanTokens, stride)
    val a = windows.alias("a")
    val b = windows.alias("b")
    a.join(b, col("a.__h") === col("b.__h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("left_id"), col("b.doc_id").as("right_id"))
      .agg(count(lit(1)).as("shared_spans"))
  }

  /** Verbatim-span decontamination — the exact-substring sibling of
    * [[TextAnalysis.contamination]] (shingle overlap can score high on
    * scrambled word soup; a shared full `spanTokens`-token WINDOW is
    * near-certain verbatim copying). Corpus windows are stride-aligned
    * (`corpusStride`); benchmark windows default to EVERY offset
    * (`benchStride = 1`) so an aligned corpus window is caught wherever
    * it sits inside a benchmark document — the eval set is model-sized,
    * so its token-count × spanTokens window blowup is cheap, and it
    * broadcasts. Emits (doc_id, benchmark_id, shared_spans) where
    * shared_spans counts DISTINCT shared window contents.
    *
    * Scale shape: corpus windowing is map-side slice/hash; the
    * benchmark side broadcasts; the only shuffle is the pair
    * aggregation, bounded by real matches.
    */
  def spanContamination(corpus: DataFrame, benchmark: DataFrame,
                        idCol: String, textCol: String,
                        spanTokens: Int = 20, corpusStride: Int = 5,
                        benchStride: Int = 1): DataFrame = {
    val c = spanWindows(corpus, idCol, textCol, spanTokens, corpusStride)
    val b = spanWindows(benchmark, idCol, textCol, spanTokens, benchStride)
      .select(col("doc_id").as("benchmark_id"), col("__h"))
    c.join(broadcast(b), "__h")
      .groupBy("doc_id", "benchmark_id")
      .agg(count(lit(1)).as("shared_spans"))
  }

  /** Stride-aligned full-window hashes of each document — the shared
    * building block of [[sharedSpanPairs]], [[spanContamination]] and
    * the span index.
    */
  private def spanWindows(docs: DataFrame, idCol: String, textCol: String,
                          spanTokens: Int, stride: Int): DataFrame = {
    require(spanTokens > 0 && stride > 0,
      s"spanTokens=$spanTokens and stride=$stride must be positive")
    val toks = array_remove(split(trim(col(textCol)), "\\s+"), "")
    val starts = sequence(lit(0),
      floor((size(col("__toks")) - spanTokens).cast("double") / stride).cast("int"))
    // not fanned out (r11 A/B: shared_spans 1.30s -> 2.68s with the
    // rebalance — the slice+hash window pass is cheaper than the added
    // exchange, and dropDuplicates shuffles right after anyway)
    docs
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .filter(size(col("__toks")) >= spanTokens)
      .select(col("doc_id"), col("__toks"), explode(starts).as("__six"))
      .select(col("doc_id"),
        xxhash64(concat_ws(" ",
          slice(col("__toks"), col("__six") * stride + 1, lit(spanTokens))))
          .as("__h"))
      .dropDuplicates("doc_id", "__h")
  }

  /** Persist the corpus's span-hash index for INCREMENTAL partial-copy
    * detection — [[buildDedupIndex]]'s twin for [[sharedSpanPairs]]:
    * history windows are hashed once into `spans` (partitioned by
    * pmod(span_hash, 64)); daily batches then check against the index
    * without re-windowing the history. Same parameters must be used
    * for build, extend and query.
    */
  def buildSpanIndex(docs: DataFrame, idCol: String, textCol: String,
                     indexDir: String, spanTokens: Int = 50,
                     stride: Int = 10): Unit =
    writeSpanIndex(docs, idCol, textCol, indexDir, spanTokens, stride,
      mode = "overwrite")

  /** Append a batch's windows to an existing span index (admit the
    * batch after checking it). Extended ≡ fresh-build (spec-asserted).
    */
  def extendSpanIndex(docs: DataFrame, idCol: String, textCol: String,
                      indexDir: String, spanTokens: Int = 50,
                      stride: Int = 10): Unit =
    writeSpanIndex(docs, idCol, textCol, indexDir, spanTokens, stride,
      mode = "append")

  private def writeSpanIndex(docs: DataFrame, idCol: String, textCol: String,
                             indexDir: String, spanTokens: Int, stride: Int,
                             mode: String): Unit =
    spanWindows(docs, idCol, textCol, spanTokens, stride)
      .withColumnRenamed("__h", "span_hash")
      .withColumn("span_pt", pmod(col("span_hash"), lit(64L)))
      // cluster by the write-partition key (same small-files reasoning
      // as the band index write above)
      .repartition(col("span_pt"))
      .write.mode(mode).partitionBy("span_pt")
      .parquet(s"$indexDir/spans")

  /** Partial-copy detection of a NEW batch against a persisted span
    * index: which incoming documents share a verbatim
    * `spanTokens`-token window with history? Emits
    * (new_id, dup_of, shared_spans). The batch's window hashes
    * BROADCAST against the index scan (same contract and fallback as
    * [[dedupAgainstIndex]]); the history is never re-windowed and
    * never shuffled.
    */
  def spansAgainstIndex(newDocs: DataFrame, indexDir: String, idCol: String,
                        textCol: String, spanTokens: Int = 50,
                        stride: Int = 10,
                        broadcastBatch: Boolean = true): DataFrame = {
    val spark = newDocs.sparkSession
    def hinted(df: DataFrame) = if (broadcastBatch) broadcast(df) else df
    val batch = spanWindows(newDocs, idCol, textCol, spanTokens, stride)
      .select(col("doc_id").as("new_id"), col("__h").as("span_hash"))
      .withColumn("span_pt", pmod(col("span_hash"), lit(64L)))
    spark.read.parquet(s"$indexDir/spans")
      .join(hinted(batch), Seq("span_pt", "span_hash"))
      // replay tolerance: a re-admitted batch must not match itself
      .filter(col("doc_id") =!= col("new_id"))
      // duplicate index rows (replayed extends) must not inflate counts
      .dropDuplicates("new_id", "doc_id", "span_hash")
      .groupBy(col("new_id"), col("doc_id").as("dup_of"))
      .agg(count(lit(1)).as("shared_spans"))
  }

  /** Exact n-gram Jaccard between two text columns (pair verification). */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = shingles(a, n)
    val sb = shingles(b, n)
    round(size(array_intersect(sa, sb)).cast("double") /
          size(array_union(sa, sb)), 6)
  }

  /** Persist the corpus's LSH band index for INCREMENTAL dedup: the
    * expensive map-side work (normalize → shingle → k-seed minhash →
    * band keys) runs once over the history and lands in two tables —
    * `bands` (doc_id, band_ix, band_hash; partitioned by
    * pmod(band_hash, 64) so tiny batches can prune) and `shingles`
    * (doc_id, sh) for pair verification. At 100 TB this is the
    * difference between re-sketching the whole history per ingest
    * batch and a pure index scan.
    */
  def buildDedupIndex(docs: DataFrame, idCol: String, textCol: String,
                      indexDir: String, shingleN: Int = 3, k: Int = 64,
                      bands: Int = 16): Unit =
    writeDedupIndex(docs, idCol, textCol, indexDir, shingleN, k, bands,
      mode = "overwrite")

  /** Admit an ingested batch into an existing index (the second half of
    * the daily cycle: dedup the batch, then index its survivors).
    * Appends the batch's bands/shingles — querying the extended index
    * is result-identical to a fresh build over history ∪ batch
    * (spec-asserted). Caller dedups BEFORE extending; same
    * shingleN/k/bands as the original build are required.
    */
  def extendDedupIndex(docs: DataFrame, idCol: String, textCol: String,
                       indexDir: String, shingleN: Int = 3, k: Int = 64,
                       bands: Int = 16): Unit =
    writeDedupIndex(docs, idCol, textCol, indexDir, shingleN, k, bands,
      mode = "append")

  private def writeDedupIndex(docs: DataFrame, idCol: String, textCol: String,
                              indexDir: String, shingleN: Int, k: Int,
                              bands: Int, mode: String): Unit = {
    val withSig = Par.fanOut(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
        col("doc_id"))
      .select(col("doc_id"), shingles(col("__text"), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("bands", graft.functions.MinHashBandsExpr(col("sh"), k, bands))
    withSig.select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band_ix", "band_hash")))
      .withColumn("band_pt", pmod(col("band_hash"), lit(64L)))
      // cluster by the write-partition key so each task writes whole
      // band_pt directories (guide §6: without this, every input
      // partition opens a file in every band_pt dir — measured r11:
      // 32×64 small files and an 8s commit for a sub-MB index)
      .repartition(col("band_pt"))
      .write.mode(mode).partitionBy("band_pt")
      .parquet(s"$indexDir/bands")
    withSig.select(col("doc_id"), col("sh"))
      .write.mode(mode).parquet(s"$indexDir/shingles")
  }

  /** Compact a persisted dedup index in place: rewrite `bands` as ONE
    * file per band_pt partition and `shingles` as `shinglePartitions`
    * files, dropping the exact-duplicate rows an at-least-once replay
    * of [[extendDedupIndex]] may have appended (result-neutral:
    * [[dedupAgainstIndex]] already dedups candidate pairs, so dropping
    * duplicate index rows cannot change its output — spec-asserted).
    *
    * [[extendDedupIndex]] appends one file-set per batch across 64
    * partitions, so a long-running stream accrues unbounded small
    * files without this — the same problem
    * [[graft.sources.DataSyncStore.compact]] solves for the store.
    * Commit is temp-write + delete/rename (the PublishToMarc pattern):
    * the long write job targets a sibling tmp dir while the live index
    * stays readable; only the two fast metadata ops sit in the swap
    * window. Run it between micro-batches (see
    * [[graft.streaming.Streams.streamDedupIncremental]]'s
    * `compactEvery`) or while ingest is paused.
    */
  /** Temp-write → delete-live → rename swap for one index sub-table;
    * the crash states this ordering leaves are exactly the two
    * [[recoverTable]] repairs. Shared by the band- and span-index
    * compactions.
    */
  // swap/recover shared with the other persisted indexes
  private def swapIn(spark: org.apache.spark.sql.SparkSession,
                     indexDir: String, sub: String)
                    (write: String => Unit): Unit =
    IndexFiles.swapIn(spark, indexDir, sub)(write)

  private def recoverTable(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String, sub: String): Boolean =
    IndexFiles.recoverTable(spark, indexDir, sub)

  def compactDedupIndex(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String, shinglePartitions: Int = 64): Unit = {
    recoverDedupIndex(spark, indexDir) // a prior crash mid-swap may have
    // left tmp as the ONLY copy — never delete it before checking
    swapIn(spark, indexDir, "bands") { tmp =>
      spark.read.parquet(s"$indexDir/bands")
        .dropDuplicates("doc_id", "band_ix", "band_hash")
        // each band_pt lands wholly in one task → one file per partition dir
        .repartition(64, col("band_pt"))
        .write.mode("overwrite").partitionBy("band_pt").parquet(tmp)
    }
    swapIn(spark, indexDir, "shingles") { tmp =>
      spark.read.parquet(s"$indexDir/shingles")
        .dropDuplicates("doc_id")
        .repartition(shinglePartitions)
        .write.mode("overwrite").parquet(tmp)
    }
  }

  /** Repair an index left mid-swap by a crashed [[compactDedupIndex]].
    * The swap order is write-tmp → delete-live → rename-tmp-to-live,
    * so exactly two crash states exist per table:
    *  - live AND tmp present (crash before the delete): live is still
    *    the valid current index — drop the orphaned tmp;
    *  - tmp ONLY (crash between delete and rename): tmp holds the only
    *    copy — complete the swap by renaming it into place.
    * Returns true if anything was repaired. Idempotent; called
    * automatically at the start of every compaction, and safe to call
    * at stream/job startup.
    */
  def recoverDedupIndex(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String): Boolean =
    Seq("bands", "shingles").map(recoverTable(spark, indexDir, _))
      .exists(identity)

  /** Compact the span index after repeated [[extendSpanIndex]] appends
    * — one file per span_pt partition, replay-duplicated rows dropped.
    * Query-result identical before/after ([[spansAgainstIndex]] already
    * count-dedupes, so dropping physical duplicates changes nothing —
    * spec-asserted). Same temp-write → delete → rename swap and crash
    * states as [[compactDedupIndex]]; recovery runs automatically
    * first.
    */
  def compactSpanIndex(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String): Unit = {
    recoverSpanIndex(spark, indexDir)
    swapIn(spark, indexDir, "spans") { tmp =>
      spark.read.parquet(s"$indexDir/spans")
        .dropDuplicates("doc_id", "span_hash")
        .repartition(64, col("span_pt"))
        .write.mode("overwrite").partitionBy("span_pt").parquet(tmp)
    }
  }

  /** Repair a span index left mid-swap by a crashed
    * [[compactSpanIndex]] — same two crash states as
    * [[recoverDedupIndex]]. Idempotent.
    */
  def recoverSpanIndex(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String): Boolean =
    recoverTable(spark, indexDir, "spans")

  /** Near-dup detection of a NEW batch against a persisted corpus index
    * (see [[buildDedupIndex]]) — the daily-ingest shape of dedup:
    * which incoming documents already exist (near-)verbatim in the
    * history? Emits (new_id, dup_of, jaccard).
    *
    * Scale shape: the new batch's sketches are map-side; the batch's
    * band keys BROADCAST against the index scan (the default — an
    * ingest batch is usually executor-memory-sized), so the 100 TB
    * band index is never shuffled; candidate verification touches only
    * the matched history rows (semi-join-bounded shuffle). For a batch
    * too large to broadcast, pass `broadcastBatch = false`: the hints
    * drop and the joins fall back to shuffle joins planned by AQE —
    * the index pays its one shuffle, the same floor as running
    * [[minhashPairs]] over history ∪ batch, which is what a
    * corpus-sized "batch" actually is. Result-identical either way
    * (spec-asserted), so the switch is purely a plan decision.
    * Same parameters ⇒ identical candidate generation to running
    * [[minhashPairs]] over history ∪ batch (spec-asserted equality).
    */
  def dedupAgainstIndex(newDocs: DataFrame, indexDir: String, idCol: String,
                        textCol: String, shingleN: Int = 3, k: Int = 64,
                        bands: Int = 16, threshold: Double = 0.7,
                        broadcastBatch: Boolean = true): DataFrame = {
    val spark = newDocs.sparkSession
    def hinted(df: DataFrame) = if (broadcastBatch) broadcast(df) else df
    val newSig = newDocs
      .select(col(idCol).as("new_id"), shingles(col(textCol), shingleN).as("sh_new"))
      .filter(size(col("sh_new")) > 0)
      .withColumn("bands", graft.functions.MinHashBandsExpr(col("sh_new"), k, bands))
    val newBands = newSig.select(col("new_id"),
        posexplode(col("bands")).as(Seq("band_ix", "band_hash")))
      .withColumn("band_pt", pmod(col("band_hash"), lit(64L)))
    val idx = spark.read.parquet(s"$indexDir/bands")
    val candidates = idx
      .join(hinted(newBands), Seq("band_pt", "band_ix", "band_hash"))
      .select(col("doc_id").as("dup_of"), col("new_id")).distinct()
    val oldSh = spark.read.parquet(s"$indexDir/shingles")
      .select(col("doc_id").as("dup_of"), col("sh").as("sh_old"))
    // candidates are batch-bounded → broadcast them too: verification
    // is then a second pure index scan, zero shuffles end to end
    oldSh
      .join(hinted(candidates), "dup_of")
      .join(hinted(newSig.select(col("new_id"), col("sh_new"))), "new_id")
      .select(col("new_id"), col("dup_of"),
        round(size(array_intersect(col("sh_old"), col("sh_new"))).cast("double") /
              size(array_union(col("sh_old"), col("sh_new"))), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      // replay tolerance (at-least-once foreachBatch re-running extend):
      // duplicate index rows must not duplicate the emitted pair, and a
      // batch whose own docs already landed in the index must not match
      // ITSELF — ids are globally unique, so a self-pair is always the
      // replay artifact, never a finding
      .filter(col("new_id") =!= col("dup_of"))
      .dropDuplicates("new_id", "dup_of")
  }

  /** EDIT-DISTANCE near-dup pairs (the typo/OCR/diff shape): all pairs
    * within Levenshtein distance `maxDist` — character-level edits
    * that token-set measures miss entirely (a one-char typo in every
    * 10th word leaves Jaccard high but matters for OCR dedup; a short
    * insertion leaves Jaccard low while the edit distance is tiny).
    *
    * Candidate generation is the LOSSLESS q-gram count filter (Ed-Join
    * / Gravano et al.): one edit destroys at most `q` of a string's
    * overlapping character q-grams, so `ed(A,B) ≤ d` forces the
    * multiset gram overlap `Σ_g min(cA(g), cB(g)) ≥ max(|A|,|B|) −
    * (q−1) − d·q`; pairs also must satisfy `||A|−|B|| ≤ d` (each edit
    * changes length by ≤ 1). Survivors verify with Spark's built-in
    * banded `levenshtein(l, r, threshold)` — O(d·n) per pair, codegen,
    * never the full O(n²) DP matrix.
    *
    * Scale shape: gram explode is map-side; the candidate join keys on
    * the gram VALUE (uniformly distributed for q big enough to dodge
    * stop-phrase collisions — pick `q` ≥ a couple of words); the
    * length band rides the join condition so hopeless pairs never
    * reach the pair aggregation; verification touches only
    * filter survivors with texts attached by id-joins (no text ever
    * rides the gram shuffle). At 100 TB the hot-gram hazard is a
    * stop-phrase gram pairing everything: either cap join grams by
    * document frequency and LOWER the count bound by each string's
    * dropped-gram count (stays lossless — a dropped gram can hide at
    * most its own multiplicity of overlap), or switch candidate
    * generation to the PassJoin chunk scheme; not needed at bench
    * scale with q spanning multiple words. Like [[containmentPairs]],
    * TRUE-pair volume is Θ(Σ family²) under k-clone duplication (r7
    * sf10: 100-clone families drove the gram shuffle past local
    * disk); sequencing contract: near-dup cluster first, run
    * edit-distance over family representatives.
    *
    * Strings shorter than `q` emit no grams and never pair
    * (require-d away via the caller's min-length contract; the
    * planted corpus's shortest doc is 48 chars ≫ q).
    *
    * Output: `(id_a < id_b, dist)` for verified pairs.
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        q: Int = 24, maxDist: Int = 10): DataFrame = {
    require(q >= 2, s"q must be >= 2, got $q")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val base = Par.fanOut(
      docs.select(col(idCol).as("__id"), col(textCol).as("__text"),
        length(col(textCol)).cast("long").as("__len")),
      col("__id"))
    val grams = base
      .filter(col("__len") >= q)
      .select(col("__id"), col("__len"),
        explode(transform(sequence(lit(1), (col("__len") - (q - 1)).cast("int")),
          i => col("__text").substr(i, lit(q)))).as("g"))
      .groupBy(col("__id"), col("__len"), col("g"))
      .agg(count(lit(1)).as("__c"))
    val a = grams.select(col("__id").as("id_a"), col("__len").as("len_a"),
      col("g"), col("__c").as("ca"))
    val b = grams.select(col("__id").as("id_b"), col("__len").as("len_b"),
      col("g"), col("__c").as("cb"))
    val shared = a.join(b,
        a("g") === b("g") && col("id_a") < col("id_b") &&
          abs(col("len_a") - col("len_b")) <= maxDist)
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(least(col("ca"), col("cb"))).as("__shared"),
           first(col("len_a")).as("len_a"), first(col("len_b")).as("len_b"))
      .filter(col("__shared") >=
        greatest(greatest(col("len_a"), col("len_b"))
          - lit((q - 1).toLong + maxDist.toLong * q), lit(1L)))
    // r12: the banded-levenshtein verify is the compute-dense stage —
    // pin its joins above AQE's byte-based coalesce (the
    // containmentPairs verify fix; fanOut no-ops on large pair frames)
    val v1 = Par.pin(shared, col("id_a"))
      .join(base.select(col("__id").as("id_a"), col("__text").as("ta")), "id_a")
    Par.pin(v1, col("id_b"))
      .join(base.select(col("__id").as("id_b"), col("__text").as("tb")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta"), col("tb"), maxDist).as("dist"))
      .filter(col("dist") >= 0) // banded levenshtein yields -1 past the cap
  }
}
