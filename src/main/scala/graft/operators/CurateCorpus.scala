package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the E-group operators composed into
  * ONE runnable pipeline, the way the reference composes its MARC
  * operators into CLI mains (alma_publish_to_marc.py etc.): a user
  * points it at a document table and gets back a training-ready
  * curated corpus plus a full per-document audit trail.
  *
  * Stages (all reusing the verified operators):
  *  1. Unicode NFC canonicalization (`NormalizeUnicodeExpr`) before
  *     any hashing, so visually-identical text dedups together.
  *  2. Per-document signals in ONE map-side pass: token count,
  *     alpha ratio, repetition stats; plus unigram-LM cross-entropy
  *     (one token aggregation + broadcast model).
  *  3. Rule filters: token bounds, alpha floor, top-bigram ceiling,
  *     cross-entropy ceiling.
  *  4. Exact dedup (content-hash canonical, min doc id wins).
  *  5. Near dedup: MinHash/LSH pairs → connected components → only
  *     cluster canonicals survive.
  *  6. Deterministic stratified sampling by a stratum column
  *     (fingerprint-gated, no RNG — reproducible on any layout).
  *  7. GPT-style sequence packing of the survivors.
  *
  * Emits: the curated frame (doc_id, stratum, text, n_tokens, shard,
  * seq_id, seq_offset, crosses_cut), a decisions frame auditing EVERY
  * input document (flags + first drop reason), and observe-based
  * counters that ride the curated frame's materialization.
  *
  * Scale shape: stages 1-3 are map-side; 4 is one hash shuffle; 5 is
  * the band-bucket shuffle + label propagation on the (small) dup
  * graph; 6 is map-side; 7 is one window shuffle on the shard key.
  * Nothing driver-sized except the vocab-sized LM and the filter
  * config.
  */
object CurateCorpus {

  final case class Config(
      minTokens: Long = 8,
      maxTokens: Long = 5000,
      minAlphaRatio: Double = 0.3,
      maxTopBigramFrac: Double = 0.6,
      maxCrossEntropy: Double = 12.0,
      shingleN: Int = 3,
      minhashK: Int = 64,
      minhashBands: Int = 16,
      jaccardThreshold: Double = 0.7,
      sampleRates: Map[String, Int] = Map.empty, // permille per stratum; empty = keep all
      nShards: Int = 32,
      contextLen: Int = 2048)

  final case class Result(curated: DataFrame, decisions: DataFrame,
                          observation: Observation) {
    /** Unpersist the pipeline's cached frames. Call once the returned
      * frames have been materialized/written — each `run()` otherwise
      * pins its feature and survivor frames until a session cache
      * clear.
      */
    def release(): Unit = cached.foreach(_.unpersist(false))
    /** The pipeline's persisted frames, for callers that manage cache
      * lifecycle themselves (e.g. a bench harness's session-scoped
      * reset) instead of calling [[release]].
      */
    def cachedFrames: Seq[DataFrame] = cached
    private[CurateCorpus] var cached: Seq[DataFrame] = Nil
  }

  def run(docs: DataFrame, idCol: String, textCol: String,
          strataCol: String, cfg: Config = Config()): Result = {
    val spark = docs.sparkSession
    import spark.implicits._

    // 1. canonicalize, then treat the NFC text as THE text. Persisted
    // (r12, guide §2.3 read-once): the signal pass, the unigram-LM
    // aggregation and the cross-entropy scoring each consume `canon` —
    // unpersisted, the corpus scan + NFC normalization ran three times.
    val canon = docs.select(col(idCol).as("doc_id"),
      col(strataCol).as("stratum"),
      graft.functions.NormalizeUnicodeExpr(col(textCol), "NFC").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 2. signals (map-side pass + LM scoring). Token count is the
    // whitespace definition shared with tokenCounts/curationFilter
    // (split(" ") would count phantom empty tokens on ragged spacing).
    val t = col("text")
    val rep = graft.functions.RepetitionStatsExpr(split(t, " "))
    val sig = canon.select(col("doc_id"), col("stratum"), col("text"),
      size(split(trim(t), "\\s+")).cast("long").as("n_tokens"),
      TextAnalysis.alphaRatioRaw(t).as("alpha_ratio"),
      rep.getItem(1).as("top_bigram_frac"))
    val lm = TextAnalysis.unigramLm(canon, "text")
    val xent = TextAnalysis.crossEntropy(canon, "doc_id", "text", lm)
      .select(col("doc_id"), col("cross_entropy"))
    val featured = sig.join(xent, Seq("doc_id"), "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 3. rule flags — null-safe: a null/empty-text document fails its
    // gates as false (never null), so it still gets an audit row
    val flagged = featured.select(col("doc_id"), col("stratum"), col("text"),
      col("n_tokens"),
      coalesce(col("n_tokens") >= cfg.minTokens &&
               col("n_tokens") <= cfg.maxTokens, lit(false)).as("len_ok"),
      coalesce(col("alpha_ratio") >= cfg.minAlphaRatio, lit(false))
        .as("alpha_ok"),
      coalesce(col("top_bigram_frac") <= cfg.maxTopBigramFrac, lit(false))
        .as("repetition_ok"),
      coalesce(col("cross_entropy") <= cfg.maxCrossEntropy, lit(true))
        .as("perplexity_ok"))
    val ruleOk = col("len_ok") && col("alpha_ok") &&
      col("repetition_ok") && col("perplexity_ok")

    // 4+5. dedup canonicals are elected among RULE SURVIVORS only —
    // if a cluster's min-id doc fails a quality gate, a clean member
    // inherits the family instead of the whole cluster dying with it.
    // Rule-failed docs skip dedup entirely (they already drop).
    val clean = flagged.filter(ruleOk)
    val reps = TextAnalysis.exactDupGroups(clean, "text", "doc_id")
      .select(col("content_hash"), col("keep_id"))
    val exact = flagged
      .withColumn("content_hash", TextAnalysis.contentHash(col("text")))
      .join(reps, Seq("content_hash"), "left")
      .withColumn("exact_canonical",
        coalesce(col("doc_id") === col("keep_id"), lit(true)))
      .drop("content_hash", "keep_id")
    val pairs = Dedup.minhashPairs(clean, "doc_id", "text",
      cfg.shingleN, cfg.minhashK, cfg.minhashBands, cfg.jaccardThreshold)
    val clusters = Dedup.connectedComponents(pairs)
    val near = exact.join(clusters, Seq("doc_id"), "left")
      .withColumn("near_canonical",
        coalesce(col("keep_id") === col("doc_id"), lit(true)))
      .drop("keep_id")

    // 6. deterministic sampling decision. An empty rate table keeps
    // all; with a non-empty table, strata MISSING from it also default
    // to keep-all (rate 1000‰) — a partial rate table tunes the strata
    // it names without silently discarding the rest (use an explicit
    // 0 rate to drop a stratum).
    val sampled =
      if (cfg.sampleRates.isEmpty) near.withColumn("sampled", lit(true))
      else {
        val rates = broadcast(cfg.sampleRates.toSeq.toDF("stratum", "__permille"))
        near.join(rates, Seq("stratum"), "left")
          .withColumn("sampled",
            pmod(TextAnalysis.fingerprint(col("text")), lit(1000L))
              < coalesce(col("__permille"), lit(1000)))
          .drop("__permille")
      }

    val decided = sampled.withColumn("kept",
      ruleOk && col("exact_canonical") && col("near_canonical") &&
      col("sampled"))

    val decisions = decided.withColumn("drop_reason",
      when(col("kept"), lit(null).cast("string"))
        .when(!col("len_ok"), "length")
        .when(!col("alpha_ok"), "alpha")
        .when(!col("repetition_ok"), "repetition")
        .when(!col("perplexity_ok"), "perplexity")
        .when(!col("exact_canonical"), "exact_dup")
        .when(!col("near_canonical"), "near_dup")
        .otherwise("sampled_out"))
      .drop("text")

    // 7. pack the survivors; shard by content-independent id hash so
    // shard sizes stay balanced whatever the corpus. Persisted: the
    // decision-join chain above feeds both the packing window and the
    // stratum/text join-back.
    val survivors = decided.filter(col("kept"))
      .select(col("doc_id"), col("stratum"), col("text"), col("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val packed = TextAnalysis.packSequences(
        survivors, "doc_id", pmod(xxhash64(col("doc_id")), lit(cfg.nShards)),
        col("n_tokens"), cfg.contextLen)
      .join(survivors.select(col("doc_id"), col("stratum"), col("text")), "doc_id")

    // counters ride the curated materialization — no extra pass
    val obs = Observation("graft_curate_metrics")
    val curated = packed.observe(obs,
      count(lit(1)).as("kept_docs"),
      sum(col("n_tokens")).as("kept_tokens"),
      max(col("seq_id")).as("max_seq_id"))

    val result = Result(curated, decisions, obs)
    result.cached = Seq(canon, featured, survivors)
    result
  }
}
