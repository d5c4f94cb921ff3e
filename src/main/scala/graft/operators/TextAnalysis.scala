package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All map-side (per-document) except the dedup groupBy; everything
  * stays in whole-stage codegen (built-in functions only).
  */
object TextAnalysis {

  /** Whitespace-collapse + lowercase normalization used as the exact-dedup key. */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Deterministic content hash for exact dedup. */
  def contentHash(c: Column): Column = md5(normalizeText(c))

  /** Exact duplicate groups: hash → representative (min id) + group size.
    * One shuffle on the 128-bit hash; partial aggregation map-side.
    */
  def exactDupGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(contentHash(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  private val StopWords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Letter-chars / total-chars ratio, un-rounded; 0.0 (not null) for
    * empty text — the single definition every quality consumer shares
    * ([[quality]], [[curationFilter]], [[QualityClassifier.features]]).
    */
  def alphaRatioRaw(t: Column): Column =
    when(length(t) > 0,
      length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") / length(t))
      .otherwise(0.0)

  /** Per-document quality metrics: char/alpha/space/stopword ratios and
    * token stats. Ratios rounded to 6 places for cross-engine parity.
    * Contract: EVERY ratio is 0.0 — never null — on empty or null text
    * (text is coalesced to "" so a missing document still gets a row of
    * zeros instead of silently dropping out of downstream aggregates).
    */
  def quality(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val toks = split(t, " ")
    val nChars = length(t)
    val spaces = length(t) - length(regexp_replace(t, " ", ""))
    val stops = size(filter(toks, w => w.isin(StopWords: _*)))
    docs.select(
      col(idCol),
      nChars.cast("long").as("n_chars"),
      round(alphaRatioRaw(t), 6).as("alpha_ratio"),
      round(when(nChars > 0, spaces.cast("double") / nChars).otherwise(0.0), 6)
        .as("space_ratio"),
      round(when(nChars > 0, stops.cast("double") / size(toks)).otherwise(0.0), 6)
        .as("stopword_ratio"),
      round(when(nChars > 0, (nChars.cast("double") - spaces) / size(toks))
        .otherwise(0.0), 6).as("avg_token_len"))
  }

  /** Token counts: whitespace tokens and a BPE-ish lexer count
    * (letter runs | digit runs | single other non-space).
    */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      size(split(trim(t), "\\s+")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(t, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_tokens"))
  }

  /** Polynomial rolling-hash fingerprint of the full text:
    * h = Σ h*base + code(char) (mod `mod`). Pure HOF aggregation over
    * the character sequence — map-side, codegen, deterministic, and
    * exactly reproducible in any engine with a fold (DuckDB
    * list_reduce oracle).
    */
  def fingerprint(text: Column, base: Long = 31L, mod: Long = 1000000007L): Column =
    graft.functions.RollingHashExpr(text, base, mod)

  /** FIM (fill-in-the-middle) transformation (Bavarian et al. 2022 —
    * the code-model pretraining reorder): a gated fraction of
    * documents split at two points and emitted PSM-style
    * (`<PRE>prefix<SUF>suffix<MID>middle`) so the model learns to
    * infill; the rest pass through untouched.
    *
    * Everything is derived from the content [[fingerprint]] — the
    * house no-RNG discipline: the APPLY gate is `fp % 1000 <
    * fimPermille`, and the two cut points are `1 + (fp % (L−1))` and
    * `1 + ((fp div 1000) % (L−1))` ordered (equal cuts ⇒ empty
    * middle, legal) — so the transform is a pure function of the
    * corpus, layout/engine-identical, and the SAME document gets the
    * SAME treatment on every run (a reseeded RNG would re-scramble
    * the whole corpus per epoch). Documents shorter than `minChars`
    * never transform (a 3-char doc has no meaningful split). Pure
    * column arithmetic + substrings: map-side, zero shuffle,
    * codegen'd.
    */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
                   fimPermille: Int, minChars: Int = 20): DataFrame = {
    require(fimPermille >= 0 && fimPermille <= 1000,
      s"fimPermille must be in [0,1000], got $fimPermille")
    require(minChars >= 3, s"minChars must be >= 3, got $minChars")
    val staged = docs.select(col(idCol), col(textCol).as("__t"),
      fingerprint(col(textCol)).as("__fp"),
      length(col(textCol)).cast("long").as("__len"))
    val apply_ = expr(s"__fp % 1000 < $fimPermille") &&
      col("__len") >= minChars
    // integer `div` (not `/` — Column division on longs is DOUBLE);
    // cuts cast to INT for substring's signature
    val lo = least(expr("CAST(1 + __fp % (__len - 1) AS INT)"),
                   expr("CAST(1 + (__fp div 1000) % (__len - 1) AS INT)"))
    val hi = greatest(expr("CAST(1 + __fp % (__len - 1) AS INT)"),
                      expr("CAST(1 + (__fp div 1000) % (__len - 1) AS INT)"))
    val prefix = col("__t").substr(lit(1), lo)
    val middle = col("__t").substr(lo + 1, hi - lo)
    val suffix = col("__t").substr(hi + 1, col("__len").cast("int") - hi)
    staged.select(col(idCol), apply_.as("fim_applied"),
      when(apply_, concat(lit("<PRE>"), prefix, lit("<SUF>"), suffix,
          lit("<MID>"), middle))
        .otherwise(col("__t")).as("text_out"))
  }

  /** Span-corruption transformation (the T5/UL2 denoising objective):
    * a gated fraction of documents have two character spans masked
    * with typed sentinels — `corrupted` = text with spans replaced by
    * `<X0>`/`<X1>`, `target` = the sentinel-prefixed masked spans —
    * so the model learns to reconstruct deleted content; the rest
    * pass through with an empty target.
    *
    * Same no-RNG discipline as [[fimTransform]]: the gate
    * (`fp % 1000 < permille`) and all four span coordinates derive
    * from the content [[fingerprint]]. Disjointness by construction —
    * span 1 lives in the first half `[1, h]`, span 2 in the second
    * `[h+1, L]` (`h = L div 2`): `a1 = 1 + fp % h`,
    * `e1 = min(a1 + 1 + (fp div 7) % 4, h)` (2–5 chars before
    * clipping), `a2 = h + 1 + (fp div 1000) % (L − h)`,
    * `e2 = min(a2 + 1 + (fp div 31) % 4, L)`. Every substring length
    * is ≥ 0 by construction so both engines' `substr` agree without
    * clamps. Docs shorter than `minChars` never transform. Pure
    * map-side column arithmetic, zero shuffle, codegen'd.
    */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
                     permille: Int, minChars: Int = 16): DataFrame = {
    require(permille >= 0 && permille <= 1000,
      s"permille must be in [0,1000], got $permille")
    require(minChars >= 8, s"minChars must be >= 8, got $minChars")
    val staged = docs.select(col(idCol), col(textCol).as("__t"),
      fingerprint(col(textCol)).as("__fp"),
      length(col(textCol)).cast("long").as("__len"))
    val apply_ = expr(s"__fp % 1000 < $permille") && col("__len") >= minChars
    val h = expr("CAST(__len div 2 AS INT)")
    val a1 = expr("CAST(1 + __fp % (__len div 2) AS INT)")
    val e1 = least(a1 + lit(1) + expr("CAST((__fp div 7) % 4 AS INT)"), h)
    val a2 = h + lit(1) +
      expr("CAST((__fp div 1000) % (__len - __len div 2) AS INT)")
    val e2 = least(a2 + lit(1) + expr("CAST((__fp div 31) % 4 AS INT)"),
      col("__len").cast("int"))
    val t = col("__t")
    val corrupted = concat(
      t.substr(lit(1), a1 - 1), lit("<X0>"),
      t.substr(e1 + 1, a2 - e1 - 1), lit("<X1>"),
      t.substr(e2 + 1, col("__len").cast("int") - e2))
    val target = concat(lit("<X0>"), t.substr(a1, e1 - a1 + 1),
      lit("<X1>"), t.substr(a2, e2 - a2 + 1))
    staged.select(col(idCol), apply_.as("span_applied"),
      when(apply_, corrupted).otherwise(t).as("corrupted"),
      when(apply_, target).otherwise(lit("")).as("target"))
  }

  /** PII redaction for training corpora: emails, bare URLs and
    * long digit runs (phone/ID-ish) replaced with typed sentinels.
    * Pure regexp_replace chain — codegen'd, map-side, order matters
    * (emails before digit runs so the local part survives as a unit).
    */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^\\s]+", "<URL>")
    regexp_replace(url, "\\d{7,}", "<NUM>")
  }

  /** Prompt/completion pair extraction for SFT-style corpora: split
    * each document at the first sentence terminator run (`[.!?]+`)
    * AT-OR-AFTER the midpoint — prompt = everything through the
    * boundary, completion = the rest — so the pair is a pure function
    * of content (no RNG, the [[fimTransform]] discipline) and the
    * completion is never the document's trailing whitespace tail.
    * Documents with no terminator after the midpoint, with nothing
    * after the boundary, or shorter than `minChars` pass through
    * unsplit with an empty completion and `sft_applied = false`.
    *
    * Pure map-side substring + one regexp_extract (the boundary is
    * found by extracting `^[^.!?]*[.!?]+` from the midpoint tail and
    * measuring its length — both engines re-derive it identically);
    * zero shuffle, codegen'd.
    */
  def sftPairs(docs: DataFrame, idCol: String, textCol: String,
               minChars: Int = 16): DataFrame = {
    require(minChars >= 2, s"minChars must be >= 2, got $minChars")
    val staged = docs.select(col(idCol), col(textCol).as("__t"),
      length(col(textCol)).cast("int").as("__len"))
    val h = expr("CAST(__len div 2 AS INT)")
    val tail = col("__t").substr(h + 1, col("__len") - h)
    val blen = length(regexp_extract(tail, "^[^.!?]*[.!?]+", 0))
    val cut = h + blen
    val applied = col("__len") >= minChars && blen > 0 && cut < col("__len")
    staged.select(col(idCol), applied.as("sft_applied"),
      when(applied, col("__t").substr(lit(1), cut))
        .otherwise(col("__t")).as("prompt"),
      when(applied, col("__t").substr(cut + 1, col("__len") - cut))
        .otherwise(lit("")).as("completion"))
  }

  /** Chat-template rendering + injection guard (E82 — the last step
    * before SFT data ships: turn a prompt/completion pair into the
    * model's chat format and REJECT rows that would corrupt training):
    * renders `<|im_start|>role\n…<|im_end|>` turns (system/user/
    * assistant), rejecting pairs that never split (`unsplit`) and —
    * the guard that matters — pairs whose CONTENT already contains the
    * template sentinel (`sentinel_collision`: a document carrying
    * `<|im_` would fake turn boundaries inside the training example;
    * the classic special-token injection). Reject precedence is
    * stated: unsplit before collision. Pure map-side concat +
    * contains, codegen'd, zero shuffle.
    */
  def chatFormat(pairs: DataFrame, idCol: String, appliedCol: String,
                 promptCol: String, completionCol: String,
                 systemText: String): DataFrame = {
    require(!systemText.contains("<|im_"),
      "systemText must not contain the template sentinel")
    val collision = col(promptCol).contains("<|im_") ||
      col(completionCol).contains("<|im_")
    val valid = col(appliedCol) && !collision
    val rendered = concat(
      lit(s"<|im_start|>system\n$systemText<|im_end|>\n<|im_start|>user\n"),
      col(promptCol),
      lit("<|im_end|>\n<|im_start|>assistant\n"),
      col(completionCol), lit("<|im_end|>"))
    pairs.select(col(idCol), valid.as("valid"),
      when(!col(appliedCol), "unsplit")
        .when(collision, "sentinel_collision").as("reject_reason"),
      when(valid, rendered).as("rendered"),
      when(valid, length(rendered).cast("long")).as("n_chars_rendered"))
  }

  /** URL canonicalization for crawl dedup (the CCNet/Dolma first
    * stage: most crawl duplicates are the SAME page under cosmetic
    * URL variation, collapsed here before any content hashing runs):
    * drop the fragment, lowercase scheme+authority (path/query stay
    * case-sensitive — they are), strip a leading `www.`, strip the
    * scheme's DEFAULT port only (`http…:80`, `https…:443` — a
    * non-default port is a different origin), remove `utm_*` tracking
    * parameters, tidy the leftover `?`/`&` punctuation, and drop
    * trailing slashes. A schemeless string passes through with only
    * the fragment/utm/slash rules applied.
    *
    * Pure regexp_replace chain (codegen, map-side, zero shuffle);
    * transform ORDER is part of the contract — the oracle re-derives
    * the identical chain (with RE2's `\1` replacement syntax in
    * place of Java's `$1`).
    */
  def urlCanonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val prefix = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val lowered = when(length(prefix) > 0, concat(lower(prefix), rest))
      .otherwise(noFrag)
    // no lookahead anywhere (RE2, the oracle's engine, lacks it):
    // "default port" = :80/:443 followed by /, ?, or end-of-authority
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    val noP80 = regexp_replace(noWww, "^(http://[^/:?#]*):80([/?]|$)", "$1$2")
    val noPort = regexp_replace(noP80,
      "^(https://[^/:?#]*):443([/?]|$)", "$1$2")
    val noUtm = regexp_replace(noPort, "utm_[A-Za-z0-9_]*=[^&#]*&?", "")
    val tidy = regexp_replace(regexp_replace(noUtm, "\\?&", "?"), "[?&]+$", "")
    regexp_replace(tidy, "/+$", "")
  }

  /** Exact URL dedup groups after [[urlCanonicalize]]: canonical URL →
    * representative (min original string) + variant count. One shuffle
    * on the canonical key, partial aggregation map-side.
    */
  def urlDupGroups(docs: DataFrame, urlCol: String): DataFrame =
    docs.groupBy(urlCanonicalize(col(urlCol)).as("canonical_url"))
      .agg(min(col(urlCol)).as("keep_url"), count(lit(1)).as("n_urls"))

  /** Corpus vocabulary statistics: per-token document frequency, total
    * count, and share of the token stream — the input to vocab pruning
    * and contamination checks. One explode + one aggregation.
    */
  def vocabStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(split(normalizeText(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val counts = toks.groupBy("word")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("doc_freq"))
    // stream total as a 1-row aggregate broadcast back — an empty-window
    // sum would drag the whole vocabulary to a single partition
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", round(col("n").cast("double") / col("__total"), 6))
      .drop("__total")
  }

  /** Benchmark decontamination — the training-data step that finds
    * corpus documents overlapping an evaluation set: distinct n-gram
    * shingles per document on both sides, equi-join on the shingle
    * (benchmark side broadcast — eval sets are model-sized), count of
    * shared shingles per (corpus doc, benchmark doc) pair, thresholded.
    *
    * Scale shape: the corpus is touched by one map-side shingle explode
    * + broadcast join; the only shuffle is the pair aggregation, whose
    * size is bounded by actual overlaps, never corpus × benchmark.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, shingleN: Int = 3,
                    minShared: Int = 10): DataFrame = {
    def sh(df: DataFrame, outId: String) = df.select(col(idCol).as(outId),
      explode(Dedup.shingles(col(textCol), shingleN)).as("shingle"))
    sh(corpus, "doc_id")
      .join(broadcast(sh(benchmark, "benchmark_id")), "shingle")
      .groupBy("doc_id", "benchmark_id")
      // shingles are distinct per doc on each side → plain count
      .agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= minShared)
  }

  /** Bloom-prefiltered benchmark decontamination — same result as
    * [[contamination]] (a Bloom filter has NO false negatives and the
    * exact shingle join kills its false positives), but the corpus side
    * is pruned MAP-SIDE before anything shuffles: benchmark shingle
    * hashes are folded into a Bloom sketch once (driver-side aggregate,
    * ~1.2 MB at 2^20 items / 1% fpp), the sketch rides into every scan
    * task as a plan literal, and only corpus shingles the sketch admits
    * enter the join. At 100 TB that is the difference between shuffling
    * every document's shingles and shuffling only the (rare) suspected
    * overlaps — the same shape Spark's own runtime row-group filtering
    * uses, via the same codegen'd [[BloomFilterMightContain]] predicate
    * (no UDF in the hot path).
    */
  def bloomContamination(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                         textCol: String, shingleN: Int = 3,
                         minShared: Int = 10,
                         expectedItems: Long = 1L << 20,
                         fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    def sh(df: DataFrame, outId: String) = df.select(col(idCol).as(outId),
      explode(Dedup.shingles(col(textCol), shingleN)).as("shingle"))
    val bsh = sh(benchmark, "benchmark_id")
    val bloom = bsh.select(xxhash64(col("shingle")).as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val admitted = ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bytes, org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(xxhash64(col("shingle")))))
    sh(corpus, "doc_id")
      .filter(admitted)
      .join(broadcast(bsh), "shingle")
      .groupBy("doc_id", "benchmark_id")
      .agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= minShared)
  }

  /** Deterministic stratified sampling — the per-source mixing-weight
    * step of a training-data pipeline: each stratum keeps
    * `rates(stratum)`‰ of its documents, selected by the content
    * fingerprint (NOT a seeded RNG: the same document always makes the
    * same decision across runs, engines and cluster layouts). The rate
    * table is model-sized and broadcast; strata without a rate drop.
    * Map-side only — zero shuffle.
    */
  def stratifiedSample(docs: DataFrame, strataCol: String, textCol: String,
                       idCol: String, rates: Map[String, Int]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rateDim = broadcast(rates.toSeq.toDF(strataCol, "__permille"))
    docs.join(rateDim, strataCol)
      .filter(pmod(fingerprint(col(textCol)), lit(1000L)) < col("__permille"))
      .select(col(idCol), col(strataCol))
  }

  /** Exact-k uniform sample, deterministically: the k documents with
    * the smallest content fingerprints (id tiebreak). Complements
    * [[stratifiedSample]] (rate-based, size varies with the corpus)
    * when the contract is "exactly k rows" — eval-set carving, fixed
    * inspection samples. Because the fingerprint is a content hash,
    * the selection is a uniform draw that is stable across runs,
    * engines and cluster layouts, and documents ADDED to the corpus
    * displace at most their own count (bounded churn, unlike a
    * reseeded RNG which reshuffles everything).
    *
    * Scale shape: Spark plans orderBy+limit as TakeOrderedAndProject —
    * each task keeps a local top-k heap and the driver merges
    * numPartitions·k rows; the corpus is never globally sorted and
    * never shuffled.
    */
  def uniformSampleK(docs: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .orderBy(col("fp"), col(idCol))
      .limit(k)

  /** Mixture resampling — the domain-rebalancing step of a training-data
    * pipeline (Pile/DoReMi-style): given TARGET proportions per stratum
    * (‰ of the output mix), deterministically subsample each stratum so
    * the surviving corpus approaches the target mixture at the largest
    * size the available data supports (the binding stratum keeps ~all
    * of its documents; over-represented strata are thinned). The
    * per-document decision is the content fingerprint — stable across
    * runs, engines and cluster layouts, like [[stratifiedSample]].
    *
    * All sizing arithmetic is INTEGER (floor division): with
    * `scale = min_s(avail_s·1000 div tgt_s)`, each stratum keeps
    * `floor(scale·tgt_s/1000)` ≤ avail_s documents via an acceptance
    * permille — exact cross-engine parity, no fp proportions anywhere.
    * Strata absent from `targets` drop entirely.
    *
    * Scale shape: one stratum-count aggregation (map-side partial, the
    * result is model-sized), the rate table broadcasts back, and the
    * gate is map-side — the corpus itself never shuffles.
    */
  def domainMix(docs: DataFrame, strataCol: String, textCol: String,
                idCol: String, targets: Map[String, Int]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty positive permille weights")
    val spark = docs.sparkSession
    import spark.implicits._
    val tgt = broadcast(targets.toSeq.toDF(strataCol, "__tgt_pm"))
    val avail = docs.groupBy(strataCol).agg(count(lit(1)).as("__avail"))
      .join(tgt, strataCol)
    val scale = avail.agg(min(expr("__avail * 1000 div __tgt_pm")).as("__scale"))
    val rates = avail.crossJoin(broadcast(scale))
      .select(col(strataCol),
        expr("least(1000, ((__scale * __tgt_pm div 1000) * 1000) div __avail)")
          .as("__permille"))
    docs.join(broadcast(rates), strataCol)
      .filter(pmod(fingerprint(col(textCol)), lit(1000L)) < col("__permille"))
      .select(col(idCol), col(strataCol))
  }

  /** Curation filter — the keep/drop decision of a corpus pipeline as
    * one composed pass: exact-dup canonicalization (only the min-id
    * representative of each content hash is canonical), token-count
    * bounds, and an alpha-ratio floor. Emits the decision per document
    * (flags + final `kept`), not just the survivors, so downstream can
    * audit drop reasons. One shuffle (the dup-group aggregate);
    * everything else map-side.
    */
  def curationFilter(docs: DataFrame, textCol: String, idCol: String,
                     minTokens: Long = 5, maxTokens: Long = 5000,
                     minAlphaRatio: Double = 0.3): DataFrame = {
    val t = col(textCol)
    val reps = exactDupGroups(docs, textCol, idCol)
      .select(col("content_hash"), col("keep_id"))
    val toks = size(split(trim(t), "\\s+")).cast("long")
    val alphaRatio = round(alphaRatioRaw(t), 6)
    docs
      .select(col(idCol), contentHash(t).as("content_hash"),
        toks.as("__toks"), alphaRatio.as("__alpha"))
      .join(reps, "content_hash")
      .select(col(idCol),
        (col(idCol) === col("keep_id")).as("is_canonical"),
        (col("__toks") >= minTokens && col("__toks") <= maxTokens).as("len_ok"),
        (col("__alpha") >= minAlphaRatio).as("alpha_ok"))
      .withColumn("kept",
        col("is_canonical") && col("len_ok") && col("alpha_ok"))
  }

  /** Sequence packing (concat-and-chunk): within each shard, documents
    * are laid end-to-end in `idCol` order and the token stream is cut
    * into fixed `contextLen` windows — the packing step of an LLM
    * training pipeline (GPT-style: concatenate, then split at the
    * context length; documents may span a cut). Emits, per document,
    * the sequence it starts in, its token offset there, and whether it
    * spans a cut. One window shuffle on the shard key; shards are
    * bounded (a writer task's worth of docs), so any corpus size
    * packs embarrassingly parallel across shards.
    */
  def packSequences(docs: DataFrame, idCol: String, shardCol: Column,
                    tokenCount: Column, contextLen: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Long.MinValue, -1)
    docs.select(col(idCol), shardCol.cast("long").as("shard"),
        tokenCount.cast("long").as("n_tokens"))
      .withColumn("__start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("n_tokens"),
        floor(col("__start") / contextLen).as("seq_id"),
        (col("__start") % contextLen).as("seq_offset"),
        (col("__start") % contextLen + col("n_tokens") > contextLen)
          .as("crosses_cut"))
  }

  /** Per-document repetition statistics — the Gopher/MassiveText
    * repetition quality filters: type-token ratio, most-frequent-bigram
    * fraction, duplicate-trigram occurrence fraction. One native
    * single-pass expression per row ([[graft.functions.RepetitionStatsExpr]]) —
    * map-side, zero shuffle, codegen. Ratios rounded to 6 places for
    * cross-engine parity (house convention, see [[quality]]).
    */
  def repetitionStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val stats = graft.functions.RepetitionStatsExpr(toks)
    docs.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      round(stats.getItem(0), 6).as("distinct_token_ratio"),
      round(stats.getItem(1), 6).as("top_bigram_frac"),
      round(stats.getItem(2), 6).as("dup_trigram_frac"))
  }

  /** Corpus n-gram count table with a count cutoff — the KenLM-style
    * LM-training artifact (and the standard "frequent phrases" sweep):
    * word n-grams under the house empty-stripped `\s+` tokenization,
    * counted corpus-wide, grams below `minCount` pruned.
    *
    * Scale shape: gram generation is map-side (slice/transform over
    * the token array — no per-gram explode of intermediate frames),
    * ONE gram-keyed aggregation with map-side combine, and the cutoff
    * prunes the long tail BEFORE anything returns — the classic
    * MapReduce LM-counts job as one declarative plan. Documents
    * shorter than `n` tokens emit nothing (guarded before `sequence`,
    * which rejects inverted intervals).
    */
  def ngramCounts(docs: DataFrame, textCol: String, n: Int,
                  minCount: Long): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = filter(split(trim(col(textCol)), "\\s+"),
      x => length(x) > 0)
    docs.select(toks.as("__t"))
      .filter(size(col("__t")) >= n)
      .select(explode(transform(sequence(lit(0), size(col("__t")) - n),
        i => concat_ws(" ", slice(col("__t"), i + 1, lit(n))))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Discriminative terms per document cluster — the
    * corpus-understanding step after [[Similarity]] k-means
    * (embedding_clusters): for each (cluster, token), the count and
    * the LIFT of the token's in-cluster rate over its corpus rate,
    * kept when both clear thresholds. What a topic label is made of.
    *
    * Integer discipline with BOUNDED intermediates at any corpus
    * size: rates in parts-per-billion first (`n·10⁹ div cell_total`,
    * `cn·10⁹ div T` — each ≤ 10⁹ regardless of scale), then
    * `lift_permille = rate_cell·1000 div rate_corpus` (≤ 10¹²) — the
    * same two-step truncation on both engines IS the contract, and
    * nothing ever needs more than a long (the naive `n·T·1000`
    * overflows at 100 TB). Tokens rarer than 1-per-billion fall below
    * the rate resolution and are excluded (lift is meaningless at
    * that rarity).
    *
    * Shape: map-side tokenize, one id-keyed join to the assignment
    * frame, one (cell, token) agg; cell totals broadcast (cells are
    * model-sized), corpus totals one token-keyed join, T a 1-row
    * scalar.
    */
  def clusterTopics(docs: DataFrame, idCol: String, textCol: String,
                    assign: DataFrame, assignIdCol: String, cellCol: String,
                    minCount: Long, minLiftPermille: Long): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
        explode(split(normalizeText(col(textCol)), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val j = toks.join(
      assign.select(col(assignIdCol).as("__id"), col(cellCol).as("cell")),
      "__id")
    val ct = j.groupBy(col("cell"), col("token")).agg(count(lit(1)).as("n"))
    val cellTot = ct.groupBy("cell").agg(sum(col("n")).as("__ct"))
    val corp = ct.groupBy("token").agg(sum(col("n")).as("__cn"))
    val tot = ct.agg(sum(col("n")).as("__T"))
    ct.join(broadcast(cellTot), "cell")
      .join(corp, "token")
      .crossJoin(broadcast(tot))
      .withColumn("__rc", expr("n * 1000000000L div __ct"))
      .withColumn("__rt", expr("__cn * 1000000000L div __T"))
      .filter(col("__rt") > 0)
      .withColumn("lift_permille", expr("__rc * 1000 div __rt"))
      .filter(col("n") >= minCount &&
        col("lift_permille") >= minLiftPermille)
      .select(col("cell"), col("token"), col("n"), col("lift_permille"))
  }

  /** Cross-source n-gram overlap matrix — the contamination question
    * asked at SOURCE granularity ("how much does train-source A share
    * with eval-source B") instead of per-document ([[decontaminate]])
    * or per-doc-vs-corpus ([[ngramNovelty]]): for every source pair,
    * the count of shared DISTINCT n-grams and the Jaccard of the two
    * sources' gram sets in integer permille.
    *
    * Shape: distinct `(source, gram)` projection (map-side gram gen +
    * one gram-keyed distinct), per-source set sizes (one agg), then a
    * gram-keyed self-join generates each sharing pair once under
    * `source_a < source_b` — per-gram fan-out is bounded by
    * #sources², and #sources is a catalog-sized dimension (tens to
    * thousands), never corpus-sized. Integer permille; ties/layout
    * irrelevant (pure set algebra).
    *
    * Hub-gram cap (the [[graft.operators.Graph.jaccardNeighbors]]
    * `maxDegree` device): a gram present in MORE than `maxSources`
    * sources fans out ~df²/2 pair rows in the self-join, and at
    * thousands of sources the boilerplate grams that every web source
    * shares are exactly that worst case — while carrying ~zero
    * distinguishing signal (a gram in nearly all sources tells you
    * nothing about which PAIR overlaps). Grams with df > `maxSources`
    * are dropped from the gram UNIVERSE before sizes and the join, so
    * the Jaccard stays consistent set algebra on the capped universe
    * — a documented approximation that only engages when a gram's df
    * exceeds the cap (exact whenever #sources ≤ `maxSources`, the
    * oracle regime; the fan-out bound becomes #pairs · maxSources²
    * per gram instead of df²).
    */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
                    n: Int = 3, maxSources: Int = 1024): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(maxSources >= 2, s"maxSources must be >= 2, got $maxSources")
    val toks = filter(split(trim(col(textCol)), "\\s+"),
      x => length(x) > 0)
    val allGrams = Par.fanOut(
        docs.select(col(srcCol).as("__src"), col(textCol)))
      .select(col("__src"), toks.as("__t"))
      .filter(size(col("__t")) >= n)
      .select(col("__src"),
        explode(transform(sequence(lit(0), size(col("__t")) - n),
          i => concat_ws(" ", slice(col("__t"), i + 1, lit(n))))).as("gram"))
      .distinct()
    // gram df over SOURCES (rows are already distinct per (src, gram))
    // — one gram-keyed window-free agg + a semi-join-shaped filter
    val keep = allGrams.groupBy("gram")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxSources)
      .select("gram")
    val grams = allGrams.join(keep, "gram")
    val sizes = grams.groupBy(col("__src")).agg(count(lit(1)).as("__sz"))
    val common = grams
      .join(grams.select(col("__src").as("__src2"), col("gram")), "gram")
      .filter(col("__src") < col("__src2"))
      .groupBy(col("__src").as("source_a"), col("__src2").as("source_b"))
      .agg(count(lit(1)).as("common_grams"))
    common
      .join(sizes.select(col("__src").as("source_a"), col("__sz").as("__sa")),
        "source_a")
      .join(sizes.select(col("__src").as("source_b"), col("__sz").as("__sb")),
        "source_b")
      .select(col("source_a"), col("source_b"), col("common_grams"),
        expr("1000 * common_grams div (__sa + __sb - common_grams)")
          .as("jaccard_permille"))
  }

  /** Per-document n-gram NOVELTY against the rest of the corpus (the
    * inverse of boilerplate: how much of this document's phrasing
    * exists nowhere else) — a selection signal for dedup-adjacent
    * curation (C4's "novel text" prior, memorization audits): a doc
    * whose grams all recur elsewhere is template/copy material even
    * when no single document matches it (so pairwise dedup misses it).
    *
    * `novelty_permille = (unique_grams · 1000) div total_grams` over
    * the document's DISTINCT n-grams, where a gram is unique iff its
    * corpus document frequency is 1 — integer permille end-to-end
    * (engine-exact, the score_percentile discipline).
    *
    * Scale shape: gram generation is map-side (slice over the token
    * array, distinct per doc before exploding), document frequency is
    * ONE gram-keyed aggregation with map-side combine, and the df
    * attach is a gram-keyed equi-join back to the same frame — two
    * shuffles on the uniformly-distributed gram key plus the final
    * doc-keyed count. Nothing is ever pairwise: cost is linear in
    * corpus gram volume where a pair-based "who shares my grams"
    * formulation would be quadratic. Docs shorter than `n` tokens
    * emit no grams and are absent from the output (documented).
    */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = filter(split(trim(col(textCol)), "\\s+"),
      x => length(x) > 0)
    val grams = Par.fanOut(docs.select(col(idCol), col(textCol)),
        col(idCol))
      .select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) >= n)
      .select(col(idCol), explode(array_distinct(
        transform(sequence(lit(0), size(col("__t")) - n),
          i => concat_ws(" ", slice(col("__t"), i + 1, lit(n))))))
        .as("gram"))
    val df = grams.groupBy("gram").agg(count(lit(1)).as("__df"))
    grams.join(df, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("total_grams"),
           sum(when(col("__df") > 1, 1L).otherwise(0L)).as("shared_grams"))
      .select(col(idCol), col("total_grams"), col("shared_grams"),
        expr("(total_grams - shared_grams) * 1000 div total_grams")
          .as("novelty_permille"))
  }

  /** Length-bucketed batch layout (padding-waste minimization for
    * training/inference): documents grouped into fixed-width
    * token-length buckets, then dealt into `batchSize`-row batches
    * WITHIN each bucket under a deterministic (bucket, id) total
    * order — batching same-length documents together is what makes
    * per-batch padding ≈ zero instead of max-length.
    *
    * Scale shape: the [[Relational.chunkIndex]] zipWithIndex device
    * (range-repartition total order, NO single-partition window) gives
    * global positions; per-bucket positions derive by subtracting each
    * bucket's first global index — a bucket-count-sized aggregate
    * broadcast back. Buckets are `n_tokens div bucketWidth`, pure
    * integer arithmetic both engines (deliberately not
    * `floor(log2(…))`, whose power-of-two boundaries are libm-
    * implementation-dependent).
    */
  def lengthBatches(docs: DataFrame, textCol: String, idCol: String,
                    bucketWidth: Long, batchSize: Int): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0,
      "bucketWidth and batchSize must be positive")
    val toks = size(split(trim(col(textCol)), "\\s+")).cast("long")
    val bucketed = docs.select(col(idCol), toks.as("n_tokens"))
      .withColumn("bucket", expr(s"n_tokens div $bucketWidth"))
    val indexed = Relational.withGlobalIndex(bucketed,
      Seq(col("bucket"), col(idCol)), Seq("__gix" -> identity))
    val starts = indexed.groupBy("bucket").agg(min("__gix").as("__start"))
    indexed.join(broadcast(starts), "bucket")
      .select(col(idCol), col("n_tokens"), col("bucket"),
        expr(s"(__gix - __start) div $batchSize").as("batch_ix"),
        ((col("__gix") - col("__start")) % batchSize).as("pos_in_batch"))
  }

  /** Blocklist / watchlist sweep: (doc, pattern) rows for every listed
    * pattern occurring as a substring of the document — the safety-
    * term / PII-keyword / license-string filter. ONE Aho-Corasick scan
    * per document regardless of pattern count
    * ([[graft.functions.MultiMatchExpr]]) — map-side, zero shuffle;
    * documents matching nothing emit nothing (explode of an empty
    * match array).
    */
  def blocklistMatches(docs: DataFrame, textCol: String, idCol: String,
                       patterns: Seq[String]): DataFrame =
    docs.select(col(idCol),
      explode(graft.functions.MultiMatchExpr(col(textCol), patterns))
        .as("pattern"))

  /** Per-document character-entropy quality signal (exact integer
    * micro-nats — see [[graft.functions.CharEntropyExpr]]): uniform
    * noise scores high, repeated filler near zero; the cheap
    * complement to token-level [[repetitionStats]]. One native pass
    * per document, map-side, zero shuffle.
    */
  def charEntropy(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val e = graft.functions.CharEntropyExpr(col(textCol))
    docs.select(col(idCol),
      e.getItem(0).as("n_chars"),
      e.getItem(1).as("entropy_micro"))
  }

  /** Unigram language model over the corpus token stream with add-one
    * smoothing: per word, `-ln((count+1)/(N+V))` quantized to integer
    * MICRO-nats. The quantization makes downstream per-document sums
    * exact integer arithmetic — order-independent, so the score is
    * reproducible across engines, partition layouts and shuffle orders
    * (a raw double sum of per-token logs is not: fp addition is
    * non-associative and groupBy delivers rows in arbitrary order).
    * `ln` itself runs once per VOCAB entry, never per token.
    *
    * Tokenization is the house empty-stripped `\s+` definition shared
    * with [[tokenCounts]]/[[tfidfKeywords]]/[[chunkDocuments]] — ragged
    * spacing never mints phantom ""-word vocab entries.
    *
    * Scale shape: one token-count aggregation (map-side partial); the
    * totals ride back as a 1-row broadcast. The model is vocab-sized.
    */
  def unigramLm(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.select(
        explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val counts = toks.groupBy("word").agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c")).as("__n"), count(lit(1)).as("__v"))
    counts.crossJoin(broadcast(totals))
      .select(col("word"),
        round(-log((col("c") + 1).cast("double") / (col("__n") + col("__v"))) * 1e6)
          .cast("long").as("lp_micro"))
  }

  /** Bigram language model with add-one smoothing — the n-gram upgrade
    * of [[unigramLm]] (KenLM-style scoring, one order up):
    * `P(w|v) = (c(v,w)+1) / (c(v)+V)`. Three model tables, all
    * vocab-sized and broadcastable:
    *  - `bigrams(prev, cur, lp_micro)` for SEEN bigrams:
    *    `round(ln((c(v)+V)/(c(v,w)+1))·1e6)` — ONE log per bigram type;
    *  - `contexts(prev, lp_unseen_micro)` for unseen continuations of a
    *    seen context: `round(ln(c(v)+V)·1e6)` (the add-one mass);
    *  - `lpGlobal` (1 row, `lp_global_micro`) for unseen contexts:
    *    `round(ln(V)·1e6)`.
    * Everything downstream of the two count aggregations is integer
    * arithmetic — same cross-engine determinism contract as
    * [[unigramLm]]. Tokenization is the house `\s+` empty-stripped
    * definition.
    */
  def bigramLm(docs: DataFrame, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val toks = array_remove(split(trim(col(textCol)), "\\s+"), "")
    val pairs = docs.select(toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("bi"))
      .select(col("bi.prev").as("prev"), col("bi.cur").as("cur"))
    val unigrams = docs.select(
        explode(array_remove(split(trim(col(textCol)), "\\s+"), "")).as("word"))
    val v = unigrams.agg(countDistinct(col("word")).as("__v"))
    val ctxCounts = pairs.groupBy("prev").agg(count(lit(1)).as("__c_prev"))
    val contexts = ctxCounts.crossJoin(broadcast(v))
      .select(col("prev"),
        round(log((col("__c_prev") + col("__v")).cast("double")) * 1e6)
          .cast("long").as("lp_unseen_micro"),
        col("__c_prev"), col("__v"))
    val bigrams = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("__c_bi"))
      .join(contexts.select("prev", "__c_prev", "__v"), "prev")
      .select(col("prev"), col("cur"),
        round(log((col("__c_prev") + col("__v")).cast("double") /
                  (col("__c_bi") + 1)) * 1e6)
          .cast("long").as("lp_micro"))
    val lpGlobal = v.select(
      round(log(col("__v").cast("double")) * 1e6)
        .cast("long").as("lp_global_micro"))
    (bigrams, contexts.select("prev", "lp_unseen_micro"), lpGlobal)
  }

  /** Per-document cross-entropy under a [[bigramLm]]: mean bigram
    * surprisal in nats over the document's `n-1` bigram positions,
    * with add-one backoff — seen bigram → its `lp_micro`; unseen
    * continuation of a seen context → the context's add-one mass;
    * unseen context → `ln(V)`. The sum is exact integer arithmetic and
    * the mean is integer round-half-up — deterministic across engines,
    * partition layouts and shuffle orders. Documents with <2 tokens
    * emit no row (no bigram positions — explode semantics, like
    * [[chunkDocuments]]).
    *
    * Scale shape: the three model tables broadcast (vocab-sized); one
    * per-document aggregation is the only shuffle.
    */
  def crossEntropyBigram(docs: DataFrame, idCol: String, textCol: String,
                         bigrams: DataFrame, contexts: DataFrame,
                         lpGlobal: DataFrame): DataFrame = {
    val toks = array_remove(split(trim(col(textCol)), "\\s+"), "")
    val pairs = docs.select(col(idCol).as("doc_id"), toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1),
        (a, b) => struct(a.as("prev"), b.as("cur")))).as("bi"))
      .select(col("doc_id"), col("bi.prev").as("prev"), col("bi.cur").as("cur"))
    pairs
      .join(broadcast(bigrams), Seq("prev", "cur"), "left")
      .join(broadcast(contexts), Seq("prev"), "left")
      .crossJoin(broadcast(lpGlobal))
      .select(col("doc_id"),
        coalesce(col("lp_micro"), col("lp_unseen_micro"),
                 col("lp_global_micro")).as("__lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("__s"))
      // integer round-half-up mean — see [[crossEntropy]]
      .select(col("doc_id"), col("n_bigrams"),
        (expr("(2 * __s + n_bigrams) div (2 * n_bigrams)").cast("double") / 1e6)
          .as("cross_entropy"))
  }

  /** Per-document cross-entropy under a unigram LM (the CCNet-style
    * perplexity quality filter): mean token surprisal in nats, rounded
    * to 6 places. The LM is broadcast (vocab-sized; for >threshold
    * vocabularies drop the hint and let AQE plan the shuffle join);
    * out-of-vocabulary tokens are dropped by the inner join —
    * deterministic, and absent entirely when scoring the fitting
    * corpus. One shuffle: the per-document aggregation.
    */
  def crossEntropy(docs: DataFrame, idCol: String, textCol: String,
                   lm: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0) // same tokenization as unigramLm
    toks.join(broadcast(lm), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
           sum(col("lp_micro")).as("__lp"))
      // round-half-up mean in PURE integer arithmetic — (2s+n) div (2n)
      // = floor(s/n + 1/2) — because a double round() call sits on a .5
      // boundary whenever n is even and s ≡ n/2 (mod n), and engines
      // disagree there (BigDecimal-on-string vs scaled std::round).
      // The final /1e6 is a single correctly-rounded fp op — exact.
      .select(col("doc_id"), col("n_tokens"),
        (expr("(2 * __lp + n_tokens) div (2 * n_tokens)").cast("double") / 1e6)
          .as("cross_entropy"))
  }

  /** Per-document top-k TF-IDF keywords — the classic term-weighting
    * feature extractor. IDF is quantized to integer micro-nats
    * (`round(ln(N/df)·1e6)`, computed once per VOCAB word) so the
    * tf·idf weight is EXACT integer arithmetic — order-independent
    * across engines and layouts, the same determinism device as
    * [[unigramLm]]. Ties break by term ascending.
    *
    * Scale shape: one (doc, word) aggregation, one vocab-sized df
    * aggregation broadcast back, and a doc-partitioned top-k window.
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val toks = Par.fanOut(
        docs.select(col(idCol).as("doc_id"), col(textCol)), col("doc_id"))
      .select(col("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0) // blank docs contribute no terms
    val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    // tf already has one row per (doc, word) — derive df from it
    // instead of a second full corpus explode + countDistinct
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("__n"))
    val idf = df.crossJoin(broadcast(n))
      .select(col("word"),
        round(log(col("__n").cast("double") / col("df")) * 1e6)
          .cast("long").as("idf_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("w_micro").desc, col("word"))
    tf.join(broadcast(idf), "word")
      .withColumn("w_micro", col("tf") * col("idf_micro"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("word").as("term"),
        col("tf"), col("w_micro"))
  }

  /** Token-window chunking — the passage-splitting step of a
    * pretraining/RAG pipeline: each document yields windows of
    * `chunkTokens` whitespace tokens advancing by `stride` (stride <
    * chunkTokens ⇒ overlapping windows; the final partial window is
    * kept iff non-empty). Map-side: slice/explode over the token
    * array, no shuffle — each 100 TB scan task chunks its own rows.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0,
      s"chunkTokens=$chunkTokens and stride=$stride must be positive")
    // drop empty tokens: split(trim(""), "\s+") is [""], and trim()
    // strips only spaces, so newline/tab-trailing text would otherwise
    // inflate counts and emit phantom empty chunks for blank docs
    val toks = array_remove(split(trim(col(textCol)), "\\s+"), "")
    // window start indices 0..kmax; the last window reaches the final
    // token, a sub-stride remainder is not re-emitted as its own window
    val starts = sequence(lit(0), greatest(
      ceil((size(toks) - chunkTokens).cast("double") / stride).cast("int"),
      lit(0)))
    docs.select(col(idCol).as("doc_id"), toks.as("__toks"),
        explode(starts).as("chunk_ix"))
      .select(col("doc_id"), col("chunk_ix"),
        slice(col("__toks"), col("chunk_ix") * stride + 1, lit(chunkTokens))
          .as("__ct"))
      .filter(size(col("__ct")) > 0)
      .select(col("doc_id"), col("chunk_ix").cast("long").as("chunk_ix"),
        size(col("__ct")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__ct")).as("chunk_text"))
  }

  /** Segment-level exact dedup — the paragraph/line dedup stage of a
    * web-corpus pipeline (CCNet/C4 remove duplicated paragraphs
    * corpus-wide, keeping only the first occurrence). Documents are cut
    * into non-overlapping `segTokens`-token segments (a deterministic
    * segmenter; real corpora would split on blank lines — the synthetic
    * corpus has none, and a fixed token window keeps the boundary
    * decision engine-independent), each segment is hashed, and only the
    * FIRST occurrence corpus-wide — ordered by (doc, segment index), a
    * total order — survives. Emits one row per document: segment
    * counts and the reassembled deduplicated text.
    *
    * Scale shape: segmentation is a map-side slice/explode; first-
    * occurrence election is ONE window shuffle on the 128-bit segment
    * hash (uniformly distributed — no skew); reassembly is one
    * aggregation on the doc id. No corpus×corpus join anywhere.
    * Documents with no tokens vanish (they contribute no segments),
    * matching the explode semantics of [[chunkDocuments]].
    */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
                   segTokens: Int = 20): DataFrame = {
    val segs = segmentize(docs, idCol, textCol, segTokens)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("seg_hash")).orderBy(col("doc_id"), col("seg_ix"))
    segs
      .withColumn("seg_hash", md5(col("seg_text")))
      .withColumn("kept", row_number().over(w) === 1)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segments"),
        count(when(col("kept"), 1)).as("n_kept"),
        // collect_list skips the nulls the un-kept branch produces; the
        // struct sort is by seg_ix (unique per doc) — deterministic
        array_join(
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("seg_ix"), col("seg_text"))))),
            s => s("seg_text")),
          " ").as("dedup_text"))
  }

  /** Non-overlapping `segTokens`-token segments per document —
    * (doc_id, seg_ix, seg_text), map-side slice/explode. Token-less
    * documents contribute no rows.
    */
  private def segmentize(docs: DataFrame, idCol: String, textCol: String,
                         segTokens: Int): DataFrame = {
    require(segTokens > 0, s"segTokens=$segTokens must be positive")
    val toks = array_remove(split(trim(col(textCol)), "\\s+"), "")
    val nSegs = ceil(size(toks).cast("double") / segTokens).cast("int")
    Par.fanOut(docs.select(col(idCol).as(idCol), col(textCol)), col(idCol))
      .select(col(idCol).as("doc_id"), toks.as("__toks"),
        explode(sequence(lit(0), greatest(nSegs - 1, lit(0)))).as("seg_ix"))
      .select(col("doc_id"), col("seg_ix"),
        concat_ws(" ",
          slice(col("__toks"), col("seg_ix") * segTokens + 1, lit(segTokens)))
          .as("seg_text"))
      .filter(length(col("seg_text")) > 0)
  }

  /** Boilerplate-segment removal — the CCNet/RefinedWeb line-dedup
    * heuristic: a segment occurring in ≥ `minDocs` DISTINCT documents
    * is boilerplate (headers, footers, navigation chrome); each
    * document reports its boilerplate fraction and reassembles without
    * those segments. Unlike [[segmentDedup]] (first copy survives),
    * boilerplate is removed from EVERY document, including the first.
    *
    * Scale shape: one segment-hash aggregation (map-side partial
    * countDistinct), one hash-keyed join back (both sides partitioned
    * by the uniformly-distributed 128-bit hash), one doc aggregation.
    */
  def boilerplateSegments(docs: DataFrame, idCol: String, textCol: String,
                          segTokens: Int = 20, minDocs: Int = 2): DataFrame = {
    require(minDocs > 1, s"minDocs=$minDocs must be > 1")
    val segs = segmentize(docs, idCol, textCol, segTokens)
      .withColumn("seg_hash", md5(col("seg_text")))
    val stats = segs.groupBy("seg_hash")
      .agg(countDistinct(col("doc_id")).as("__n_docs"))
    segs.join(stats, "seg_hash")
      .withColumn("boiler", col("__n_docs") >= minDocs)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segments"),
        count(when(col("boiler"), 1)).as("n_boilerplate"),
        round(count(when(col("boiler"), 1)).cast("double") / count(lit(1)), 6)
          .as("boilerplate_frac"),
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("boiler"), struct(col("seg_ix"), col("seg_text"))))),
            s => s("seg_text")),
          " ").as("clean_text"))
  }

  /** Exact-k-per-stratum deterministic sample: the k smallest content
    * fingerprints (id tiebreak) within each stratum — the balanced
    * per-language/per-domain subset builder ([[uniformSampleK]]'s
    * grouped sibling).
    *
    * Scale shape: NOT a `row_number` window — a window ships every row
    * of a stratum to one task, and with a handful of corpus-sized
    * strata that is a single-task sort of ~the whole corpus. Instead a
    * bounded per-group top-k aggregate
    * ([[graft.functions.GroupedTopKAgg]]): per-task heaps of k (fp, id)
    * pairs merge associatively, O(k) per partition through the ONE
    * stratum shuffle, output layout-independent.
    */
  def stratifiedSampleK(docs: DataFrame, strataCol: String, idCol: String,
                        textCol: String, k: Int): DataFrame =
    docs.groupBy(col(strataCol))
      .agg(graft.functions.GroupedTopKAgg(
        fingerprint(col(textCol)), col(idCol), k).as("__top"))
      .select(col(strataCol), posexplode(col("__top")).as(Seq("__pos", "__p")))
      .select(col(strataCol), col("__p.payload").as(idCol),
        col("__p.key").as("fp"),
        (col("__pos") + 1).cast("long").as("rank"))

  /** Preference-pair construction (DPO/RLHF-style training data from a
    * scored corpus): within each stratum, pair the i-th HIGHEST-scoring
    * document with the i-th LOWEST-scoring one for i ≤ k — maximally
    * separated (chosen, rejected) pairs under the score. Pairs with no
    * positive margin (ties, or strata too small to separate) are
    * dropped, so `chosen_id ≠ rejected_id` by construction.
    *
    * Scale shape: NOT two `row_number` windows — with a handful of
    * corpus-sized strata those are single-task sorts. Both ends come
    * from ONE stratum aggregation of two [[graft.functions.GroupedTopKAgg]]
    * heaps (k smallest of `(−score, id)` and of `(score, id)`): O(k)
    * state per partial, associative merges, 2k longs per partition
    * through the single shuffle; output is layout-bit-identical (the k
    * extremes of a SET are arrival-order-independent). Tie-break is
    * ascending id at both ends.
    */
  def preferencePairs(docs: DataFrame, strataCol: String, idCol: String,
                      scoreCol: String, k: Int): DataFrame = {
    val sc = col(scoreCol).cast("long")
    docs.groupBy(col(strataCol))
      .agg(
        graft.functions.GroupedTopKAgg(-sc, col(idCol), k).as("__hi"),
        graft.functions.GroupedTopKAgg(sc, col(idCol), k).as("__lo"))
      .select(col(strataCol),
        posexplode(arrays_zip(col("__hi"), col("__lo"))).as(Seq("__pos", "__z")))
      .select(col(strataCol),
        (col("__pos") + 1).cast("long").as("pair_ix"),
        col("__z.__hi.payload").as("chosen_id"),
        (-col("__z.__hi.key")).as("chosen_score"),
        col("__z.__lo.payload").as("rejected_id"),
        col("__z.__lo.key").as("rejected_score"))
      .filter(col("chosen_score") > col("rejected_score"))
  }

  /** Deterministic weight-proportional sample without replacement
    * (Efraimidis–Spirakis exponential keys): each document draws
    * u ∈ [1, 10⁶] from its CONTENT fingerprint, its selection key is
    * −ln(u/10⁶)/w, and the k SMALLEST keys are the sample — heavier
    * documents draw systematically smaller keys, and the no-RNG
    * fingerprint draw keeps the sample a pure function of the corpus
    * (re-runs and layouts agree; the stratified_sample device).
    *
    * Integer discipline: −ln(u/10⁶) = ln 10⁶ − ln u in MILLI-nats
    * (`13816 − round(1000·ln u)`, the zipf_fit quantization), scaled
    * by 10⁶ then integer-divided by the integer weight — the key is
    * exact integer arithmetic after one quantized ln, so the DuckDB
    * oracle reproduces it bit-for-bit. Zero/negative weights are
    * never sampled (w ≤ 0 ⇒ probability 0, filtered before the
    * divide).
    *
    * Scale shape: key assignment is map-side; k-smallest ships as
    * orderBy+limit ⇒ TakeOrderedAndProject (per-task heap, driver
    * merges partitions·k rows) — the corpus never globally sorts.
    */
  def weightedSample(docs: DataFrame, idCol: String, textCol: String,
                     weight: Column, k: Int): DataFrame = {
    val u = pmod(fingerprint(col(textCol)), lit(1000000L)) + lit(1L)
    val lnU = round(lit(1000.0) * log(u.cast("double"))).cast("long")
    docs
      .withColumn("__w", weight.cast("long"))
      .filter(col("__w") > 0)
      .withColumn("__num", (lit(13816L) - lnU) * lit(1000000L))
      .withColumn("sample_key", expr("__num div __w"))
      .orderBy(col("sample_key"), col(idCol))
      .limit(k)
      .select(col(idCol), col("__w").as("weight"), col("sample_key"))
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling, Xie et al. 2023): per-document log importance ratio
    * ln p_target(doc) − ln p_base(doc) under two add-one unigram LMs —
    * base fit on the WHOLE corpus (so every scored token is in-vocab),
    * target fit on the documents matching `targetPred`. Documents that
    * look like the target distribution score positive; feed the weight
    * to [[weightedSample]] (exponentiate via the permille rank, or
    * threshold directly) to resample toward the target domain.
    *
    * Determinism: both LMs are the [[unigramLm]] integer micro-nat
    * tables; a token unseen by the target LM takes the uniform add-one
    * mass `round(ln(N_t+V_t)·1e6)` — the same `(c+1)/(N+V)` formula at
    * c=0 — so the per-document sum is exact integer arithmetic.
    *
    * Scale shape: LMs are vocab-sized and broadcast; ONE corpus token
    * explode feeds one per-document aggregation (map-side combined).
    * The target subset must be non-empty (the fit is degenerate
    * otherwise). Zero-token documents don't appear in the output (no
    * tokens ⇒ no ratio), matching the SQL twin.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column): DataFrame = {
    val base = unigramLm(docs, textCol).withColumnRenamed("lp_micro", "__lp_b")
    val tgtDocs = docs.filter(targetPred)
    val tgt = unigramLm(tgtDocs, textCol).withColumnRenamed("lp_micro", "__lp_t")
    val unseen = tgtDocs.select(
        explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("__v"))
      .select(round(log((col("__n") + col("__v")).cast("double")) * 1e6)
        .cast("long").as("__lp_unseen"))
    val toks = docs.select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    toks.join(broadcast(base), "word")
      .join(broadcast(tgt), Seq("word"), "left")
      .crossJoin(broadcast(unseen))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
           sum(col("__lp_b") - coalesce(col("__lp_t"), col("__lp_unseen")))
             .as("log_w_micro"))
  }

  /** Per-stratum EXACT percentile rank of an integer score — the
    * calibration step before a cross-language quality threshold (a raw
    * score cut keeps different fractions of each language; a permille
    * cut keeps the same fraction everywhere).
    *
    * permille = (strictly-below count · 1000) div (n−1) — integer
    * arithmetic end to end, 0 for singleton strata.
    *
    * Scale shape: the corpus-sized window this op naively wants
    * (`percent_rank` partitioned by stratum = one single-task sort of
    * ~the whole corpus per stratum — the stratified_sample_k lesson)
    * is avoided by ranking the DISTINCT-SCORE distribution table
    * instead: one (stratum, score) count aggregation (map-side
    * combined), a window over that score-cardinality-bounded table,
    * then a broadcast join back onto the corpus. The corpus itself
    * never sorts and never passes through a window.
    *
    * Cardinality contract: the window's single-task sort is bounded
    * by the stratum's DISTINCT score count — the caller owns the
    * score's quantization (scores here are integer by signature). For
    * a high-cardinality continuous score, coarsen it in the `score`
    * expression (`score div q * q`) — the
    * [[graft.operators.Relational.robustZscore]] `quantMilli` device.
    */
  def scorePercentile(docs: DataFrame, strataCol: String, idCol: String,
                      score: Column): DataFrame = {
    val scored = docs.select(col(strataCol).as("stratum"),
      col(idCol), score.cast("long").as("score"))
    val dist = scored.groupBy(col("stratum"), col("score"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("score"))
    val ranked = dist
      .withColumn("__below", sum(col("__c")).over(w) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col("stratum"))))
      .select(col("stratum"), col("score"),
        when(col("__n") > 1,
          expr("__below * 1000 div (__n - 1)")).otherwise(lit(0L))
          .as("permille"))
    scored.join(broadcast(ranked), Seq("stratum", "score"))
      .select(col(idCol), col("stratum"), col("score"), col("permille"))
  }

  /** Zipf's-law fit of the token frequency distribution per stratum:
    * least-squares slope/intercept/r² of ln(count) against ln(rank)
    * over the (rank, count) vocabulary curve — the corpus statistic
    * behind vocab sizing and "is this corpus natural language or
    * boilerplate" checks (natural text ⇒ slope ≈ −1).
    *
    * Determinism (the tfidf/pmi discipline): logs are quantized to
    * integer MILLI-nats per distinct word (`round(1000·ln x)` — milli
    * not micro so every regression sum fits a long: |x|,|y| ≤ 2·10⁴,
    * n·Σxy ≤ 10¹⁸ at 10⁵ vocab), the five sums are exact integer
    * aggregates, and slope/intercept/r² derive from those integers in
    * a handful of IEEE-identical double ops — bit-identical in any
    * engine that reproduces the integer sums.
    *
    * Scale shape: one token-count shuffle (map-side combined), then
    * ranking and sums on the VOCAB-sized (lang, word, n) table — the
    * corpus is scanned once; the per-stratum window sorts vocab, never
    * documents.
    */
  def zipfFit(docs: DataFrame, strataCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(strataCol).as("stratum"),
        explode(split(normalizeText(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val counts = toks.groupBy(col("stratum"), col("word"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("n").desc, col("word"))
    val lnq = (c: Column) => round(lit(1000.0) * log(c)).cast("long")
    val xy = counts
      .withColumn("x", lnq(row_number().over(w).cast("long")))
      .withColumn("y", lnq(col("n")))
    xy.groupBy(col("stratum"))
      .agg(count(lit(1)).as("vocab_size"), sum(col("n")).as("total_tokens"),
           sum(col("x")).as("sx"), sum(col("y")).as("sy"),
           sum(col("x") * col("x")).as("sxx"),
           sum(col("x") * col("y")).as("sxy"),
           sum(col("y") * col("y")).as("syy"))
      .select(col("stratum"), col("vocab_size"), col("total_tokens"),
        (col("vocab_size") * col("sxy") - col("sx") * col("sy")).as("__num"),
        (col("vocab_size") * col("sxx") - col("sx") * col("sx")).as("__den"),
        (col("vocab_size") * col("syy") - col("sy") * col("sy")).as("__dy"),
        col("sx"), col("sy"))
      .select(col("stratum"), col("vocab_size"), col("total_tokens"),
        round(col("__num").cast("double") / col("__den").cast("double"), 6)
          .as("slope"),
        round((col("sy").cast("double") -
               col("__num").cast("double") / col("__den").cast("double") *
               col("sx").cast("double")) /
              col("vocab_size").cast("double") / 1000.0, 6).as("intercept"),
        round(col("__num").cast("double") * col("__num").cast("double") /
              (col("__den").cast("double") * col("__dy").cast("double")), 6)
          .as("r2"))
  }

  /** Deterministic train/val/test split, keyed on the CONTENT
    * fingerprint permille — so byte-identical duplicates always land
    * in the SAME split (id-hash splits leak exact dups across the
    * train/test boundary; content-keyed splits can't) — plus a leakage
    * audit: `leaked` marks documents whose whitespace/case-NORMALIZED
    * form still appears in more than one split (trivial near-dups an
    * exact-byte key cannot co-assign). Downstream either drops leaked
    * eval docs or re-assigns whole normalized groups.
    *
    * Scale shape: assignment is a pure map-side function of the text;
    * the audit is one normalized-fingerprint groupBy (map-side
    * combined) whose group frame joins back on the same key —
    * shuffle-partitioned by content hash, no skew (hash keys), no
    * windows.
    */
  def datasetSplit(docs: DataFrame, idCol: String, textCol: String,
                   valPermille: Int = 10, testPermille: Int = 10): DataFrame = {
    val trainLim = 1000 - valPermille - testPermille
    require(trainLim > 0, "val+test permille must leave room for train")
    val bucket = pmod(fingerprint(col(textCol)), lit(1000L))
    val assigned = docs.select(col(idCol), col(textCol),
        when(bucket < trainLim, "train")
          .when(bucket < trainLim + valPermille, "val")
          .otherwise("test").as("split"))
    val groups = assigned
      .groupBy(fingerprint(normalizeText(col(textCol))).as("__nfp"))
      .agg(countDistinct(col("split")).as("__nsplits"))
    assigned
      .withColumn("__nfp", fingerprint(normalizeText(col(textCol))))
      .join(groups, "__nfp")
      .select(col(idCol), col("split"), (col("__nsplits") > 1).as("leaked"))
  }

  /** Windowed word co-occurrence counts with pointwise mutual
    * information — the GloVe/word2vec corpus statistic (directed
    * pairs (t_i, t_{i+δ}) for δ = 1..`window`).
    *
    * Scale shape: pair extraction is pure array slicing per document
    * (`zip_with(slice, slice)` per offset — map-side, no self-join,
    * no position explode), so the only shuffle is the (w1, w2) count
    * aggregation with map-side partial combine; marginals and the
    * total derive from the aggregated pair table (vocab²-bounded, not
    * corpus-bounded) and broadcast back. PMI = ln(c·T / (c1·c2)) is
    * quantized to integer micro-nats from exact integer counts (the
    * tfidf/bm25 determinism discipline): identical on any engine.
    */
  def cooccurrencePmi(docs: DataFrame, textCol: String,
                      window: Int = 3): DataFrame =
    pmiFromCounts(cooccurrenceCounts(docs, textCol, window))

  /** The corpus pass of [[cooccurrencePmi]]: directed (w1, w2, pair_n)
    * counts. Callers that branch over the result several times should
    * persist it (it is vocab²-bounded; see the `cooccurrence_pmi`
    * key) so the corpus is scanned once.
    */
  def cooccurrenceCounts(docs: DataFrame, textCol: String,
                         window: Int): DataFrame = {
    require(window >= 1, s"window=$window must be >= 1")
    val toks = filter(split(trim(col(textCol)), "\\s+"), w => length(w) > 0)
    val pairCols = (1 to window).map { d =>
      zip_with(
        slice(toks, lit(1), greatest(size(toks) - d, lit(0))),
        slice(toks, lit(d + 1), greatest(size(toks) - d, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))
    }
    Par.fanOut(docs.select(col(textCol)))
      .select(explode(flatten(array(pairCols: _*))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("pair_n"))
  }

  /** PMI of a (w1, w2, pair_n) count table; marginals and the total
    * derive from the counts (no corpus access) and broadcast back.
    */
  def pmiFromCounts(pc: DataFrame): DataFrame = {
    val tot = pc.agg(sum(col("pair_n")).cast("double").as("t"))
    val lm = pc.groupBy("w1").agg(sum(col("pair_n")).cast("double").as("c1"))
    val rm = pc.groupBy("w2").agg(sum(col("pair_n")).cast("double").as("c2"))
    pc.join(broadcast(lm), "w1").join(broadcast(rm), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("pair_n"),
        round(lit(1e6) * log((col("pair_n").cast("double") * col("t")) /
                             (col("c1") * col("c2"))))
          .cast("long").as("pmi_micro"))
  }

  /** Word-set Jaccard similarity between two text columns (candidate-pair
    * verification for near-dedup). Pure column expression.
    */
  def wordJaccard(a: Column, b: Column): Column = {
    val ta = array_distinct(split(a, " "))
    val tb = array_distinct(split(b, " "))
    round(size(array_intersect(ta, tb)).cast("double") /
          size(array_union(ta, tb)), 6)
  }

  /** Per-document readability grade (Flesch-Kincaid-shaped) in integer
    * CENTI-grade units — a standard curation feature alongside
    * [[qualityFeatures]]: reading-level bands gate training mixes and
    * flag OCR junk (absurdly high grades) or boilerplate lists
    * (absurdly low).
    *
    * Heuristic counts, all as regexp-match counts so both engines
    * re-derive them identically: words = `[^ \t\r\n\f]+` runs (the
    * class spelled out because Java's `\S` and RE2's differ on
    * vertical tab), sentences = `[.!?]+` runs (floored at 1),
    * syllables = `[aeiouy]+` vowel groups of the lowercased text
    * (the classic one-line syllable approximation). The FK formula `0.39·W/S + 11.8·Syl/W − 15.59`
    * rides integer arithmetic per term — `39·W div S + 1180·Syl div W
    * − 1559` centi-grades with truncating division on non-negative
    * operands — so the score is bit-identical cross-engine. Empty
    * texts emit grade −1559 with zero counts (W floored to 1 only in
    * the divisor). Purely map-side; stays in whole-stage codegen.
    */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = regexp_count(col(textCol), lit("[^ \\t\\r\\n\\f]+")).cast("long")
    val sentences = regexp_count(col(textCol), lit("[.!?]+")).cast("long")
    val syllables =
      regexp_count(lower(col(textCol)), lit("[aeiouy]+")).cast("long")
    docs.select(col(idCol), words.as("words"), sentences.as("sentences"),
        syllables.as("syllables"))
      .withColumn("grade_centi",
        expr("39 * words div greatest(1L, sentences)" +
          " + 1180 * syllables div greatest(1L, words) - 1559"))
  }

  /** Top-gram coverage curve (E74) — how much of the corpus the k
    * most frequent n-grams account for: the compression-potential /
    * boilerplate signal (a crawl whose top-100 trigrams cover 40% of
    * token mass is template soup, not prose). Deterministic top-k by
    * `(count desc, gram asc)`, each gram's own and CUMULATIVE
    * coverage in integer permille of TOTAL gram instances. One
    * gram-keyed count (map-side combined), a k-bounded
    * TakeOrdered, and the HOF running-sum fold over the collected
    * k-row frame — no global window, nothing gram-sized sorted.
    */
  def ngramCoverage(docs: DataFrame, textCol: String, n: Int,
                    k: Int): DataFrame = {
    require(n >= 1 && k >= 1, s"need n,k >= 1, got ($n, $k)")
    val counts = ngramCounts(docs, textCol, n, minCount = 1L)
      .withColumnRenamed("gram", "g")
    val total = counts.agg(sum("n").as("__t"))
    val top = counts.orderBy(col("n").desc, col("g")).limit(k)
    top.crossJoin(broadcast(total))
      .agg(array_sort(collect_list(struct((-col("n")).as("negn"),
        col("g"), col("n"), col("__t")))).as("__s"))
      .select(explode(expr("""aggregate(__s,
        CAST(array() AS ARRAY<STRUCT<rank: BIGINT, gram: STRING,
          n: BIGINT, permille: BIGINT, cum_permille: BIGINT>>),
        (acc, el) -> array_append(acc, struct(
          CAST(size(acc) + 1 AS BIGINT) AS rank, el.g AS gram,
          el.n AS n, el.n * 1000L div el.__t AS permille,
          CASE WHEN size(acc) = 0 THEN el.n * 1000L div el.__t
               ELSE element_at(acc, -1).cum_permille
                    + el.n * 1000L div el.__t
          END AS cum_permille)))""")).as("__r"))
      .select(col("__r.rank").as("rank"), col("__r.gram").as("gram"),
        col("__r.n").as("n"), col("__r.permille").as("permille"),
        col("__r.cum_permille").as("cum_permille"))
  }

  /** Within-document duplicate n-gram ratio (E111 — the Gopher-style
    * REPETITION quality filter: a looping generation, a scraped page
    * with a repeated nav block, or a template-stamped listing shows
    * up as a high fraction of duplicate n-grams INSIDE the document —
    * the signal the corpus-level dedup family can't see because the
    * document is only similar to ITSELF). Tokenization is the shared
    * [[normalizeText]] + single-space split (the exact-dedup rule);
    * per doc, the n-gram multiset is `size − n + 1` windows and
    * `dup_permyriad = strunc(10⁴·(total − distinct), total)`; docs
    * with fewer than n tokens read 0 n-grams and a null ratio.
    *
    * Scale shape: PURELY map-side — one projection per document, no
    * shuffle, no join, embarrassingly parallel at any corpus size;
    * the n-gram array is document-sized and never leaves its row.
    */
  def dupNgramRatio(docs: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    require(n >= 1 && n <= 5, s"n in [1,5], got $n")
    val toks = split(normalizeText(coalesce(col(textCol), lit(""))), " ")
    docs.select(col(idCol), toks.as("__w"))
      .select(col(idCol),
        when(size(col("__w")) >= n,
          expr(s"""transform(sequence(1, size(__w) - ${n - 1}),
            i -> array_join(slice(__w, i, $n), ' '))"""))
          .otherwise(expr("CAST(array() AS ARRAY<STRING>)")).as("__g"))
      .select(col(idCol),
        size(col("__g")).cast("long").as("n_ngrams"),
        size(array_distinct(col("__g"))).cast("long").as("n_distinct"))
      .withColumn("dup_permyriad",
        when(col("n_ngrams") > 0,
          expr("(10000 * (n_ngrams - n_distinct)) div n_ngrams")))
  }

  /** Vocabulary growth curve (E71, the Heaps-law observable) — how
    * fast the distinct-token vocabulary grows as the corpus grows,
    * the curve that sizes tokenizer vocabularies and predicts
    * OOV-rate decay: corpus order is the document id, the axis is
    * `nBuckets` equal id-RANGE slices (`(id − lo)·n div (hi−lo+1)` —
    * min/max broadcast, map-side, NO rank and NO corpus sort; slices
    * are equal-count when ids are dense, which the loader contract
    * guarantees here), and the vocab at slice b counts tokens FIRST
    * SEEN at or before b. One pass: per-token `min(bucket)` (map-side
    * combined), a bucket-sized count, and a running sum over the
    * nBuckets-row aggregated frame (the only windows in the plan run
    * over that tiny frame — nothing token-sized is ever windowed).
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val base = docs.select(col(idCol).cast("long").as("__id"),
      col(textCol).as("__t"))
    val stats = base.agg(min("__id").as("__lo"), max("__id").as("__hi"))
    val bucketed = base.crossJoin(broadcast(stats))
      .withColumn("bucket",
        expr(s"(__id - __lo) * ${nBuckets}L div (__hi - __lo + 1)"))
    val toks = bucketed.select(col("bucket"),
        explode(array_remove(split(trim(col("__t")), "\\s+"), ""))
          .as("token"))
    val firstSeen = toks.groupBy("token").agg(min("bucket").as("__fb"))
    val perBucket = firstSeen.groupBy(col("__fb").as("bucket"))
      .agg(count(lit(1)).as("new_tokens"))
    val tokCounts = toks.groupBy("bucket")
      .agg(count(lit(1)).as("bucket_tokens"))
    // running sums via the ewma HOF-fold device, NOT a window: a
    // constant partition key would be constant-folded into a global
    // window (single-partition killer); the fold runs over the
    // collected nBuckets-row frame instead
    perBucket.join(tokCounts, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("new_tokens", "bucket_tokens"))
      .agg(array_sort(collect_list(struct(col("bucket"),
        col("new_tokens"), col("bucket_tokens")))).as("__s"))
      .select(explode(expr("""aggregate(__s,
        CAST(array() AS ARRAY<STRUCT<bucket: BIGINT, new_tokens: BIGINT,
          bucket_tokens: BIGINT, vocab: BIGINT, corpus_tokens: BIGINT>>),
        (acc, el) -> array_append(acc, struct(
          el.bucket AS bucket, el.new_tokens AS new_tokens,
          el.bucket_tokens AS bucket_tokens,
          CASE WHEN size(acc) = 0 THEN el.new_tokens
               ELSE element_at(acc, -1).vocab + el.new_tokens
          END AS vocab,
          CASE WHEN size(acc) = 0 THEN el.bucket_tokens
               ELSE element_at(acc, -1).corpus_tokens + el.bucket_tokens
          END AS corpus_tokens)))""")).as("__r"))
      .select(col("__r.bucket").as("bucket"),
        col("__r.new_tokens").as("new_tokens"),
        col("__r.bucket_tokens").as("bucket_tokens"),
        col("__r.vocab").as("vocab"),
        col("__r.corpus_tokens").as("corpus_tokens"))
  }

  /** Token-budget truncation (E77 — context-window enforcement with
    * loss accounting, the gate before [[packSequences]] when a single
    * document can exceed the window): keep the first `maxTokens`
    * house tokens, rejoin with single spaces (the canonical-whitespace
    * normalization every tokenizer here applies), and report original
    * token count, the truncation flag, and tokens lost — so the
    * corpus-level truncation loss (`sum(tokens_lost)/sum(n_tokens)`)
    * is one aggregation away. Purely map-side, zero shuffle.
    */
  def truncateTokens(docs: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val toks = regexp_extract_all(col(textCol),
      lit("[^ \\t\\r\\n\\f]+"), lit(0))
    docs.select(col(idCol), toks.as("__t"))
      .select(col(idCol),
        array_join(slice(col("__t"), 1, maxTokens), " ").as("text"),
        size(col("__t")).cast("long").as("n_tokens"))
      .withColumn("truncated", col("n_tokens") > maxTokens)
      .withColumn("tokens_lost",
        greatest(lit(0L), col("n_tokens") - maxTokens))
  }

  /** Intra-document repeated-line removal (E76 — the C4 cleaning rule:
    * navigation menus, cookie banners, and templated footers repeat
    * VERBATIM within a page; keep the first occurrence of each exact
    * line, preserve order, drop the rest). The intra-doc complement of
    * [[segmentDedup]] (which dedups across documents). Emits the
    * cleaned text plus line/removal counts so the Gopher-style
    * duplicate-line-fraction gate falls out as `n_removed div n_lines`.
    *
    * Scale shape: lines explode map-side with their positions; first
    * occurrence is one (doc, line)-keyed min aggregation (map-side
    * combined), reassembly one doc-keyed sort-of-collected-lines agg —
    * both shuffles carry the line frame, nothing is windowed, and
    * per-doc state is bounded by the doc's own line count.
    */
  def dedupLines(docs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val lines = docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val first = lines.groupBy(col(idCol), col("__line"))
      .agg(min("__pos").as("__p"), count(lit(1)).as("__c"))
    first.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__p"), col("__line"))))
             .as("__a"),
           sum("__c").as("n_lines"),
           (sum("__c") - count(lit(1))).as("n_removed"))
      .select(col(idCol),
        array_join(expr("transform(__a, x -> x.__line)"), "\n")
          .as("text"),
        col("n_lines"), col("n_removed"))
  }

  /** Log-template mining (E70, Drain-lite) — the ops-log
    * understanding step: lines collapse to TEMPLATES by masking the
    * variable parts (hex runs ≥ 8 first — else `deadbeef1234` decays to
    * digit fragments; 8 keeps short all-digit ids like `1234` in the
    * `<N>` class — then digit runs to `<N>`),
    * then one template-keyed count with the lexicographically first
    * raw line kept as the example. Order of the two masks is part of
    * the contract; both classes are RE2-safe. Map-side explode +
    * split, ONE template-keyed aggregation (map-side combined);
    * blank lines drop.
    */
  def logTemplates(docs: DataFrame, textCol: String,
                   minCount: Long): DataFrame = {
    val line = trim(col("__line"))
    docs.select(explode(split(col(textCol), "\n")).as("__line"))
      .select(line.as("__raw"))
      .filter(length(col("__raw")) > 0)
      .withColumn("template",
        regexp_replace(
          regexp_replace(col("__raw"), "[0-9a-f]{8,}", "<H>"),
          "[0-9]+", "<N>"))
      .groupBy("template")
      .agg(count(lit(1)).as("n"), min("__raw").as("example"))
      .filter(col("n") >= minCount)
  }

  /** Sentence segmentation (E69) — the span primitive under
    * [[readability]]'s counts and `sft_pairs`' boundary search: one
    * row per sentence with its 1-based index, trimmed text, char and
    * house-token counts, and whether a terminator closed it (the
    * trailing fragment of an unterminated doc rides along flagged
    * `terminated = false` — dropping it would silently lose tail
    * text). Sentences are maximal `[^.!?]+[.!?]+` runs — the same
    * RE2-safe terminator class the readability/SFT family uses, no
    * lookbehind (RE2 has none). All-space fragments vanish; a doc of
    * only terminators emits nothing. Purely map-side
    * (regexp_extract_all + posexplode), zero shuffle.
    */
  def sentenceSegment(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val t = col(textCol)
    val closed = regexp_extract_all(t, lit("[^.!?]+[.!?]+"), lit(0))
    val trailing = regexp_extract(t, "[^.!?]+$", 0)
    // regex-dense map pass: fan an under-split scan out first (no-op
    // at production scan parallelism — see Par.fanOut)
    Par.fanOut(docs.select(col(idCol), t.as(textCol)), col(idCol))
      .select(col(idCol),
        concat(closed,
          when(trailing =!= "", array(trailing))
            .otherwise(array().cast("array<string>"))).as("__s"))
      .select(col(idCol), posexplode(col("__s")).as(Seq("__ix", "__raw")))
      .select(col(idCol), (col("__ix") + 1).cast("long").as("sent_ix"),
        trim(col("__raw")).as("sentence"),
        regexp_count(col("__raw"), lit("[.!?]+ *$")).cast("long").as("__term"))
      .filter(length(col("sentence")) > 0)
      .select(col(idCol), col("sent_ix"), col("sentence"),
        length(col("sentence")).cast("long").as("n_chars"),
        regexp_count(col("sentence"), lit("[^ \\t\\r\\n\\f]+")).cast("long")
          .as("n_words"),
        (col("__term") > 0).as("terminated"))
  }

  /** Heuristic code-vs-prose detection (E68) — the routing signal a
    * mixed crawl needs before language-ID, quality scoring, or
    * tokenizer choice (code wants a different pipeline than prose):
    * four integer-permille signals blended with fixed weights —
    *  - `punct_line_permille`: non-blank lines ending in `; { } )`
    *    (statement/block terminators; trailing spaces tolerated);
    *  - `indent_line_permille`: lines opening with 4 spaces or a tab;
    *  - `kw_permille`: code-keyword hits (`def class import return
    *    function const void public static`) per whitespace token,
    *    capped at 1000;
    *  - `symbol_permille`: `{}();=<>` characters per character
    *    (counted via `translate`, no regex).
    * `score_permille = (3·punct + 2·indent + 3·kw + 2·symbol) div 10`,
    * `is_code = score ≥ threshold`. Every regex is RE2-safe (no `\s`/
    * `\S` classes — the house vertical-tab lesson; `\b` is ASCII-safe
    * in both engines), all ratios truncating division on non-negative
    * operands — bit-identical cross-engine. Purely map-side.
    */
  def codeDetect(docs: DataFrame, idCol: String, textCol: String,
                 thresholdPermille: Long): DataFrame = {
    val t = col(textCol)
    val nLines = size(filter(split(t, "\n"), l => length(trim(l)) > 0))
      .cast("long")
    val punctLines =
      regexp_count(t, lit("(?m)[;{})] *$")).cast("long")
    val indentLines =
      regexp_count(t, lit("(?m)^(    |\t)")).cast("long")
    val kwHits = regexp_count(t, lit(
      "\\b(def|class|import|return|function|const|void|public|static)\\b"))
      .cast("long")
    val nWords = regexp_count(t, lit("[^ \\t\\r\\n\\f]+")).cast("long")
    val symChars = (length(t) - length(translate(t, "{}();=<>", "")))
      .cast("long")
    val nChars = length(t).cast("long")
    docs.select(col(idCol),
        nLines.as("n_lines"), punctLines.as("__pl"),
        indentLines.as("__il"), kwHits.as("__kw"), nWords.as("__w"),
        symChars.as("__sym"), nChars.as("__ch"))
      .withColumn("punct_line_permille",
        expr("CASE WHEN n_lines > 0 THEN __pl * 1000L div n_lines ELSE 0L END"))
      .withColumn("indent_line_permille",
        expr("CASE WHEN n_lines > 0 THEN __il * 1000L div n_lines ELSE 0L END"))
      .withColumn("kw_permille",
        expr("CASE WHEN __w > 0 THEN least(1000L, __kw * 1000L div __w) " +
             "ELSE 0L END"))
      .withColumn("symbol_permille",
        expr("CASE WHEN __ch > 0 THEN __sym * 1000L div __ch ELSE 0L END"))
      .withColumn("score_permille",
        expr("(3L * punct_line_permille + 2L * indent_line_permille + " +
             "3L * kw_permille + 2L * symbol_permille) div 10L"))
      .withColumn("is_code", col("score_permille") >= thresholdPermille)
      .drop("__pl", "__il", "__kw", "__w", "__sym", "__ch")
  }

  /** BLEU-2 pair scoring (E91 — the generation-eval member of the eval
    * family: every distillation / paraphrase / translation pipeline
    * gates candidate text against a reference; BLEU's clipped n-gram
    * precisions with the brevity penalty are the standard first
    * number). Per pair, EXACTLY: clipped unigram/bigram matches
    * (`Σ_g min(cand_count(g), ref_count(g))`), the log precisions on
    * the micro-nat device (`round(ln(clip/total)·10⁶)` — one quantized
    * log of an integer ratio both engines hold), `ln BP = (c−r)/c`
    * EXACT in micro (no transcendental — sign-trunc, 0 when c ≥ r),
    * `ln_bleu_micro = lnbp + sign-trunc(lnp1+lnp2, 2)` and one
    * quantized exp back to `bleu_permille`. Any zero precision (or a
    * sub-2-token candidate, which has no bigrams) reads the standard
    * BLEU 0 with null logs (stated). House tokens: whitespace split.
    *
    * Scale shape: entirely map-side per pair — token arrays, n-gram
    * HOF counts (O(len·distinct) per doc), no shuffle at all.
    */
  def bleuPairs(df: DataFrame, idCol: String, candCol: String,
                refCol: String): DataFrame = {
    def toks(c: String) =
      s"filter(split(trim($c), '\\\\s+'), x -> x <> '')"
    def grams2(a: String) =
      s"""CASE WHEN size($a) >= 2 THEN transform(sequence(1, size($a) - 1),
        i -> concat(element_at($a, i), ' ', element_at($a, i + 1)))
        ELSE CAST(array() AS ARRAY<STRING>) END"""
    def clipped(c: String, r: String) =
      s"""aggregate(array_distinct($c), CAST(0 AS BIGINT),
        (acc, t) -> acc + least(
          CAST(size(filter($c, x -> x = t)) AS BIGINT),
          CAST(size(filter($r, x -> x = t)) AS BIGINT)))"""
    def strunc(num: String, den: String) =
      s"""CASE WHEN ($num) < 0 THEN -((-($num)) div ($den))
               ELSE ($num) div ($den) END"""
    df.select(col(idCol),
        expr(toks(candCol)).as("__c"), expr(toks(refCol)).as("__r"))
      .withColumn("__c2", expr(grams2("__c")))
      .withColumn("__r2", expr(grams2("__r")))
      .select(col(idCol),
        expr("CAST(size(__c) AS BIGINT)").as("cand_len"),
        expr("CAST(size(__r) AS BIGINT)").as("ref_len"),
        expr(clipped("__c", "__r")).as("clip1"),
        expr(clipped("__c2", "__r2")).as("clip2"))
      .withColumn("lnp1_micro", expr("""CASE WHEN clip1 > 0 THEN
        CAST(round(ln(CAST(clip1 AS DOUBLE) / cand_len) * 1e6)
          AS BIGINT) END"""))
      .withColumn("lnp2_micro", expr("""CASE WHEN clip2 > 0 THEN
        CAST(round(ln(CAST(clip2 AS DOUBLE) / (cand_len - 1)) * 1e6)
          AS BIGINT) END"""))
      .withColumn("ln_bleu_micro", expr(s"""CASE WHEN clip1 > 0
          AND clip2 > 0 THEN
        CASE WHEN cand_len >= ref_len THEN CAST(0 AS BIGINT)
             ELSE -((1000000 * (ref_len - cand_len)) div cand_len) END
        + (${strunc("lnp1_micro + lnp2_micro", "2")}) END"""))
      .withColumn("bleu_permille", expr("""CASE WHEN ln_bleu_micro
          IS NULL THEN CAST(0 AS BIGINT)
        ELSE CAST(round(exp(CAST(ln_bleu_micro AS DOUBLE) / 1e6)
          * 1000) AS BIGINT) END"""))
  }

  /** ROUGE-1/2 pair scoring (E96 — [[bleuPairs]]' recall-side
    * complement: BLEU asks how much of the CANDIDATE is supported,
    * ROUGE how much of the REFERENCE is covered — the
    * summarization/caption-eval standard, and the pair closes the
    * precision/recall view of generation quality). Per pair, EXACTLY
    * in integers (no logs — ROUGE is a plain ratio): clipped n-gram
    * matches `clipN = Σ_{g∈ref distinct} min(cand(g), ref(g))`,
    * `rougeN_recall_permille = (1000·clipN) div ref_grams`,
    * `rougeN_precision_permille = (1000·clipN) div cand_grams`, and
    * the exact harmonic `rougeN_f1_permille = (2000·clipN) div
    * (cand_grams + ref_grams)`. A side with no n-grams (sub-n-token
    * text) reads the standard 0 for that order. House tokens:
    * whitespace split (the [[bleuPairs]] contract).
    *
    * Scale shape: entirely map-side per pair — token arrays and
    * distinct-gram HOF folds, O(len·distinct) per doc, no shuffle.
    */
  def rougeN(df: DataFrame, idCol: String, candCol: String,
             refCol: String): DataFrame = {
    def toks(c: String) =
      s"filter(split(trim($c), '\\\\s+'), x -> x <> '')"
    def grams2(a: String) =
      s"""CASE WHEN size($a) >= 2 THEN transform(sequence(1, size($a) - 1),
        i -> concat(element_at($a, i), ' ', element_at($a, i + 1)))
        ELSE CAST(array() AS ARRAY<STRING>) END"""
    // clip over the REFERENCE's distinct grams (recall orientation —
    // bleuPairs clips over the candidate's); min() makes the two
    // orientations produce the same clip, stated for the reader
    def clipped(c: String, r: String) =
      s"""aggregate(array_distinct($r), CAST(0 AS BIGINT),
        (acc, t) -> acc + least(
          CAST(size(filter($c, x -> x = t)) AS BIGINT),
          CAST(size(filter($r, x -> x = t)) AS BIGINT)))"""
    df.select(col(idCol),
        expr(toks(candCol)).as("__c"), expr(toks(refCol)).as("__r"))
      .withColumn("__c2", expr(grams2("__c")))
      .withColumn("__r2", expr(grams2("__r")))
      .select(col(idCol),
        expr("CAST(size(__c) AS BIGINT)").as("cand_len"),
        expr("CAST(size(__r) AS BIGINT)").as("ref_len"),
        expr(clipped("__c", "__r")).as("clip1"),
        expr(clipped("__c2", "__r2")).as("clip2"),
        expr("CAST(size(__c2) AS BIGINT)").as("__cl2"),
        expr("CAST(size(__r2) AS BIGINT)").as("__rl2"))
      .withColumn("rouge1_recall_permille",
        expr("CASE WHEN ref_len > 0 THEN (1000 * clip1) div ref_len ELSE 0L END"))
      .withColumn("rouge1_f1_permille", expr(
        """CASE WHEN cand_len + ref_len > 0
             THEN (2000 * clip1) div (cand_len + ref_len) ELSE 0L END"""))
      .withColumn("rouge2_recall_permille",
        expr("CASE WHEN __rl2 > 0 THEN (1000 * clip2) div __rl2 ELSE 0L END"))
      .withColumn("rouge2_f1_permille", expr(
        """CASE WHEN __cl2 + __rl2 > 0
             THEN (2000 * clip2) div (__cl2 + __rl2) ELSE 0L END"""))
      .drop("__cl2", "__rl2")
  }

  /** Generation-diversity report (E99 — distinct-1/distinct-2 per
    * group: the mode-collapse detector every generation pipeline
    * tracks next to [[bleuPairs]]/[[rougeN]] quality — a model can
    * score well against references while emitting the same few
    * phrasings; the distinct-n gram ratios are the standard
    * diversity numbers, and per SOURCE they also profile corpus
    * repetitiveness before training). Per group, EXACT integers:
    * doc count, total/distinct unigram and bigram counts, and
    * `d1/d2_permille = (1000·distinct) div total` (null when the
    * group has no grams of that order — sub-2-token docs contribute
    * none, stated). House tokens: whitespace split.
    *
    * Scale shape: two (group, gram) aggregations (map-side combined)
    * reduced to group-sized frames, joined group-keyed (the exchange
    * reuses); the corpus is scanned once per gram order, never
    * sorted.
    */
  def genDiversity(docs: DataFrame, groupCol: String,
                   textCol: String): DataFrame = {
    val toks = docs.select(col(groupCol).as("grp"),
      expr(s"filter(split(trim($textCol), '\\\\s+'), x -> x <> '')")
        .as("__t"))
    val nDocs = toks.groupBy("grp").agg(count(lit(1)).as("n_docs"))
    val uni = toks.select(col("grp"), explode(col("__t")).as("__g"))
      .groupBy("grp", "__g").agg(count(lit(1)).as("__c"))
      .groupBy("grp").agg(sum("__c").as("total_1"),
        count(lit(1)).as("distinct_1"))
    val bi = toks
      .withColumn("__b", expr(
        """CASE WHEN size(__t) >= 2 THEN
             transform(sequence(1, size(__t) - 1),
               i -> concat(element_at(__t, i), ' ',
                 element_at(__t, i + 1)))
           ELSE CAST(array() AS ARRAY<STRING>) END"""))
      .select(col("grp"), explode(col("__b")).as("__g"))
      .groupBy("grp", "__g").agg(count(lit(1)).as("__c"))
      .groupBy("grp").agg(sum("__c").as("total_2"),
        count(lit(1)).as("distinct_2"))
    nDocs
      .join(uni, Seq("grp"), "left")
      .join(bi, Seq("grp"), "left")
      .select(col("grp"), col("n_docs"),
        coalesce(col("total_1"), lit(0L)).as("total_1"),
        coalesce(col("distinct_1"), lit(0L)).as("distinct_1"),
        coalesce(col("total_2"), lit(0L)).as("total_2"),
        coalesce(col("distinct_2"), lit(0L)).as("distinct_2"))
      .withColumn("d1_permille", expr(
        "CASE WHEN total_1 > 0 THEN (1000 * distinct_1) div total_1 END"))
      .withColumn("d2_permille", expr(
        "CASE WHEN total_2 > 0 THEN (1000 * distinct_2) div total_2 END"))
  }

  /** Curriculum ordering (E103 — the training-schedule transform
    * curriculum-learning pipelines ship after difficulty scoring:
    * easy-to-hard is too rigid, pure shuffle wastes the signal; the
    * standard compromise is difficulty BANDS interleaved round-robin,
    * so every training window sees the full difficulty spectrum while
    * the within-band order stays easy-first). Deterministic, exact:
    * `band = least(B−1, (score·B) div (max_score+1))` (equal-width
    * over [0, max] — the stated banding; scores arrive quantized
    * non-negative), within-band rank by (score, id), and
    * `curriculum_pos = (rank_in_band − 1)·B + band` — position p
    * serves band p mod B, round-robin.
    *
    * Scale shape: one 1-row max broadcast, then the
    * [[Relational.withGlobalIndex]] zipWithIndex device over
    * (band, score, id) — range-repartition gives a TOTAL order with
    * every partition sorting only its slice (bands are contiguous in
    * that order, so within-band rank = global index − the band's
    * first index), per-partition counts become driver offsets, and
    * the rank is assigned map-side. NO window anywhere: a
    * band-partitioned `row_number` would sort corpus/B rows in ONE
    * task, and B is a TRAINING-SCHEDULE semantic, not a parallelism
    * knob. The band-start frame is B rows, broadcast back.
    */
  def curriculumOrder(docs: DataFrame, idCol: String, scoreCol: String,
                      nBands: Int = 4): DataFrame = {
    require(nBands >= 2 && nBands <= 1024,
      s"nBands in [2,1024], got $nBands")
    val d = docs.select(col(idCol).as("id"),
      col(scoreCol).cast("long").as("score"))
    val mx = d.agg(max("score").as("__mx"))
    val banded = d.crossJoin(broadcast(mx))
      .withColumn("band", expr(
        s"least(${nBands - 1}, (score * $nBands) div (__mx + 1))"))
      .drop("__mx")
    val ixd = Relational.withGlobalIndex(banded,
      Seq(col("band"), col("score"), col("id")),
      Seq("__gix" -> identity))
    val starts = ixd.groupBy("band").agg(min("__gix").as("__b0"))
    ixd.join(broadcast(starts), Seq("band"))
      .select(col("id"), col("score"), col("band"),
        ((col("__gix") - col("__b0")) * nBands + col("band"))
          .as("curriculum_pos"))
  }

  /** Garbled-text detection (E104 — the OCR/mojibake gate beside
    * [[TextAnalysis]] quality scoring: encoding damage and OCR noise
    * produce text that passes length/stopword filters but poisons
    * tokenizers — the standard tells are replacement characters,
    * symbol density, and impossible consonant runs). Per document,
    * deterministic integer signals: `repl_count` (U+FFFD
    * occurrences), `sym_permille` = non-[ASCII letter/digit/space/
    * common punctuation] characters per mille (the ASCII-anchored
    * class reads identically in Java and RE2 regex — the stated
    * cross-engine contract; non-Latin scripts score high by design,
    * pair with lang_id), `consonant_run_max` = longest ASCII
    * consonant run (lowercased), and the flag
    * `garbled = repl > 0 ∨ sym > 300‰ ∨ run ≥ 8`.
    *
    * Scale shape: pure map-side regexp/array work per document —
    * zero shuffle, whole-stage codegen.
    */
  def garbledText(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame =
    docs.select(col(idCol), length(col(textCol)).cast("long")
        .as("n_chars"),
        regexp_count(col(textCol), lit("�")).cast("long")
          .as("repl_count"),
        regexp_count(col(textCol),
          lit("[^A-Za-z0-9 \\t\\n.,;:!?'\"()-]")).cast("long")
          .as("__sym"),
        coalesce(array_max(transform(
          split(lower(col(textCol)), "[^bcdfghjklmnpqrstvwxz]+"),
          x => length(x))), lit(0)).cast("long")
          .as("consonant_run_max"))
      .withColumn("sym_permille", expr(
        "CASE WHEN n_chars > 0 THEN (1000 * __sym) div n_chars " +
          "ELSE 0L END"))
      .select(col(idCol), col("n_chars"), col("repl_count"),
        col("sym_permille"), col("consonant_run_max"))
      .withColumn("garbled", col("repl_count") > 0 ||
        col("sym_permille") > 300 || col("consonant_run_max") >= 8)

  /** χ² token keyness between sub-corpora (E106 — the corpus-DIFF
    * view curation needs that [[jsDivergence]]'s one scalar cannot
    * give: WHICH tokens make source A read differently from the rest
    * — domain vocabulary drift, contamination signatures, register
    * shifts — the corpus-linguistics "keyness" standard, scored with
    * the integer-exact 2×2 χ² instead of log-likelihood so both
    * engines compare identical integers). Per (group, token) with
    * corpus token frequency ≥ `minCount`: the 2×2 table (a = token
    * in group, b = token elsewhere, c/d = other-token masses),
    * `chi2_micro = (10⁶·N·(ad−bc)²) div ((a+b)(c+d)(a+c)(b+d))` in
    * DECIMAL(38,0), ENRICHED tokens only (a·N > (a+b)·(a+c) — a
    * depleted token is the other groups' story, stated). Output =
    * every enriched token whose chi2 reaches the group's k-th
    * largest (TIES INCLUDED, the rank() ≤ k convention — stated).
    * Tokens are `[a-z0-9']+` runs of the lowercased text (its own
    * normalization, independent of the bm25 whitespace contract).
    *
    * Scale shape: one token pass, one (group, token) map-side
    * combined agg; token totals by re-agg of THAT frame (never the
    * corpus); the per-group k-th threshold from a bounded
    * [[graft.functions.GroupedTopKAgg]] heap (payload = token hash,
    * used only to keep heap pairs distinct — the threshold is the
    * KEY) broadcast back. NO window, NO sort, nothing corpus-sized
    * shuffles twice.
    */
  def tokenKeyness(docs: DataFrame, textCol: String, groupCol: String,
                   topK: Int = 20, minCount: Long = 5L): DataFrame = {
    val gt = docs.select(col(groupCol).as("grp"),
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z0-9']+"), lit(0))).as("token"))
      .groupBy("grp", "token").agg(count(lit(1)).as("__a"))
    tokenKeynessFromCells(gt, topK, minCount)
  }

  /** The keyness report tail over an already-maintained
    * `(grp, token, __a)` cell frame — shared by [[tokenKeyness]]
    * (fed from the corpus tokenize) and the D31 streaming twin
    * (fed from `readLatest`-style maintained cells), exactly as
    * classificationReport rebuilds from streamConfusionCells.
    */
  def tokenKeynessFromCells(gt: DataFrame, topK: Int,
                            minCount: Long): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val tokTot = gt.groupBy("token").agg(sum("__a").as("__tt"))
      .filter(col("__tt") >= minCount)
    val grpTot = gt.groupBy("grp").agg(sum("__a").as("__gt"))
    val tot = gt.agg(sum("__a").cast("decimal(38,0)").as("__N"))
    val scored = gt.join(tokTot, "token")
      .join(broadcast(grpTot), "grp")
      .crossJoin(broadcast(tot))
      .withColumn("__b", col("__tt") - col("__a"))
      .withColumn("__c", col("__gt") - col("__a"))
      .withColumn("__d", expr("__N - __tt - __c"))
      .filter(expr("CAST(__a AS DECIMAL(38,0)) * __N > " +
        "CAST(__tt AS DECIMAL(38,0)) * __gt")) // enriched only
      .withColumn("chi2_micro", expr(
        """CAST((CAST(1000000 AS DECIMAL(38,0)) * __N
             * (CAST(__a AS DECIMAL(38,0)) * __d
                - CAST(__b AS DECIMAL(38,0)) * __c)
             * (CAST(__a AS DECIMAL(38,0)) * __d
                - CAST(__b AS DECIMAL(38,0)) * __c))
           div (CAST(__tt AS DECIMAL(38,0)) * (__N - __tt)
                * __gt * (__N - __gt)) AS BIGINT)"""))
    // per-group k-th largest chi2 via a bounded heap; ties at the
    // threshold all surface (the rank() <= k convention)
    val kth = scored.groupBy("grp")
      .agg(graft.functions.GroupedTopKAgg(-col("chi2_micro"),
        xxhash64(col("token")), topK).as("__t"))
      .select(col("grp"), (-element_at(col("__t.key"),
        size(col("__t")))).as("__kth"))
    scored.join(broadcast(kth), "grp")
      .filter(col("chi2_micro") >= col("__kth"))
      .select(col("grp"), col("token"),
        col("__a").as("n_in_group"), col("__b").as("n_elsewhere"),
        col("chi2_micro"))
  }
}
