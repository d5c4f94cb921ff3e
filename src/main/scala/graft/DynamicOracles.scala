package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Bpe, Pca, Unigram}
import graft.sources.Tables

/** Oracle SQL whose TEXT depends on a trained model artifact — the
  * "ship the learned table as data" device that makes the
  * deterministic ENCODE / PROJECTION half of the trained operators
  * driver-verifiable.
  *
  * [[Verify]] calls these at dump time: the same deterministic trainer
  * the query key runs (exact-integer statistics, fixed tie rules — so
  * two fits of the same data are identical) is re-run against the
  * verified sf dir, and the model-sized artifact (merge table / piece
  * table / component matrix) is embedded in the SQL as literals.
  * DuckDB then independently re-derives the encode or projection from
  * the raw parquet tables plus the artifact. Training itself stays
  * engine-side (iterative fits have no SQL twin; the trainer specs
  * pin planted-structure recovery instead).
  */
object DynamicOracles {

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"
  private def dbl(x: Double): String = java.lang.Double.toString(x)

  /** Embedded-literal row cap for INDEX-ARTIFACT frames (the
    * knn_outliers / bitext_mine_ann candidate lists, which are
    * corpus-sized — unlike the learned merge/piece/component tables,
    * which are model-sized and always embed). At or below the cap the
    * frame embeds as a VALUES literal (the round-proven device, and
    * the driver's regime at every SF it verifies); above it the frame
    * is written to a parquet SIDE FILE the oracle reads back, so the
    * SQL string and DuckDB's parser stay O(cap) at any verify SF.
    */
  private def embedCap: Long =
    sys.props.get("graft.oracle.embedCap").flatMap(_.toLongOption)
      .orElse(sys.env.get("GRAFT_ORACLE_EMBED_CAP").flatMap(_.toLongOption))
      .getOrElse(65536L)

  /** Default artifact dir when the caller doesn't thread one. */
  private def defaultArtDir: String =
    s"${sys.props("java.io.tmpdir")}/graft_oracle_artifacts"

  /** Render an all-BIGINT artifact frame (columns exactly `colNames`,
    * in order) as one CTE clause: VALUES literal under [[embedCap]],
    * parquet side file + `read_parquet` above it.
    */
  private def bigintCte(df: org.apache.spark.sql.DataFrame,
                        cteName: String, colNames: Seq[String],
                        key: String, artDir: String): String = {
    val n = df.count()
    require(n > 0, s"$key: empty $cteName artifact frame")
    if (n <= embedCap) {
      val rows = df.collect().map(r =>
        colNames.indices.map(i => r.getLong(i).toString)
          .mkString("(", ",", ")")).mkString(",")
      s"$cteName(${colNames.mkString(", ")}) AS (VALUES $rows)"
    } else {
      val path = s"$artDir/${key}_$cteName"
      df.coalesce(1).write.mode("overwrite").parquet(path)
      val sel = colNames.map(c => s"CAST($c AS BIGINT) AS $c")
        .mkString(", ")
      s"$cteName AS (SELECT $sel FROM read_parquet('$path/*.parquet'))"
    }
  }

  /** All model-dependent oracles, trained against `dir`. Per-key
    * failure degrades that key to the rows-only check instead of
    * failing the dump. `artDir` receives any over-cap index-artifact
    * side files (see [[bigintCte]]); [[Verify]] passes a sibling of
    * its outDir so the files live exactly as long as the dump they
    * belong to.
    */
  def all(spark: SparkSession, dir: String,
          artDir: String = defaultArtDir): Map[String, String] =
    Seq(
      "bpe_tokenize" -> (() => bpeTokenize(spark, dir)),
      "unigram_tokenize" -> (() => unigramTokenize(spark, dir)),
      "embedding_pca" -> (() => embeddingPca(spark, dir)),
      "embedding_clusters" -> (() => embeddingClusters(spark, dir)),
      "quality_classifier" -> (() => qualityClassifier(spark, dir)),
      "dedup_simhash" -> (() => dedupSimhash(spark, dir)),
      "knn_outliers" -> (() => knnOutliers(spark, dir, artDir)),
      "bitext_mine_ann" -> (() => bitextMineAnn(spark, dir, artDir)),
      "cluster_balanced_sample" -> (() => clusterBalancedSample(spark, dir)),
      "cluster_topics" -> (() => clusterTopics(spark, dir)),
      "tokenizer_stats" -> (() => tokenizerStats(spark, dir))
    ).flatMap { case (k, f) =>
      scala.util.Try(f()).toOption.map(k -> _)
    }.toMap

  /** E83 knn_outliers twin over the ANN-composed neighbor frame: the
    * kth-cosine table is an INDEX ARTIFACT (same standing as the
    * learned merge/piece tables — deterministic IVF run, replayed
    * identically by the query key via
    * [[SparkEntry.knnOutliersNeighbors]]), embedded as literals;
    * DuckDB independently re-derives the HUGEINT moment rule and the
    * flag set. The exact-graph twin stays the planted-data oracle in
    * QuantizePreferenceSpec.
    */
  def knnOutliers(spark: SparkSession, dir: String,
                  artDir: String = defaultArtDir): String = {
    import org.apache.spark.sql.functions.col
    val frame = SparkEntry.knnOutliersNeighbors(spark, dir)
      .filter(col("rank") === 5L)
      .selectExpr("query_id AS vec_id",
        "CAST(round(cos * 1000000) AS BIGINT) AS kth")
      .orderBy("vec_id")
    val cte = bigintCte(frame, "kc", Seq("vec_id", "kth"),
      "knn_outliers", artDir)
    raw"""WITH $cte,
m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        sum(CAST(kth AS HUGEINT)) AS s1,
        sum(CAST(kth AS HUGEINT) * kth) AS s2 FROM kc)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(kth AS BIGINT) AS kth_cos_micro,
       (n >= 2 AND n * kth < s1 AND
        (n * kth - s1) * (n * kth - s1) > 4 * (n * s2 - s1 * s1))
         AS is_outlier
FROM kc, m"""
  }

  /** E66b bitext_mine_ann twin: the two IVF candidate lists are the
    * index artifact (deterministic, regenerated identically by the
    * query key via [[SparkEntry.bitextAnnLists]]); DuckDB re-derives
    * kNN sums, ratio margins, the best-per-source pick, the
    * distribution-window calibrated threshold (top-50-permille with
    * ties), and the mined set — every piece of downstream integer
    * math, independently.
    */
  def bitextMineAnn(spark: SparkSession, dir: String,
                    artDir: String = defaultArtDir): String = {
    val (fwdRaw, bwdRaw) = SparkEntry.bitextAnnLists(spark, dir)
    val fCte = bigintCte(
      fwdRaw.withColumnRenamed("__cm", "cm").orderBy("src_id", "tgt_id"),
      "fwd", Seq("src_id", "tgt_id", "cm"), "bitext_mine_ann", artDir)
    val bCte = bigintCte(
      bwdRaw.withColumnRenamed("__cm", "cm").orderBy("tgt_id", "cm"),
      "bwd", Seq("tgt_id", "cm"), "bitext_mine_ann", artDir)
    raw"""WITH $fCte,
$bCte,
ss AS (SELECT src_id, sum(cm) AS sum_s FROM fwd GROUP BY 1),
st AS (SELECT tgt_id, sum(cm) AS sum_t FROM bwd GROUP BY 1),
sc AS (SELECT f.src_id, f.tgt_id, f.cm,
         (CAST(f.cm AS BIGINT) * 8000) // (ss.sum_s + st.sum_t) AS margin
       FROM fwd f JOIN ss USING (src_id) JOIN st USING (tgt_id)
       WHERE f.cm >= 0 AND ss.sum_s + st.sum_t > 0),
best AS (SELECT src_id, tgt_id, cm, margin FROM (
           SELECT *, row_number() OVER (PARTITION BY src_id
             ORDER BY margin DESC, tgt_id) AS rk FROM sc) WHERE rk = 1),
n AS (SELECT count(*) AS nb FROM best),
dist AS (SELECT margin, count(*) AS c FROM best GROUP BY 1),
cum AS (SELECT margin, sum(c) OVER (ORDER BY margin DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cge
        FROM dist),
thr AS (SELECT max(margin) AS t FROM cum, n
        WHERE cge >= greatest(1, nb * 50 // 1000))
SELECT CAST(src_id AS BIGINT) AS src_id, CAST(tgt_id AS BIGINT) AS tgt_id,
       cm / 1e6 AS cos, CAST(margin AS BIGINT) AS margin_permille
FROM best, thr WHERE margin >= t"""
  }

  /** BPE encode twin. Per merge (rank order) the full-token
    * ` l r ` → ` lr ` replace is applied TWICE: a left-to-right
    * replace consumes the trailing space of each match, so of
    * directly-consecutive occurrences only every other one merges in
    * pass 1 — but the survivors are then never adjacent, and pass 2
    * clears them. Within one rank no new occurrence can form
    * (`lr` ≠ `l` and ≠ `r`), and a later rank never re-enables an
    * earlier one (a merge's symbols postdate it in training), so
    * rank-order exhaustive replacement reproduces the lowest-rank-
    * first encode loop of [[graft.operators.Bpe.encodeWord]] exactly
    * (validated symbol-for-symbol over the corpus).
    */
  /** E67: per-language tokenizer report under the SAME trained merge
    * table as [[bpeTokenize]] — the oracle re-runs the embedded merge
    * chain per distinct word and aggregates fertility / subword-length
    * ratios with the identical integer truncation. */
  def tokenizerStats(spark: SparkSession, dir: String): String = {
    val merges = Bpe.train(Tables(spark, dir).documents, "text",
      numMerges = 30)
    val chain = merges.sortBy(_.rank).foldLeft("s0") { (acc, m) =>
      val pat = lit(" " + m.left + " " + m.right + " ")
      val rep = lit(" " + m.left + m.right + " ")
      s"replace(replace($acc, $pat, $rep), $pat, $rep)"
    }
    raw"""WITH toks AS (
  SELECT doc_id, lang, list_filter(string_split_regex(trim(text), '\s+'),
                                   x -> x <> '') AS t
  FROM documents),
w AS (SELECT doc_id, lang, t[i] AS word
      FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)),
dw AS (SELECT DISTINCT word FROM w),
spread AS (SELECT word,
    ' ' || regexp_replace(trim(regexp_replace(word, '(.)', '\1 ', 'g')),
                          '([^ ]+)$$', '\1</w>') || ' ' AS s0
  FROM dw),
enc AS (SELECT word, trim($chain) AS e FROM spread),
j AS (SELECT w.lang, enc.e FROM w JOIN enc USING (word)),
sub AS (SELECT lang,
    CAST(sum(len(string_split(e, ' '))) AS BIGINT) AS n_subwords,
    CAST(sum(len(replace(e, ' ', ''))) AS BIGINT) AS n_subword_chars
  FROM j GROUP BY 1),
wd AS (SELECT lang, CAST(sum(len(t)) AS BIGINT) AS n_words
       FROM toks GROUP BY 1)
SELECT wd.lang, wd.n_words, sub.n_subwords, sub.n_subword_chars,
       CAST(sub.n_subwords * 1000 // wd.n_words AS BIGINT)
         AS fertility_permille,
       CAST(sub.n_subword_chars * 1000 // sub.n_subwords AS BIGINT)
         AS chars_per_subword_milli
FROM wd JOIN sub USING (lang)
WHERE wd.n_words > 0"""
  }

  def bpeTokenize(spark: SparkSession, dir: String): String = {
    val merges = Bpe.train(Tables(spark, dir).documents, "text",
      numMerges = 30)
    val chain = merges.sortBy(_.rank).foldLeft("s0") { (acc, m) =>
      val pat = lit(" " + m.left + " " + m.right + " ")
      val rep = lit(" " + m.left + m.right + " ")
      s"replace(replace($acc, $pat, $rep), $pat, $rep)"
    }
    raw"""WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> '') AS t
  FROM documents),
w AS (SELECT doc_id, i, t[i] AS word
      FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)),
dw AS (SELECT DISTINCT word FROM w),
spread AS (SELECT word,
    ' ' || regexp_replace(trim(regexp_replace(word, '(.)', '\1 ', 'g')),
                          '([^ ]+)$$', '\1</w>') || ' ' AS s0
  FROM dw),
enc AS (SELECT word, trim($chain) AS e FROM spread),
j AS (SELECT w.doc_id, w.i, enc.e FROM w JOIN enc USING (word)),
agg AS (SELECT doc_id,
    string_agg(e, ' ' ORDER BY i) AS subwords,
    CAST(sum(len(string_split(e, ' '))) AS BIGINT) AS n_subwords
  FROM j GROUP BY doc_id)
SELECT t.doc_id, coalesce(a.subwords, '') AS subwords,
       coalesce(a.n_subwords, 0) AS n_subwords,
       CAST(len(t.t) AS BIGINT) AS n_words
FROM toks t LEFT JOIN agg a USING (doc_id)"""
  }

  /** Unigram (Viterbi) encode twin, as exhaustive search: every
    * segmentation of every distinct word is enumerated backward by a
    * recursive CTE (pieces from the embedded vocabulary, unknown
    * single chars at the fixed unk score), then the winner per word is
    * max total score with ties to the lexicographically smallest
    * end-anchored boundary list — exactly the
    * [[graft.operators.Unigram.segmentWord]] backtrack (dp ties keep
    * the smallest start = longest final piece, recursively), so the
    * stronger exhaustive oracle reproduces Viterbi symbol-for-symbol.
    * Tractable because the enumeration runs per DISTINCT word
    * (vocabulary-sized), never per document.
    */
  def unigramTokenize(spark: SparkSession, dir: String): String = {
    val pieces = Unigram.train(Tables(spark, dir).documents, "text",
      vocabSize = 40)
    val vocabVals = pieces
      .map(p => s"(${lit(p.piece)}, CAST(${p.scoreMicro} AS BIGINT))")
      .mkString(", ")
    raw"""WITH RECURSIVE toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> '') AS t
  FROM documents),
w AS (SELECT doc_id, i, t[i] AS word
      FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)),
dw AS (SELECT DISTINCT word FROM w),
vocab(piece, sc) AS (VALUES $vocabVals),
cand AS (
  SELECT p.word, p.j, p.i,
         coalesce(v.sc, CASE WHEN p.i - p.j = 1
                             THEN CAST(${Unigram.UnkScoreMicro} AS BIGINT) END)
           AS psc,
         p.piece
  FROM (
    SELECT dw.word, jj.j, ii.i, substr(dw.word, jj.j + 1, ii.i - jj.j) AS piece
    FROM dw,
         UNNEST(generate_series(1, len(dw.word))) AS ii(i),
         UNNEST(generate_series(0, len(dw.word) - 1)) AS jj(j)
    WHERE jj.j < ii.i AND ii.i - jj.j <= 6) p
  LEFT JOIN vocab v ON v.piece = p.piece
  WHERE coalesce(v.sc, CASE WHEN p.i - p.j = 1
                            THEN CAST(${Unigram.UnkScoreMicro} AS BIGINT) END)
        IS NOT NULL),
seg AS (
  SELECT word, len(word) AS pos,
         CAST([] AS BIGINT[]) AS bounds, CAST([] AS VARCHAR[]) AS toks_r,
         CAST(0 AS BIGINT) AS sc
  FROM dw
  UNION ALL
  SELECT s.word, c.j, s.bounds || [CAST(c.j AS BIGINT)],
         s.toks_r || [c.piece], s.sc + c.psc
  FROM seg s JOIN cand c ON c.word = s.word AND c.i = s.pos
  WHERE s.pos > 0),
best AS (
  SELECT word, toks_r FROM (
    SELECT word, toks_r,
           row_number() OVER (PARTITION BY word
             ORDER BY sc DESC, bounds ASC) AS rk
    FROM seg WHERE pos = 0)
  WHERE rk = 1),
encw AS (SELECT word, array_to_string(list_reverse(toks_r), ' ') AS e,
                CAST(len(toks_r) AS BIGINT) AS np
         FROM best),
j AS (SELECT w.doc_id, w.i, encw.e, encw.np FROM w JOIN encw USING (word)),
agg AS (SELECT doc_id, string_agg(e, ' ' ORDER BY i) AS pieces,
               CAST(sum(np) AS BIGINT) AS n_pieces
        FROM j GROUP BY doc_id)
SELECT t.doc_id, coalesce(a.pieces, '') AS pieces,
       coalesce(a.n_pieces, 0) AS n_pieces,
       CAST(len(t.t) AS BIGINT) AS n_words
FROM toks t LEFT JOIN agg a USING (doc_id)"""
  }

  /** PCA projection + residual twin: plain mat-vec arithmetic with the
    * fitted mean / component matrix embedded as shortest-round-trip
    * double literals. Every sum is written left-associated in the
    * SAME index order [[graft.functions.PcaProjectExpr]] accumulates,
    * so the doubles (and their round-6 images) are bit-identical
    * cross-engine; the residual is `sqrt(max(0, ‖c‖² − Σp²))` exactly
    * as the expression computes it.
    */
  /** k-means assignment twin. The trained centroid matrix is
    * re-derived by the same deterministic Lloyd fit the key runs, then
    * UNIT-NORMALIZED exactly as the assignment expression does
    * ([[graft.functions.NearestCellsExpr.normalized]]) and embedded as
    * shortest-round-trip double literals. Each cell's similarity is the
    * same LEFT-ASSOCIATED IEEE dot product the codegen'd quantizer
    * computes (ascending dimension, sequential adds — DuckDB's `+` is
    * left-associative too), and the argmax CASE checks cells in
    * ascending index order so double-equality ties resolve to the
    * lower index, the quantizer's tie rule.
    */
  /** The `(vec_id, cell)` assignment subquery both clustering oracles
    * build on: trains the same deterministic Lloyd quantizer the keys
    * run and embeds the UNIT centroid matrix as literals. */
  private def clusterAssignSql(spark: SparkSession, dir: String): String = {
    import graft.operators.Similarity
    val e = Tables(spark, dir).embeddings
      .select(org.apache.spark.sql.functions.col("vec_id"),
              org.apache.spark.sql.functions.col("embedding"))
    val centroids = Similarity.trainCentroidsLloyd(
      e, "vec_id", "embedding", nlist = 16, iters = 3)
    val unit = graft.functions.NearestCellsExpr.normalized(
      centroids.map(_.toArray).toArray)
    val dim = unit.head.length
    val sims = unit.zipWithIndex.map { case (row, c) =>
      (0 until dim).map(j => s"e[${j + 1}]*(${dbl(row(j))})")
        .mkString(" + ") + s" AS s$c"
    }.mkString(",\n    ")
    val best = unit.indices.map(c => s"s$c").mkString("greatest(", ", ", ")")
    val cases = unit.indices.map(c =>
      s"WHEN s$c = best THEN CAST($c AS BIGINT)").mkString(" ")
    raw"""SELECT vec_id, CASE $cases END AS cell
FROM (
  SELECT vec_id, $best AS best, * FROM (
    SELECT vec_id,
    $sims
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings) b) s) q"""
  }

  def embeddingClusters(spark: SparkSession, dir: String): String =
    clusterAssignSql(spark, dir)

  /** Cluster-balanced sampling twin: the assignment subquery + a
    * per-cell k-smallest-id pick (row_number in SQL; the engine runs a
    * bounded per-cell heap, same set by construction). */
  def clusterBalancedSample(spark: SparkSession, dir: String): String =
    raw"""SELECT cell, vec_id, CAST(rk AS BIGINT) AS rank FROM (
  SELECT cell, vec_id,
         row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rk
  FROM (${clusterAssignSql(spark, dir)}) a) r
WHERE rk <= 10"""

  /** Cluster-topics twin: the assignment subquery joined to documents
    * (doc_id = vec_id), then the SAME two-step bounded-integer rate
    * arithmetic as the engine (ppb rates, then permille lift). */
  def clusterTopics(spark: SparkSession, dir: String): String =
    raw"""WITH assign AS (${clusterAssignSql(spark, dir)}),
toks AS (SELECT doc_id,
           unnest(list_filter(
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
             x -> x <> '')) AS token
         FROM documents),
j AS (SELECT a.cell, t.token FROM toks t JOIN assign a ON t.doc_id = a.vec_id),
ct AS (SELECT cell, token, count(*) AS n FROM j GROUP BY 1, 2),
celltot AS (SELECT cell, CAST(sum(n) AS BIGINT) AS ctot FROM ct GROUP BY 1),
corp AS (SELECT token, CAST(sum(n) AS BIGINT) AS cn FROM ct GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM ct),
r AS (SELECT cell, token, n,
        n * 1000000000 // ctot AS rc,
        cn * 1000000000 // t AS rt
      FROM ct JOIN celltot USING (cell) JOIN corp USING (token), tot)
SELECT cell, token, n, CAST(rc * 1000 // rt AS BIGINT) AS lift_permille
FROM r
WHERE rt > 0 AND n >= 3 AND rc * 1000 // rt >= 1200"""

  /** SimHash near-dup twin. The "hash-seed-dependent" barrier
    * dissolves the same way the tokenizer merge tables did: the
    * per-token xxh64 values are MODEL-SIZED DATA (the corpus
    * vocabulary — 31 tokens in the driver-generated sets), so the
    * oracle ships (token → hash) as literals and DuckDB re-derives
    * everything downstream independently: per-bit ±1 majority votes
    * over ALL token occurrences (not distinct), packed sign bits
    * (DuckDB `>>` is logical like Java's `>>>`; bit 63 lands as
    * BIGINT-min), pairwise XOR popcount ≤ maxHamming over the planted
    * corpus. The blocking join the engine runs is exact (pigeonhole:
    * any pair within budget shares a whole block), so the quadratic
    * SQL twin produces the identical pair set.
    */
  def dedupSimhash(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.functions.{col, explode, split}
    val corpus = SparkEntry.plantedDocs(Tables(spark, dir))
    val toks = corpus
      .select(explode(split(
        graft.operators.TextAnalysis.normalizeText(col("text")), " ")).as("tok"))
      .distinct().collect().map(_.getString(0)).sorted
    require(toks.length <= 4096,
      s"simhash oracle vocabulary too large to embed: ${toks.length}")
    def longLit(h: Long): String =
      if (h == Long.MinValue) "(-9223372036854775807 - 1)" else h.toString
    val values = toks.map { t =>
      val h = graft.functions.HashSketches.tokenHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      s"(${lit(t)}, CAST(${longLit(h)} AS BIGINT))"
    }.mkString(",\n    ")
    val sigBits = (0 until 64).map { b =>
      val pow = if (b == 63) "(-9223372036854775807 - 1)"
                else s"CAST(${1L << b} AS BIGINT)"
      s"(CASE WHEN sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0" +
        s" THEN $pow ELSE 0 END)"
    }.mkString("\n    + ")
    raw"""WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' appended' FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 11 = 0),
vocab(tok, h) AS (VALUES
    $values),
toks AS (
  SELECT doc_id,
         unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
  FROM corpus),
sig AS (
  SELECT doc_id,
    $sigBits AS sig
  FROM toks JOIN vocab USING (tok) GROUP BY doc_id)
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3"""
  }

  /** Logistic-regression scoring twin. The TRAINED weights come from
    * [[SparkEntry.qualityModel]]'s per-(session, dir) cache — the
    * exact model the verified key scored with (a second fit could
    * differ in the low bits of the gradient averages' merge order) —
    * embedded as shortest-round-trip double literals. DuckDB
    * re-derives the features from raw documents (the already-verified
    * repetition_stats constructions, UNROUNDED as the margin consumes
    * them) and the margin in the same left-associated IEEE order.
    * Residual cross-engine risk: ln/exp are libm calls, so a score
    * landing within ~1 ulp of a 6-dp rounding boundary could flip —
    * measured zero occurrences over sf0.001/0.01/0.1.
    */
  def qualityClassifier(spark: SparkSession, dir: String): String = {
    val m = SparkEntry.qualityModel(spark, dir)
    val Seq(wA, wD, wT, wL) = m.weights.toSeq
    raw"""WITH toks AS (
  SELECT doc_id, coalesce(text, '') AS t,
         string_split(coalesce(text, ''), ' ') AS ts
  FROM documents),
bi AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
  FROM toks, UNNEST(generate_series(1, len(ts)-1)) AS u(i)),
bic AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g),
bistat AS (
  SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_bigram_frac
  FROM bic GROUP BY doc_id),
feat AS (
  SELECT t.doc_id,
    CASE WHEN len(t.t) > 0
         THEN len(regexp_replace(t.t, '[^A-Za-z]', '', 'g'))::DOUBLE / len(t.t)
         ELSE 0.0 END AS alpha_ratio,
    len(list_distinct(t.ts))::DOUBLE / len(t.ts) AS distinct_token_ratio,
    coalesce(b.top_bigram_frac, 0.0) AS top_bigram_frac,
    ln(len(t.t)::DOUBLE + 1.0) / 10.0 AS log_len
  FROM toks t LEFT JOIN bistat b USING (doc_id)),
mg AS (
  SELECT doc_id,
         alpha_ratio*(${dbl(wA)}) + distinct_token_ratio*(${dbl(wD)})
           + top_bigram_frac*(${dbl(wT)}) + log_len*(${dbl(wL)})
           + (${dbl(m.bias)}) AS margin
  FROM feat)
SELECT doc_id, round(1.0/(1.0 + exp(-margin)), 6) AS quality_score,
       round(1.0/(1.0 + exp(-margin)), 6) >= 0.5 AS keep
FROM mg"""
  }

  def embeddingPca(spark: SparkSession, dir: String): String = {
    val model = Pca.fit(Tables(spark, dir).embeddings, "embedding", k = 8)
    val dim = model.dim
    val cdefs = (0 until dim)
      .map(i => s"(e[${i + 1}] - (${dbl(model.mean(i))})) AS c${i + 1}")
      .mkString(",\n    ")
    val ns = (1 to dim).map(i => s"c$i*c$i").mkString(" + ")
    val pdefs = model.components.zipWithIndex.map { case (row, r) =>
      (0 until dim).map(j => s"c${j + 1}*(${dbl(row(j))})").mkString(" + ") +
        s" AS p${r + 1}"
    }.mkString(",\n    ")
    val projSq = (1 to model.k).map(r => s"p$r*p$r").mkString(" + ")
    val pcSel = (1 to model.k).map(r => s"round(p$r, 6) AS pc$r")
      .mkString(", ")
    raw"""SELECT vec_id, $pcSel,
       round(sqrt(greatest(ns - ($projSq), 0.0)), 6) AS residual
FROM (
  SELECT vec_id,
    $cdefs,
    $ns AS ns,
    $pdefs
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings) b) q"""
  }
}
