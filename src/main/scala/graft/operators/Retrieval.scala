package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text retrieval over the corpus — the search-side counterpart of the
  * E-group's indexing/dedup operators: inline BM25 ranking and a
  * persisted postings index with the same build/extend/compact
  * lifecycle as the dedup, span and IVF-PQ indexes.
  */
object Retrieval {

  /** (doc_id, toks, dl) — tokens (\s+ empty-stripped) and map-side
    * document length, the shared corpus pass.
    */
  private def withDl(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    // r12 NOTE — an eager checkpoint here (to stop the 2-3 consumer
    // branches re-tokenizing) was measured and REVERTED: materializing
    // the token ARRAYS costs more than the repeated in-pipeline splits
    // (bm25_indexed 3.1 → 3.5, rocchio_expand 2.4 → 4.5 full bench —
    // string-array serialization is the §5 "memory pressure caching
    // creates" case). The fanOut exchange below is runtime-reused by
    // every consumer branch; only the post-exchange split repeats.
    Par.fanOut(docs.select(col(idCol).as("doc_id"), col(textCol)),
        col("doc_id"))
      .select(col("doc_id"),
        split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col("doc_id"), col("__toks"),
        size(filter(col("__toks"), w => length(w) > 0)).cast("long").as("dl"))

  /** Explode to (doc_id, dl, term) rows (empties stripped). */
  private def docTerms(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .filter(length(col("term")) > 0)

  /** BM25 scoring core over a (doc_id, dl, term, tf) frame.
    *
    * Cross-engine determinism discipline (the tfidf/perplexity
    * pattern): `ln` runs once per TERM (model-sized) and is quantized
    * to integer micro-units there — the only libm call leaves the plan
    * immediately; every per-(doc, term) factor after that is
    * IEEE-deterministic arithmetic on integer tf/dl and the two fixed
    * constants, the per-term contribution rounds to integer
    * micro-units, and the per-doc score is an exact INTEGER sum (no fp
    * summation-order dependence through the shuffle). df derives from
    * the tf frame itself (no second corpus pass); idf broadcasts; the
    * final top-k is orderBy+limit → TakeOrderedAndProject (per-task
    * heaps, no global sort).
    */
  private def scoreBm25(tf: DataFrame, nDocs: Long, avgdl: Double,
                        k1: Double, b: Double, topK: Int): DataFrame = {
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"),
        round(log(lit(1.0) +
            (lit(nDocs).cast("double") - col("df") + 0.5) / (col("df") + 0.5))
          * 1e6).cast("long").as("idf_micro"))
    tf.join(broadcast(idf), "term")
      .withColumn("c_micro",
        round(col("idf_micro") * (col("tf") * (k1 + 1)) /
              (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
          .cast("long"))
      .groupBy("doc_id").agg(sum(col("c_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(topK)
  }

  /** BM25 ranking of the corpus against a bag of query terms
    * (Robertson/Okapi, Lucene's positive idf variant):
    * score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl)).
    * Document lengths are map-side (`size(filter(split))`); only
    * query-matching tokens enter the tf aggregation.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val d = withDl(docs, idCol, textCol)
    val stats = d.agg(count(lit(1)).as("n"), sum(col("dl")).as("len")).head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / nDocs
    val tf = docTerms(d)
      .join(broadcast(queryTerms.toDF("term")), "term")
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    scoreBm25(tf, nDocs, avgdl, k1, b, topK)
  }

  /** Rocchio pseudo-relevance query expansion (E102 — the classic
    * second half of every retrieval loop: run the query, assume the
    * top `fbDocs` hits are relevant, and mine THEIR vocabulary for
    * the terms the user should have typed — BM25 picks the feedback
    * set, tf·idf over it ranks the candidates). Exact integers end to
    * end: the feedback set is [[bm25]]'s deterministic top-k
    * (score desc, doc_id tiebreak), per-candidate-term `fb_tf` = its
    * occurrence count inside the feedback docs (original query terms
    * excluded — they are already in the query), `df` = corpus
    * document frequency, `idf_micro` = the same quantized-log idf the
    * scorer uses, `weight_micro = fb_tf · idf_micro`, top `expandK`
    * by (weight desc, term).
    *
    * Scale shape: one corpus token pass shared with scoring, the
    * fbDocs-sized id set broadcast back, df as ONE candidate-pruned
    * corpus agg (candidate terms broadcast onto the token frame), and
    * TakeOrderedAndProject for both top-ks. The only driver scalars
    * are the corpus stats pair (the [[bm25]] contract).
    */
  def rocchioExpand(docs: DataFrame, idCol: String, textCol: String,
                    queryTerms: Seq[String], fbDocs: Int = 10,
                    expandK: Int = 10): DataFrame = {
    require(fbDocs >= 1, s"fbDocs must be >= 1, got $fbDocs")
    require(expandK >= 1, s"expandK must be >= 1, got $expandK")
    val spark = docs.sparkSession
    import spark.implicits._
    val d = withDl(docs, idCol, textCol)
    val stats = d.agg(count(lit(1)).as("n"), sum(col("dl")).as("len")).head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / nDocs
    val terms = docTerms(d)
    val tfq = terms
      .join(broadcast(queryTerms.toDF("term")), "term")
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val fbIds = scoreBm25(tfq, nDocs, avgdl, 1.2, 0.75, fbDocs)
      .select("doc_id")
    val fbtf = terms.join(broadcast(fbIds), "doc_id")
      .filter(!col("term").isin(queryTerms: _*))
      .groupBy("term").agg(count(lit(1)).as("fb_tf"))
    val dfreq = terms
      .join(broadcast(fbtf.select("term")), "term")
      .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    fbtf.join(dfreq, "term")
      .withColumn("idf_micro", round(log(lit(1.0) +
          (lit(nDocs).cast("double") - col("df") + 0.5) / (col("df") + 0.5))
        * 1e6).cast("long"))
      .withColumn("weight_micro", col("fb_tf") * col("idf_micro"))
      .orderBy(col("weight_micro").desc, col("term"))
      .limit(expandK)
  }

  /** Build a persisted postings index: (doc_id, dl, term, tf) rows
    * partitioned by `term_pt = pmod(xxhash64(term), termPartitions)` —
    * a query's terms prune to their hash partitions at the FILE level —
    * with dl denormalized in (no doc-length join at query time) and a
    * per-batch stats row (batch fingerprint, n_docs, total_len,
    * term_partitions). Global df and corpus stats are derived AT QUERY
    * TIME (df from the pruned postings, stats by summing batch rows),
    * so unlike the frozen-quantizer IVF-PQ extension, an extended
    * postings index scores EXACTLY like a fresh build over the union.
    */
  def buildPostingsIndex(docs: DataFrame, idCol: String, textCol: String,
                         indexDir: String, termPartitions: Int = 64): Unit =
    writePostings(docs, idCol, textCol, indexDir, termPartitions, "overwrite")

  /** Append a document batch to a persisted postings index — the
    * daily-ingest shape: the existing index is never read or
    * rewritten; batch A then B ≡ A∪B (per-doc rows independent, stats
    * rows sum, df derived at query time). At-least-once replays are
    * tolerated end to end: duplicate postings rows dedupe at query
    * time and at compaction, duplicate stats rows dedupe by batch
    * fingerprint.
    */
  def extendPostingsIndex(newDocs: DataFrame, idCol: String, textCol: String,
                          indexDir: String): Unit = {
    val spark = newDocs.sparkSession
    val parts = spark.read.parquet(s"$indexDir/stats")
      .select(col("term_partitions")).head().getInt(0)
    writePostings(newDocs, idCol, textCol, indexDir, parts, "append")
  }

  private def writePostings(docs: DataFrame, idCol: String, textCol: String,
                            indexDir: String, termPartitions: Int,
                            mode: String): Unit = {
    val d = withDl(docs, idCol, textCol)
    docTerms(d).groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .withColumn("term_pt",
        pmod(xxhash64(col("term")), lit(termPartitions.toLong)).cast("int"))
      // cluster by the write-partition key so each task writes whole
      // term_pt directories (guide §6 small-files; the dedup-index fix)
      .repartition(col("term_pt"))
      .write.mode(mode).partitionBy("term_pt").parquet(s"$indexDir/postings")
    // batch fingerprint: order-independent XOR fold over the doc-id
    // hashes (no overflow under ANSI, unlike a sum), so a replayed
    // batch writes an IDENTICAL row (deduped at read)
    d.agg(expr("bit_xor(xxhash64(doc_id))").as("batch_fp"),
          count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
      .withColumn("term_partitions", lit(termPartitions))
      .coalesce(1).write.mode(mode).parquet(s"$indexDir/stats")
  }

  /** BM25 query against a persisted postings index: the scan prunes to
    * the query terms' hash partitions (file-level partition pruning),
    * corpus stats sum from the (deduped) batch rows, and scoring is
    * [[scoreBm25]] — identical integer scores to inline [[bm25]] over
    * the same documents (spec-asserted).
    */
  def bm25AgainstIndex(spark: SparkSession, indexDir: String,
                       queryTerms: Seq[String], k1: Double = 1.2,
                       b: Double = 0.75, topK: Int = 20): DataFrame = {
    import spark.implicits._
    val stats = spark.read.parquet(s"$indexDir/stats")
      .dropDuplicates("batch_fp")
      .agg(sum(col("n_docs")).as("n"), sum(col("total_len")).as("len"))
      .head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / nDocs
    val parts = spark.read.parquet(s"$indexDir/stats")
      .select(col("term_partitions")).head().getInt(0)
    // the same hash the build wrote, computed through the same
    // expression (one model-sized job)
    val pts = queryTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(parts.toLong)).cast("int"))
      .as[Int].collect().toSeq.distinct
    val tf = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term_pt").isin(pts: _*) &&
              col("term").isin(queryTerms: _*))
      .dropDuplicates("doc_id", "term") // at-least-once replay tolerance
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    scoreBm25(tf, nDocs, avgdl, k1, b, topK)
  }

  /** Bound the small-file growth of repeated [[extendPostingsIndex]]
    * appends: one file per term_pt partition, replay-duplicated
    * postings and stats rows dropped. Query-result identical
    * before/after (the query path already dedupes — spec-asserted).
    * Same write-tmp → delete → rename swap and crash states as the
    * other index compactions; [[recoverPostingsIndex]] runs first.
    */
  def compactPostingsIndex(spark: SparkSession, indexDir: String): Unit = {
    recoverPostingsIndex(spark, indexDir)
    val parts = spark.read.parquet(s"$indexDir/stats")
      .select(col("term_partitions")).head().getInt(0)
    IndexFiles.swapIn(spark, indexDir, "postings") { tmp =>
      spark.read.parquet(s"$indexDir/postings")
        .dropDuplicates("doc_id", "term")
        .repartition(parts, col("term_pt"))
        .write.mode("overwrite").partitionBy("term_pt").parquet(tmp)
    }
    IndexFiles.swapIn(spark, indexDir, "stats") { tmp =>
      spark.read.parquet(s"$indexDir/stats")
        .dropDuplicates("batch_fp")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
    }
  }

  /** Repair an index left mid-swap by a crashed compaction; see
    * [[IndexFiles.recoverTable]]. Idempotent, safe at job startup.
    */
  def recoverPostingsIndex(spark: SparkSession, indexDir: String): Boolean = {
    val a = IndexFiles.recoverTable(spark, indexDir, "postings")
    val b = IndexFiles.recoverTable(spark, indexDir, "stats")
    a || b
  }
}
