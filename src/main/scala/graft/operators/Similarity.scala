package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (`array<float>`).
  *
  * Scale design: cosine math is pure HOF Column expressions (codegen,
  * map-side). Brute-force broadcasts the (small) query set against the
  * vector scan — zero shuffle. The LSH path buckets BOTH sides with
  * deterministic random-hyperplane signatures so the candidate join is
  * co-partitioned on the bucket key; at 100 TB only bucket-mates meet.
  */
/** Test-only witness that [[Similarity.mmrSelect]]'s per-round pool
  * plan stays flat (bounded node count) at any k.
  */
private[graft] object MmrDebug {
  @volatile var maxPoolPlanNodes: Int = 0
}

object Similarity {

  /** Dot product of two numeric arrays (double accumulation) — the
    * HOF formulation, kept for composition; hot paths use the fused
    * native [[graft.functions.CosineSimExpr]] below.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0d), (acc, v) => acc + v)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity as ONE native codegen pass (dot + both norms
    * fused, bit-identical fp order to the HOF formulation). Every
    * candidate-pair scoring below runs through this, so exact-kNN
    * stays usable as a recall oracle at large query sets.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimExpr(a, b)

  /** Deterministic random hyperplanes (splitmix64 stream), generated
    * once driver-side and shipped as a literal — no per-row hashing,
    * no RNG state on executors, identical across runs and engines.
    * Shape: (tables*bits) hyperplanes × dim components in [-1, 1).
    */
  def hyperplanes(dim: Int, tables: Int, bits: Int): Seq[Seq[Double]] = {
    var s = 0x9E3779B97F4A7C15L
    def next(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Seq.fill(tables * bits)(Seq.fill(dim)(next().toDouble / Long.MaxValue))
  }

  /** All (table, bucket) keys for `v` — one per LSH table: `bits`
    * sign-bits of hyperplane dot products packed into a long. The
    * hyperplane matrix rides as a reference object in a native
    * expression ([[graft.functions.LshBucketsExpr]]), so per row this
    * is one (tables*bits × dim) mat-vec in a single static call inside
    * WholeStageCodegen — the corpus-side sketch of [[annLsh]] and
    * [[embeddingNearDup]] never drops to interpreted HOF evaluation.
    */
  def lshBuckets(v: Column, dim: Int, tables: Int, bits: Int): Column =
    graft.functions.LshBucketsExpr(v, hyperplanes(dim, tables, bits),
      tables, bits)

  /** Per-query top-k of a scored candidate frame (`query_id,
    * neighbor_id, cos` with cos ALREADY rounded to 6 decimals) —
    * ordering (cos desc, neighbor_id asc), output carries cos + rank.
    *
    * NOT a `row_number` window: a query-partitioned window sort-shuffles
    * EVERY scored row (the brute-force frame is n·|queries| — at corpus
    * scale that shuffle dwarfs the cosine math itself). Instead one
    * bounded per-group heap ([[graft.functions.GroupedTopKAgg]]): each
    * task keeps k `(−cos·1e6, id)` pairs per query, partials merge
    * associatively, only |queries|·k pairs cross the wire. The
    * 6-decimal cos rides the heap as an exact micro-unit integer — once
    * rounded, cos·1e6 sits within 1e-9 of that integer, and `int/1e6`
    * is the correctly-rounded double of the same decimal, so the
    * reported cos is bit-identical to the window formulation's.
    * (Degenerate zero-norm vectors score NaN; the heap ranks them as
    * cos 0 rather than the window's NaN placement — no caller feeds
    * zero vectors, all corpora here are non-degenerate.)
    */
  private def topKByCos(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.GroupedTopKAgg(
        -round(col("cos") * lit(1e6)).cast("long"),
        col("neighbor_id"), k).as("__t"))
      .select(col("query_id"), posexplode(col("__t")).as(Seq("__pos", "__p")))
      .select(col("query_id"), col("__p.payload").as("neighbor_id"),
              (-col("__p.key") / lit(1e6)).as("cos"),
              (col("__pos") + 1).cast("long").as("rank"))

  /** Top-`n` candidate ids per query by an unrounded double score —
    * the ADC shortlist stage. Same bounded-heap shape as [[topKByCos]];
    * the score rides the heap quantized to NANO units (ties within
    * 1e-9 fall to the id tiebreak — the exact re-rank re-scores every
    * survivor, so quantization never reaches reported values).
    */
  private def topIdsByScore(scored: DataFrame, scoreCol: String,
                            n: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.GroupedTopKAgg(
        -round(col(scoreCol) * lit(1e9)).cast("long"),
        col("neighbor_id"), n).as("__t"))
      .select(col("query_id"), explode(col("__t.payload")).as("neighbor_id"))

  /** Exact top-k cosine neighbors for each query vector (baseline).
    * Queries are broadcast; the corpus is scanned once; per-query top-k
    * is a bounded heap aggregation — the n·|queries| scored rows never
    * shuffle (see [[topKByCos]]).
    */
  def annBruteForce(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame = {
    // corpus side is the compute-dense pass (|queries| cosines per
    // row): fan an under-split scan out first (one pass, no iteration
    // — the Lloyd-trainer caveat of Tables.embeddings does not apply)
    val c = Par.fanOut(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
      col("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              round(cosine(col("__qv"), col("__cv")), 6).as("cos"))
    topKByCos(scored, k)
  }

  /** Embedding-space benchmark decontamination (E53): flag every TRAIN
    * vector whose best cosine match in the EVAL set reaches
    * `threshold` — the semantic complement of the exact/n-gram/bloom/
    * span decontamination family (catches paraphrased or re-tokenized
    * benchmark leakage that token-level matching misses; the SemDeDup/
    * benchmark-decontamination practice for LLM corpora).
    *
    * Scale shape: the eval set is MODEL-sized (benchmarks are
    * thousands of rows) and rides one broadcast; the train corpus
    * streams map-side through the scoring cross product (a deliberate
    * broadcast nested-loop — same device as [[annBruteForce]]) into
    * per-train-id bounded top-1 heaps, so the corpus never shuffles
    * and nothing rides the wire but heap partials. For an eval set too
    * big to broadcast, compose [[annIvf]] with a threshold filter
    * instead.
    *
    * Output: `(train_id, eval_id, cos)` — the best eval match per
    * flagged train vector (cos ≥ threshold), ready for an anti-join
    * against the corpus.
    */
  def semanticDecontaminate(train: DataFrame, eval: DataFrame,
                            idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    val t = Par.fanOut(
      train.select(col(idCol).as("query_id"), col(vecCol).as("__tv")),
      col("query_id"))
    val e = eval.select(col(idCol).as("neighbor_id"), col(vecCol).as("__ev"))
    topKByCos(t.crossJoin(broadcast(e))
        .select(col("query_id"), col("neighbor_id"),
                round(cosine(col("__tv"), col("__ev")), 6).as("cos")), 1)
      .filter(col("cos") >= threshold)
      .select(col("query_id").as("train_id"),
              col("neighbor_id").as("eval_id"), col("cos"))
  }

  /** Exact top-k cosine neighbors via per-partition BLOCKED scoring —
    * the mapPartitions escape hatch, taken deliberately: result- and
    * bit-identical to [[annBruteForce]], but the n·|queries| scored
    * pairs are never materialized as JOIN ROWS. The broadcast join
    * formulation pays per-pair row construction through the
    * BroadcastNestedLoopJoin (measured: that overhead, not the cosine
    * math, dominates the 10k×10k self-kNN); here each partition keeps
    * one bounded (key, id) heap per query and emits only
    * |queries|·k candidates, merged exactly by a final
    * [[graft.functions.GroupedTopKAgg]] pass.
    *
    * Bit-identity discipline: per-pair cosine uses the SAME
    * accumulation order as [[graft.functions.CosineSimExpr]] (dot,
    * then norms, `dot/(√na·√nb)`; norms are pure per-vector functions
    * so hoisting them is exact), and the 6-decimal rounding replicates
    * Spark's `round(_, 6)` double path
    * (`BigDecimal.valueOf(x).setScale(6, HALF_UP)`). The heap key is
    * the [[topKByCos]] micro-unit integer, so the merged output is
    * row-identical to the join formulation (spec-asserted).
    *
    * Contract: the query set is model-sized (collected + broadcast —
    * the same assumption [[annBruteForce]]'s `broadcast(q)` makes);
    * batch corpus-sized query sets through the ANN paths instead.
    *
    * Broadcast lifetime: the query broadcast rides inside the returned
    * (lazy) frame's closure, so it cannot be destroyed here — it is
    * reclaimed by Spark's ContextCleaner once the caller drops the
    * frame (same lifetime as any broadcast-join hash relation). Long-
    * lived sessions issuing many query batches should not retain the
    * result frames beyond consumption.
    */
  def annBruteForceBlocked(corpus: DataFrame, queries: DataFrame,
                           idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect()
    val qIds = q.map(_._1)
    val qVecs = q.map(_._2)
    val qNorms = qVecs.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { val x = v(i).toDouble; s += x * x; i += 1 }
      math.sqrt(s)
    }
    val bQ = spark.sparkContext.broadcast((qIds, qVecs, qNorms))
    val partials = Par.fanOut(
        corpus.select(col(idCol).cast("long"), col(vecCol)), col(idCol))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val (ids, vecs, norms) = bQ.value
        val nq = ids.length
        val heaps = Array.fill(nq)(new java.util.TreeSet[Array[Long]](
          graft.functions.GroupedTopKAgg.PairOrder))
        rows.foreach { case (cid, cv) =>
          var nb = 0.0
          var i = 0
          while (i < cv.length) { val y = cv(i).toDouble; nb += y * y; i += 1 }
          val nbs = math.sqrt(nb)
          var qi = 0
          while (qi < nq) {
            if (ids(qi) != cid) {
              val qv = vecs(qi)
              val n = math.min(qv.length, cv.length)
              var dot = 0.0
              i = 0
              while (i < n) { dot += qv(i).toDouble * cv(i).toDouble; i += 1 }
              val cos = dot / (norms(qi) * nbs)
              // Spark round(_, 6) double path, then the exact micro key
              val r6 = java.math.BigDecimal.valueOf(cos)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
              graft.functions.GroupedTopKAgg.add(
                heaps(qi), Array(-Math.round(r6 * 1e6), cid), k)
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          val it = h.iterator()
          new Iterator[(Long, Long, Long)] {
            def hasNext = it.hasNext
            def next() = { val p = it.next(); (ids(qi), p(1), p(0)) }
          }
        }
      }
      .toDF("query_id", "neighbor_id", "__key")
    partials.groupBy("query_id")
      .agg(graft.functions.GroupedTopKAgg(
        col("__key"), col("neighbor_id"), k).as("__t"))
      .select(col("query_id"), posexplode(col("__t")).as(Seq("__pos", "__p")))
      .select(col("query_id"), col("__p.payload").as("neighbor_id"),
              (-col("__p.key") / lit(1e6)).as("cos"),
              (col("__pos") + 1).cast("long").as("rank"))
  }

  /** Maximal Marginal Relevance (MMR) greedy diversity selection —
    * the eval-set / few-shot-pool builder: pick `k` vectors maximizing
    * `rel − λ·max_sim_to_already_selected`, so the result is relevant
    * to the query but not redundant (plain top-k returns k near-copies
    * of the best hit).
    *
    * Integer discipline: relevance and penalties are `round(1e6·cos)`
    * micro-units, λ a permille, the penalty term
    * `(λ·pen) div 1000` — every comparison is exact integer
    * arithmetic with id tie-break, so the greedy trajectory is
    * bit-identical cross-engine and the DuckDB oracle UNROLLS the same
    * k steps in SQL.
    *
    * Shape: greedy selection is inherently sequential — up to k driver
    * rounds, each ONE map-side scan of the pool with a
    * TakeOrderedAndProject top-1; nothing corpus-sized ever reaches
    * the driver. The pool carries a RUNNING `__pen` column (max
    * cosine-micro to any already-selected vector, clamped at 0), so
    * each round adds exactly ONE filter + ONE `greatest` over the
    * previous pool — never k stacked cosine columns or an O(k)
    * `isin` literal — and the round's frame is localCheckpoint-
    * truncated, keeping the plan FLAT at any k (superseded pool RDDs
    * become unreferenced and the ContextCleaner reclaims their
    * blocks). At 100 TB run it over an ANN candidate pool
    * ([[annIvf]]/[[annLsh]] output), not the raw corpus — the scan is
    * then pool-sized.
    *
    * If the pool holds fewer than k vectors the result simply has
    * fewer rows (selection stops when the pool is exhausted).
    */
  def mmrSelect(corpus: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int, lambdaPermille: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val qv = corpus.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<float>")).as[Array[Float]].head()
    var pool = corpus.filter(col(idCol) =!= queryId)
      .select(col(idCol).cast("long").as("vec_id"),
              col(vecCol).cast("array<float>").as("__v"))
      .withColumn("rel",
        round(cosine(col("__v"), typedLit(qv.toSeq)) * 1e6).cast("long"))
      .withColumn("__pen", lit(0L))
      .localCheckpoint()
    var selected = List.empty[(Long, Long)] // id, score
    var exhausted = false
    while (selected.size < k && !exhausted) {
      // __pen starts at 0 and only grows via greatest, so the `div
      // 1000` operand stays non-negative, where truncating division
      // agrees across engines (the link_rank discipline) — identical
      // to the unrolled max(0, cos-terms...) formulation
      val top = pool
        .withColumn("score",
          expr(s"rel - ($lambdaPermille * __pen) div 1000"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(1)
        .select(col("vec_id"), col("__v"), col("score"))
        .as[(Long, Array[Float], Long)].take(1)
      if (top.isEmpty) exhausted = true
      else {
        val (id, v, score) = top(0)
        selected = selected :+ ((id, score))
        if (selected.size < k) {
          val next = pool.filter(col("vec_id") =!= id)
            .withColumn("__pen",
              greatest(col("__pen"),
                round(cosine(col("__v"), typedLit(v.toSeq)) * 1e6)
                  .cast("long")))
          // flat-plan witness for the spec: the pre-checkpoint frame is
          // always (project ∘ filter ∘ LogicalRDD) — NEVER k-deep
          MmrDebug.maxPoolPlanNodes = math.max(MmrDebug.maxPoolPlanNodes,
            next.queryExecution.analyzed.collect { case p => p }.size)
          pool = next.localCheckpoint()
        }
      }
    }
    selected.zipWithIndex.map { case ((id, score), i) =>
      ((i + 1).toLong, id, score)
    }.toDF("rank", "vec_id", "score_micro")
  }

  /** Hard-negative mining for contrastive training: per query, the
    * top-k most-similar corpus vectors carrying a DIFFERENT label —
    * near-misses the loss learns the most from (easy negatives are
    * already far; same-label hits are positives, not negatives).
    *
    * Exact by construction (the label filter rides the broadcast join
    * condition, so pruning happens before scoring). For corpora where
    * the brute-force scan is too hot, the same label-mismatch predicate
    * drops into any of the ANN candidate joins ([[annLsh]]/[[annIvf]])
    * unchanged — the per-query window is identical.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
                          col(labelCol).as("__cl"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
                           col(labelCol).as("__ql"))
    val scored = c.join(broadcast(q), col("__ql") =!= col("__cl"))
      .select(col("query_id"), col("neighbor_id"),
              round(cosine(col("__qv"), col("__cv")), 6).as("cos"))
    topKByCos(scored, k)
  }

  /** Ranking-quality metrics (E72) — MRR and binary NDCG@k of an
    * approximate ranking against the exact top-k truth, completing
    * the retrieval-eval family next to `recallAtK`: recall says HOW
    * MANY truth items surfaced, these say WHERE (early hits matter).
    * Zero floats at runtime: the DCG discounts are the PRE-ROUNDED
    * integer constants `round(1e6/log2(r+1))` embedded identically in
    * both engines, per-query `mrr_permille = 1000 div first_rel_rank`
    * and `ndcg_permille = dcg·1000 div idcg` (idcg truncated to the
    * query's truth-list size), and the corpus-level row is the
    * truncating integer mean over ALL truth queries — a query the
    * ranking missed entirely contributes zeros, not absence.
    * Scale shape: one (query, neighbor) equi-join of two k·|queries|
    * frames + two query-keyed aggregations; nothing corpus-sized.
    */
  def rankMetrics(truth: DataFrame, ranking: DataFrame,
                  k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    // round(1e6 / log2(r+1)) — derived once, embedded as literals
    val w: Map[Int, Long] = (1 to k).map(r =>
      r -> math.round(1e6 / (math.log(r + 1) / math.log(2)))).toMap
    val wExpr = (1 to k).foldLeft(lit(0L): Column) { (acc, r) =>
      when(col("rank") === r, lit(w(r))).otherwise(acc) }
    val t = truth.select(col("query_id"), col("neighbor_id"),
      col("rank").as("__trank"))
    val truthN = t.groupBy("query_id")
      .agg(count(lit(1)).cast("int").as("__tn"))
    val idcgExpr = (1 to k).foldLeft(lit(0L): Column) { (acc, n) =>
      when(col("__tn") === n, lit((1 to n).map(w).sum)).otherwise(acc) }
    val rel = ranking.select(col("query_id"), col("neighbor_id"),
        col("rank"))
      .join(t.drop("__trank"), Seq("query_id", "neighbor_id"), "left_semi")
    val perQuery = rel.groupBy("query_id")
      .agg(min("rank").as("__first"), sum(wExpr).as("__dcg"))
    truthN.join(perQuery, Seq("query_id"), "left")
      .na.fill(0L, Seq("__dcg"))
      .withColumn("__mrr",
        when(col("__first").isNull, lit(0L))
          .otherwise(expr("1000L div __first")))
      .withColumn("__idcg", idcgExpr)
      .withColumn("__ndcgp", expr("(__dcg * 1000L) div __idcg"))
      .agg(count(lit(1)).as("n_queries"),
           expr("sum(__mrr) div count(1)").as("mrr_permille"),
           expr("sum(__ndcgp) div count(1)").as("ndcg_permille"))
  }

  /** Reciprocal-rank fusion (E75, Cormack et al. 2009 — the standard
    * hybrid-retrieval combiner): fuse any number of per-query rankings
    * (lexical BM25, dense cosine, a prefix-truncated cheap pass, …)
    * into one list by `Σ_lists 1e6 div (kConst + rank)` — rank-based,
    * so incomparable scores (BM25 log-units vs cosine) never need
    * calibration, and a document missing from a list contributes 0.
    * `kConst` (classically 60) damps the head so one list's rank-1
    * cannot dictate the fusion alone.
    *
    * Integer discipline: contributions are truncating `div` on exact
    * longs, the fused score stays in integer micro-units end-to-end —
    * bit-identical cross-engine. Ties break by neighbor id.
    *
    * Scale shape: inputs are k-bounded per query (k·|queries| rows
    * each — already heap-reduced by whatever retriever made them), so
    * everything here is query-frame-sized: one (query, neighbor)
    * hash aggregation (map-side combined) and one bounded
    * [[graft.functions.GroupedTopKAgg]] heap per query. Nothing
    * corpus-sized shuffles, no windows.
    */
  def rrfFuse(rankings: Seq[DataFrame], kConst: Long,
              topK: Int): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(kConst >= 0 && topK >= 1,
      s"need kConst >= 0 and topK >= 1, got ($kConst, $topK)")
    val contrib = rankings.map(_.select(col("query_id"),
        col("neighbor_id"),
        expr(s"1000000L div (${kConst}L + rank)").as("__c")))
      .reduce(_.unionByName(_))
    contrib.groupBy("query_id", "neighbor_id")
      .agg(sum("__c").cast("long").as("__s"))
      .groupBy("query_id")
      .agg(graft.functions.GroupedTopKAgg(
        -col("__s"), col("neighbor_id"), topK).as("__t"))
      .select(col("query_id"), posexplode(col("__t")).as(Seq("__pos", "__p")))
      .select(col("query_id"), col("__p.payload").as("neighbor_id"),
              (-col("__p.key")).as("rrf_micro"),
              (col("__pos") + 1).cast("long").as("rank"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019 — the
    * CCMatrix/LASER parallel-corpus construction step): for each
    * source vector, its best target match scored by the RATIO margin
    * `cos(x,y) / (Σ_{z∈NNk(x)} cos(x,z)/2k + Σ_{z∈NNk(y)} cos(y,z)/2k)`
    * — raw cosine over-fires on "hub" sentences that are everyone's
    * neighbor; dividing by both sides' average-kNN similarity keeps
    * only pairs that are MUTUALLY exceptional. Pairs whose margin
    * clears `minMarginPermille` survive.
    *
    * Integer discipline: cosines ride as the [[annBruteForce]]
    * micro-units, the margin is `(cos_micro · 2k · 1000) div
    * (Σ_src + Σ_tgt)` — exact integer arithmetic on non-negative
    * operands (negative-cosine candidates and non-positive
    * denominators are dropped up front, so truncating division agrees
    * cross-engine), tie-break by target id.
    *
    * Scale shape: two exact kNN passes ([[annBruteForce]] bounded
    * heaps — the n² FLOPs never materialize as rows), two k-bounded
    * per-id sum aggregations, one candidate join, one per-source
    * top-1 window over k rows. At 100 TB swap both kNN passes for
    * [[annIvf]]/[[annLsh]] under the [[mutualKnn]] composition
    * contract — margins then fold in the index's own recall loss.
    */
  def bitextMine(src: DataFrame, tgt: DataFrame, idCol: String,
                 vecCol: String, k: Int,
                 minMarginPermille: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val micro = (c: Column) => round(c * lit(1e6)).cast("long")
    val fwd = annBruteForce(tgt, src, idCol, vecCol, k)
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
              micro(col("cos")).as("__cm"))
    val bwd = annBruteForce(src, tgt, idCol, vecCol, k)
      .select(col("query_id").as("tgt_id"), micro(col("cos")).as("__cm"))
    bitextBest(fwd, bwd, k)
      .filter(col("margin_permille") >= minMarginPermille)
      .select(col("src_id"), col("tgt_id"),
              (col("__cm") / lit(1e6)).as("cos"), col("margin_permille"))
  }

  /** Shared margin scoring over ANY pair of neighbor LISTS (the
    * composition seam that lets [[bitextMine]]'s exact heaps and
    * [[bitextMineAnn]]'s IVF lists feed identical downstream math):
    * `fwd` is (src_id, tgt_id, __cm) — each source's k candidate
    * targets with micro-cosine; `bwd` is (tgt_id, __cm) — each
    * target's k neighbor cosines on the source side. Returns the
    * best-margin pair per source (`src_id, tgt_id, __cm,
    * margin_permille`), ties broken by tgt_id.
    */
  private def bitextBest(fwd: DataFrame, bwd: DataFrame,
                         k: Int): DataFrame = {
    val sumS = fwd.groupBy("src_id").agg(sum("__cm").as("__sum_s"))
    val sumT = bwd.groupBy("tgt_id").agg(sum("__cm").as("__sum_t"))
    val scored = fwd.join(sumS, "src_id").join(sumT, "tgt_id")
      .filter(col("__cm") >= 0 && col("__sum_s") + col("__sum_t") > 0)
      .withColumn("margin_permille",
        expr(s"(__cm * ${2 * k * 1000}L) div (__sum_s + __sum_t)"))
    val w = Window.partitionBy("src_id")
      .orderBy(col("margin_permille").desc, col("tgt_id"))
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("src_id"), col("tgt_id"), col("__cm"),
              col("margin_permille"))
  }

  /** The 100 TB bitext miner made EXECUTABLE (the [[mutualKnn]] /
    * `mutual_knn_ann` precedent): both kNN passes ride [[annIvf]]
    * cell-probe candidate lists instead of exact heaps — n^1.5
    * candidate volume with √n-scaled `nlist` — and the mining
    * threshold is CORPUS-CALIBRATED instead of fixed: a fixed permille
    * cut mines nothing when corpus density rises (every kNN sum grows
    * — the r6 sf1 rehearsal measured exactly that: 0 rows mined at
    * 10×), so the threshold is set from the margin distribution
    * itself. `ratePermille` is the target mining rate over best-pairs
    * (CCMatrix practice: pick the margin cut that yields the wanted
    * parallel-corpus size): the threshold is the LARGEST margin value
    * `t` with `count(margin ≥ t) ≥ max(1, n_best·rate div 1000)` —
    * exact integer rule over the margin DISTRIBUTION table (margin
    * cardinality is permille-bounded, so the one-task cumulative
    * window never sees corpus-sized data; ties at the threshold are
    * included, stated).
    *
    * Margin quality folds in the index's recall loss (the mutual_knn
    * composition contract); BitextAnnSpec pins full-probe ≡ exact and
    * a partial-probe recall floor on planted pairs. A source whose
    * probed cells hold fewer than `k` candidates gets a short kNN sum
    * (margin biased up — same n < k edge the exact miner has;
    * calibration is within-corpus, stated).
    */
  def bitextMineAnn(src: DataFrame, tgt: DataFrame, idCol: String,
                    vecCol: String, k: Int, ratePermille: Long,
                    nprobe: Int = 4, lloydIters: Int = 2,
                    srcN: Long = -1L, tgtN: Long = -1L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(ratePermille >= 1 && ratePermille <= 1000,
      s"ratePermille must be in [1,1000], got $ratePermille")
    // nlist sizing needs each side's cardinality; the default counts
    // here (cheap column-pruned scans), but a caller invoking the
    // miner in a loop — or one that already materialized the sides —
    // can pass `srcN`/`tgtN` and this constructor runs ZERO jobs of
    // its own (annIvf's Lloyd fit still executes, as any ML fit does).
    // Exact counts are NOT required: nlist moves by its √n rule, so a
    // same-order approximation yields the same index geometry.
    val micro = (c: Column) => round(c * lit(1e6)).cast("long")
    val nSrc = if (srcN > 0) srcN else src.count()
    val nTgt = if (tgtN > 0) tgtN else tgt.count()
    val fwd = annIvf(tgt, src, idCol, vecCol, k,
        nlist = ivfNlistFor(nTgt), nprobe = nprobe,
        lloydIters = lloydIters)
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
              micro(col("cos")).as("__cm"))
    val bwd = annIvf(src, tgt, idCol, vecCol, k,
        nlist = ivfNlistFor(nSrc), nprobe = nprobe,
        lloydIters = lloydIters)
      .select(col("query_id").as("tgt_id"), micro(col("cos")).as("__cm"))
    bitextCalibrated(fwd, bwd, k, ratePermille)
  }

  /** Calibrated mining over prebuilt lists — see [[bitextMineAnn]];
    * exposed at list granularity so Verify's dynamic oracle can replay
    * the identical downstream math over the embedded lists.
    */
  private[graft] def bitextCalibrated(fwd: DataFrame, bwd: DataFrame,
                                      k: Int,
                                      ratePermille: Long): DataFrame = {
    val best = bitextBest(fwd, bwd, k)
    val dist = best.groupBy("margin_permille").agg(count(lit(1)).as("__c"))
    // cum count of best-pairs at or above each margin value WITHOUT a
    // partition-less window (the single-partition killer the plan
    // gate bans): a broadcast triangular self-join of the margin
    // DISTRIBUTION table — cardinality is permille-bounded, so the
    // pair frame is distribution², never corpus-sized
    val cge = dist.select(col("margin_permille").as("__m"))
      .join(broadcast(dist.select(col("margin_permille").as("__m2"),
          col("__c"))),
        col("__m2") >= col("__m"))
      .groupBy("__m").agg(sum("__c").as("__cge"))
    val tot = dist.agg(sum("__c").as("__n"))
    val thr = cge.crossJoin(broadcast(tot))
      .agg(max(when(col("__cge") >= greatest(lit(1L),
          expr(s"__n * ${ratePermille}L div 1000")), col("__m")))
        .as("__thr"))
    best.crossJoin(broadcast(thr))
      .filter(col("margin_permille") >= col("__thr"))
      .select(col("src_id"), col("tgt_id"),
              (col("__cm") / lit(1e6)).as("cos"), col("margin_permille"))
  }

  /** Approximate top-k via random-hyperplane LSH: both sides bucketed,
    * equal-bucket join on any of `tables` signatures → candidates →
    * exact cosine → per-query top-k. The scale path: the corpus scan
    * shuffles once on the bucket key instead of meeting every query.
    *
    * Parameter scaling (the [[ivfNlistFor]] lesson applies here too):
    * candidates per query ≈ tables · n / 2^bits, so a FIXED `bits`
    * degrades to linear-per-query as the corpus grows — grow `bits`
    * like ⌈log2(n / targetBucketSize)⌉ to hold per-bucket occupancy
    * constant, and raise `tables` to buy back the recall each added
    * bit costs (measured sweep in graft.Debug r4: 16×6 → 0.53,
    * 32×6 → 0.75 recall@10 on the sf corpus).
    */
  def annLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, dim: Int, k: Int,
             tables: Int = 8, bits: Int = 8): DataFrame = {
    val c = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
              posexplode(lshBuckets(col(vecCol), dim, tables, bits)).as(Seq("t", "bucket")))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
              posexplode(lshBuckets(col(vecCol), dim, tables, bits)).as(Seq("t", "bucket")))
    val candidates = c.join(q.withColumnRenamed("t", "qt").withColumnRenamed("bucket", "qbucket"),
        col("t") === col("qt") && col("bucket") === col("qbucket") &&
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("__qv"), col("__cv"))
      .dropDuplicates("query_id", "neighbor_id")
    topKByCos(candidates
      .select(col("query_id"), col("neighbor_id"),
              round(cosine(col("__qv"), col("__cv")), 6).as("cos")), k)
  }

  /** Deterministic seed centroids: first `nlist` corpus vectors by id —
    * a model-sized driver collect, like any ML fit.
    */
  def seedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                    nlist: Int): Seq[Seq[Double]] =
    corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq

  /** Trained coarse quantizer: deterministic spherical-Lloyd
    * iterations, each one distributed — assign every vector to its
    * nearest cell (native codegen quantizer expression), then update
    * each centroid to the component-wise mean of its members via `dim`
    * map-side partial AVG aggregates (one tiny shuffle of
    * nlist×dim partial sums per iteration; the only driver data is the
    * nlist×dim centroid matrix itself). Components round to 6 places
    * each iteration so float summation order can never make two runs
    * (or two cluster layouts) diverge; empty cells keep their previous
    * centroid. Cosine metric throughout — the quantizer normalizes
    * centroids, so the mean update is spherical k-means.
    */
  def trainCentroidsLloyd(corpus: DataFrame, idCol: String, vecCol: String,
                          nlist: Int, iters: Int = 3): Seq[Seq[Double]] = {
    val v = col(vecCol).cast("array<double>")
    var centroids = seedCentroids(corpus, idCol, vecCol, nlist)
    val dim = centroids.head.size
    // the training loop re-executes the corpus subtree once per
    // iteration around a driver collect — persist the narrow vector
    // projection once (the standard k-means discipline; guide §5:
    // reuse + expensive lineage). Driver-coordinated loop = a sound
    // unpersist point, unlike the lazily-returned operators.
    val train = corpus.select(v.as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try for (_ <- 1 to iters) {
      val assigned = train.select(col("__v"),
        element_at(graft.functions.NearestCells(col("__v"), centroids, 1), 1)
          .as("cell"))
      val meanCols = (0 until dim).map(i => avg(col("__v")(i)).as(s"c$i"))
      val means = assigned.groupBy(col("cell"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (0 until dim).map(i =>
          BigDecimal(r.getDouble(i + 1))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toSeq)
        .toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
    } finally train.unpersist(blocking = false)
    centroids
  }

  /** IVF (inverted-file) ANN — the other scale path: a coarse
    * quantizer assigns every corpus vector to one of `nlist` cells;
    * queries probe their `nprobe` nearest cells and rank only those
    * candidates. The cell join is co-partitioned on the cell id, so at
    * 100 TB each query meets ~nprobe/nlist of the corpus instead of
    * all of it.
    *
    * `lloydIters` = 0 uses the seed-sampled quantizer; > 0 runs that
    * many trained (spherical-Lloyd) refinement passes — better-balanced
    * cells, higher recall at the same nprobe.
    */
  def annIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, nlist: Int = 32,
             nprobe: Int = 4, lloydIters: Int = 0): DataFrame = {
    val centroids =
      if (lloydIters > 0)
        trainCentroidsLloyd(corpus, idCol, vecCol, nlist, lloydIters)
      else seedCentroids(corpus, idCol, vecCol, nlist)
    // native one-pass quantizer (graft.functions.NearestCellsExpr):
    // the centroid mat-vec runs inside codegen, not as per-centroid
    // interpreted HOF cosines
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      element_at(graft.functions.NearestCells(col(vecCol), centroids, 1), 1)
        .as("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      explode(graft.functions.NearestCells(col(vecCol), centroids, nprobe))
        .as("cell"))
    // no dedup needed (unlike LSH multi-table): a corpus vector lives
    // in exactly ONE cell and the probed cells are distinct, so a
    // (query, neighbor) pair can meet at most once — a dropDuplicates
    // here would full-shuffle the candidate frame for nothing
    // (measured at the 22k-vector self-join: its removal plus √n-scaled
    // nlist took the composed mutual-kNN from 316s to the n^1.5 path)
    topKByCos(c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              round(cosine(col("__qv"), col("__cv")), 6).as("cos")), k)
  }

  /** IVF list count that keeps the candidate volume on the n^1.5 path:
    * cells of ~√n vectors, so each query scores nprobe·√n candidates
    * instead of the nprobe·n/nlist blowup a FIXED nlist degrades to as
    * the corpus grows (nlist=32 at 22k vectors means 690-vector cells —
    * quadratic in disguise; the sf1 rehearsal measured exactly that).
    */
  def ivfNlistFor(n: Long, floor: Int = 32): Int =
    math.max(floor, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Build and persist an IVF index: train the coarse quantizer, then
    * write (a) the nlist×dim centroid matrix and (b) every corpus
    * vector's cell assignment as parquet under `indexDir`. Repeated
    * query batches through [[annIvfIndexed]] then skip both the Lloyd
    * training passes and the full-corpus re-assignment scan — the
    * dominant cost of [[annIvf]] — paying only the nprobe-cell
    * candidate join. The assignment table is written partitioned by
    * cell, so the query-side join prunes to the probed cells at the
    * file level (partition pruning, no corpus scan at all).
    */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    indexDir: String, nlist: Int = 32,
                    lloydIters: Int = 3): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids =
      if (lloydIters > 0)
        trainCentroidsLloyd(corpus, idCol, vecCol, nlist, lloydIters)
      else seedCentroids(corpus, idCol, vecCol, nlist)
    centroids.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"),
        element_at(graft.functions.NearestCells(col(vecCol), centroids, 1), 1)
          .as("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/cells")
  }

  /** ANN query against a persisted IVF index (see [[buildIvfIndex]]).
    * Loads the model-sized centroid matrix to the driver, probes each
    * query's `nprobe` nearest cells, and joins only those partitions of
    * the assignment table — identical results to [[annIvf]] with the
    * same quantizer, without re-training or re-assigning the corpus.
    */
  def annIvfIndexed(queries: DataFrame, indexDir: String, idCol: String,
                    vecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    val centroids = spark.read.parquet(s"$indexDir/centroids")
      .orderBy(col("cell")).collect()
      .map(r => r.getSeq[Double](1).toSeq).toSeq
    val c = spark.read.parquet(s"$indexDir/cells")
      .select(col("neighbor_id"), col("vec").as("__cv"),
              col("cell").cast("int").as("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      explode(graft.functions.NearestCells(col(vecCol), centroids, nprobe))
        .as("cell"))
    // single-cell assignment + distinct probes ⇒ pairs already unique
    // (see annIvf) — no dedup shuffle
    topKByCos(c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
              round(cosine(col("__qv"), col("__cv")), 6).as("cos")), k)
  }

  /** SemDeDup-style semantic deduplication: embedding cosine near-dup
    * pairs ([[embeddingNearDup]]) → connected components
    * ([[Dedup.connectedComponents]]) → min-id canonical per cluster.
    * Emits (vec_id, keep_id) for every vector that belongs to a
    * semantic-duplicate cluster; keep the rows where
    * `vec_id = keep_id` (plus all unlisted vectors) for the deduped
    * corpus. Same scale shape as its parts: one LSH bucket shuffle +
    * O(log n) pointer-jumping rounds on the (small) duplicate graph.
    */
  def semanticDedup(vectors: DataFrame, idCol: String, vecCol: String,
                    dim: Int, threshold: Double,
                    tables: Int = 6, bits: Int = 10): DataFrame =
    Dedup.connectedComponents(
        embeddingNearDup(vectors, idCol, vecCol, dim, threshold, tables, bits))
      .select(col("doc_id").as("vec_id"), col("keep_id"))

  /** Mean recall@k of an approximate ANN result against exact ground
    * truth (both in the (query_id, neighbor_id, …) shape the ANN
    * operators emit): per query, |approx ∩ exact| / |exact|, averaged
    * over queries. Queries absent from `approx` entirely count as
    * recall 0 — an index that drops a query must not inflate the mean.
    * One semi-join + two aggregates; the scalar result is model-sized.
    */
  /** Matryoshka (MRL) truncation sweep: for each prefix dimensionality
    * in `dims`, the top-k recall of TRUNCATED-vector cosine search
    * against the full-dimension exact graph — the evaluation that
    * decides how far an MRL-trained embedding column can be cut for
    * cheap first-stage retrieval before reranking at full width.
    *
    * One row per tested width: `(dims, hits, n_exact,
    * recall_permille)`, integer permille over the POOLED top-k pair
    * sets (micro-averaged). Both sides score with the same rounded
    * cosine + id tie rule as [[annBruteForce]], so the pair sets are
    * deterministic and the oracle re-derives them exactly.
    *
    * Scale shape: each width is one [[annBruteForce]] pass (corpus
    * map-side against broadcast queries into bounded heaps) plus a
    * pair-keyed semi-join of two k·|queries|-sized frames; |dims|+1
    * corpus scans total. At 100 TB substitute [[annIvf]] for the
    * approx side (compose-over-ANN, same contract as mutual_knn_ann)
    * — the recall then folds in the index's own loss, which is
    * exactly what you want measured before committing to a width.
    */
  def matryoshkaRecall(corpus: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int,
                       dims: Seq[Int]): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1), "dims must be >= 1")
    // r12 (r11 verdict item 6): the 1+|dims| annBruteForce passes each
    // paid their OWN fanOut exchange over the same corpus (the slice
    // projections differ, so the exchanges never unified for runtime
    // reuse). Fan the corpus projection out ONCE and slice after: the
    // inner fanOuts then see the explicit-N repartition in the lineage
    // (the static probe walks through the slice Project) and no-op, so
    // the whole sweep carries ONE corpus exchange. Everything stays
    // lazy — `exact`'s six references dedupe at runtime via exchange
    // reuse (its agg subtree is identical across frames); eager
    // checkpoints here were MEASURED SLOWER (1.2 → 2.0 s: two extra
    // jobs for a 3-row result) and reverted.
    val c = Par.fanOut(corpus.select(col(idCol), col(vecCol)), col(idCol))
    val exact = annBruteForce(c, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val frames = dims.map { d =>
      val tc = c.select(col(idCol),
        slice(col(vecCol), 1, d).as(vecCol))
      val tq = queries.select(col(idCol),
        slice(col(vecCol), 1, d).as(vecCol))
      val approx = annBruteForce(tc, tq, idCol, vecCol, k)
        .select(col("query_id"), col("neighbor_id"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .select(lit(d).as("dims"), col("hits"), col("n_exact"),
          expr("hits * 1000 div n_exact").as("recall_permille"))
    }
    frames.reduce(_.unionByName(_))
  }

  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val g = exact.select(col("query_id"), col("neighbor_id"))
    val hits = g.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("__hit"))
    g.groupBy("query_id").agg(count(lit(1)).as("__n"))
      .join(hits, Seq("query_id"), "left")
      .agg(avg(coalesce(col("__hit"), lit(0L)).cast("double") / col("__n")))
      .head().getDouble(0)
  }

  /** L2-normalized copy of `vecCol` as `array<double>` (zero vectors
    * pass through unscaled). Norm computed once per row into a helper
    * column — never inside a per-element lambda.
    */
  private def withUnitVec(df: DataFrame, vecCol: String,
                          out: String): DataFrame =
    df.withColumn("__norm", l2Norm(col(vecCol)))
      .withColumn(out, when(col("__norm") === 0d, col(vecCol).cast("array<double>"))
        .otherwise(transform(col(vecCol), x => x.cast("double") / col("__norm"))))
      .drop("__norm")

  /** Deterministic PQ codebooks: m subspaces × ksub centroids, trained
    * with the same distributed Lloyd device as [[trainCentroidsLloyd]]
    * but per-subspace and under squared-L2 (the PQ objective): each
    * iteration encodes every vector natively
    * ([[graft.functions.PqEncodeExpr]]), then every (subspace, code)
    * cell re-centers via subdim map-side partial AVGs — ALL subspaces
    * in one pass, one tiny shuffle of m·ksub×subdim partials. Means
    * round to 6 places so fp summation order can never make runs
    * diverge; empty cells keep their centroid. Seeds are the first
    * ksub vectors' slices (id order). Vectors are L2-normalized before
    * training so ADC dot products rank like cosine.
    */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                       m: Int, ksub: Int,
                       iters: Int = 3): Seq[Seq[Seq[Double]]] = {
    // persist the normalized training vectors once: the loop below
    // re-executes this subtree (normalize included) per iteration
    // around a driver collect, and the seeding/dim probes add two more
    // passes (guide §5; same discipline as trainCentroidsLloyd)
    val unit = withUnitVec(corpus, vecCol, "__v")
      .select(col(idCol), col("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dim = unit.select(size(col("__v"))).head().getInt(0)
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val subdim = dim / m
    var books: Seq[Seq[Seq[Double]]] =
      unit.orderBy(col(idCol)).limit(ksub)
        .select(col("__v")).collect()
        .map(_.getSeq[Double](0).toSeq).toSeq
        .transpose.grouped(subdim).toSeq               // dim × ksub → m groups
        .map(_.transpose.map(_.toSeq))                 // each: ksub × subdim
    try for (_ <- 1 to iters) {
      val coded = unit.select(col("__v"),
          posexplode(graft.functions.PqEncodeExpr(col("__v"), books))
            .as(Seq("m", "code")))
        .select(col("m"), col("code"),
                slice(col("__v"), col("m") * subdim + 1, lit(subdim)).as("sub"))
      val meanCols = (0 until subdim).map(i => avg(col("sub")(i)).as(s"c$i"))
      val means = coded.groupBy(col("m"), col("code"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (0 until subdim).map(i =>
          BigDecimal(r.getDouble(i + 2))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toSeq)
        .toMap
      books = books.zipWithIndex.map { case (book, s) =>
        book.zipWithIndex.map { case (cent, c) => means.getOrElse((s, c), cent) }
      }
    } finally unit.unpersist(blocking = false)
    books
  }

  /** PQ ANN with ADC + exact re-rank — the memory-bound scale path:
    * the corpus persists as m int codes per vector (the 100 TB corpus
    * ADC-scans from a fraction of its raw size), each query ships one
    * m·ksub lookup table, candidates score with m array lookups inside
    * codegen ([[graft.functions.PqAdcExpr]]) — no d-term dot product,
    * no full vectors in the scan. The ADC top-`rerank` per query then
    * re-scores EXACTLY: the candidate id set (queries × rerank, model-
    * sized) broadcasts against the raw-vector scan, so the final
    * (query_id, neighbor_id, cos, rank) carries true cosines — ADC
    * approximation error can only cost recall, never precision of the
    * reported scores.
    */
  def annPq(corpus: DataFrame, queries: DataFrame, idCol: String,
            vecCol: String, k: Int, m: Int = 16, ksub: Int = 16,
            lloydIters: Int = 2, rerank: Int = 64): DataFrame = {
    val books = trainPqCodebooks(corpus, idCol, vecCol, m, ksub, lloydIters)
    val codes = withUnitVec(corpus, vecCol, "__v")
      .select(col(idCol).as("neighbor_id"),
              graft.functions.PqEncodeExpr(col("__v"), books).as("__codes"))
    val q = withUnitVec(queries, vecCol, "__qv")
      .select(col(idCol).as("query_id"),
              graft.functions.PqLutExpr(col("__qv"), books).as("__lut"))
    val candidates = topIdsByScore(
      codes.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
                graft.functions.PqAdcExpr(col("__lut"), col("__codes"), ksub)
                  .as("__adc")),
      "__adc", rerank)
    // exact re-rank: candidate ids broadcast against the raw scans
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    topKByCos(cv.join(broadcast(candidates), "neighbor_id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("neighbor_id"),
              round(cosine(col("__qv"), col("__cv")), 6).as("cos")), k)
  }

  /** Build and persist an IVF-PQ index (the FAISS IVFPQ composition):
    * coarse quantizer cells for probe pruning PLUS per-vector PQ codes
    * for cheap in-cell scoring. The cells table stores
    * (neighbor_id, vec, codes) partitioned by cell, so a probe prunes
    * to nprobe cells at the FILE level and — because parquet is
    * columnar — the ADC stage reads only (neighbor_id, codes), never
    * the raw vectors; only the re-rank survivors' vectors are read.
    */
  def buildIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      indexDir: String, nlist: Int = 32, m: Int = 16,
                      ksub: Int = 16, lloydIters: Int = 3): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = trainCentroidsLloyd(corpus, idCol, vecCol, nlist, lloydIters)
    val books = trainPqCodebooks(corpus, idCol, vecCol, m, ksub, lloydIters)
    centroids.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (cent, c) => (s, c, cent) }
    }.toDF("m", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebooks")
    ivfPqCellRows(corpus, idCol, vecCol, centroids, books)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/cells")
  }

  /** (neighbor_id, vec, codes, cell) rows for the cells table — the
    * map-side assignment shared by build and extend.
    */
  private def ivfPqCellRows(corpus: DataFrame, idCol: String, vecCol: String,
                            centroids: Seq[Seq[Double]],
                            books: Seq[Seq[Seq[Double]]]): DataFrame =
    withUnitVec(corpus, vecCol, "__u")
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"),
        graft.functions.PqEncodeExpr(col("__u"), books).as("codes"),
        element_at(graft.functions.NearestCells(col(vecCol), centroids, 1), 1)
          .as("cell"))

  /** Load the model-sized quantizers of a persisted IVF-PQ index. */
  private def loadIvfPqModel(spark: org.apache.spark.sql.SparkSession,
                             indexDir: String)
      : (Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    val centroids = spark.read.parquet(s"$indexDir/centroids")
      .orderBy(col("cell")).collect()
      .map(r => r.getSeq[Double](1).toSeq).toSeq
    val loaded = spark.read.parquet(s"$indexDir/codebooks")
      .orderBy(col("m"), col("code")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toSeq))
    (centroids, loaded.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).toSeq))
  }

  /** Append a vector batch to a persisted IVF-PQ index under its
    * FROZEN quantizers: the batch encodes and cell-assigns map-side
    * and appends into the cell partition dirs — the existing 100 TB
    * cells table is never read or rewritten (the daily-ingest shape,
    * like `extendDedupIndex`). Appending batch A then B is identical
    * to appending A∪B (per-row assignment, no cross-row state;
    * spec-asserted). Quantizers drift from the data as the corpus
    * grows — recall degrades gracefully (probe/ADC stay valid for any
    * codebooks; the exact re-rank keeps scores true) until a rebuild
    * retrains.
    */
  def extendIvfPqIndex(newVecs: DataFrame, idCol: String, vecCol: String,
                       indexDir: String): Unit = {
    val spark = newVecs.sparkSession
    val (centroids, books) = loadIvfPqModel(spark, indexDir)
    ivfPqCellRows(newVecs, idCol, vecCol, centroids, books)
      .write.mode("append").partitionBy("cell")
      .parquet(s"$indexDir/cells")
  }

  /** Bound the small-file growth of repeated [[extendIvfPqIndex]]
    * appends: rewrite the cells table one file per cell partition,
    * dropping replay-duplicated ids. Query-result identical
    * before/after (spec-asserted). Same write-tmp → delete → rename
    * swap and crash states as the dedup/span index compactions;
    * [[recoverIvfPqIndex]] runs automatically first.
    */
  def compactIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String): Unit = {
    recoverIvfPqIndex(spark, indexDir)
    val nlist = spark.read.parquet(s"$indexDir/centroids").count().toInt
    IndexFiles.swapIn(spark, indexDir, "cells") { tmp =>
      spark.read.parquet(s"$indexDir/cells")
        .dropDuplicates("neighbor_id")
        // each cell lands wholly in one task → one file per cell dir
        .repartition(nlist, col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    }
  }

  /** Repair a cells table left mid-swap by a crashed compaction; see
    * [[IndexFiles.recoverTable]]. Idempotent, safe at job startup.
    */
  def recoverIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String): Boolean =
    IndexFiles.recoverTable(spark, indexDir, "cells")

  /** ANN query against a persisted IVF-PQ index: probe `nprobe` cells
    * (partition-pruned), ADC-score their codes (m lookups per
    * candidate, vec column never read), exact-cosine re-rank the ADC
    * top-`rerank` (candidate ids broadcast, vectors read only for
    * survivors). Model-sized driver state: centroid matrix + codebooks.
    */
  def annIvfPq(queries: DataFrame, indexDir: String, idCol: String,
               vecCol: String, k: Int, nprobe: Int = 4,
               rerank: Int = 64): DataFrame = {
    val spark = queries.sparkSession
    val (centroids, books) = loadIvfPqModel(spark, indexDir)
    val ksub = books.head.size
    val q = withUnitVec(queries, vecCol, "__u")
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        graft.functions.PqLutExpr(col("__u"), books).as("__lut"),
        explode(graft.functions.NearestCells(col(vecCol), centroids, nprobe))
          .as("cell"))
    val candidates = topIdsByScore(
      spark.read.parquet(s"$indexDir/cells")
        .select(col("neighbor_id"), col("codes"),
                col("cell").cast("int").as("cell"))
        .join(broadcast(q.drop("__qv")), Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .dropDuplicates("query_id", "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          graft.functions.PqAdcExpr(col("__lut"), col("codes"), ksub)
            .as("__adc")),
      "__adc", rerank)
    val cv = spark.read.parquet(s"$indexDir/cells")
      .select(col("neighbor_id"), col("vec").as("__cv"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    topKByCos(cv.join(broadcast(candidates), "neighbor_id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("neighbor_id"),
              round(cosine(col("__qv"), col("__cv")), 6).as("cos")), k)
  }

  /** Cosine near-duplicate pairs: LSH-bucket both rows, equal-bucket
    * self-join, exact-cosine verify at `threshold`. Same shape as
    * [[Dedup.minhashPairs]] — the bucket join is the only shuffle.
    */
  def embeddingNearDup(vectors: DataFrame, idCol: String, vecCol: String,
                       dim: Int, threshold: Double,
                       tables: Int = 6, bits: Int = 10): DataFrame = {
    val b = Par.fanOut(
        vectors.select(col(idCol).as("vec_id"), col(vecCol).as("__v")),
        col("vec_id"))
      .select(col("vec_id"), col("__v"),
        posexplode(lshBuckets(col("__v"), dim, tables, bits))
          .as(Seq("t", "bucket")))
    val l = b.alias("l")
    val r = b.alias("r")
    l.join(r,
        col("l.t") === col("r.t") && col("l.bucket") === col("r.bucket") &&
        col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("left_id"), col("r.vec_id").as("right_id"),
              col("l.__v").as("__vl"), col("r.__v").as("__vr"))
      .dropDuplicates("left_id", "right_id")
      .select(col("left_id"), col("right_id"),
              round(cosine(col("__vl"), col("__vr")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Mutual-kNN graph edges from ANY per-query neighbor frame
    * (`query_id, neighbor_id, cos, rank` — the output contract of
    * [[annBruteForce]]/[[annLsh]]/[[annIvf]]): undirected edges (a<b)
    * kept only when each endpoint is in the OTHER's top-k. Mutuality
    * is the standard symmetrization for kNN-graph clustering /
    * graph-based dedup (hubs rank many vectors that don't rank them
    * back; mutual edges prune those).
    *
    * Scale shape: a self-equi-join of the neighbor LIST (n·k rows, not
    * the corpus) on the reversed pair key — one shuffle of k longs per
    * vector. The cos carried is the a→b direction's (cosine is
    * symmetric; both directions round identically).
    */
  def mutualKnn(neighbors: DataFrame): DataFrame = {
    val fwd = neighbors.select(col("query_id").as("a"),
      col("neighbor_id").as("b"), col("cos"), col("rank").as("rank_ab"))
    val rev = neighbors.select(col("query_id").as("__rb"),
      col("neighbor_id").as("__ra"), col("rank").as("rank_ba"))
    fwd.filter(col("a") < col("b"))
      .join(rev, col("a") === col("__ra") && col("b") === col("__rb"))
      .select(col("a"), col("b"), col("cos"), col("rank_ab"), col("rank_ba"))
  }

  /** Symmetric per-dimension int8 scalar quantization of an embedding
    * column — the storage-compression primitive for corpus-scale vector
    * columns (4 bytes/dim → 1; the int8 codes feed ADC-style scans or
    * simply shrink the parquet footprint 4×). Per dimension d the scale
    * is `max|x_d|/127`; codes are `round_half_up(x·127/max|x_d|)` in
    * `[-127, 127]` (symmetric, zero maps to zero exactly).
    *
    * Determinism: the rounding is `floor(q + 0.5)` over the SAME IEEE
    * double quotient both engines compute, so codes are bit-identical
    * cross-engine with no .5-boundary ambiguity (floor is exact; Spark
    * HALF_UP vs DuckDB half-away never enters). All-zero dimensions
    * code to 0.
    *
    * Scale shape: the per-dim stats aggregate is dim-sized (one
    * map-side-combined shuffle of `dim` partials), broadcast back; the
    * corpus pass is map-side. Output is the exploded (id, dim, code)
    * frame — re-pack with `collect_list` over a dim-ordered window, or
    * keep columnar for parquet.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val flat = df.select(col(idCol),
        posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col(idCol), col("dim").cast("long").as("dim"),
        col("__x").cast("double").as("__x"))
    val scales = flat.groupBy("dim").agg(max(abs(col("__x"))).as("__mx"))
    flat.join(broadcast(scales), "dim")
      .select(col(idCol), col("dim"),
        when(col("__mx") === 0.0d, lit(0L))
          .otherwise(floor(col("__x") * lit(127.0d) / col("__mx") + lit(0.5d)))
          .as("code"))
  }

  /** kNN-distance outliers (E83 — the Knorr-Ng/Ramaswamy
    * distance-based outlier detector in embedding space: a vector
    * whose k-th nearest neighbor is unusually FAR sits in no cluster
    * — the curation signal for mis-embedded, off-domain, or garbage
    * documents that similarity dedup will never touch because nothing
    * is near them). Input is any `(query_id, neighbor_id, cos, rank)`
    * neighbor frame ([[annBruteForceBlocked]] for the exact graph,
    * [[annIvf]] composed at corpus scale — the [[mutualKnn]]
    * contract); a vector is flagged when its k-th-neighbor cosine
    * falls `kSigma` standard deviations BELOW the corpus mean, tested
    * with the exact integer moment rule (the anomaly_zscore device:
    * `(n·x − S1)² > k²·(n·S2 − S1²)` with `n·x < S1`, DECIMAL(38,0)
    * cross-products, no float sqrt) — a relative rule, so it adapts
    * to the density growth that breaks any fixed distance threshold.
    *
    * Scale shape: one query-keyed k-th extraction (rank = k filter —
    * already grouped in the neighbor frame), one 1-row moment
    * aggregate broadcast back over the vector-sized frame. Nothing
    * corpus-sized sorts or collects.
    */
  def knnOutliers(neighbors: DataFrame, k: Int, kSigma: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(kSigma >= 1 && kSigma <= 100,
      s"kSigma must be in [1,100], got $kSigma")
    val kth = neighbors.filter(col("rank") === k.toLong)
      .select(col("query_id").as("vec_id"),
        expr("CAST(round(cos * 1000000) AS BIGINT)").as("kth_cos_micro"))
    val mom = kth.agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
      sum(col("kth_cos_micro").cast("decimal(38,0)")).as("__s1"),
      sum(expr("CAST(kth_cos_micro AS DECIMAL(38,0)) * kth_cos_micro"))
        .as("__s2"))
    val k2 = kSigma.toLong * kSigma
    kth.crossJoin(broadcast(mom))
      .select(col("vec_id"), col("kth_cos_micro"),
        expr(s"""__n >= 2 AND __n * kth_cos_micro < __s1 AND
          (__n * kth_cos_micro - __s1) * (__n * kth_cos_micro - __s1)
            > $k2 * (__n * __s2 - __s1 * __s1)""").as("is_outlier"))
  }

  /** Deterministic embedding mixup (E98 — the representation-space
    * data augmentation under contrastive/regularization training
    * recipes: convex blends of example pairs smooth decision
    * boundaries; at corpus scale the blend must be REPRODUCIBLE, so
    * both the pairing and the mixing weight are pure functions of the
    * ids, never RNG). Pairs each vector with its id+1 successor (both
    * present — the id-dense contract; boundary ids simply pair
    * nothing), mixing weight
    * `λ_permille = ((id mod 10⁵)·2654435761) mod 899 + 51` (a fixed
    * multiplicative-hash rule landing in [51, 949] — never a
    * degenerate copy of either side; the inner mod keeps the product
    * inside int64 at any id scale), and emits integer MILLI
    * components `floor(λ·x_k + (1000−λ)·y_k + 0.5)` — one IEEE
    * double product chain both engines compute identically (the
    * quantizeInt8 discipline).
    *
    * Scale shape: one self-join on the successor id (key-partitioned
    * equi-join) + a map-side zip explode — no other shuffle; the
    * exploded (pair, dim) frame is the training-shard layout
    * downstream packers expect.
    */
  def embeddingMixup(df: DataFrame, idCol: String,
                     vecCol: String): DataFrame = {
    val a = df.select(col(idCol).cast("long").as("id_a"),
      col(vecCol).as("__va"))
    val b = df.select((col(idCol).cast("long") - 1L).as("id_a"),
      col(idCol).cast("long").as("id_b"), col(vecCol).as("__vb"))
    a.join(b, "id_a")
      .withColumn("lambda_permille",
        expr("((id_a % 100000) * 2654435761L) % 899 + 51"))
      .select(col("id_a"), col("id_b"), col("lambda_permille"),
        posexplode(expr(
          """zip_with(__va, __vb, (x, y) ->
             CAST(floor(lambda_permille * CAST(x AS DOUBLE)
               + (1000 - lambda_permille) * CAST(y AS DOUBLE) + 0.5d)
             AS BIGINT))""")).as(Seq("dim", "m_milli")))
      .select(col("id_a"), col("id_b"), col("lambda_permille"),
        col("dim").cast("long").as("dim"), col("m_milli"))
  }
}
