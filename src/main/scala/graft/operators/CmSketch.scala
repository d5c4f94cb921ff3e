package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch as a RELATIONAL frame (E101 — the frequency
  * point-query sketch completing the store family beside KLL
  * (quantiles), KMV/theta (distinct/overlap), HLL (distinct at fixed
  * memory) and Misra-Gries (top-k): CM answers "how often did THIS
  * key occur" within ε·N with d-row min confidence, and unlike MG it
  * answers for ANY key, not just the heavy ones).
  *
  * Spark-first design note: a CM sketch is d×w counters — which is
  * just a (row, bucket) → count FRAME. Building it is ONE map-side
  * hash projection + ONE grouped count (map-side combined); merging
  * two sketches is a union + re-group (counters add — the frame is
  * its own mergeable partial, no custom Aggregate needed); a point
  * query is a d-row broadcast join + min. The engine's native
  * operators ARE the sketch algebra, so everything stays in
  * WholeStageCodegen and the DuckDB twin replays the identical SQL.
  *
  * Determinism contract: the d=4 hash rows are fixed-constant
  * universal hashes `h_j(k) = ((a_j·k + b_j) mod (2⁶¹−1)) mod w`
  * computed in DECIMAL(38,0)/HUGEINT (a_j·k ≤ 10²⁸ — exact both
  * engines; non-negative keys by contract). Standard CM guarantee:
  * est ≥ true always; est ≤ true + ε·N with prob 1−δ for w = ⌈e/ε⌉,
  * d = ⌈ln 1/δ⌉ — w=1024, d=4 gives ε ≈ 0.27% of N at δ ≈ 1.8%.
  */
object CmSketch {
  val P = 2305843009213693951L // 2^61 − 1 (Mersenne)
  // fixed (a, b) per hash row — primes, a < P
  val Hashes: Seq[(Int, Long, Long)] = Seq(
    (0, 911382323L, 1500450271L),
    (1, 972663749L, 2860486313L),
    (2, 1234567891L, 3267000013L),
    (3, 789456123L, 49979687L))

  private def bucketExpr(keyCol: String, a: Long, b: Long, w: Int) =
    expr(s"""CAST(((CAST(${a}L AS DECIMAL(38,0)) * $keyCol + ${b}L)
      % ${P}L) % $w AS BIGINT)""")

  /** Build the d×w counter frame `(row, bucket, cnt)` over a
    * non-negative integer key column. Mergeable: union two counter
    * frames and re-aggregate `sum(cnt)` — counters add exactly.
    */
  def counters(df: DataFrame, keyCol: String, w: Int = 1024): DataFrame = {
    require(w >= 2, s"w must be >= 2, got $w")
    // ONE scan emitting all d (row, bucket) pairs per input row via
    // inline, not a d-way unionAll of full scans (r11, guide §2.3:
    // the union re-scanned the input d times and re-ran the DECIMAL
    // hash projection per branch; row set — and therefore the grouped
    // count — is identical either way)
    // fan out first: the single-scan inline serializes all d hash
    // projections onto the scan's (often single) task — measured r11:
    // the inline alone took cm_store 4.7s -> 8.7s; with the rebalance
    // the one-scan plan keeps the union version's parallelism while
    // still reading the input once
    Par.fanOut(df.select(col(keyCol)))
      .select(inline(array(Hashes.map { case (j, a, b) =>
        struct(lit(j).as("row"), bucketExpr(keyCol, a, b, w).as("bucket"))
      }: _*)))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Persisted COUNT-MIN store — the [[Relational.extendAggStore]] /
    * KLL / KMV lifecycle for FREQUENCY point queries (C: the fourth
    * member of the sketch-store family: counts/sums, distributions,
    * set cardinality, and now per-key occurrence frequency for ANY
    * key at d×w fixed memory): batch-stamped counter-frame partials,
    * replay-exact reads, fold-committed-batches compaction.
    *
    *  - [[extendCmStore]] appends the batch's d×w counter frame
    *    stamped `batch_id`. The partial is a PURE FUNCTION of batch
    *    content (hash buckets are fixed constants; grouped counts
    *    are order/layout-independent), so an at-least-once replay
    *    writes row-identical partials;
    *  - [[readCmStore]] drops replay duplicates by
    *    `(row, bucket, batch_id)` — exact for free, the KMV argument
    *    — then sums counters per cell: counters ADD, so the merged
    *    frame equals [[counters]] over the union of all batches,
    *    and [[estimate]] answers point queries against it with the
    *    standard CM guarantee (est ≥ true; ≤ true + ε·N w.p. 1−δ);
    *  - [[compactCmStore]] folds partials of batches strictly below
    *    `beforeBatch` into one `batch_id = −1` row per cell via the
    *    shared [[IndexFiles]] swap + recover protocol — only the
    *    in-flight batch can replay, so folding committed batches
    *    preserves replay exactness (the store-family argument, made
    *    once in IndexFiles.compactFold).
    *
    * The streaming twin is
    * [[graft.streaming.Streams.streamCmMaintain]] — same partials,
    * appended per micro-batch from foreachBatch.
    */
  def extendCmStore(rows: DataFrame, storeDir: String, keyCol: String,
                    w: Int, batchId: Long): Unit =
    counters(rows, keyCol, w)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(s"$storeDir/cm")

  /** Merged counter frame over all committed batches (replay-deduped):
    * row-for-row equal to `counters(unionOfBatches, keyCol, w)`. */
  def readCmStore(spark: org.apache.spark.sql.SparkSession,
                  storeDir: String): DataFrame =
    spark.read.parquet(s"$storeDir/cm")
      .dropDuplicates("row", "bucket", "batch_id")
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))

  def compactCmStore(spark: org.apache.spark.sql.SparkSession,
                     storeDir: String, beforeBatch: Long,
                     partitions: Int = 1): Unit =
    IndexFiles.compactFold(spark, storeDir, "cm",
        Seq("row", "bucket"), beforeBatch, partitions) { below =>
      below.groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    }

  /** Point estimates for the keys of `queries` (any extra columns ride
    * along): appends `est_n = min_j counters[j][h_j(key)]` (0 when a
    * key hashes only to untouched buckets). The query frame is the
    * SMALL side (broadcast); the counter frame is ≤ d·w rows, so the
    * join is counter-sized — nothing corpus-sized moves.
    */
  def estimate(ctrs: DataFrame, queries: DataFrame, keyCol: String,
               w: Int = 1024): DataFrame = {
    // one pass over the (possibly expensive) query subtree: inline the
    // d (row, bucket) probes instead of unioning d re-computations of
    // the frame (r11 — cm_store's truth side is itself an aggregate)
    val qb = queries.select(col("*"), inline(array(Hashes.map {
      case (j, a, b) => struct(lit(j).as("__j"),
        bucketExpr(keyCol, a, b, w).as("__bucket"))
    }: _*)))
    val passThrough = queries.columns.toSeq
    qb.join(
        broadcast(ctrs.select(col("row").as("__j"),
          col("bucket").as("__bucket"), col("cnt"))),
        Seq("__j", "__bucket"), "left")
      .groupBy(passThrough.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }
}
