package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-streaming re-expressions of the reference's webhook-fed
  * tables (README "webhook" tables; ddl/data_sync_db.sql record_update,
  * item_base_status, request_event).
  *
  * The reference receives row-at-a-time webhook updates guarded by
  * `update_date_time < $new` (database_insert.py:124-126 via
  * alma_publish_to_database.py:124). On a stream that guard is per-key
  * monotonic state — flatMapGroupsWithState keeps the latest event per
  * key and emits only strictly-newer arrivals, so the sink applies
  * exactly the rows the reference would have upserted.
  */
object Streams {

  case class StatusEvent(key: Long, ts: Long, status: String)

  /** Per-key latest-state stream: emits an event iff it is strictly
    * newer than the held state (ties and stragglers dropped — the
    * conditional-upsert guard). Use on a stream grouped by key.
    */
  def latestStatusUpdates(events: Dataset[StatusEvent]): Dataset[StatusEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[StatusEvent, StatusEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[StatusEvent], state: GroupState[StatusEvent]) =>
          var current = state.getOption
          val out = Seq.newBuilder[StatusEvent]
          // within a batch, process in ts order for deterministic output
          rows.toSeq.sortBy(e => (e.ts, e.status)).foreach { e =>
            if (current.forall(_.ts < e.ts)) { current = Some(e); out += e }
          }
          current.foreach(state.update)
          out.result().iterator
      }
  }

  case class Doc(doc_id: Long, text: String)

  /** Streaming exact dedup over a document stream: per content-hash
    * state marks hashes already emitted, so duplicates are dropped both
    * within a micro-batch (min doc_id wins, deterministic) and across
    * the stream's lifetime. The streaming twin of
    * [[graft.operators.TextAnalysis.exactDupGroups]] — state size is
    * one boolean per DISTINCT document, the minimum any exact-dedup
    * must remember. Run it on the RocksDB state store
    * ([[graft.GraftSession]] configures it): at corpus scale the state
    * is corpus-cardinality and only fits disk-backed.
    *
    * `ttl` (e.g. `"30 days"`) bounds state for unbounded streams: a
    * hash idle longer than the TTL is forgotten, so a duplicate
    * arriving after that window is re-admitted — the standard
    * bounded-memory dedup tradeoff. Default keeps state forever.
    */
  def streamDedupExact(docs: Dataset[Doc],
                       ttl: Option[String] = None): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    val timeout = if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    // mirrors TextAnalysis.normalizeText exactly — collapse, then trim,
    // then locale-independent lowercase — so streaming and batch dedup
    // produce identical content hashes for the same text (a default
    // Turkish locale would otherwise lowercase 'I' differently)
    docs.groupByKey(d =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(d.text.replaceAll("\\s+", " ").trim
            .toLowerCase(java.util.Locale.ROOT)
            .getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .flatMapGroupsWithState[Boolean, Doc](OutputMode.Append(), timeout) {
        (_: String, rows: Iterator[Doc], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            ttl.foreach(state.setTimeoutDuration) // seen again: extend
            Iterator.empty
          } else {
            state.update(true)
            ttl.foreach(state.setTimeoutDuration)
            Iterator.single(rows.minBy(_.doc_id))
          }
      }
  }

  /** Tumbling-window event metrics with a watermark — the
    * request_event rate counters. `tsCol` must be a TimestampType
    * event-time column.
    */
  def windowedEventCounts(events: DataFrame, tsCol: String, typeCol: String,
                          valueCol: String, windowDuration: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration), col(typeCol))
      .agg(count(lit(1)).as("n"), round(sum(col(valueCol)), 3).as("total_value"))
      .select(col("window.start").as("window_start"), col(typeCol),
              col("n"), col("total_value"))

  /** Gap-based session rollup via Spark's NATIVE merging session
    * windows — the streaming-capable twin of
    * [[graft.operators.Relational.sessionize]] (which numbers sessions
    * with a lag/running-sum window): `session_window` merges events
    * whose [ts, ts+gap) extents overlap, so a session closes when the
    * next event arrives ≥ gap later. Works unchanged on a batch frame
    * (one key-partitioned session-merge aggregation) or a stream (pass
    * `watermark`; state closes and emits as event time passes
    * session_end). `session_end` is last-event-time + gap — the
    * session-window contract, vs sessionize's last-event-time.
    */
  def sessionWindowStats(events: DataFrame, keyCol: String, tsCol: String,
                         valueCol: String, gap: String,
                         watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    src.groupBy(col(keyCol), session_window(col(tsCol), gap).as("__sw"))
      .agg(count(lit(1)).as("n_events"),
           // integer milli-units — exact cross-engine (see sessionize)
           sum(round(col(valueCol) * 1000).cast("long")).as("total_value_milli"))
      .select(col(keyCol),
              unix_micros(col("__sw.start")).as("session_start_us"),
              unix_micros(col("__sw.end")).as("session_end_us"),
              col("n_events"), col("total_value_milli"))
  }

  /** Continuous publish ingest: a stream of publish records (e.g. from
    * [[graft.sources.PublishFiles.streamPublishFiles]]) driven through
    * the full [[graft.AlmaPipeline]] batch flow per micro-batch — the
    * streaming twin of the reference's per-file processing loop, with
    * the store's atomic-swap publishes as the transaction boundary.
    */
  def ingestStream(records: Dataset[graft.marc.PublishSplit.PublishRow],
                   store: graft.sources.SyncSink,
                   locationDim: DataFrame,
                   checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[graft.marc.PublishSplit.PublishRow], _: Long) =>
        if (!batch.isEmpty)
          graft.AlmaPipeline.ingestPublish(batch, store, locationDim)
        ()
      }
      .start()

  /** Ordered continuous publish ingest: the file stream decoded WITH
    * per-record ordinals, so each micro-batch's intra-batch dedup uses
    * the reference's sorted-file record order (first wins) instead of a
    * content tiebreak.
    */
  def ingestFileStreamOrdered(spark: SparkSession, dir: String,
                              store: graft.sources.SyncSink,
                              locationDim: DataFrame,
                              checkpointDir: String,
                              maxFilesPerTrigger: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("binaryFile")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(dir)
      .select(col("path"), col("content"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bs = batch.sparkSession
        import bs.implicits._
        val records = graft.sources.PublishFiles.decodeOrdered(
          batch.as[(String, Array[Byte])])
        if (!records.isEmpty)
          graft.AlmaPipeline.ingestPublishOrdered(records, store, locationDim)
        ()
      }
      .start()

  /** Streaming incremental near-dedup: each micro-batch is deduped
    * against the persisted band index
    * ([[graft.operators.Dedup.dedupAgainstIndex]]), the duplicate
    * decisions append to `decisionsDir`, and the SURVIVORS (docs with
    * no match in history) are admitted into the index
    * ([[graft.operators.Dedup.extendDedupIndex]]) — so a copy arriving
    * in a LATER batch is caught by a doc admitted in an earlier one.
    * The streaming twin of the daily build→dedup→admit cycle, with the
    * micro-batch as the cycle unit.
    *
    * Semantics notes: near-dups WITHIN one micro-batch are both
    * admitted (pre-dedup the batch with
    * [[graft.operators.Dedup.minhashPairs]] if that matters);
    * foreachBatch is at-least-once, so a replayed batch can append
    * duplicate index rows — harmless: `dedupAgainstIndex` dedups
    * candidate pairs AND filters self-pairs (a replayed batch finding
    * its own already-admitted docs would otherwise mark novel
    * documents as duplicates of themselves), and duplicate decision
    * rows are dropped on read via `dropDuplicates(new_id, dup_of)`.
    * Matches whose `dup_of` is itself a member of the CURRENT batch
    * are filtered for the same reason: in a first run the batch's own
    * docs are not yet in the index when the lookup runs, so such a
    * match can only be a replay finding a within-batch sibling
    * admitted by the failed attempt — without the filter the replay
    * would demote that sibling to a duplicate, breaking the
    * both-admitted contract above.
    *
    * `compactEvery = Some(n)` runs
    * [[graft.operators.Dedup.compactDedupIndex]] after every n-th
    * batch, bounding the index's small-file growth (each batch
    * otherwise appends a file-set across 64 partitions forever).
    */
  def streamDedupIncremental(docs: Dataset[Doc], indexDir: String,
                             decisionsDir: String, checkpointDir: String,
                             shingleN: Int = 3, k: Int = 64,
                             bands: Int = 16, threshold: Double = 0.7,
                             compactEvery: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
        if (!batch.isEmpty) {
          dedupAdmitBatch(batch.toDF, indexDir, decisionsDir,
            shingleN, k, bands, threshold)
          compactEvery.foreach { n =>
            if (n > 0 && (batchId + 1) % n == 0)
              graft.operators.Dedup.compactDedupIndex(
                batch.sparkSession, indexDir)
          }
        }
        ()
      }
      .start()

  /** Streaming ingest into the persisted BM25 postings index: each
    * micro-batch appends via
    * [[graft.operators.Retrieval.extendPostingsIndex]] — exact under
    * appends by construction (df and corpus stats derive at query
    * time) and replay-tolerant end to end (a re-executed batch writes
    * identical postings rows and an identical XOR-fingerprint stats
    * row; the query path dedupes both). `compactEvery = Some(n)`
    * bounds small-file growth like the dedup-index stream.
    */
  def streamPostingsExtend(docs: Dataset[Doc], indexDir: String,
                           checkpointDir: String,
                           compactEvery: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Retrieval.extendPostingsIndex(
            batch.toDF, "doc_id", "text", indexDir)
          compactEvery.foreach { n =>
            if (n > 0 && (batchId + 1) % n == 0)
              graft.operators.Retrieval.compactPostingsIndex(
                batch.sparkSession, indexDir)
          }
        }
        ()
      }
      .start()

  /** A streamed fact row for the incremental-rollup stream. */
  case class Fact(key: Long, value: Double)

  /** Streaming incremental aggregate maintenance — the D-twin of the
    * C44 batch merge: each micro-batch appends ONE batch-stamped
    * partial aggregate to the persisted store
    * ([[graft.operators.Relational.extendAggStore]]); the current
    * rollup is always `readAggStore` — fact rows never persist, and
    * the history is never rescanned.
    *
    * Replay semantics: foreachBatch is at-least-once, but a re-executed
    * batch writes a row-identical partial (the aggregate is a pure
    * function of the batch), which `readAggStore`'s
    * `(key, batch_id)` dedup collapses — so counts and sums are EXACT,
    * not approximately-once. `compactEvery = Some(n)` folds partials of
    * committed batches (strictly below the current id — the only batch
    * that can ever replay) into one row per key, bounding both file
    * and row growth; folding never touches the in-flight batch, so
    * exactness survives a crash mid-compaction too (shared swap +
    * recover protocol).
    */
  def streamAggMaintain(facts: Dataset[Fact], storeDir: String,
                        checkpointDir: String,
                        compactEvery: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    facts.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Fact], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Relational.extendAggStore(
            batch.toDF, storeDir, Seq("key"), "value", batchId)
          compactEvery.foreach { n =>
            if (n > 0 && (batchId + 1) % n == 0)
              graft.operators.Relational.compactAggStore(
                batch.sparkSession, storeDir, Seq("key"), batchId)
          }
        }
        ()
      }
      .start()

  /** Streaming incremental QUANTILE-store maintenance — D13, the
    * streaming half of C48 exactly as [[streamAggMaintain]] is of
    * C44: each micro-batch appends one deterministic KLL sketch
    * partial per key ([[graft.operators.Relational.extendQuantileStore]]
    * — the secondary-sort fold makes the partial a pure function of
    * batch content), so an at-least-once replay writes a
    * byte-identical row that `readQuantileStore`'s
    * `(key, batch_id)` dedup collapses: running percentiles stay
    * EXACT in the k ≥ total regime, sketch-bounded otherwise. Unlike
    * D11 (`streamQuantiles`, sketch bytes in the state store, answers
    * emitted per batch), the store variant persists QUERYABLE history
    * — any reader derives current quantiles without the streaming
    * query's participation, and compaction bounds file growth with
    * the shared fold-committed-batches argument.
    */
  def streamQuantileMaintain(measures: Dataset[Measure], storeDir: String,
                             checkpointDir: String, k: Int,
                             compactEvery: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    measures.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Measure], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Relational.extendQuantileStore(
            batch.toDF, storeDir, Seq("key"), "value", k, batchId)
          compactEvery.foreach { n =>
            if (n > 0 && (batchId + 1) % n == 0)
              graft.operators.Relational.compactQuantileStore(
                batch.sparkSession, storeDir, Seq("key"), k, batchId)
          }
        }
        ()
      }
      .start()

  /** D15: streaming incremental DISTINCT-COUNT-store maintenance —
    * the streaming half of C50 completing the store-family symmetry
    * (D9↔C44 counts/sums, D13↔C48 distributions, this↔C50 set
    * cardinality): each micro-batch appends one KMV theta-sketch
    * partial per key ([[graft.operators.Relational.extendDistinctStore]]).
    * Byte-purity needs NO secondary-sort device here — the k smallest
    * distinct hashes are a pure function of the batch's value SET —
    * so an at-least-once replay appends a byte-identical row that the
    * read's `(key, batch_id)` dedup collapses; running per-key
    * distinct counts stay exact below k retained hashes and carry the
    * (k−1)/u_k estimate beyond, while fact rows never persist and
    * history is never rescanned. `compactEvery` folds committed
    * batches with the shared swap + recover protocol.
    */
  def streamDistinctMaintain(measures: Dataset[Measure], storeDir: String,
                             checkpointDir: String, k: Int,
                             compactEvery: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    measures.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Measure], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Relational.extendDistinctStore(
            batch.toDF, storeDir, Seq("key"), "value", k, batchId)
          compactEvery.foreach { n =>
            if (n > 0 && (batchId + 1) % n == 0)
              graft.operators.Relational.compactDistinctStore(
                batch.sparkSession, storeDir, Seq("key"), k, batchId)
          }
        }
        ()
      }
      .start()

  /** D-side twin of the count-min STORE (the streaming half of
    * `cm_store` exactly as D9/D13/D15 are of C44/C48/C50, extending
    * the store symmetry to frequency point queries): each micro-batch
    * appends one d×w counter-frame partial
    * ([[graft.operators.CmSketch.extendCmStore]] — fixed-constant
    * hashes and grouped counts make the partial a pure function of
    * batch content), so an at-least-once replay writes row-identical
    * partials that `readCmStore`'s `(row, bucket, batch_id)` dedup
    * collapses: merged counters stay EXACTLY equal to the one-shot
    * sketch over every event ever streamed, at d×w rows of store
    * growth per batch (never fact-sized). `compactEvery` folds
    * committed batches with the shared swap + recover protocol.
    */
  def streamCmMaintain(facts: Dataset[Fact], storeDir: String,
                       checkpointDir: String, w: Int,
                       compactEvery: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    facts.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Fact], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.CmSketch.extendCmStore(
            batch.toDF(), storeDir, "key", w, batchId)
          compactEvery.foreach { n =>
            if (n > 0 && (batchId + 1) % n == 0)
              graft.operators.CmSketch.compactCmStore(
                batch.sparkSession, storeDir, batchId)
          }
        }
        ()
      }
      .start()

  /** One CDC row of the D17 join-view stream: both sides'
    * [[graft.operators.Relational.snapshotDiff]] columns unioned with
    * a `side` discriminator (fields of the other side ride null). */
  case class JoinChange(side: String, change_type: String,
      k: Option[Long], old_fk: Option[Long], new_fk: Option[Long],
      old_v: Option[String], new_v: Option[String],
      bk: Option[Long], old_seg: Option[String], new_seg: Option[String])

  /** D17: streaming JOIN-view-store maintenance — the streaming half
    * of C71 exactly as D9/D13/D15 are of C44/C48/C50, completing the
    * store symmetry for MATERIALIZED JOINS: one CDC stream carries
    * both sides' [[graft.operators.Relational.snapshotDiff]] rows
    * (`side` ∈ fact|dim, the one-topic Debezium shape) and each
    * micro-batch maintains the persisted `view` (plus the `fact`/`dim`
    * base snapshots) via
    * [[graft.operators.Relational.joinMaintainApply]] — the 100 TB
    * fact history is never re-joined, only churn-sized frames move.
    *
    * Unlike the sketch stores there is no `(key, batch_id)` dedup:
    * replay-exactness comes from the apply being IDEMPOTENT (see
    * [[graft.operators.Relational.joinMaintainApply]]'s crash-point
    * argument), which the spec exercises by re-applying a committed
    * batch from every swap stage.
    */
  def streamJoinMaintain(changes: DataFrame, storeDir: String,
                         checkpointDir: String,
                         aKey: String, fk: String, bKey: String,
                         aCols: Seq[String], bCols: Seq[String])
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          if (!batch.isEmpty)
            graft.operators.Relational.joinMaintainApply(
              batch.toDF, storeDir, aKey, fk, bKey, aCols, bCols)
          ()
      }
      .start()

  case class BucketObs(bucket: String, obs_id: Long, x: Long)
  // BigInt state: arbitrary-precision arithmetic (scala BigDecimal ops
  // round at DECIMAL128's 34 digits — the squared terms can pass that);
  // the encoder stores it as DECIMAL(38,0), headroom ~10³⁸
  case class MomentState(n: Long, s1: BigInt, s2: BigInt)
  case class Anomaly(bucket: String, obs_id: Long, x: Long)

  /** D16: streaming PREQUENTIAL z-score anomalies — the streaming
    * reading of [[graft.operators.Behavior.anomalyZscore]], with the
    * semantics difference stated up front: each observation is scored
    * against the bucket's moments SO FAR (state before it, including
    * earlier rows of its own batch folded in deterministic
    * `(x, obs_id)` order), then folded in — the online/test-then-train
    * discipline a monitor actually wants (the batch twin's global
    * moments need the whole day before they exist; backfill with it,
    * the house lambda split). Same exact integer test,
    * `(n·x−S1)² > k²·(n·S2−S1²)`, over exact BigInt moment sums;
    * state is three numbers per bucket, forever.
    */
  def streamAnomalyZscore(obs: Dataset[BucketObs],
                          kSigma: Int): Dataset[Anomaly] = {
    import obs.sparkSession.implicits._
    require(kSigma >= 1 && kSigma <= 100, s"kSigma in [1,100], got $kSigma")
    val k2 = BigInt(kSigma.toLong * kSigma)
    obs.groupByKey(_.bucket)
      .flatMapGroupsWithState[MomentState, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bucket: String, rows: Iterator[BucketObs],
         state: GroupState[MomentState]) =>
          var st = state.getOption.getOrElse(
            MomentState(0L, BigInt(0), BigInt(0)))
          val out = Seq.newBuilder[Anomaly]
          rows.toSeq.sortBy(r => (r.x, r.obs_id)).foreach { r =>
            val x = BigInt(r.x)
            val dev = BigInt(st.n) * x - st.s1
            val varN2 = BigInt(st.n) * st.s2 - st.s1 * st.s1
            if (st.n >= 2 && dev * dev > k2 * varN2)
              out += Anomaly(bucket, r.obs_id, r.x)
            st = MomentState(st.n + 1, st.s1 + x, st.s2 + x * x)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** One cycle unit of the incremental near-dedup stream: dedup the
    * batch against the index, append the duplicate decisions, admit
    * the survivors. Exposed (package-private) so replay/backfill
    * parity specs can drive exactly what the stream runs. Idempotent
    * under at-least-once re-execution — see
    * [[streamDedupIncremental]]'s semantics notes.
    */
  private[graft] def dedupAdmitBatch(b0: DataFrame, indexDir: String,
                                     decisionsDir: String, shingleN: Int = 3,
                                     k: Int = 64, bands: Int = 16,
                                     threshold: Double = 0.7): Unit = {
    val b = b0.persist()
    val dups = graft.operators.Dedup.dedupAgainstIndex(
      b, indexDir, "doc_id", "text", shingleN, k, bands, threshold)
      // replay tolerance: dup_of inside the current batch ⇒ the match
      // is a failed attempt's within-batch admission, not a finding
      // (the batch's own docs are never in the index on a first run)
      .join(b.select(col("doc_id").as("dup_of")), Seq("dup_of"), "left_anti")
      .select(col("new_id"), col("dup_of"), col("jaccard"))
      .persist()
    // skip all-empty appends: a dup-free batch would otherwise leave a
    // schemaless file-set (and the very first one an unreadable dir)
    if (!dups.isEmpty) dups.write.mode("append").parquet(decisionsDir)
    val survivors = b.join(
      dups.select(col("new_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    graft.operators.Dedup.extendDedupIndex(
      survivors, "doc_id", "text", indexDir, shingleN, k, bands)
    dups.unpersist()
    b.unpersist()
  }

  case class Measure(key: String, value: Long)
  case class KeyQuantiles(key: String, n: Long, err_bound: Long,
                          qs: Seq[Long])

  /** D11: per-key RUNNING quantiles over an unbounded value stream —
    * latency percentiles per endpoint, size percentiles per source —
    * via a [[graft.functions.KllBuffer]] sketch held in keyed state.
    *
    * State per key is the sketch's O(k·log(n/k)) longs, NEVER the
    * value history: the store round-trips the exact wire bytes the
    * batch aggregate ships through its shuffle
    * ([[graft.functions.KllBuffer.toBytes]]). Batch rows are folded in
    * sorted order, so (state, batch-content) → state' is a pure
    * deterministic function: an at-least-once re-execution of a batch
    * rebuilds a byte-identical sketch (the determinism the alternating
    * compaction buys — a randomized sketch would diverge on replay).
    * Output (Update mode): one row per touched key per batch with the
    * current inverse-CDF quantiles and the sketch's carried worst-case
    * rank-error bound. In the k ≥ n regime the emitted quantiles equal
    * the batch aggregate's exactly — spec-asserted.
    */
  def streamQuantiles(measures: Dataset[Measure], k: Int,
                      phis: Seq[Double]): Dataset[KeyQuantiles] = {
    import measures.sparkSession.implicits._
    import graft.functions.KllBuffer
    measures.groupByKey(_.key)
      .mapGroupsWithState[Array[Byte], KeyQuantiles](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Measure], state: GroupState[Array[Byte]]) =>
          val buf = state.getOption.map(KllBuffer.fromBytes)
            .getOrElse(new KllBuffer(k))
          val vals = rows.map(_.value).toArray
          java.util.Arrays.sort(vals) // deterministic fold order
          vals.foreach(buf.insert)
          state.update(KllBuffer.toBytes(buf))
          KeyQuantiles(key, buf.n, buf.errBound,
            KllBuffer.quantiles(buf, phis))
      }
  }

  case class TokenObs(key: String, token: String)
  /** Canonical Misra-Gries state: token-sorted parallel arrays (a
    * pure function of the counter MAP, independent of fold-internal
    * hash iteration order) + the exact decrement-round count. */
  case class MgState(n: Long, decs: Long, tokens: Array[String],
                     counts: Array[Long])
  case class KeyTopTokens(key: String, n: Long, err_bound: Long,
                          top_tokens: Seq[String], est_counts: Seq[Long])

  /** One deterministic Misra-Gries fold: batch tokens sorted, then the
    * classic update (count if tracked or free; else joint decrement,
    * zeros dropped) — the same semantics as
    * [[graft.functions.MisraGriesAgg]]'s update path. Pure
    * `(state, batch-content) → state'`, so an at-least-once replay
    * rebuilds an IDENTICAL state row (spec-asserted), the KLL
    * determinism argument applied to heavy hitters. */
  private[graft] def mgFold(st: MgState, batch: Array[String],
                            capacity: Int): MgState = {
    val m = new java.util.TreeMap[String, java.lang.Long]()
    var i = 0
    while (i < st.tokens.length) {
      m.put(st.tokens(i), java.lang.Long.valueOf(st.counts(i))); i += 1
    }
    var n = st.n; var decs = st.decs
    batch.sorted.foreach { t =>
      n += 1
      val cur: java.lang.Long = m.get(t)
      if (cur != null) m.put(t, java.lang.Long.valueOf(cur + 1L))
      else if (m.size < capacity) m.put(t, java.lang.Long.valueOf(1L))
      else {
        decs += 1
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove()
          else e.setValue(java.lang.Long.valueOf(e.getValue - 1L))
        }
      }
    }
    val toks = new Array[String](m.size)
    val cnts = new Array[Long](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); toks(j) = e.getKey; cnts(j) = e.getValue; j += 1 }
    MgState(n, decs, toks, cnts)
  }

  /** D12: per-key RUNNING heavy hitters over an unbounded token
    * stream — top event types per tenant, top terms per feed — the
    * streaming twin of [[graft.functions.MisraGriesAgg]] /
    * `windowed_top_events`, with state bounded at `capacity` counters
    * per key forever (the counter map, never the token history).
    *
    * Every guarantee is the batch sketch's: reported count ∈
    * [true − decs, true] with `decs` ≤ N/(capacity+1) carried EXACTLY
    * in state and emitted as `err_bound`; capacity ≥ distinct ⇒ no
    * decrement ever fires, the counts are exact, and the stream's
    * per-batch output equals the batch `groupBy(token).count` truth
    * (spec-asserted). State is canonical (token-sorted arrays), so
    * replays rebuild identical rows. Output (Update mode): one row
    * per touched key per batch with the current top-`k` by
    * (est_count desc, token asc) — the batch aggregate's tie rule.
    */
  def streamTopTokens(obs: Dataset[TokenObs], capacity: Int,
                      k: Int): Dataset[KeyTopTokens] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .mapGroupsWithState[MgState, KeyTopTokens](
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[TokenObs], state: GroupState[MgState]) =>
          val st = state.getOption.getOrElse(
            MgState(0L, 0L, Array.empty, Array.empty))
          val next = mgFold(st, rows.map(_.token).toArray, capacity)
          state.update(next)
          val top = next.tokens.indices
            .sortBy(i => (-next.counts(i), next.tokens(i)))
            .take(k)
          KeyTopTokens(key, next.n, next.decs,
            top.map(next.tokens), top.map(next.counts))
      }
  }

  /** Stable-file detection: the sftp_wait_for_stable semantics
    * (sftp_wait_for_stable.py) as a relational op over two manifest
    * snapshots (path, size) — a file is stable when its size is
    * unchanged between snapshots. Runs as an anti-join, no driver loop.
    */
  def stableFiles(prev: DataFrame, cur: DataFrame): DataFrame = {
    val p = prev.select(col("path"), col("size").as("prev_size"))
    cur.join(p, "path").filter(col("size") === col("prev_size"))
      .select(col("path"), col("size"))
  }

  /** Stream-stream click attribution (D10): join two live event
    * streams — every (view, click) pair for the same user where the
    * view happened within `lookback` BEFORE the click. The remaining
    * Structured Streaming join shape: both sides watermarked, the join
    * condition carrying equality (user) AND the event-time range, so
    * the engine can bound both join states and evict rows once the
    * watermark passes the range — without the time bound the state
    * would grow forever.
    *
    * Inputs are `(ts timestamp, user_id long, event_id long)` frames
    * (pre-filtered to their event type). Output: one row per
    * qualifying pair with the view→click gap in microseconds; late
    * rows beyond the watermark are dropped by the engine. Downstream
    * picks the attribution policy (e.g. latest-view-wins via a
    * windowed agg on the sink table — kept out of this operator so the
    * join stays append-mode).
    */
  def streamClickAttribution(views: DataFrame, clicks: DataFrame,
                             lookback: String = "1 hour",
                             watermark: String = "1 hour"): DataFrame = {
    val v = views.select(col("ts").as("view_ts"),
        col("user_id").as("v_user"), col("event_id").as("view_event_id"))
      .withWatermark("view_ts", watermark)
    val c = clicks.select(col("ts").as("click_ts"),
        col("user_id").as("c_user"), col("event_id").as("click_event_id"))
      .withWatermark("click_ts", watermark)
    v.join(c,
        expr(s"""v_user = c_user AND
                 view_ts BETWEEN click_ts - INTERVAL $lookback
                             AND click_ts"""))
      .select(col("v_user").as("user_id"),
              col("view_event_id"), col("click_event_id"),
              (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
                .as("gap_us"))
  }

  case class UserEvent(user_id: Long, event_id: Long, ts_us: Long,
                       event_type: String)
  case class LastEvent(ts_us: Long, event_id: Long, event_type: String)
  case class Transition(user_id: Long, from_type: String, to_type: String)

  /** D14: streaming first-order event transitions — the streaming
    * twin of [[graft.operators.Behavior.eventTransitions]]. Keyed
    * state holds ONE row per user (the last event under the total
    * order `(ts_us, event_id)` — the same tiebreak as the batch
    * window), each micro-batch folds its rows per user in that order
    * and emits one `(from_type, to_type)` pair per consecutive step,
    * including the cross-batch boundary pair from the held state.
    * Counting the emitted pairs therefore equals the batch operator
    * over the concatenated in-order input.
    *
    * Replay/straggler discipline (the D1 guard): an event at-or-below
    * the held state's `(ts_us, event_id)` is dropped, so an
    * at-least-once replay of already-folded rows emits NOTHING — the
    * downstream count needs no dedup. The cost: a genuinely late
    * out-of-order event loses its transitions (bounded-state
    * streaming can't retroactively splice a sequence — the batch twin
    * is the backfill path, the house lambda split).
    */
  def streamEventTransitions(events: Dataset[UserEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[LastEvent]) =>
          var last = state.getOption
          val out = Seq.newBuilder[Transition]
          rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (last.forall(l =>
                l.ts_us < e.ts_us ||
                  (l.ts_us == e.ts_us && l.event_id < e.event_id))) {
              last.foreach(l => out += Transition(uid, l.event_type, e.event_type))
              last = Some(LastEvent(e.ts_us, e.event_id, e.event_type))
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** One daily observation of the D18 EWMA stream. */
  case class DailyMetric(key: String, day: Long, x: Long)
  /** D18 state: last folded day + running milli-state. */
  case class EwmaState(day: Long, ewma_milli: Long)
  /** One smoothed point emitted by [[streamEwma]]. */
  case class EwmaPoint(key: String, day: Long, ewma_milli: Long)

  /** One observation of the D20 experiment stream. */
  case class AbObs(stratum: String, ts_us: Long, obs_id: Long,
                   variant: Long, converted: Boolean)
  /** D20 state: four counters + the processed frontier. */
  case class AbState(nA: Long, cA: Long, nB: Long, cB: Long,
                     lastTs: Long, lastId: Long)
  /** The running test emitted per stratum per batch. */
  case class AbResult(stratum: String, n_a: Long, conv_a: Long,
                      n_b: Long, conv_b: Long, significant: Boolean)

  /** D20: streaming two-proportion A/B monitor — the streaming half
    * of C82: keyed state is FOUR counters plus the `(ts_us, obs_id)`
    * frontier, each batch folds its observations in that total order
    * dropping at-or-below-frontier rows (the D1/D14 guard — an
    * at-least-once replay cannot double-count an arm), and the
    * stratum emits its UPDATED running test after every batch that
    * touched it. The significance decision is the same exact squared
    * inequality as the batch operator, computed here in BigInt —
    * no sqrt, no float, and no overflow at any stream length.
    */
  def streamAbTest(obs: Dataset[AbObs], z2Permyriad: Long)
      : Dataset[AbResult] = {
    require(z2Permyriad > 0, s"z2Permyriad must be > 0, got $z2Permyriad")
    import obs.sparkSession.implicits._
    obs.groupByKey(_.stratum)
      .flatMapGroupsWithState[AbState, AbResult](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (stratum: String, rows: Iterator[AbObs],
         state: GroupState[AbState]) =>
          var st = state.getOption
            .getOrElse(AbState(0L, 0L, 0L, 0L, Long.MinValue, Long.MinValue))
          var touched = false
          rows.toSeq.sortBy(o => (o.ts_us, o.obs_id)).foreach { o =>
            if (st.lastTs < o.ts_us ||
                (st.lastTs == o.ts_us && st.lastId < o.obs_id)) {
              st =
                if (o.variant == 0L)
                  st.copy(nA = st.nA + 1, cA = st.cA + (if (o.converted) 1L else 0L),
                    lastTs = o.ts_us, lastId = o.obs_id)
                else
                  st.copy(nB = st.nB + 1, cB = st.cB + (if (o.converted) 1L else 0L),
                    lastTs = o.ts_us, lastId = o.obs_id)
              touched = true
            }
          }
          state.update(st)
          if (!touched || st.nA == 0 || st.nB == 0) Iterator.empty
          else {
            val (na, ca, nb, cb) =
              (BigInt(st.nA), BigInt(st.cA), BigInt(st.nB), BigInt(st.cB))
            val d = ca * nb - cb * na
            val n = na + nb; val c = ca + cb
            val sig = d * d * n * 10000 >
              BigInt(z2Permyriad) * c * (n - c) * na * nb
            Iterator.single(AbResult(stratum, st.nA, st.cA, st.nB, st.cB, sig))
          }
      }
  }

  /** D19 state: buffered reference days (bounded by `refDays`), the
    * fixed mean once known, the folded frontier, and both CUSUM arms. */
  case class CusumState(buf: List[(Long, Long)], mu: Option[Long],
                        lastDay: Long, sp: Long, sn: Long)
  /** One scored day emitted by [[streamCusum]]. */
  case class CusumPoint(key: String, day: Long, x: Long, mu_milli: Long,
                        cusum_up_milli: Long, cusum_down_milli: Long,
                        shift_up: Boolean, shift_down: Boolean)

  /** D19: streaming CUSUM drift detection — the streaming half of C75
    * with the one semantics difference stated up front: the batch
    * operator's reference mean uses `min(refDays, series length)`
    * days, but a stream cannot know a series ended, so scoring BEGINS
    * when the `refDays`-th day arrives (the buffered reference days
    * then flush through the recurrence in order — state is bounded by
    * `refDays + 3` longs per key). On any series with ≥ `refDays`
    * days the emissions equal the batch operator exactly. The
    * D1/D14/D18 at-or-below-frontier guard makes at-least-once
    * replays emit NOTHING; days arriving while the reference window
    * is still open advance the frontier too (a replay of a buffered
    * day cannot double-count the mean).
    */
  def streamCusum(metrics: Dataset[DailyMetric], refDays: Int,
                  slackMilli: Long, thresholdMilli: Long)
      : Dataset[CusumPoint] = {
    require(refDays >= 1, s"refDays must be >= 1, got $refDays")
    import metrics.sparkSession.implicits._
    metrics.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[DailyMetric],
         state: GroupState[CusumState]) =>
          var st = state.getOption
            .getOrElse(CusumState(Nil, None, Long.MinValue, 0L, 0L))
          val out = Seq.newBuilder[CusumPoint]
          def score(day: Long, x: Long, mu: Long): Unit = {
            val sp = math.max(0L, st.sp + x * 1000L - mu - slackMilli)
            val sn = math.max(0L, st.sn + mu - x * 1000L - slackMilli)
            st = st.copy(lastDay = day, sp = sp, sn = sn)
            out += CusumPoint(key, day, x, mu, sp, sn,
              sp > thresholdMilli, sn > thresholdMilli)
          }
          rows.toSeq.sortBy(_.day).foreach { m =>
            if (st.lastDay < m.day) {
              st.mu match {
                case Some(mu) => score(m.day, m.x, mu)
                case None =>
                  val buf = st.buf :+ (m.day, m.x)
                  st = st.copy(buf = buf, lastDay = m.day)
                  if (buf.size == refDays) {
                    val mu = buf.map(_._2).sum * 1000L / refDays
                    st = st.copy(buf = Nil, mu = Some(mu))
                    buf.foreach { case (d, x) => score(d, x, mu) }
                  }
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** D18: streaming per-key EWMA — the streaming half of C73 exactly
    * as D14 is of C57: keyed state holds TWO longs (last folded day +
    * running milli-state) forever, each batch folds its days in
    * ascending order through the identical integer recurrence
    * `(α·x·1000 + (1000−α)·s) div 1000`, so per-batch emissions equal
    * the batch operator on the concatenated input. The D1/D14
    * at-or-below-state guard (days ≤ the folded frontier are dropped)
    * makes an at-least-once replay emit NOTHING — no downstream
    * dedup. Gaps carry state unchanged, exactly the batch contract.
    */
  def streamEwma(metrics: Dataset[DailyMetric], alphaPermille: Long)
      : Dataset[EwmaPoint] = {
    require(alphaPermille >= 0 && alphaPermille <= 1000,
      s"alphaPermille must be in [0,1000], got $alphaPermille")
    import metrics.sparkSession.implicits._
    val a = alphaPermille
    metrics.groupByKey(_.key)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[DailyMetric],
         state: GroupState[EwmaState]) =>
          var st = state.getOption
          val out = Seq.newBuilder[EwmaPoint]
          rows.toSeq.sortBy(_.day).foreach { m =>
            if (st.forall(_.day < m.day)) {
              val next = st match {
                case None => m.x * 1000L
                case Some(s) =>
                  (a * m.x * 1000L + (1000L - a) * s.ewma_milli) / 1000L
              }
              st = Some(EwmaState(m.day, next))
              out += EwmaPoint(key, m.day, next)
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  case class HoltState(day: Long, level_milli: Long, trend_milli: Long)
  case class HoltPoint(key: String, day: Long, level_milli: Long,
                       trend_milli: Long, forecast_milli: Long)

  case class HwState(day: Long, level_milli: Long, trend_milli: Long,
                     slots: Seq[Long], i: Long)
  case class HwPoint(key: String, day: Long, level_milli: Long,
                     trend_milli: Long, seasonal_milli: Long,
                     forecast_milli: Long)

  /** Streaming Holt-Winters additive seasonality (D25 — C133
    * `hw_seasonal`'s streaming half, extending the recurrence-family
    * symmetry D18↔ewma / D19↔cusum / D24↔holt to the seasonal rung):
    * keyed state is the frontier day, level, trend, the SEVEN
    * seasonal slots, and the row index (slots address by row position
    * mod 7 — the batch operator's stated contract, so the index must
    * ride the state); each batch folds its days ascending through the
    * SHARED sign-trunc'd integer-milli recurrence (the stream ≡ batch
    * spec pins the two implementations together), at-or-below-frontier
    * days are ignored so replays emit nothing and cannot corrupt
    * state (the [[streamEwma]] ordering device). RocksDB at scale —
    * state is 10 longs + a 7-long array per key.
    */
  def streamHwSeasonal(metrics: Dataset[DailyMetric]): Dataset[HwPoint] = {
    import metrics.sparkSession.implicits._
    def strunc(num: Long, den: Long): Long =
      if (num < 0) -((-num) / den) else num / den
    metrics.groupByKey(_.key)
      .flatMapGroupsWithState[HwState, HwPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[DailyMetric],
         state: GroupState[HwState]) =>
          var st = state.getOption
          val out = Seq.newBuilder[HwPoint]
          rows.toSeq.sortBy(_.day).foreach { m =>
            if (st.forall(_.day < m.day)) {
              val next = st match {
                case None =>
                  HwState(m.day, m.x * 1000L, 0L, Seq.fill(7)(0L), 1L)
                case Some(s) =>
                  val idx = (s.i % 7).toInt
                  val sm = s.slots(idx)
                  val nl = strunc(300L * (m.x * 1000L - sm) +
                    700L * (s.level_milli + s.trend_milli), 1000L)
                  val nt = strunc(200L * (nl - s.level_milli) +
                    800L * s.trend_milli, 1000L)
                  val sn = strunc(300L * (m.x * 1000L - nl) +
                    700L * sm, 1000L)
                  HwState(m.day, nl, nt, s.slots.updated(idx, sn),
                    s.i + 1L)
              }
              val sea = st match {
                case None    => 0L
                case Some(s) => next.slots((s.i % 7).toInt)
              }
              val fc = st match {
                case None    => next.level_milli
                case Some(s) =>
                  // next day's slot, read from the PRE-write array —
                  // the batch operator's exact convention
                  next.level_milli + next.trend_milli +
                    s.slots(((s.i + 1L) % 7).toInt)
              }
              st = Some(next)
              out += HwPoint(key, m.day, next.level_milli,
                next.trend_milli, sea, fc)
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming Holt smoothing (D24 — C101 `holt_smooth`'s streaming
    * half, completing the recurrence-family symmetry D18↔ewma /
    * D19↔cusum): keyed state is THREE longs (last day, level, trend);
    * each batch folds its days in ascending order through the SHARED
    * integer recurrence (sign-explicit truncation — trend is
    * legitimately negative on declines), emitting one point per newly
    * advanced day; stale or duplicate days (at or below the state's
    * frontier) are ignored, so replays emit nothing and cannot
    * corrupt state (the [[streamEwma]] ordering device). RocksDB
    * state store at scale.
    */
  def streamHolt(metrics: Dataset[DailyMetric], alphaPermille: Long,
                 betaPermille: Long): Dataset[HoltPoint] = {
    require(alphaPermille >= 0 && alphaPermille <= 1000,
      s"alphaPermille must be in [0,1000], got $alphaPermille")
    require(betaPermille >= 0 && betaPermille <= 1000,
      s"betaPermille must be in [0,1000], got $betaPermille")
    import metrics.sparkSession.implicits._
    val a = alphaPermille; val b = betaPermille
    def strunc(num: Long, den: Long): Long =
      if (num < 0) -((-num) / den) else num / den
    metrics.groupByKey(_.key)
      .flatMapGroupsWithState[HoltState, HoltPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[DailyMetric],
         state: GroupState[HoltState]) =>
          var st = state.getOption
          val out = Seq.newBuilder[HoltPoint]
          rows.toSeq.sortBy(_.day).foreach { m =>
            if (st.forall(_.day < m.day)) {
              val next = st match {
                case None => HoltState(m.day, m.x * 1000L, 0L)
                case Some(s) =>
                  val nl = strunc(a * m.x * 1000L +
                    (1000L - a) * (s.level_milli + s.trend_milli), 1000L)
                  val nt = strunc(b * (nl - s.level_milli) +
                    (1000L - b) * s.trend_milli, 1000L)
                  HoltState(m.day, nl, nt)
              }
              st = Some(next)
              out += HoltPoint(key, m.day, next.level_milli,
                next.trend_milli, next.level_milli + next.trend_milli)
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  case class Touch(user_id: Long, ts_us: Long, event_id: Long,
                   event_type: String)
  case class TouchBuffer(touches: Seq[Touch])
  case class Credit(user_id: Long, conv_id: Long, conv_ts: Long,
                    touch_id: Long, touch_ts: Long, touch_type: String,
                    position: Long, n_touches: Long,
                    credit_permille: Long)

  /** Streaming multi-touch attribution (D21) — the streaming half of
    * [[graft.operators.Behavior.attributionCredits]]: per-user touch
    * buffers ride keyed state; a conversion emits every buffered
    * touch's credit (the shared
    * [[graft.operators.Behavior.creditPermille]] integer rule — the
    * stream ≡ batch-twin spec pins the two implementations together)
    * and clears the buffer, so each conversion's credits appear in
    * the micro-batch its conversion arrives in and sum to exactly
    * 1000. Within a batch events process in `(ts, id)` order — the
    * batch twin's deterministic tiebreak. `maxTouches` bounds state
    * per user (the NEWEST touches are kept — a bounded-attention
    * contract for unbounded streams); non-touch, non-conversion types
    * pass through unbuffered. Run on the RocksDB state store at
    * corpus scale.
    */
  def streamAttribution(events: Dataset[Touch], convType: String,
                        touchTypes: Set[String], model: String,
                        maxTouches: Int = 1024): Dataset[Credit] = {
    require(maxTouches >= 1, s"maxTouches must be >= 1, got $maxTouches")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchBuffer, Credit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Touch], state: GroupState[TouchBuffer]) =>
          var buf = state.getOption.map(_.touches).getOrElse(Seq.empty)
          val out = Seq.newBuilder[Credit]
          rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (e.event_type == convType) {
              val n = buf.size.toLong
              buf.zipWithIndex.foreach { case (t, i) =>
                out += Credit(user, e.event_id, e.ts_us, t.event_id,
                  t.ts_us, t.event_type, i + 1L, n,
                  graft.operators.Behavior.creditPermille(model, i + 1L, n))
              }
              buf = Seq.empty
            } else if (touchTypes.contains(e.event_type)) {
              buf = (buf :+ e).takeRight(maxTouches)
            }
          }
          state.update(TouchBuffer(buf))
          out.result().iterator
      }
  }

  case class ScoreObs(key: String, score: Long)
  case class KsCounts(scores: Map[Long, Long])
  case class KsRow(key: String, n_base: Long, n_cur: Long,
                   ks_micro: Long, ks_at_score: Long)

  /** D22: streaming KS drift monitor — [[graft.operators.Behavior
    * .ksDrift]]'s streaming half: each key's LIVE score distribution
    * is tested after every micro-batch against a FIXED base histogram
    * (the reference window a drift alarm compares to), emitting the
    * same exact-integer statistic as the batch operator —
    * `ks_micro = (10⁶·max_s |cum_base·n_cur − cum_cur·n_base|) div
    * (n_base·n_cur)` with the lowest-attaining-score tie rule, BigInt
    * cross-products so corpus-scale counts cannot overflow.
    *
    * State per key is the score histogram — BOUNDED by the permille
    * score domain (≤ |domain| counters forever, the
    * bounded-score-domain contract), never the observation history.
    * Pure-count state is replay-friendlier than the sorted-fold ops:
    * state' is a function of the batch's content MULTISET (addition
    * commutes), so an at-least-once re-execution of the same batch
    * rebuilds identical state with no ordering device at all. Output
    * (Update mode): one row per touched key per batch. Run on the
    * RocksDB state store at corpus scale.
    */
  case class LabeledPred(truth: String, pred: String)
  case class CellCount(n: Long)
  case class CellRow(truth: String, pred: String, n: Long)

  /** Streaming confusion-cell maintenance (D23 — E84
    * `classification_report`'s streaming half: the report is a trivial
    * batch view over the (truth, pred) cell counts, so the streaming
    * job maintains the CELLS and emits every touched cell's updated
    * running count per micro-batch). State per (truth, pred) key is
    * ONE long — bounded by |classes|² forever, and pure-COUNT state
    * needs no ordering device (the [[streamKsDrift]] contract:
    * addition commutes, a batch's content multiset rebuilds identical
    * state under replay, and state commits align with batch commits).
    * Update-mode emission; RocksDB store at scale.
    */
  def streamConfusionCells(
      preds: Dataset[LabeledPred]): Dataset[CellRow] = {
    import preds.sparkSession.implicits._
    preds.groupByKey(p => (p.truth, p.pred))
      .flatMapGroupsWithState[CellCount, CellRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (String, String), rows: Iterator[LabeledPred],
         state: GroupState[CellCount]) =>
          val n = state.getOption.map(_.n).getOrElse(0L) + rows.size
          state.update(CellCount(n))
          Iterator.single(CellRow(key._1, key._2, n))
      }
  }

  def streamKsDrift(obs: Dataset[ScoreObs],
                    base: Map[Long, Long]): Dataset[KsRow] = {
    require(base.nonEmpty, "base histogram must be non-empty")
    require(base.values.forall(_ > 0), "base counts must be positive")
    import obs.sparkSession.implicits._
    val nb = base.values.sum
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[KsCounts, KsRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[ScoreObs],
         state: GroupState[KsCounts]) =>
          val cur = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(s => cur ++= s.scores)
          rows.foreach { r =>
            cur.update(r.score, cur.getOrElse(r.score, 0L) + 1L)
          }
          state.update(KsCounts(cur.toMap))
          val nc = cur.valuesIterator.sum
          val domain = (base.keySet ++ cur.keySet).toSeq.sorted
          var cb = BigInt(0); var cc = BigInt(0)
          var best = BigInt(-1); var bestAt = 0L
          domain.foreach { s =>
            cb += BigInt(base.getOrElse(s, 0L))
            cc += BigInt(cur.getOrElse(s, 0L))
            val d = (cb * nc - cc * nb).abs
            if (d > best) { best = d; bestAt = s }
          }
          val ks = (BigInt(1000000) * best /
            (BigInt(nb) * BigInt(nc))).toLong
          Iterator.single(KsRow(key, nb, nc, ks, bestAt))
      }
  }

  case class DailyXY(key: String, day: Long, x: Long, y: Long)
  case class CrossState(day: Long, days: Seq[Long], xs: Seq[Long],
                        ys: Seq[Long], m: Seq[Long])
  case class LagCorr(key: String, upto_day: Long, lag: Long,
                     n_pairs: Long, r_sign: Option[Long],
                     r2_permyriad: Option[Long])

  /** Streaming lead-lag cross-correlation (D26 — C132 `cross_corr`'s
    * streaming half): when day d arrives (ascending, the frontier
    * guard), the ONLY newly completable pairs are `(x_{d−ℓ}, y_d)`
    * for each lag ℓ whose partner day sits in the ring buffer — so a
    * buffer of the last maxLag+1 days plus six RUNNING raw moments
    * per lag (n, Σx, Σy, Σx², Σy², Σxy — Longs; the envelope is the
    * daily-milli grid the family shares) is EXACTLY the batch
    * operator's pair set at every prefix, with state bounded at
    * `(maxLag+1)·9` longs per key regardless of history length.
    * Emissions carry `upto_day` (the stats are over days ≤ it) and
    * reproduce the batch formula — centered DECIMAL-exact moments in
    * BigInt, the sign/square device, lags with < 2 pairs or zero
    * variance null, zero-pair lags absent. A batch that advances no
    * day (a replay) emits NOTHING and cannot corrupt the moments —
    * the [[streamEwma]] ordering device.
    */
  def streamCrossCorr(obs: Dataset[DailyXY], maxLag: Int)
      : Dataset[LagCorr] = {
    require(maxLag >= 0 && maxLag <= 90, s"maxLag in [0,90], got $maxLag")
    import obs.sparkSession.implicits._
    val L = maxLag
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[CrossState, LagCorr](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[DailyXY],
         state: GroupState[CrossState]) =>
          var st = state.getOption.getOrElse(
            CrossState(Long.MinValue, Nil, Nil, Nil,
              Seq.fill(6 * (L + 1))(0L)))
          var advanced = false
          rows.toSeq.sortBy(_.day).foreach { r =>
            if (st.day < r.day) {
              advanced = true
              val days = (st.days :+ r.day).dropWhile(_ < r.day - L)
              val keep = st.days.length + 1 - days.length
              val xs = (st.xs :+ r.x).drop(keep)
              val ys = (st.ys :+ r.y).drop(keep)
              val m = st.m.toArray
              (0 to L).foreach { lag =>
                val i = days.indexOf(r.day - lag)
                if (i >= 0) {
                  val px = xs(i); val py = r.y; val o = 6 * lag
                  m(o) += 1L; m(o + 1) += px; m(o + 2) += py
                  m(o + 3) += px * px; m(o + 4) += py * py
                  m(o + 5) += px * py
                }
              }
              st = CrossState(r.day, days, xs, ys, m.toSeq)
            }
          }
          if (!advanced) Iterator.empty
          else {
            state.update(st)
            def strunc(a: BigInt, b: BigInt): BigInt = a / b // BigInt
            // division truncates toward zero — the batch strunc
            (0 to L).iterator.flatMap { lag =>
              val o = 6 * lag
              val n = st.m(o)
              if (n == 0L) None
              else {
                val (sx, sy) = (BigInt(st.m(o + 1)), BigInt(st.m(o + 2)))
                val sxx = BigInt(n) * st.m(o + 3) - sx * sx
                val syy = BigInt(n) * st.m(o + 4) - sy * sy
                val sxy = BigInt(n) * st.m(o + 5) - sx * sy
                val ok = sxx > 0 && syy > 0
                Some(LagCorr(key, st.day, lag.toLong, n,
                  if (ok) Some(sxy.signum.toLong) else None,
                  if (ok) Some((strunc(100 * sxy, sxx) *
                    strunc(100 * sxy, syy)).toLong) else None))
              }
            }
          }
      }
  }

  case class GDoc(grp: String, text: String)
  case class TokCell(grp: String, token: String, n: Long)

  /** Streaming (group, token) count-cell maintenance (D31 — E106
    * `token_keyness`'s streaming half, the [[streamConfusionCells]]
    * shape one level up: the keyness χ² is a pure function of the
    * cell counts, so the stream maintains THE CELLS and the batch
    * tail ([[graft.operators.TextAnalysis.tokenKeynessFromCells]])
    * rebuilds the report from the latest emission whenever asked):
    * documents tokenize map-side with the batch operator's exact
    * `[a-z0-9']+` lowercase rule.
    *
    * STATE DISCIPLINE: state is one [[MgState]] (the D12
    * [[mgFold]] Misra-Gries device) per GROUP, bounded at `capacity`
    * counters FOREVER — an adversarial or noisy corpus (random
    * strings, base64 blobs) grows distinct tokens linearly, so "one
    * counter per (group, token)" is not a closed domain the way its
    * siblings' p-micro grids and value histograms are. The MG
    * guarantees carry over exactly: while a group's distinct tokens
    * stay ≤ capacity no decrement ever fires and every cell count is
    * EXACT (stream ≡ batch, spec-pinned); past it, low-count tokens
    * evict jointly and surviving counts are under-estimates by at
    * most N/(capacity+1) — the right failure mode for a keyness
    * tail, whose `minCount` floor discards the low-count tail
    * anyway. Canonical (token-sorted) state + deterministic fold ⇒
    * replays rebuild identical rows. Update-mode emission: each
    * touched group re-emits its tracked cell set (≤ capacity rows —
    * under MG the decrement round touches EVERY tracked count, so
    * "changed cells only" is the full set whenever it matters).
    *
    * EVICTION / REBUILD CONTRACT: Update-mode emission never
    * RETRACTS — an evicted token's last pre-eviction row stays in
    * any naive latest-per-(group, token) downstream store, and a
    * token that re-enters after eviction re-emits a RESTARTED
    * (lower) count. Past capacity, a
    * [[graft.operators.TextAnalysis.tokenKeynessFromCells]] rebuild
    * must therefore use ONLY the most recent emission per group
    * (each touch re-emits the group's FULL tracked set, so the last
    * batch's rows per group are complete and self-consistent) —
    * merging latest-per-token rows across batches mixes current
    * tracked cells with stale evicted ones, a failure mode beyond
    * the documented N/(capacity+1) under-estimate. Within capacity
    * nothing ever evicts and the two reads coincide.
    */
  def streamTokenCells(docs: Dataset[GDoc],
                       capacity: Int = 1 << 16): Dataset[TokCell] = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    import docs.sparkSession.implicits._
    val tokRe = "[a-z0-9']+".r
    docs.flatMap(d => tokRe.findAllIn(d.text.toLowerCase)
        .map(t => TokenObs(d.grp, t)))
      .groupByKey(_.key)
      .flatMapGroupsWithState[MgState, TokCell](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (grp: String, rows: Iterator[TokenObs],
         state: GroupState[MgState]) =>
          val batch = rows.map(_.token).toArray
          if (batch.isEmpty) Iterator.empty
          else {
            val st = state.getOption.getOrElse(
              MgState(0L, 0L, Array.empty, Array.empty))
            val next = mgFold(st, batch, capacity)
            state.update(next)
            next.tokens.indices.iterator
              .map(i => TokCell(grp, next.tokens(i), next.counts(i)))
          }
      }
  }

  case class PObs(key: String, p_micro: Long)
  case class BhState(hist: Map[Long, Long])
  case class BhRow(key: String, m: Long, cutoff_p_micro: Option[Long],
                   n_rejected: Long)

  /** Streaming Benjamini-Hochberg monitor (D30 — C137 `bh_fdr`'s
    * streaming half: a test battery that GROWS — every new
    * metric/segment adds a test — needs its FDR cutoff maintained,
    * not recomputed from a rescan): per key the state is the p-value
    * HISTOGRAM (bounded by the micro grid forever, the
    * [[streamKsDrift]] contract), each batch folds new observations
    * in and re-walks the sorted histogram with the batch operator's
    * exact integer candidate rule (`1000·m·p ≤ α‰·cum·10⁶` in
    * BigInt), emitting the current `(m, cutoff, n_rejected)`. Each
    * arriving observation is one test (the battery's append log);
    * state versioning makes micro-batch replays exact.
    */
  def streamBhFdr(obs: Dataset[PObs], alphaPermille: Long)
      : Dataset[BhRow] = {
    require(alphaPermille >= 1 && alphaPermille <= 1000,
      s"alphaPermille in [1,1000], got $alphaPermille")
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[BhState, BhRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[PObs], state: GroupState[BhState]) =>
          val hist = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(s => hist ++= s.hist)
          var any = false
          rows.foreach { r =>
            any = true
            hist.update(r.p_micro, hist.getOrElse(r.p_micro, 0L) + 1L)
          }
          if (!any) Iterator.empty
          else {
            state.update(BhState(hist.toMap))
            val m = hist.valuesIterator.sum
            var cum = 0L
            var cutoff: Option[Long] = None
            var nRej = 0L
            hist.toSeq.sortBy(_._1).foreach { case (p, c) =>
              cum += c
              if (BigInt(1000) * m * p <=
                  BigInt(alphaPermille) * cum * 1000000) {
                cutoff = Some(p); nRej = cum
              }
            }
            Iterator.single(BhRow(key, m, cutoff, nRej))
          }
      }
  }

  case class MkState(day: Long, s: Long, hist: Map[Long, Long])
  case class MkPoint(key: String, upto_day: Long, n_days: Long, s: Long,
                     var18: Long, trend_sign: Long, significant: Boolean)

  /** Streaming Mann-Kendall trend monitor (D29 — C136
    * `mann_kendall`'s streaming half for the S/variance/significance
    * triple): when day d arrives (ascending, frontier-guarded), its
    * pair contributions against ALL history are `(#prior < x_d) −
    * (#prior > x_d)` — read from a VALUE HISTOGRAM, so state is
    * bounded by the value domain forever (the [[streamKsDrift]]
    * bounded-histogram contract; daily metrics are quantized by
    * construction), never by history length. `var18` and the
    * integer-grid 5% significance recompute per emission from the
    * histogram in BigInt — the batch operator's exact rule. ONE
    * STATED DIFFERENCE: the Sen slope needs day POSITIONS (unbounded
    * state) and stays batch-only. Replays emit nothing.
    */
  def streamMannKendall(metrics: Dataset[DailyMetric])
      : Dataset[MkPoint] = {
    import metrics.sparkSession.implicits._
    metrics.groupByKey(_.key)
      .flatMapGroupsWithState[MkState, MkPoint](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[DailyMetric],
         state: GroupState[MkState]) =>
          var st = state.getOption.getOrElse(
            MkState(Long.MinValue, 0L, Map.empty))
          var advanced = false
          rows.toSeq.sortBy(_.day).foreach { m =>
            if (st.day < m.day) {
              advanced = true
              val less = st.hist.iterator
                .collect { case (v, c) if v < m.x => c }.sum
              val greater = st.hist.iterator
                .collect { case (v, c) if v > m.x => c }.sum
              st = MkState(m.day, st.s + less - greater,
                st.hist.updated(m.x, st.hist.getOrElse(m.x, 0L) + 1L))
            }
          }
          if (!advanced) Iterator.empty
          else {
            state.update(st)
            val n = BigInt(st.hist.valuesIterator.sum)
            val tt = st.hist.valuesIterator.map(t =>
              BigInt(t) * (t - 1) * (2 * t + 5)).sum
            val var18 = n * (n - 1) * (2 * n + 5) - tt
            val sAbs = BigInt(st.s).abs
            val sig = st.s != 0L &&
              BigInt(180000) * (sAbs - 1) * (sAbs - 1) > 38416 * var18
            Iterator.single(MkPoint(key, st.day, n.toLong, st.s,
              var18.toLong, st.s.sign.toLong, sig))
          }
      }
  }

  case class DecompState(day: Long, days: Seq[Long], xs: Seq[Long],
                         dowSum: Seq[Long], dowN: Seq[Long])
  case class DecompPoint(key: String, day: Long, x: Long,
                         trend_milli: Long, seasonal_milli: Long,
                         resid_milli: Long)

  /** Streaming additive seasonal decomposition (D27 — C134
    * `seasonal_decompose`'s streaming half): the centered 7-day
    * trend at day e needs days e−3..e+3, so the stream emits day
    * d−3 when day d arrives — a 7-day ring buffer and the 3-day
    * emission delay are the whole memory of the series; a window
    * with any calendar gap never completes and its center row never
    * emits (gaps disable trend rather than contaminate it — when its
    * last-chance day e+3 arrives short, the row is dropped exactly
    * as the batch RANGE frame drops it). ONE STATED SEMANTIC
    * DIFFERENCE: `seasonal_milli(key, dow)` is the RUNNING mean of
    * detrended values over emitted rows so far (a stream cannot know
    * the series ended to take the batch's whole-series mean) —
    * stream ≡ batch EXACTLY whenever the detrended series is
    * dow-constant (any linear-trend + exact-weekly-pattern series,
    * the spec's pinned case), and converges to it otherwise. State:
    * frontier + ≤7 buffered days + 14 dow-slot longs; replays emit
    * nothing.
    */
  def streamSeasonalDecompose(metrics: Dataset[DailyMetric])
      : Dataset[DecompPoint] = {
    import metrics.sparkSession.implicits._
    def strunc(num: Long, den: Long): Long =
      if (num < 0) -((-num) / den) else num / den
    metrics.groupByKey(_.key)
      .flatMapGroupsWithState[DecompState, DecompPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[DailyMetric],
         state: GroupState[DecompState]) =>
          var st = state.getOption.getOrElse(
            DecompState(Long.MinValue, Nil, Nil,
              Seq.fill(7)(0L), Seq.fill(7)(0L)))
          val out = Seq.newBuilder[DecompPoint]
          rows.toSeq.sortBy(_.day).foreach { r =>
            if (st.day < r.day) {
              val days = (st.days :+ r.day).dropWhile(_ < r.day - 6)
              val keep = st.days.length + 1 - days.length
              val xs = (st.xs :+ r.x).drop(keep)
              var (dowSum, dowN) = (st.dowSum, st.dowN)
              val e = r.day - 3
              // the window centered at e is complete iff its seven
              // calendar days are exactly the buffer's last seven
              if (days.length == 7 && days.head == r.day - 6) {
                val trend = strunc(1000L * xs.sum, 7L)
                val det = xs(3) * 1000L - trend
                val dow = (e % 7).toInt
                dowSum = dowSum.updated(dow, dowSum(dow) + det)
                dowN = dowN.updated(dow, dowN(dow) + 1L)
                val sea = strunc(dowSum(dow), dowN(dow))
                out += DecompPoint(key, e, xs(3), trend, sea, det - sea)
              }
              st = DecompState(r.day, days, xs, dowSum, dowN)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming SKYLINE-store maintenance (D28 — the Pareto front's
    * streaming half, extending the store symmetry D9↔C44 / D13↔C48 /
    * D15↔C50 / cm to dominance queries; skyline_2d's prefix-max is
    * the classic streaming fold, and the store form keeps it
    * QUERYABLE without the streaming query's participation): each
    * micro-batch appends one per-x partial `(x, max_y, n at max)` —
    * a pure function of batch content
    * ([[graft.operators.Relational.extendSkylineStore]]), so an
    * at-least-once replay writes row-identical partials that
    * `readSkylineStore`'s `(x, batch_id)` dedup collapses; the read
    * merges partials (max wins, counts sum only at the max) and runs
    * the shared prefix-max fold — rows EXACTLY equal to batch
    * `skyline2d` over every point ever streamed, at ≤|X| store rows
    * per batch (never point-sized). `compactEvery` folds committed
    * batches with the shared swap + recover protocol.
    */
  def streamSkylineMaintain(points: Dataset[Point2D], storeDir: String,
                            checkpointDir: String,
                            compactEvery: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    points.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Point2D], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Relational.extendSkylineStore(
            batch.toDF, storeDir, "x", "y", batchId)
          compactEvery.foreach { n =>
            if (n > 0 && (batchId + 1) % n == 0)
              graft.operators.Relational.compactSkylineStore(
                batch.sparkSession, storeDir, batchId)
          }
        }
        ()
      }
      .start()

  case class Point2D(x: Long, y: Long)

  case class GapEvent(user: Long, grp: String, ts: Long)
  case class GapRow(grp: String, user: Long, ts: Long, gap: Long)
  case class UserFrontier(ts: Long)

  /** Streaming per-user inter-arrival gap derivation (D32 — C138
    * `burstiness`'s streaming half, split at the shared tail the D31
    * way: the stream derives THE GAPS with per-user frontier state
    * and the batch tail
    * ([[graft.operators.Behavior.burstinessFromGaps]]) rebuilds the
    * CV² report from the gap log whenever asked). When an event
    * arrives past a user's frontier, one gap row `(grp of the later
    * event, user, ts, ts − frontier)` emits and the frontier
    * advances — the batch operator's later-event gap attribution.
    * State: ONE long (the frontier ts) per active user — bounded by
    * the user population, never event history — and its LIFETIME is
    * a knob: with `frontierTtlMs = Some(ttl)` a user whose frontier
    * goes untouched for `ttl` of processing time EXPIRES
    * (ProcessingTimeTimeout ⇒ state removed), so departed users'
    * frontiers are not dead weight forever; the stated cost is that
    * a gap LONGER than the TTL is dropped (the returning user's
    * first event re-seeds a fresh frontier and emits nothing) —
    * choose ttl ≥ the largest gap of interest. With the default
    * `None` the frontier lives forever and stream ≡ batch exactly
    * as before. OPERATIONAL NOTE: with a processing-time timeout
    * registered, Spark schedules no-data batches unconditionally
    * (`shouldRunAnotherBatch` is always true), so run the TTL
    * variant under a ProcessingTime trigger (an as-fast-as-possible
    * trigger spins empty batches) and drive tests by polling the
    * sink — `processAllAvailable` never observes quiescence.
    * Replays and out-of-order arrivals emit nothing
    * (strict frontier). ONE STATED DIFFERENCE from batch:
    * same-instant events cannot advance a strict frontier, so
    * equal-ts duplicates DROP where the batch window's (ts, grp)
    * tiebreak emits 0-gaps — stream ≡ batch exactly on tie-free
    * series (spec-pinned).
    */
  def streamUserGaps(events: Dataset[GapEvent],
                     frontierTtlMs: Option[Long] = None)
      : Dataset[GapRow] = {
    import events.sparkSession.implicits._
    require(frontierTtlMs.forall(_ > 0),
      s"frontierTtlMs must be positive, got $frontierTtlMs")
    val timeoutConf =
      if (frontierTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user)
      .flatMapGroupsWithState[UserFrontier, GapRow](
        OutputMode.Update(), timeoutConf) {
        (user: Long, rows: Iterator[GapEvent],
         state: GroupState[UserFrontier]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(UserFrontier(Long.MinValue))
            val out = Seq.newBuilder[GapRow]
            rows.toSeq.sortBy(r => (r.ts, r.grp)).foreach { r =>
              if (st.ts < r.ts) {
                if (st.ts != Long.MinValue)
                  out += GapRow(r.grp, user, r.ts, r.ts - st.ts)
                st = UserFrontier(r.ts)
              }
            }
            state.update(st)
            frontierTtlMs.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  case class RatingObs(item: Long, rater: String, label: String)
  /** Canonical per-item vote state: rater-sorted parallel arrays (a
    * pure function of the rater→label MAP). */
  case class VoteState(raters: Array[String], labels: Array[String])
  case class KappaCell(item: Long, label: String, n: Long)

  /** Streaming (item, label) vote-cell maintenance (D33 — E105
    * `fleiss_kappa`'s streaming half, the [[streamConfusionCells]] /
    * D31 shape: kappa is a pure function of the vote cells, so the
    * stream maintains THE CELLS and the batch tail
    * ([[graft.operators.Behavior.fleissKappaFromCells]]) rebuilds
    * the agreement report from the latest emission whenever asked —
    * the exactly-`nRaters` panel filter included). Each item's state
    * is its rater→label vote map — bounded by the PANEL (raters per
    * item), never by the rating stream. A rater's FIRST vote per
    * item wins; re-votes and replays change nothing and emit
    * nothing (idempotent fold ⇒ replay-silent, and cell counts are
    * MONOTONE, so the latest-cell rebuild is a max). ONE STATED
    * DIFFERENCE from batch: conflicting duplicate (item, rater)
    * rows collapse to the FIRST arrival here vs the MIN label in
    * batch (a stream has an arrival order; an unordered batch frame
    * does not) — stream ≡ batch exactly when every (item, rater)
    * carries one distinct vote, the stated batch contract.
    */
  case class DailyFlag(key: String, day: Long, x: Boolean)
  case class RunsState(day: Long, prev: Boolean, runs: Long, n1: Long,
                       n2: Long)
  case class RunsPoint(key: String, upto_day: Long, n_days: Long,
                       n_pos: Long, n_neg: Long, runs: Long,
                       significant: Option[Boolean])

  /** Streaming Wald-Wolfowitz runs monitor (D34 — C141 `runs_test`'s
    * streaming half: the runs count is a PREFIX FOLD — one frontier
    * day, the last flag, and three counters are its entire memory —
    * so the randomness alarm maintains instead of rescanning). Days
    * arrive ascending per key (strict frontier; replays and
    * out-of-order arrivals emit nothing); each advancing day bumps
    * `runs` iff the flag changed, and every emission re-evaluates the
    * batch operator's exact cleared-denominator z² rule in BigInt —
    * identical integers to C141 at every prefix. State: FIVE fields
    * per key, forever.
    */
  def streamRunsTest(flags: Dataset[DailyFlag]): Dataset[RunsPoint] = {
    import flags.sparkSession.implicits._
    flags.groupByKey(_.key)
      .flatMapGroupsWithState[RunsState, RunsPoint](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[DailyFlag],
         state: GroupState[RunsState]) =>
          var st = state.getOption.getOrElse(
            RunsState(Long.MinValue, false, 0L, 0L, 0L))
          var advanced = false
          rows.toSeq.sortBy(_.day).foreach { r =>
            if (st.day < r.day) {
              advanced = true
              val bump = st.runs == 0L || st.prev != r.x
              st = RunsState(r.day, r.x,
                st.runs + (if (bump) 1L else 0L),
                st.n1 + (if (r.x) 1L else 0L),
                st.n2 + (if (r.x) 0L else 1L))
            }
          }
          if (!advanced) Iterator.empty
          else {
            state.update(st)
            val n = BigInt(st.n1 + st.n2)
            val sig =
              if (st.n1 > 0 && st.n2 > 0 &&
                  BigInt(2) * st.n1 * st.n2 > n)
                Some(BigInt(10000)
                  * (BigInt(st.runs) * n - n - BigInt(2) * st.n1 * st.n2)
                  * (BigInt(st.runs) * n - n - BigInt(2) * st.n1 * st.n2)
                  * (n - 1)
                  > BigInt(38416) * 2 * st.n1 * st.n2
                    * (BigInt(2) * st.n1 * st.n2 - n))
              else None
            Iterator.single(RunsPoint(key, st.day, n.toLong, st.n1,
              st.n2, st.runs, sig))
          }
      }
  }

  case class LbState(day: Long, series: Map[Long, Long])
  case class LbPoint(key: String, upto_day: Long, n_days: Long,
                     rho1_micro: Option[Long], q_milli: Option[Long],
                     significant: Option[Boolean])

  /** Streaming Ljung-Box monitor (D35 — C143 `ljungBox`'s streaming
    * half): the quantized objective is a pure function of the whole
    * day-sorted series (every past deviation `c_i = n·x_i − S`
    * rescales as n and S grow), so the state IS the daily series —
    * one (day → value) entry per observed day, bounded by the SAME
    * `maxDays` calendar contract the batch guard enforces (state
    * past the bound fails fast with the batch guard's message, never
    * grows silently — the D29 bounded-by-domain discipline, keyed by
    * calendar rather than value domain). Every advancing batch
    * re-evaluates the batch operator's exact BigInt objective —
    * identical integers to C143 at every prefix. Replays and
    * out-of-order arrivals emit nothing (strict frontier).
    */
  def streamLjungBox(metrics: Dataset[DailyMetric], maxLag: Int,
                     maxDays: Long = 5000L): Dataset[LbPoint] = {
    require(maxLag >= 1 && maxLag <= 10,
      s"maxLag in [1,10] (embedded chi-square grid), got $maxLag")
    val critMilli = Seq(3841L, 5991L, 7815L, 9488L, 11070L, 12592L,
      14067L, 15507L, 16919L, 18307L)(maxLag - 1)
    import metrics.sparkSession.implicits._
    metrics.groupByKey(_.key)
      .flatMapGroupsWithState[LbState, LbPoint](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[DailyMetric],
         state: GroupState[LbState]) =>
          var st = state.getOption.getOrElse(
            LbState(Long.MinValue, Map.empty))
          var advanced = false
          rows.toSeq.sortBy(_.day).foreach { m =>
            if (st.day < m.day) {
              advanced = true
              if (st.series.size >= maxDays)
                // the batch guard's message verbatim (withDailyGuard's
                // wording) — stream and batch contracts fail identically
                throw new IllegalStateException(
                  "ljungBox: the input must be a DAILY-AGGREGATED " +
                    s"series with at most maxDays=$maxDays distinct " +
                    "days and no duplicate days; aggregate upstream " +
                    "or raise maxDays knowingly (got " +
                    s"${st.series.size + 1} days over key '$key')")
              st = LbState(m.day, st.series.updated(m.day, m.x))
            }
          }
          if (!advanced) Iterator.empty
          else {
            state.update(st)
            val xs = st.series.toSeq.sortBy(_._1).map(_._2)
            val n = xs.size
            val s = xs.map(BigInt(_)).sum
            val c = xs.map(x => BigInt(n) * x - s)
            val den = c.map(v => v * v).sum
            if (n <= maxLag || den == 0)
              Iterator.single(LbPoint(key, st.day, n.toLong,
                None, None, None))
            else {
              val num = (1 to maxLag).map(h =>
                (0 until n - h).map(i => c(i) * c(i + h)).sum)
              val rho = num.map(v => BigInt(1000000) * v.abs / den)
              val qs = (1 to maxLag).map(h =>
                BigInt(1000000) * rho(h - 1) * rho(h - 1) / (n - h)).sum
              val lhs = BigInt(1000) * n * (n + 2) * qs
              val e18 = BigInt("1000000000000000000")
              Iterator.single(LbPoint(key, st.day, n.toLong,
                Some((if (num.head < 0) -rho.head else rho.head).toLong),
                Some((lhs / e18).toLong),
                Some(lhs > BigInt(critMilli) * e18)))
            }
          }
      }
  }

  case class PairObs(subject: Long, a: Long, b: Long)
  case class DiffRow(subject: Long, d: Long)
  case class SeenState(seen: Boolean)

  /** Streaming paired-difference derivation (D36 — C144
    * `wilcoxon_signed_rank`'s streaming half, split at the shared
    * tail the D32 way: the signed-rank test is a pure function of
    * the per-subject DIFFERENCES, so the stream derives THE DIFFS
    * with per-subject first-wins state and the batch tail —
    * [[graft.operators.Behavior.wilcoxonSignedRank]] over the diff
    * log as `(d, 0)` pairs — rebuilds the test whenever asked,
    * zero-diff drop and magnitude-histogram guard included). A
    * subject's FIRST pair wins: one `DiffRow(subject, a − b)` emits
    * and the subject is marked seen; re-observations and replays
    * emit nothing (idempotent ⇒ replay-silent — the batch contract's
    * one-row-per-pair precondition enforced by arrival order).
    * State: ONE boolean per subject, bounded by the subject
    * universe, never the observation stream — the D32 lifetime
    * class; pass `seenTtlMs` to expire departed subjects'
    * markers (stated cost: a replay arriving after expiry
    * re-emits — choose ttl ≥ the replay horizon; the D32
    * operational note applies: pair the TTL with a ProcessingTime
    * trigger, poll sinks in tests).
    */
  def streamPairDiffs(pairs: Dataset[PairObs],
                      seenTtlMs: Option[Long] = None): Dataset[DiffRow] = {
    import pairs.sparkSession.implicits._
    require(seenTtlMs.forall(_ > 0),
      s"seenTtlMs must be positive, got $seenTtlMs")
    val timeoutConf =
      if (seenTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    pairs.groupByKey(_.subject)
      .flatMapGroupsWithState[SeenState, DiffRow](
        OutputMode.Update(), timeoutConf) {
        (subject: Long, rows: Iterator[PairObs],
         state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            seenTtlMs.foreach(state.setTimeoutDuration)
            Iterator.empty
          } else {
            // deterministic first: lowest (a, b) of the batch
            val r = rows.toSeq.minBy(p => (p.a, p.b))
            state.update(SeenState(true))
            seenTtlMs.foreach(state.setTimeoutDuration)
            Iterator.single(DiffRow(subject, r.a - r.b))
          }
      }
  }

  case class FTObs(subject: Long, treatment: String, value: Long)
  case class FTCell(subject: Long, treatment: String, value: Long)
  /** Per-subject treatment→value map (rater-sorted parallel arrays,
    * the [[VoteState]] device) with an overflow tombstone. */
  case class BlockState(treatments: Array[String], values: Array[Long],
                        overflowed: Boolean)

  /** The treatment a block emits once when it exceeds k cells: its
    * presence keeps the rebuilt block's size above k FOREVER, so the
    * batch tail's exactly-k filter drops it — without the stream
    * remembering the unbounded set of extra treatments. */
  val FriedmanOverflowSentinel = "\u0000overflow"

  /** Streaming (subject, treatment, value) block-cell maintenance
    * (D37 — C142 `friedman_test`'s streaming half, the D33 vote-cell
    * shape: the tie-corrected rank statistic is a pure function of
    * the block cells, so the stream maintains THE CELLS and the
    * batch tail — [[graft.operators.Behavior.friedmanTest]] over the
    * latest emission per (subject, treatment) — rebuilds the battery
    * whenever asked, complete-blocks filter included; the same cells
    * serve [[graft.operators.Behavior.cochranQ]] when values are
    * 0/1, one store → two matched-design reports). A treatment's
    * FIRST value per subject wins; re-votes and replays change
    * nothing and emit nothing (idempotent fold ⇒ replay-silent,
    * cells MONOTONE so latest-per-cell = first). Each advancing
    * batch re-emits the subject's full cell set (≤ k rows).
    *
    * STATE DISCIPLINE: a block is useful only while it holds ≤ k
    * cells (the batch filter keeps EXACTLY-k blocks); at the
    * (k+1)-th distinct treatment the stream emits the overflow row —
    * the (k+1)-th cell plus [[FriedmanOverflowSentinel]] — and
    * collapses state to a TOMBSTONE (one flag), so the rebuilt block
    * stays above k forever and per-subject state is bounded at
    * k cells, never the treatment vocabulary. ONE STATED DIFFERENCE
    * from batch: duplicate (subject, treatment) values collapse to
    * FIRST arrival here vs MIN in batch — stream ≡ batch exactly
    * when every (subject, treatment) carries one distinct value, the
    * stated batch contract.
    */
  def streamFriedmanBlocks(obs: Dataset[FTObs], k: Int)
      : Dataset[FTCell] = {
    require(k >= 2 && k <= 11, s"k in [2,11] (the batch grid), got $k")
    import obs.sparkSession.implicits._
    obs.groupByKey(_.subject)
      .flatMapGroupsWithState[BlockState, FTCell](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (subject: Long, rows: Iterator[FTObs],
         state: GroupState[BlockState]) =>
          val st = state.getOption.getOrElse(
            BlockState(Array.empty, Array.empty, overflowed = false))
          if (st.overflowed) Iterator.empty
          else {
            val m = new java.util.TreeMap[String, Long]()
            var i = 0
            while (i < st.treatments.length) {
              m.put(st.treatments(i), st.values(i)); i += 1
            }
            var changed = false
            var overflowCell: Option[FTCell] = None
            val it = rows
            while (it.hasNext && overflowCell.isEmpty) {
              val r = it.next()
              if (!m.containsKey(r.treatment)) {
                if (m.size == k)
                  overflowCell = Some(FTCell(subject, r.treatment, r.value))
                else {
                  m.put(r.treatment, r.value); changed = true
                }
              }
            }
            overflowCell match {
              case Some(cell) =>
                state.update(BlockState(Array.empty, Array.empty,
                  overflowed = true))
                // re-emit the k tracked cells alongside the overflow
                // row + sentinel: a same-batch overflow must not leave
                // a small-looking block in the rebuild (k+2 distinct
                // cells > k, so the exactly-k filter always drops it)
                val tracked = Seq.newBuilder[FTCell]
                val te = m.entrySet().iterator()
                while (te.hasNext) {
                  val en = te.next()
                  tracked += FTCell(subject, en.getKey, en.getValue)
                }
                tracked.result().iterator ++ Iterator(cell,
                  FTCell(subject, FriedmanOverflowSentinel, 0L))
              case None if changed =>
                val ts = new Array[String](m.size)
                val vs = new Array[Long](m.size)
                var j = 0
                val e = m.entrySet().iterator()
                while (e.hasNext) {
                  val en = e.next()
                  ts(j) = en.getKey; vs(j) = en.getValue; j += 1
                }
                state.update(BlockState(ts, vs, overflowed = false))
                ts.indices.iterator
                  .map(x => FTCell(subject, ts(x), vs(x)))
              case None => Iterator.empty
            }
          }
      }
  }

  case class DocObs(doc_id: Long, text: String)

  /** Streaming within-document duplicate n-gram ratio (D38 — E111
    * `dup_ngram_ratio`'s streaming half, and the degenerate case of
    * the twin discipline: the batch operator is PURELY map-side (one
    * projection per document, no shuffle, no state), so the
    * streaming twin IS the batch operator applied to an unbounded
    * frame — append output, zero state stores, stream ≡ batch row
    * for row by construction. Replay semantics are the source's
    * (exactly-once parquet/Kafka offsets re-emit nothing; an
    * at-least-once source duplicates rows — dedup upstream with D4's
    * exact-dedup stream if ids must be unique).
    */
  def streamDupNgramRatio(docs: Dataset[DocObs], n: Int)
      : DataFrame =
    graft.operators.TextAnalysis.dupNgramRatio(
      docs.toDF, "doc_id", "text", n)

  def streamFleissCells(ratings: Dataset[RatingObs]): Dataset[KappaCell] = {
    import ratings.sparkSession.implicits._
    ratings.groupByKey(_.item)
      .flatMapGroupsWithState[VoteState, KappaCell](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (item: Long, rows: Iterator[RatingObs],
         state: GroupState[VoteState]) =>
          val m = new java.util.TreeMap[String, String]()
          state.getOption.foreach { s =>
            var i = 0
            while (i < s.raters.length) {
              m.put(s.raters(i), s.labels(i)); i += 1
            }
          }
          var changed = false
          rows.foreach { r =>
            if (!m.containsKey(r.rater)) {
              m.put(r.rater, r.label); changed = true
            }
          }
          if (!changed) Iterator.empty
          else {
            val raters = new Array[String](m.size)
            val labels = new Array[String](m.size)
            var i = 0
            val it = m.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              raters(i) = e.getKey; labels(i) = e.getValue; i += 1
            }
            state.update(VoteState(raters, labels))
            labels.groupBy(identity).toSeq.sortBy(_._1).iterator
              .map { case (l, v) => KappaCell(item, l, v.length.toLong) }
          }
      }
  }
}
