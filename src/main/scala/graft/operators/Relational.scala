package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks for the ingest pipeline.
  *
  * Each method re-expresses a driver-side loop or SQL statement from the
  * reference as one declarative plan, so Catalyst handles pushdown and
  * AQE handles skew at scale.
  */
object Relational {

  /** Orphan cleanup: rows in `db` that belong to a parent present in the
    * current publish but whose own key is absent from it.
    *
    * Reference: alma_publish_to_database.py:139-143 (holdings of a
    * published bib not in its current holding list are deleted) and
    * :236-241 (items of a holding not in its current pid list).
    *
    * One semi join (parent present) + one anti join (own key absent);
    * both shuffle on their keys, no driver iteration.
    */
  def orphans(db: DataFrame, publish: DataFrame,
              parentKeys: Seq[String], childKeys: Seq[String]): DataFrame =
    db.join(publish.selectExpr(parentKeys: _*).distinct(), parentKeys, "left_semi")
      .join(publish.selectExpr((parentKeys ++ childKeys).distinct: _*).distinct(),
            parentKeys ++ childKeys, "left_anti")

  /** Surrogate-key dimension lookup. The reference loads the whole
    * `location` table into a driver dict (alma_publish_to_database.py:
    * 130-137); here the dimension is broadcast so the lookup is map-side
    * with zero shuffle on the fact table.
    */
  def dimLookup(fact: DataFrame, dim: DataFrame, joinKeys: Seq[(String, String)],
                how: String = "left"): DataFrame = {
    val cond = joinKeys.map { case (f, d) => fact(f) === dim(d) }.reduce(_ && _)
    fact.join(broadcast(dim), cond, how)
  }

  /** First record wins per key — the reference's in-memory
    * `bib_ids`/`holding_ids` dedup sets (alma_publish_parser.py:172-183),
    * made deterministic by an explicit tiebreak ordering.
    */
  def firstPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    keepRank1(df, keys, order)

  /** Latest record wins per key — the `item_base_status` guarded upsert
    * (`where update_date_time < $new`, alma_publish_to_database.py:124-125).
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    keepRank1(df, keys, order.map(_.desc))

  private def keepRank1(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Last row of each consecutive run of equal `runCol` values in
    * `orderCol` order — the analytics importer's prior-row buffering
    * (alma_analytics_to_item_status.py:35-49).
    *
    * The reference reads one file sequentially, so the window is global;
    * at scale partition this per input file (the run semantics only hold
    * within a file anyway).
    */
  def lastOfConsecutiveRuns(df: DataFrame, runCol: String, orderCol: String,
                            partitionCols: Seq[String] = Nil): DataFrame = {
    // empty partitionCols = the reference's one-file global scan; at
    // scale pass the input-file column (run semantics only hold within
    // a file anyway) and the window stops being single-partition
    val w =
      if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__next_run", lead(col(runCol), 1).over(w))
      .filter(col("__next_run").isNull || col("__next_run") =!= col(runCol))
      .drop("__next_run")
  }

  /** Chunk assignment for N-records-per-file output (split_jsonl.py).
    * For actual writes use `option("maxRecordsPerFile", n)`; this returns
    * the deterministic chunk index for verification.
    *
    * Scale shape: a global `row_number` window would move everything to
    * one partition. Instead: range-repartition on the order column +
    * per-partition sort (total order across partitions), then the
    * zipWithIndex pattern — per-partition counts (one tiny job, a
    * driver array of numPartitions longs) become cumulative offsets,
    * and the global index is offset + local position, assigned
    * map-side. Both jobs recompute the same deterministic range
    * partitioning (sampled with fixed seeds), so counts and rows align.
    */
  def chunkIndex(df: DataFrame, orderCol: String, n: Int,
                 ixCol: String = "file_ix"): DataFrame =
    withGlobalIndex(df, Seq(col(orderCol)), Seq(ixCol -> (_ / n)))

  /** Deterministic epoch shuffle into `nShards` balanced shards — the
    * layout step before a training run: order the corpus by its content
    * fingerprint (pass it in `orderCols`, with an id tiebreak), then
    * deal rows round-robin so every shard is (a) within one row of the
    * same size and (b) itself a uniform draw of the corpus. Appends
    * `shard` and `shard_pos` (the within-shard read order). Same
    * content → same layout on any engine or cluster shape.
    *
    * Scale shape: the zipWithIndex device of [[chunkIndex]] — ONE
    * range-repartition on the order columns (total order across
    * partitions, no single-partition window anywhere), per-partition
    * counts become driver-side offsets, shard/position assigned
    * map-side.
    */
  def shuffleShards(df: DataFrame, orderCols: Seq[Column],
                    nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    withGlobalIndex(df, orderCols,
      Seq("shard" -> (_ % nShards), "shard_pos" -> (_ / nShards)))
  }

  /** Global-index device shared by [[chunkIndex]] and [[shuffleShards]]:
    * range-repartition + per-partition sort gives a total order without
    * a global window; zipWithIndex turns per-partition counts (a driver
    * array of numPartitions longs) into cumulative offsets, and each
    * output column is a map-side function of offset + local position.
    * Both jobs recompute the same deterministic range partitioning
    * (sampled with fixed seeds), so counts and rows align.
    */
  private[operators] def withGlobalIndex(df: DataFrame, orderCols: Seq[Column],
                              outCols: Seq[(String, Long => Long)]): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema.fields ++ outCols.map { case (name, _) =>
        org.apache.spark.sql.types.StructField(
          name, org.apache.spark.sql.types.LongType, nullable = false)
      })
    val fns = outCols.map(_._2)
    val indexed = ranged.rdd.zipWithIndex().map { case (row, ix) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq ++ fns.map(f => f(ix)))
    }
    spark.createDataFrame(indexed, schema)
  }

  /** History retention — the lifecycle step the reference's
    * webhook-fed history tables (record_update, request_event) lack:
    * they grow unboundedly (ddl has no TTL). Keeps, per key, only the
    * newest `keepN` rows with `orderCol >= cutoff`. One key-partitioned
    * window — a single shuffle on the record key, scale-safe at any
    * history size. `tiebreak` columns make rank assignment
    * deterministic when order values collide.
    */
  def retainHistory(df: DataFrame, keys: Seq[String], orderCol: String,
                    keepN: Int, cutoff: Column,
                    tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc +: tiebreak.map(_.desc): _*)
    df.filter(col(orderCol) >= cutoff)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= keepN).drop("__rn")
  }

  /** As-of join: each left row picks up the LATEST right row with
    * right.ts <= left.ts for its key (temporal lookup — price-as-of,
    * status-as-of). Spark has no native ASOF; the scalable shape is
    * union + one key-partitioned window: a single shuffle on the key,
    * never a range-condition join (which Catalyst would plan as a
    * broadcast-nested-loop). Ties (equal ts) take the right row, like
    * SQL ASOF's `>=`.
    *
    * `rightCols` are the value columns carried over (nulled when no
    * right row precedes the left row).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lvType = left.schema
    val rvType = right.select(rightCols.map(col): _*).schema
    val l = left.select(
      keys.map(col) ++
      Seq(col(leftTs).as("__ts"), lit(1).as("__tag"),
          struct(leftCols.map(col): _*).as("__lv"),
          lit(null).cast(rvType).as("__rv")): _*)
    val r = right.select(
      keys.map(col) ++
      Seq(col(rightTs).as("__ts"), lit(0).as("__tag"),
          lit(null).cast(lvType).as("__lv"),
          struct(rightCols.map(col): _*).as("__rv")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__last_rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col("__lv")(c).as(c)) ++
              rightCols.map(c => col("__last_rv")(c).as(s"asof_$c")): _*)
  }

  /** Point-in-time feature attachment — the feature-store primitive
    * that builds LEAKAGE-FREE training sets: each spine row (a
    * training example at `spineTs`) gets the latest feature row
    * at-or-before its timestamp ([[asofJoin]] — so a feature computed
    * AFTER the example can never leak in), and features older than
    * `maxStalenessUs` are nulled rather than silently served stale
    * (the freshness SLA half of the contract). `feature_age_us`
    * reports the served feature's age; null when absent or stale.
    *
    * Composition contract: one feature GROUP per call (they share a
    * timestamp column); fold calls for multi-group training frames —
    * each fold is one key-partitioned window pass, never a rescan of
    * previously attached groups. Ties: a feature stamped exactly at
    * `spineTs` IS visible (≤ — matches the warehouse ASOF
    * convention); callers must dedupe the feature side to one row per
    * (keys, ts) or the tie winner is undefined, same as any ASOF.
    *
    * Scale shape: inherits [[asofJoin]]'s single merge — union the
    * two frames, ONE window over (keys) ordered by (ts, side-tag),
    * `last(ignoreNulls)` carries the feature forward; no range
    * explosion, no per-example probe. 100 TB: the window partitions
    * on the entity key; skewed hot entities are the caller's salting
    * decision as with every keyed window here.
    */
  def pointInTimeFeatures(spine: DataFrame, keys: Seq[String],
                          spineTs: String, features: DataFrame,
                          featureTs: String, featureCols: Seq[String],
                          maxStalenessUs: Long): DataFrame = {
    require(maxStalenessUs > 0, s"maxStalenessUs must be > 0")
    require(featureTs != spineTs,
      "feature ts column must be named differently from the spine's")
    val joined = asofJoin(spine, features, keys, spineTs, featureTs,
      featureCols :+ featureTs)
    val age = col(spineTs) - col(s"asof_$featureTs")
    val fresh = col(s"asof_$featureTs").isNotNull && age <= maxStalenessUs
    joined.select(
      spine.columns.map(col) ++
      featureCols.map(c =>
        when(fresh, col(s"asof_$c")).as(s"feat_$c")) ++
      Seq(when(fresh, age).as("feature_age_us")): _*)
  }

  /** Range (interval-containment) join without a nested loop: Catalyst
    * plans `point BETWEEN lo AND hi` as BroadcastNestedLoopJoin, which
    * dies when neither side broadcasts. Bucketize instead: intervals
    * explode into the fixed-width buckets they cover, points hash to
    * their own bucket, and the join is a plain equi-join on the bucket
    * id + a residual filter. Shuffle cost scales with interval width /
    * bucketSize — pick bucketSize near the median interval width.
    */
  def bucketedRangeJoin(points: DataFrame, pointCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        bucketSize: Long): DataFrame = {
    val p = points.withColumn("__b",
      floor(col(pointCol) / bucketSize).cast("long"))
    val i = intervals.withColumn("__b",
      explode(sequence(floor(col(loCol) / bucketSize).cast("long"),
                       floor(col(hiCol) / bucketSize).cast("long"))))
    p.join(i, "__b")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }

  /** Skew-resistant equi-join: the big (skewed) side gets a
    * deterministic per-row salt, the small-but-too-big-to-broadcast
    * side is replicated `saltFactor` times, and the join runs on
    * (keys, salt) — a hot key spreads over `saltFactor` reducers
    * instead of melting one. AQE's skew-join handles most cases at
    * runtime; this is the explicit tool for when it can't (e.g.
    * pre-AQE stages or deliberate layout control).
    */
  def saltedJoin(big: DataFrame, other: DataFrame, keys: Seq[String],
                 saltFactor: Int, how: String = "inner"): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt", how).drop("__salt")
  }

  /** Gap-based sessionization: consecutive events of a key belong to
    * one session until the gap to the previous event exceeds `gapNs`;
    * then a new session starts. Appends `session_ix` (1-based per-key
    * session index). The classic clickstream/telemetry operator the
    * reference's per-event webhook tables never aggregate.
    *
    * Scale shape: ONE key-partitioned window (lag + running sum ride
    * the same sort), a single shuffle on the session key — never a
    * global window. `tiebreak` columns pin the order when `orderCol`
    * collides, keeping the assignment deterministic under any
    * partitioning.
    */
  def sessionize(df: DataFrame, keys: Seq[String], orderCol: String,
                 gapNs: Long, tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol) +: tiebreak: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(col(orderCol), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
             col(orderCol) - col("__prev") > gapNs, 1L).otherwise(0L))
      .withColumn("session_ix", sum(col("__new_session")).over(run))
      .drop("__prev", "__new_session")
  }

  /** Slowly-changing-dimension type-2 history from an event log: per
    * key, consecutive runs of equal `attrCols` collapse to one row
    * valid from its first event until the NEXT change (`valid_to` null
    * on the current row) — the warehouse-dimension twin of the
    * reference's latest-wins state tables, keeping the full validity
    * timeline instead of only the head.
    *
    * Scale shape: change detection (lag) and interval close (lead)
    * ride the SAME key-partitioned sort — one shuffle on the
    * dimension key, no self-join. `tiebreak` pins the order of
    * same-instant events.
    */
  def scd2History(df: DataFrame, keys: Seq[String], orderCol: String,
                  attrCols: Seq[String],
                  tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol) +: tiebreak: _*)
    val attrs = struct(attrCols.map(col): _*)
    df.withColumn("__prev", lag(attrs, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= attrs)
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev", orderCol)
  }

  /** Multi-valued external ids exploded to an indexed lookup table with
    * set semantics (alma_publish_to_database.py:223-233 inserts
    * `set(external_ids)` rows into `external_id`).
    */
  def explodeExternalIds(df: DataFrame, recordId: Column, recordType: String,
                         idType: String, values: Column): DataFrame =
    df.select(recordId.as("record_id"), explode(values).as("external_value"))
      .distinct()
      .select(col("record_id"), lit(recordType).as("record_type"),
              lit(idType).as("id_type"), col("external_value"))

  /** Trailing time-window rolling aggregates: for every row, the count
    * and integer-milli value sum of the key's rows whose `orderCol`
    * lies in `[orderCol − windowSpan, orderCol]` — the feature-
    * engineering primitive behind "events in the last 7 days" columns.
    *
    * RANGE (not ROWS) frame: same-instant peers are always included
    * together, so the result is deterministic under any partitioning
    * even when timestamps collide.
    *
    * Scale shape: ONE key-partitioned window shuffle; the frame is
    * evaluated by a sliding pointer over each key's sorted run, never a
    * per-row rescan. No global sort, no self-join (the naive
    * `e1 JOIN e2 ON ts BETWEEN` twin is O(n·w) and shuffles twice).
    */
  def rollingStats(df: DataFrame, keys: Seq[String], orderCol: String,
                   valueCol: String, windowSpan: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rangeBetween(-windowSpan, 0)
    df.withColumn("n_window", count(lit(1)).over(w))
      .withColumn("value_milli_window",
        sum(round(col(valueCol) * 1000).cast("long")).over(w))
  }

  /** Snapshot diff (CDC): classify every key across two snapshots of
    * the same table as `added` (new only), `removed` (old only) or
    * `changed` (both, any compared column differs); unchanged rows are
    * dropped. The null-safe `<=>` comparison treats null==null as equal
    * so nullable attributes never misreport a change.
    *
    * Scale shape: one full-outer equi-join on the snapshot key — the
    * minimal shuffle for a diff; with both snapshots bucketed on the
    * key it collapses to a zero-shuffle sort-merge. Output carries the
    * old/new values of every compared column for downstream apply.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select((keys ++ compareCols).map(col): _*)
      .withColumn("__old", lit(1))
      .toDF(keys ++ compareCols.map("old_" + _) ++ Seq("__old"): _*)
    val n = newSnap.select((keys ++ compareCols).map(col): _*)
      .withColumn("__new", lit(1))
      .toDF(keys ++ compareCols.map("new_" + _) ++ Seq("__new"): _*)
    val changed = compareCols
      .map(c => !(col("old_" + c) <=> col("new_" + c)))
      .reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("change_type").isNotNull)
      .drop("__old", "__new")
  }

  /** Incremental aggregate maintenance: fold a batch of new fact ROWS
    * into a persisted per-key aggregate table (count / integer-milli
    * sum / min / max) WITHOUT rescanning history — the materialized-
    * view delta-merge primitive behind every incremental warehouse
    * rollup. All four stats are decomposable, so
    * `merge(aggregate(history), delta) ≡ aggregate(history ∪ delta)`
    * exactly (the oracle identity); value sums ride as round-half-up
    * integer millis per the house discipline, making the merge
    * bit-exact in any engine.
    *
    * Scale shape: the delta aggregates map-side first (combiner), the
    * base table is ALREADY key-cardinality-sized, and the final
    * aggregation touches base+delta partials only — the 100 TB fact
    * history is never read. Keys absent from one side pass through
    * (full-outer semantics via the union).
    */
  /** The per-key aggregate snapshot [[mergeAggDeltas]] maintains —
    * the bootstrap aggregation of an initial fact set. */
  def aggSnapshot(rows: DataFrame, keys: Seq[String],
                  valueCol: String): DataFrame = {
    val milli = round(col(valueCol) * 1000).cast("long")
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(milli).as("sum_milli"),
           min(milli).as("min_milli"), max(milli).as("max_milli"))
  }

  def mergeAggDeltas(base: DataFrame, deltaRows: DataFrame,
                     keys: Seq[String], valueCol: String): DataFrame = {
    val d = aggSnapshot(deltaRows, keys, valueCol)
    base.select((keys.map(col) ++
        Seq(col("n"), col("sum_milli"), col("min_milli"), col("max_milli"))): _*)
      .unionByName(d)
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"), sum("sum_milli").as("sum_milli"),
           min("min_milli").as("min_milli"), max("max_milli").as("max_milli"))
  }

  /** Apply a [[snapshotDiff]] change set to the old snapshot —
    * CDC replication's consumer half: `removed` keys drop, `added`
    * insert, `changed` take their new values; the round trip
    * `apply(old, diff(old, new)) ≡ new` holds exactly
    * (property-spec'd). One key-equi join of the snapshot against the
    * (change-sized) diff — broadcastable whenever the day's churn is
    * small, the usual case.
    */
  def applySnapshotDiff(oldSnap: DataFrame, diff: DataFrame,
                        keys: Seq[String],
                        compareCols: Seq[String]): DataFrame = {
    val d = diff.select((keys.map(col) ++
      compareCols.map(c => col("new_" + c)) :+ col("change_type")): _*)
    val joined = oldSnap.join(d, keys, "full_outer")
    val kept = joined.filter(
      col("change_type").isNull || col("change_type") =!= "removed")
    kept.select((keys.map(col) ++ compareCols.map { c =>
      when(col("change_type").isin("added", "changed"), col("new_" + c))
        .otherwise(col(c)).as(c)
    }): _*)
  }

  /** Data-quality validation report (the expectation-suite primitive
    * run before anything ships downstream): one row per check with its
    * violation count —
    *  - `not_null:<col>` — null occurrences;
    *  - `non_negative:<col>` — values `< 0`;
    *  - `in_set:<col>` — non-null values outside the allowed set
    *    (nulls are `not_null`'s job, counted nowhere else);
    *  - `unique:<keys>` — surplus rows beyond the first per key;
    *  - `ref:<col>-><dimCol>` — non-null values absent from the
    *    referenced dimension (foreign-key orphans).
    *
    * Scale shape: every column-local check rides ONE scan as a
    * conditional sum (single aggregated row, unpivoted driver-free via
    * `stack`); uniqueness is one key-grouped aggregation; each
    * referential check is a broadcast anti-join against the
    * (dimension-sized) key set. The fact table is never shuffled by
    * the column-local checks.
    */
  def qualityReport(df: DataFrame, notNull: Seq[String],
                    nonNegative: Seq[String],
                    inSet: Map[String, Seq[String]],
                    uniqueKey: Seq[String],
                    refs: Seq[(String, DataFrame, String)]): DataFrame = {
    require(notNull.nonEmpty || nonNegative.nonEmpty || inSet.nonEmpty,
      "qualityReport needs at least one column-local check")
    val condAggs: Seq[(String, Column)] =
      notNull.map(c => s"not_null:$c" ->
        sum(when(col(c).isNull, 1L).otherwise(0L))) ++
      nonNegative.map(c => s"non_negative:$c" ->
        sum(when(col(c) < 0, 1L).otherwise(0L))) ++
      inSet.toSeq.sortBy(_._1).map { case (c, vals) =>
        s"in_set:$c" ->
          sum(when(col(c).isNotNull && !col(c).isin(vals: _*), 1L)
            .otherwise(0L))
      }
    val aliased = condAggs.zipWithIndex.map { case ((_, a), i) =>
      coalesce(a, lit(0L)).as(s"c$i")
    }
    val scanRow = df.agg(aliased.head, aliased.tail: _*)
    val stackExpr = s"stack(${condAggs.size}, " +
      condAggs.zipWithIndex
        .map { case ((name, _), i) => s"'$name', c$i" }.mkString(", ") +
      ") AS (check_name, violations)"
    val scanChecks = scanRow.selectExpr(stackExpr)
    // an empty uniqueKey would make groupBy() one global group and
    // silently report total_rows-1 "violations" under an empty label
    require(uniqueKey.nonEmpty, "qualityReport needs a non-empty uniqueKey")
    val uniq = df.groupBy(uniqueKey.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(when(col("__n") > 1, col("__n") - 1L)), lit(0L))
        .as("violations"))
      .select(lit(s"unique:${uniqueKey.mkString(",")}").as("check_name"),
              col("violations"))
    val refChecks = refs.map { case (c, dim, dimCol) =>
      df.select(col(c)).filter(col(c).isNotNull)
        .join(broadcast(dim.select(col(dimCol).as(c)).distinct()),
              Seq(c), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(s"ref:$c->$dimCol").as("check_name"), col("violations"))
    }
    (Seq(scanChecks, uniq) ++ refChecks).reduce(_ unionByName _)
  }

  /** Persisted aggregate store — [[mergeAggDeltas]] as an
    * extend / read / compact table lifecycle (the dedup/span/postings
    * index discipline applied to a materialized rollup):
    *
    *  - [[extendAggStore]] appends ONE batch-stamped partial aggregate
    *    per micro-batch (key-cardinality-sized rows, the fact rows
    *    never persist);
    *  - [[readAggStore]] derives the current rollup by merging
    *    partials, dropping replay-duplicated ones first — a re-executed
    *    batch writes a row-identical partial (the aggregate is a pure
    *    function of the batch), so `(keys, batch_id)` dedup makes
    *    at-least-once delivery exact;
    *  - [[compactAggStore]] folds all partials of batches STRICTLY
    *    below `beforeBatch` into one `batch_id = −1` row per key
    *    (merging any prior fold) via the shared write-tmp → swap →
    *    recover protocol. Only the in-flight batch can ever replay
    *    (earlier ones are checkpoint-committed), so folding committed
    *    batches — and never the current one — preserves replay
    *    exactness across compactions.
    */
  def extendAggStore(rows: DataFrame, storeDir: String, keys: Seq[String],
                     valueCol: String, batchId: Long): Unit =
    aggSnapshot(rows, keys, valueCol)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(s"$storeDir/agg")

  def readAggStore(spark: org.apache.spark.sql.SparkSession,
                   storeDir: String, keys: Seq[String]): DataFrame =
    spark.read.parquet(s"$storeDir/agg")
      .dropDuplicates(keys :+ "batch_id")
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"), sum("sum_milli").as("sum_milli"),
           min("min_milli").as("min_milli"), max("max_milli").as("max_milli"))

  def compactAggStore(spark: org.apache.spark.sql.SparkSession,
                      storeDir: String, keys: Seq[String],
                      beforeBatch: Long, partitions: Int = 1): Unit =
    IndexFiles.compactFold(spark, storeDir, "agg", keys, beforeBatch,
        partitions) { below =>
      below.groupBy(keys.map(col): _*)
        .agg(sum("n").as("n"), sum("sum_milli").as("sum_milli"),
             min("min_milli").as("min_milli"), max("max_milli").as("max_milli"))
    }

  /** Persisted QUANTILE store — the [[extendAggStore]] lifecycle for
    * distribution (not just count/sum/min/max) history: per-key
    * latency/size percentiles maintained incrementally, without ever
    * rescanning fact history and without Spark's exact `percentile`
    * buffering every value.
    *
    *  - [[kllPartials]] builds ONE deterministic KLL sketch per
    *    (key, batch): batch rows repartition on the key and fold in
    *    sorted (key, value) order inside each partition run — the
    *    secondary-sort device — so the partial's wire bytes are a pure
    *    function of the batch CONTENT (not of partition layout or
    *    aggregate merge order), and an at-least-once replay writes a
    *    byte-identical row;
    *  - [[extendQuantileStore]] appends the batch-stamped partials —
    *    key-cardinality-sized rows of `O(k·log(n/k))` bytes each, the
    *    fact rows never persist;
    *  - [[readQuantileStore]] drops replay duplicates by
    *    `(keys, batch_id)` (exact because partials are byte-pure) and
    *    folds the survivors per key through [[graft.functions.KllMergeAgg]]
    *    — inverse-CDF quantiles + the carried worst-case rank-error
    *    bound; with `k ≥` the largest per-key TOTAL count no compaction
    *    ever fires, the bound is 0, and every quantile equals the
    *    exact answer over the union of all batches (the driver-verified
    *    regime, DuckDB `quantile_disc` parity);
    *  - [[compactQuantileStore]] folds partials of batches strictly
    *    below `beforeBatch` into one canonicalized `batch_id = −1`
    *    sketch per key via the shared swap + recover protocol — only
    *    the in-flight batch can replay, so folding committed batches
    *    preserves replay exactness, same argument as the agg store.
    *
    * The streaming twin is [[graft.streaming.Streams.streamQuantiles]]
    * — same sketch bytes, held in keyed state instead of parquet rows.
    */
  def kllPartials(rows: DataFrame, keys: Seq[String], valueCol: String,
                  k: Int): DataFrame = {
    import graft.functions.KllBuffer
    require(keys.nonEmpty, "kllPartials needs at least one key column")
    val sel = rows.select(
      (keys.map(col) :+ col(valueCol).cast("long").as("__v")): _*)
      .filter(col("__v").isNotNull)
    val sorted = sel.repartition(keys.map(col): _*)
      .sortWithinPartitions((keys.map(col) :+ col("__v")): _*)
    val outSchema = org.apache.spark.sql.types.StructType(
      keys.map(n => sorted.schema(n)) :+
        org.apache.spark.sql.types.StructField("sketch",
          org.apache.spark.sql.types.BinaryType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val nk = keys.size
    sorted.mapPartitions { it =>
      new Iterator[org.apache.spark.sql.Row] {
        private val in = it.buffered
        override def hasNext: Boolean = in.hasNext
        override def next(): org.apache.spark.sql.Row = {
          val first = in.next()
          val keyVals = (0 until nk).map(first.get)
          val buf = new KllBuffer(k)
          buf.insert(first.getLong(nk))
          while (in.hasNext &&
                 (0 until nk).forall(i => in.head.get(i) == keyVals(i))) {
            buf.insert(in.next().getLong(nk))
          }
          org.apache.spark.sql.Row.fromSeq(keyVals :+ KllBuffer.toBytes(buf))
        }
      }
    }(enc)
  }

  def extendQuantileStore(rows: DataFrame, storeDir: String,
                          keys: Seq[String], valueCol: String, k: Int,
                          batchId: Long): Unit =
    kllPartials(rows, keys, valueCol, k)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(s"$storeDir/kll")

  def readQuantileStore(spark: org.apache.spark.sql.SparkSession,
                        storeDir: String, keys: Seq[String], k: Int,
                        phis: Seq[Double]): DataFrame =
    spark.read.parquet(s"$storeDir/kll")
      .dropDuplicates(keys :+ "batch_id")
      .groupBy(keys.map(col): _*)
      .agg(graft.functions.KllMergeAgg(col("sketch"), k, phis).as("__s"))
      .select((keys.map(col) ++ Seq(col("__s.n").as("n"),
        col("__s.err_bound").as("err_bound"), col("__s.qs").as("qs"))): _*)

  def compactQuantileStore(spark: org.apache.spark.sql.SparkSession,
                           storeDir: String, keys: Seq[String], k: Int,
                           beforeBatch: Long, partitions: Int = 1): Unit =
    IndexFiles.compactFold(spark, storeDir, "kll", keys, beforeBatch,
        partitions) { below =>
      below.groupBy(keys.map(col): _*)
        .agg(graft.functions.KllMergeAgg.sketch(col("sketch"), k).as("sketch"))
    }

  /** Persisted DISTINCT-COUNT store — the sketch-store lifecycle
    * ([[extendAggStore]] counts/sums, [[extendQuantileStore]]
    * distributions) completed for set cardinality: per-key distinct
    * counts maintained incrementally via KMV theta-sketch partials
    * ([[graft.functions.KmvSketchAgg]]), where a COUNT(DISTINCT)
    * rollup cannot be maintained from per-batch counts at all
    * (distinct does not sum across batches — the sketch union is
    * exactly what makes it incremental).
    *
    * Simpler than the KLL store in one pleasant way: a KMV sketch is
    * the k smallest distinct value hashes — a pure function of the
    * value SET — so batch partials are byte-identical under any
    * layout, merge order, or replay with NO secondary-sort device,
    * and `(keys, batch_id)` dedup at read is exact for free. Exact
    * regime: below k retained hashes `n_distinct` equals the true
    * distinct count over the UNION of all batches (the
    * driver-verified regime); above it the standard (k−1)/u_k
    * estimate with ~1/√k error. Same swap + recover compaction as the
    * sibling stores.
    */
  def extendDistinctStore(rows: DataFrame, storeDir: String,
                          keys: Seq[String], valueCol: String, k: Int,
                          batchId: Long): Unit =
    rows.groupBy(keys.map(col): _*)
      .agg(graft.functions.KmvSketchAgg(col(valueCol), k).as("sketch"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(s"$storeDir/kmv")

  def readDistinctStore(spark: org.apache.spark.sql.SparkSession,
                        storeDir: String, keys: Seq[String],
                        k: Int): DataFrame =
    spark.read.parquet(s"$storeDir/kmv")
      .dropDuplicates(keys :+ "batch_id")
      .groupBy(keys.map(col): _*)
      .agg(graft.functions.KmvMergeAgg(col("sketch"), k).as("__s"))
      .select((keys.map(col) ++ Seq(col("__s.n_distinct").as("n_distinct"),
        col("__s.is_exact").as("is_exact"))): _*)

  def compactDistinctStore(spark: org.apache.spark.sql.SparkSession,
                           storeDir: String, keys: Seq[String], k: Int,
                           beforeBatch: Long, partitions: Int = 1): Unit =
    IndexFiles.compactFold(spark, storeDir, "kmv", keys, beforeBatch,
        partitions) { below =>
      below.groupBy(keys.map(col): _*)
        .agg(graft.functions.KmvMergeAgg.sketch(col("sketch"), k)
          .as("sketch"))
    }

  /** Join-key SKEW diagnostic (the planning input for [[saltedJoin]] /
    * AQE skew thresholds): for each candidate key column, the top-k
    * hottest values with their share of the table in integer permille
    * — the report that says which keys need salting before a 100 TB
    * join melts one reducer.
    *
    * ONE scan: every column's Misra-Gries sketch rides the same
    * single aggregation (O(capacity) state each through one
    * 1-row final merge), then each sketch explodes to its top-k rows
    * driver-free. Exact while capacity ≥ a column's distinct count
    * (the oracle regime); above it the standard MG undercount bound
    * applies and hot keys — the ones the report exists for — are
    * precisely the ones MG cannot lose.
    */
  def skewReport(df: DataFrame, cols: Seq[String], capacity: Int,
                 topK: Int): DataFrame = {
    require(cols.nonEmpty, "skewReport needs at least one column")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val aggs = count(lit(1)).as("__total") +:
      cols.map(c => graft.functions.MisraGriesAgg(col(c).cast("string"),
        capacity).as(s"__mg_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*)
    // stack, not a union of per-column selects: a union would plan the
    // aggregation once PER BRANCH and re-scan the table each time —
    // stack unpivots the single 1-row result in place
    val stacked = s"stack(${cols.size}, " +
      cols.map(c => s"'$c', __mg_$c").mkString(", ") +
      ") AS (col_name, __sketch)"
    row.selectExpr("__total", stacked)
      .select(col("col_name"), col("__total"),
        posexplode(slice(col("__sketch"), 1, topK)))
      .select(col("col_name"), (col("pos") + 1).cast("long").as("rank"),
        col("col.token").as("key_value"),
        col("col.est_count").as("est_count"),
        col("__total").as("total_rows"),
        expr("col.est_count * 1000 div __total").as("share_permille"))
  }

  /** Equi-join OUTPUT-SIZE estimate from per-side key sketches — the
    * second planning input ([[skewReport]] says which keys are hot;
    * this says how big the join will be, BEFORE running it): join
    * cardinality is `Σ_k cA(k)·cB(k)`, and a mis-estimate here is how
    * a "small" join materializes 10¹² rows at 100 TB.
    *
    * Each side aggregates ONE Misra-Gries sketch of its key column
    * (O(capacity) state, map-side merges); the two sketch frames
    * explode and equi-join on the key value — sketch-sized work, the
    * fact tables are never joined. While capacity ≥ a side's distinct
    * count its counts are exact, so the estimate equals the true join
    * size (the oracle regime). Past capacity, MG keeps the hot keys —
    * exactly the ones that dominate `Σ cA·cB` — and drops tail keys
    * whose products are small: the estimate becomes a LOWER bound
    * with each surviving count within the standard MG undercount.
    *
    * Output: one row `(est_rows, keys_a, keys_b, matched_keys)`.
    */
  def joinCardinality(a: DataFrame, keyA: String, b: DataFrame,
                      keyB: String, capacity: Int): DataFrame = {
    def sketch(df: DataFrame, key: String, side: String) =
      df.agg(graft.functions.MisraGriesAgg(col(key).cast("string"),
          capacity).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.token").as("k"),
          col("e.est_count").as(s"c_$side"))
    val sa = sketch(a, keyA, "a")
    val sb = sketch(b, keyB, "b")
    // full-outer + one aggregate: every statistic derives from the
    // single joined sketch frame, so each side's fact scan runs ONCE
    // (re-referencing the sketch frame for separate key counts would
    // re-plan the aggregation and re-scan the table)
    sa.join(sb, Seq("k"), "full_outer")
      .agg(
        coalesce(sum(expr("c_a * c_b")), lit(0L)).as("est_rows"),
        coalesce(sum(when(col("c_a").isNotNull, 1L)), lit(0L)).as("keys_a"),
        coalesce(sum(when(col("c_b").isNotNull, 1L)), lit(0L)).as("keys_b"),
        coalesce(sum(when(col("c_a").isNotNull && col("c_b").isNotNull, 1L)),
          lit(0L)).as("matched_keys"))
  }

  /** Entity resolution → GOLDEN RECORD (the MDM/master-data composed
    * pipeline, and the warehouse sibling of the E-group's document
    * dedup): dirty re-entries of the same real-world entity — case
    * drift, stray punctuation, whitespace mangling — collapse to one
    * resolved row with survivorship rules applied.
    *
    * Stages, each an already-verified primitive:
    *  1. CANONICALIZE — match key = lowercased name stripped of
    *     non-alphanumerics (formatting-only variation disappears;
    *     the B-group normalization discipline);
    *  2. MATCH — pairs sharing (match key, blocking cols): ONE
    *     block-keyed self-join shuffle, pairs bounded by block sizes
    *     (for typo-level fuzziness compose [[graft.operators.Dedup.
    *     editDistancePairs]] as the matcher instead — documented, not
    *     default: ID-like names make small edit distances merge
    *     DISTINCT entities);
    *  3. CLUSTER — [[graft.operators.Dedup.connectedComponents]]
    *     min-label propagation (transitive closure of the match
    *     relation; singletons resolve to themselves);
    *  4. SURVIVE — one grouped aggregation builds the golden record:
    *     canonical source row = `min_by(rec id)` (deterministic,
    *     first-entered wins), additive attributes sum in integer
    *     cents, `n_members` records the collapse.
    *
    * Output: `(entity_id, n_members, canonical_name, total_cents)`
    * per resolved entity.
    */
  def resolveEntities(records: DataFrame, idCol: String, nameCol: String,
                      blockCols: Seq[String],
                      balanceCol: String): DataFrame = {
    val normKey = lower(regexp_replace(col(nameCol), "[^A-Za-z0-9]", ""))
    val keyed = records.select(
      (col(idCol).as("rec_id") +: col(nameCol).as("__name") +:
        normKey.as("__k") +:
        round(col(balanceCol) * 100).cast("long").as("__cents") +:
        blockCols.map(col)): _*)
    val right = keyed.select(
      (col("rec_id").as("right_id") +: col("__k") +:
        blockCols.map(col)): _*)
    val pairs = keyed.select(
        (col("rec_id").as("left_id") +: col("__k") +:
          blockCols.map(col)): _*)
      .join(right, "__k" +: blockCols)
      .filter(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"))
    val clusters = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("rec_id"), col("keep_id"))
    keyed.join(clusters, Seq("rec_id"), "left")
      .withColumn("entity_id", coalesce(col("keep_id"), col("rec_id")))
      .groupBy("entity_id")
      .agg(count(lit(1)).as("n_members"),
        min_by(col("__name"), col("rec_id")).as("canonical_name"),
        sum(col("__cents")).as("total_cents"))
  }

  /** Ordered conversion funnel: per key, the earliest time each step
    * was reached at-or-after the PREVIOUS step's attain time
    * (view → click → purchase). A user who never reaches step i has
    * null there and (by construction) at every later step.
    *
    * Output: one row per key that reached step 1, with a `<step>_ts`
    * long column per step (the `tsCol` unit, e.g. µs).
    *
    * Scale shape: k−1 rounds of (filter → min-aggregate → equi-join),
    * every round partitioned on the SAME key — map-side-combined mins,
    * no windows, no per-key event collection (a `collect_list` cascade
    * would ship whole per-user histories through the shuffle; this
    * ships one long per user per round). The step filter prunes each
    * scan to one event type before its shuffle. Same-instant events
    * satisfy `>=`, so a step can share its predecessor's timestamp.
    */
  /** Time-bounded conversion funnel (the windowFunnel analytics
    * primitive): like [[funnelSteps]] but each later step must land
    * within `windowUs` of the ANCHOR — the user's earliest first-step
    * event — and the completed-prefix `level` is emitted. Anchored
    * semantics stated explicitly (some engines slide the anchor to
    * the best-converting chain; this one pins it to the earliest
    * entry, which is the cohort-faithful reading: "of users who
    * ENTERED the funnel, how far did they get within T of entry").
    *
    * Same scale shape as the unbounded funnel: k−1 filtered min-agg +
    * equi-join rounds all partitioned on the user key, no windows, no
    * per-user history collection; the window bound rides the join
    * condition. Null cascade is monotone (a missed step nulls all
    * later steps), so `level` is a plain sum of non-null step flags.
    */
  def windowFunnel(events: DataFrame, keyCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowUs: Long): DataFrame = {
    require(steps.size >= 2, s"need at least 2 funnel steps, got $steps")
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    val stepCol = (s: String) => s"${s}_ts"
    val anchor = stepCol(steps.head)
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as(anchor))
    for ((step, i) <- steps.tail.zipWithIndex) {
      val prev = stepCol(steps(i))
      val ev = events.filter(col(typeCol) === step)
        .select(col(keyCol).as("__k"), col(tsCol).as("__ts"))
      val doneCols = steps.take(i + 1).map(s => col(stepCol(s)))
      acc = acc.join(ev,
          acc(keyCol) === col("__k") && col("__ts") >= col(prev) &&
            col("__ts") <= col(anchor) + windowUs, "left")
        .groupBy((col(keyCol) +: doneCols): _*)
        .agg(min(col("__ts")).as(stepCol(step)))
    }
    acc.withColumn("level",
      steps.map(s => when(col(stepCol(s)).isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  def funnelSteps(events: DataFrame, keyCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"need at least 2 funnel steps, got $steps")
    val stepCol = (s: String) => s"${s}_ts"
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as(stepCol(steps.head)))
    for ((step, i) <- steps.tail.zipWithIndex) {
      val prev = stepCol(steps(i))
      val ev = events.filter(col(typeCol) === step)
        .select(col(keyCol).as("__k"), col(tsCol).as("__ts"))
      val doneCols = steps.take(i + 1).map(s => col(stepCol(s)))
      acc = acc.join(ev,
          acc(keyCol) === col("__k") && col("__ts") >= col(prev), "left")
        .groupBy((col(keyCol) +: doneCols): _*)
        .agg(min(col("__ts")).as(stepCol(step)))
    }
    acc
  }

  /** Incremental JOIN-view maintenance — the two-table completion of
    * the CDC family ([[snapshotDiff]] produces the change sets,
    * [[applySnapshotDiff]] maintains a TABLE, this maintains a JOIN):
    * given the materialized inner-join view `V = A ⋈ B` (fact `A`
    * keyed by `aKey` carrying foreign key `fk`; dimension `B` keyed by
    * `bKey`) and one [[snapshotDiff]] change set per side, produce the
    * view AFTER both change sets apply — WITHOUT re-joining the full
    * fact. The maintained identity (property-spec'd and the driver
    * oracle's mechanism):
    * `joinMaintain(V, …) ≡ applySnapshotDiff(A,dA) ⋈ applySnapshotDiff(B,dB)`.
    *
    * Delta algebra for keyed relations (each key at most once per
    * change set — [[snapshotDiff]]'s contract): a view row is stale
    * iff its fact key is in `dA` OR its foreign key is in `dB`; every
    * replacement row joins a post-apply fact row from that same
    * affected set against the post-apply dimension. So:
    *  1. evict stale rows: two ANTI joins of `V` against the
    *     BROADCAST change-key sets (change-sized, never fact-sized);
    *  2. rebuild affected fact rows: `A` rows whose key ∈ dA-keys or
    *     fk ∈ dB-keys (one scan of `A` probed by broadcast key sets —
    *     with `A` bucketed or clustered on either key this prunes;
    *     the frame that comes OUT is churn+fanout-sized), with `dA`
    *     applied on top (re-pointed foreign keys land correctly
    *     because the apply happens before the re-join);
    *  3. re-join ONLY those rows against the post-apply dimension
    *     (dimension-sized, broadcastable) and union back.
    *
    * The 100 TB view is touched only by the two broadcast anti-joins
    * (map-side, no shuffle of `V`); the fact contributes one probed
    * scan; nothing fact-sized shuffles. A dimension delete orphans its
    * referencing facts out of the inner view (evicted, never rebuilt)
    * — the [[orphans]] semantics falling out of the algebra.
    */
  def joinMaintain(viewOld: DataFrame,
                   aOld: DataFrame, dA: DataFrame,
                   bOld: DataFrame, dB: DataFrame,
                   aKey: String, fk: String, bKey: String,
                   aCols: Seq[String], bCols: Seq[String]): DataFrame = {
    require(aCols.contains(fk), s"fk $fk must be one of aCols so the view carries it")
    val dAKeys = dA.select(col(aKey)).distinct()
    val dBKeys = dB.select(col(bKey)).distinct()
    // 1. evict every view row either change set could have touched
    val evicted = viewOld
      .join(broadcast(dAKeys), Seq(aKey), "left_anti")
      .join(broadcast(dBKeys.withColumnRenamed(bKey, fk)), Seq(fk), "left_anti")
    // 2. affected fact rows, post-apply: keys in dA (changed/removed/
    // added ride the apply's full-outer) plus untouched rows whose
    // dimension side changed
    val aTouched = aOld.join(broadcast(dAKeys), Seq(aKey), "left_semi")
    val aFanout = aOld
      .join(broadcast(dBKeys.withColumnRenamed(bKey, fk)), Seq(fk), "left_semi")
      .join(broadcast(dAKeys), Seq(aKey), "left_anti")
      .select((col(aKey) +: aCols.map(col)): _*)
    val aRebuilt = applySnapshotDiff(aTouched, dA, Seq(aKey), aCols)
      .unionByName(aFanout)
    // 3. post-apply dimension (catalog-sized) joined to the affected set
    val bNew = applySnapshotDiff(bOld, dB, Seq(bKey), bCols)
    val delta = aRebuilt.join(broadcast(bNew),
      aRebuilt(fk) === bNew(bKey), "inner")
      .select((col(aKey) +: aCols.map(col)) ++ bCols.map(col): _*)
    evicted.select((col(aKey) +: aCols.map(col)) ++ bCols.map(col): _*)
      .unionByName(delta)
  }

  /** One micro-batch of the PERSISTED join-view store (D17's batch
    * body, exposed for direct replay testing): `storeDir` holds three
    * parquet tables — `fact`, `dim`, and the maintained `view` —
    * seeded by the caller with consistent initial snapshots. The
    * batch is a single CDC frame carrying BOTH sides' [[snapshotDiff]]
    * rows (`side` ∈ fact|dim — the one-topic Debezium shape), applied
    * atomically-enough via the shared swap+recover protocol.
    *
    * Replay contract — IDEMPOTENT APPLY, not `(key, batch_id)` dedup:
    * [[applySnapshotDiff]] is idempotent (re-removing an absent key is
    * a no-op; re-adding / re-changing overwrites with the same
    * values), and [[joinMaintain]] of an already-maintained view
    * evicts and rebuilds the same rows. So an at-least-once replay of
    * the in-flight batch converges to the identical store from ANY
    * crash point in the view → fact → dim swap sequence (each swap is
    * individually crash-safe via recover; the view is written first
    * because it reads the PRE-apply fact/dim).
    */
  /** Effective-sample-size report (C84) — the weight-degeneracy
    * diagnostic for every weighted pipeline (importance resampling,
    * survey weights, loss weighting): Kish's
    * `ESS = (Σw)² / Σw²` — n for uniform weights, → 1 as one weight
    * dominates. Exact integers end-to-end: weights ride in MILLIS,
    * the squared sums in decimal(38,0) (HUGEINT in the oracle), and
    * `ess_milli = (Σw)²·1000 div Σw²` plus
    * `ess_ratio_permille = (Σw)²·1000 div (Σw²·n)` — a ratio under
    * ~500‰ means half the nominal sample is doing the work. One
    * stratum-keyed aggregation, map-side combined; non-positive
    * weights are excluded (they have no sampling interpretation).
    */
  def essReport(df: DataFrame, stratumCol: String,
                weightCol: String): DataFrame = {
    val wMilli = round(col(weightCol) * 1000).cast("decimal(38,0)")
    df.select(col(stratumCol).as("stratum"), wMilli.as("__w"))
      .filter(col("__w") > 0)
      .groupBy("stratum")
      .agg(count(lit(1)).as("n"), sum("__w").as("__s1"),
           sum(col("__w") * col("__w")).as("__s2"))
      .withColumn("ess_milli",
        expr("(__s1 * __s1 * 1000) div __s2").cast("long"))
      .withColumn("ess_ratio_permille",
        expr("(__s1 * __s1 * 1000) div (__s2 * n)").cast("long"))
      .drop("__s1", "__s2")
  }

  /** Population Stability Index (C81) — the ML-ops drift monitor:
    * how far the CURRENT snapshot's value distribution has moved from
    * the BASE snapshot's, per stratum, as
    * `PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i)` (≥ 0.2 nats is the
    * textbook "investigate" line). Determinism discipline:
    *  - bins are k equi-width cells over the BASE stratum's
    *    [min, max] (broadcast, 1 row per stratum); current values
    *    outside clamp to the edge bins — drift INTO the tails is
    *    what the monitor exists to see;
    *  - proportions are Laplace-smoothed integer MICRO units
    *    `(c+1)·1e6 div (n+k)` (no empty-bin infinities), and every
    *    one of the k bins contributes per stratum — two-sided-absent
    *    bins still carry a (tiny) term because the smoothed masses
    *    differ, which both engines compute identically;
    *  - `ln(p/q)` rides the unigramLm micro-nat device (rounded to
    *    integer micro-nats from the same integer ratio both engines
    *    form), so `psi_micro` (micro-nats) is exact integer
    *    arithmetic after the one quantized log.
    * Scale shape: two distribution-sized (stratum, bin) aggregations,
    * a stratum-sized bin frame (strata × k), broadcast stats — the
    * snapshots are scanned once each and never sorted.
    */
  def psiDrift(base: DataFrame, current: DataFrame, stratumCol: String,
               valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    def milli(df: DataFrame) = df.select(col(stratumCol).as("stratum"),
      round(col(valueCol) * 1000).cast("long").as("__v"))
    val b = milli(base); val c = milli(current)
    val stats = b.groupBy("stratum")
      .agg(min("__v").as("__lo"), max("__v").as("__hi"))
    def binned(df: DataFrame) = df.join(broadcast(stats), Seq("stratum"))
      .withColumn("bin", expr(
        s"""CASE WHEN __hi = __lo THEN 0L
            ELSE greatest(0L, least(${k - 1}L,
              (__v - __lo) * ${k}L div (__hi - __lo + 1)))
            END"""))
      .groupBy("stratum", "bin").agg(count(lit(1)).as("n"))
    val bb = binned(b).withColumnRenamed("n", "n_base")
    val cc = binned(c).withColumnRenamed("n", "n_cur")
    val allBins = stats.select(col("stratum"),
      explode(sequence(lit(0L), lit((k - 1).toLong))).as("bin"))
    val joined = allBins
      .join(bb, Seq("stratum", "bin"), "left")
      .join(cc, Seq("stratum", "bin"), "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
    val totals = joined.groupBy("stratum")
      .agg(sum("n_base").as("__tb"), sum("n_cur").as("__tc"))
    joined.join(broadcast(totals), Seq("stratum"))
      .withColumn("__q", expr(s"(n_base + 1L) * 1000000L div (__tb + ${k}L)"))
      .withColumn("__p", expr(s"(n_cur + 1L) * 1000000L div (__tc + ${k}L)"))
      .withColumn("__lnm",
        round(log(col("__p").cast("double") / col("__q").cast("double"))
          * 1e6).cast("long"))
      .groupBy("stratum")
      .agg(sum("n_base").as("n_base"), sum("n_cur").as("n_cur"),
           expr("sum((__p - __q) * __lnm) div 1000000L").as("psi_micro"))
      .withColumn("drift", col("psi_micro") >= 200000L)
  }

  /** Equi-DEPTH histogram (C80) — the optimizer's-eye view of a
    * column that [[clipOutliers]]'s cousin `value_histogram`
    * (equi-width) distorts under skew: `k` bins holding ~equal row
    * counts, so dense regions get narrow bins and the long tail
    * collapses into wide ones. A distinct value belongs WHOLLY to the
    * bin of its exclusive-prefix position — `bin = (cum(v) − c(v)) ·
    * k div n` — duplicates never split across bins, so bin counts are
    * exact integers and a heavy value may own its bin outright
    * (counts then exceed n/k — the honest equi-depth behavior, not a
    * defect). Same scale shape as [[clipOutliers]]: the cumulative
    * window runs over the per-stratum DISTINCT-VALUE distribution,
    * the corpus never sorts.
    */
  def equiDepthHistogram(df: DataFrame, stratumCol: String,
                         valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rows = df.select(col(stratumCol).as("stratum"),
      round(col(valueCol) * 1000).cast("long").as("__v"))
    val dist = rows.groupBy("stratum", "__v").agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("stratum").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dist
      .withColumn("__cum", sum("__c").over(w))
      .withColumn("__n", sum("__c").over(Window.partitionBy("stratum")))
      .withColumn("bin",
        expr(s"(__cum - __c) * ${k}L div __n"))
      .groupBy("stratum", "bin")
      .agg(min("__v").as("lo_milli"), max("__v").as("hi_milli"),
           sum("__c").as("n_rows"), count(lit(1)).as("n_distinct"))
  }

  /** Benford first-digit audit (C79) — the classic fabricated-data /
    * broken-ETL smell test: naturally-occurring multiplicative
    * quantities put digit d first with probability `log10(1+1/d)`;
    * uniform or hand-typed data does not. Per stratum and digit:
    * observed count, observed vs expected integer permille, and the
    * absolute deviation — all exact integers (the expected permilles
    * are the rounded constants 301..46; the first digit comes from
    * the value's DECIMAL STRING, no float log anywhere). One
    * (stratum, digit) aggregation over a map-side digit extraction;
    * values below 1 are excluded (no leading digit).
    */
  def benfordCheck(df: DataFrame, stratumCol: String,
                   valueCol: String): DataFrame = {
    val benford = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)
    val expected = benford.zipWithIndex
      .map { case (p, i) => (i + 1).toString -> p }
      .foldLeft(lit(0L): Column) { case (acc, (d, p)) =>
        when(col("digit") === d, lit(p)).otherwise(acc) }
    val digits = df
      .select(col(stratumCol).as("stratum"),
        round(col(valueCol)).cast("long").as("__v"))
      .filter(col("__v") >= 1L)
      .select(col("stratum"), substring(col("__v").cast("string"), 1, 1)
        .as("digit"))
    val counts = digits.groupBy("stratum", "digit")
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot",
        sum("n").over(Window.partitionBy("stratum")))
    counts
      .withColumn("obs_permille", expr("n * 1000L div __tot"))
      .withColumn("benford_permille", expected)
      .withColumn("dev_permille",
        abs(col("obs_permille") - col("benford_permille")))
      .drop("__tot")
  }

  /** Percentile winsorization report (C78) — outlier clipping at
    * exact per-stratum percentile thresholds, the feature-hygiene
    * step before any mean-based model sees a long-tailed column. The
    * thresholds are EXACT order statistics in integer millis:
    * `lo = min{v : cum(v)·100 ≥ pLow·n}`,
    * `hi = min{v : cum(v)·100 ≥ pHigh·n}` over the per-stratum
    * distinct-value distribution — the E42 device: the cumulative
    * window runs over the (stratum, value) DISTRIBUTION table
    * (bounded by value cardinality), the corpus never sorts. Output
    * is the per-stratum report (thresholds, clip counts, raw vs
    * clipped integer-milli sums); the same broadcast-threshold join
    * applied row-wise is the clipped-column writer.
    */
  def clipOutliers(df: DataFrame, stratumCol: String, valueCol: String,
                   pLow: Int, pHigh: Int, quantMilli: Long = 1L): DataFrame = {
    require(0 <= pLow && pLow < pHigh && pHigh <= 100,
      s"need 0 <= pLow < pHigh <= 100, got ($pLow, $pHigh)")
    require(quantMilli >= 1, s"quantMilli must be >= 1, got $quantMilli")
    // distribution-window cardinality contract: see [[robustZscore]] —
    // quantMilli > 1 floors values to multiples, bounding the
    // per-stratum distinct table a continuous metric would inflate
    val rawV = round(col(valueCol) * 1000).cast("long")
    val qv = if (quantMilli == 1L) rawV
             else rawV - pmod(rawV, lit(quantMilli))
    val rows = df.select(col(stratumCol).as("stratum"), qv.as("__v"))
    val dist = rows.groupBy("stratum", "__v").agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("stratum").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thresholds = dist
      .withColumn("__cum", sum("__c").over(w))
      .withColumn("__n", sum("__c").over(Window.partitionBy("stratum")))
      .groupBy("stratum")
      .agg(min(when(col("__cum") * 100 >= lit(pLow) * col("__n"), col("__v")))
             .as("lo_milli"),
           min(when(col("__cum") * 100 >= lit(pHigh) * col("__n"), col("__v")))
             .as("hi_milli"))
    rows.join(broadcast(thresholds), Seq("stratum"))
      .groupBy("stratum")
      .agg(first("lo_milli").as("lo_milli"), first("hi_milli").as("hi_milli"),
           count(lit(1)).as("n"),
           sum(when(col("__v") < col("lo_milli"), 1L).otherwise(0L))
             .as("n_clipped_low"),
           sum(when(col("__v") > col("hi_milli"), 1L).otherwise(0L))
             .as("n_clipped_high"),
           sum(col("__v")).as("sum_raw_milli"),
           sum(greatest(col("lo_milli"), least(col("hi_milli"), col("__v"))))
             .as("sum_clipped_milli"))
  }

  /** Missing-partition detection (C77) — the operational health check
    * every dated table needs (did ingest skip a day?): per key, every
    * RUN of absent days strictly between the key's first and last
    * observed day, as `(gap_start, gap_end, gap_days)` rows. The
    * classic gaps-and-islands shape: distinct observed days, one
    * key-partitioned `lag` window, a gap row wherever the step
    * exceeds 1 — the frame is calendar-sized per key, never
    * row-sized, and there is no generate-all-days-and-anti-join
    * blowup (a year-long gap is ONE row, not 365).
    */
  def partitionGaps(present: DataFrame, keyCols: Seq[String],
                    dayCol: String): DataFrame = {
    present.select((keyCols.map(col) :+ col(dayCol).cast("long")
        .as("__day")): _*)
      .distinct()
      .withColumn("__prev", lag(col("__day"), 1).over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(col("__day"))))
      .filter(col("__prev").isNotNull && col("__day") - col("__prev") > 1)
      .select((keyCols.map(col) ++ Seq(
        (col("__prev") + 1).as("gap_start"),
        (col("__day") - 1).as("gap_end"),
        (col("__day") - col("__prev") - 1).as("gap_days"))): _*)
  }

  /** Foreign-key / containment profiling (C74) — the data-profiling
    * question schema discovery asks of every candidate column pair:
    * how much of the child column's DISTINCT value set lives inside
    * the parent's? `containment_permille = 1000` with a plausible
    * cardinality ratio is FK-shaped; partial containment flags
    * incidental overlap (small integer domains). Orphans
    * (`n_child − n_shared`) are C47's referential check as a COUNT
    * rather than a pass/fail.
    *
    * Scale shape: per pair, one distinct-projection per side (the
    * aggregation combines map-side) and ONE key equi-join of the two
    * distinct sets — never the raw tables. Each pair's report is a
    * single row; the union is pairs-sized. At 100 TB profile breadth
    * first with the sketch pair ([[skewReport]]/[[joinCardinality]]
    * machinery — KMV intersection estimates containment without the
    * join) and reserve this exact operator for the shortlist.
    */
  def fkProfile(pairs: Seq[(DataFrame, String, DataFrame, String, String)])
      : DataFrame = {
    require(pairs.nonEmpty, "fkProfile needs at least one candidate pair")
    pairs.map { case (child, childCol, parent, parentCol, label) =>
      val cd = child.select(col(childCol).cast("long").as("__v"))
        .na.drop().distinct()
      val pd = parent.select(col(parentCol).cast("long").as("__v"))
        .na.drop().distinct()
      cd.join(pd.withColumn("__p", lit(1)), Seq("__v"), "left")
        .agg(count(lit(1)).as("n_child"),
             sum(when(col("__p").isNotNull, 1L).otherwise(0L)).as("n_shared"))
        .crossJoin(broadcast(pd.agg(count(lit(1)).as("n_parent"))))
        .select(lit(label).as("rel"), col("n_child"), col("n_parent"),
                col("n_shared"),
                expr("n_shared * 1000L div n_child").as("containment_permille"))
    }.reduce(_ unionByName _)
  }

  def joinMaintainApply(batch: DataFrame, storeDir: String,
                        aKey: String, fk: String, bKey: String,
                        aCols: Seq[String], bCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    Seq("fact", "dim", "view")
      .foreach(IndexFiles.recoverTable(spark, storeDir, _))
    val aOld = spark.read.parquet(s"$storeDir/fact")
    val bOld = spark.read.parquet(s"$storeDir/dim")
    val vOld = spark.read.parquet(s"$storeDir/view")
    val dA = batch.filter(col("side") === "fact")
      .select(col(aKey) +: (aCols.flatMap(c =>
        Seq(col("old_" + c), col("new_" + c))) :+ col("change_type")): _*)
    val dB = batch.filter(col("side") === "dim")
      .select(col(bKey) +: (bCols.flatMap(c =>
        Seq(col("old_" + c), col("new_" + c))) :+ col("change_type")): _*)
    val vNew = joinMaintain(vOld, aOld, dA, bOld, dB,
      aKey, fk, bKey, aCols, bCols)
    // each swapIn materializes its frame into the tmp dir BEFORE the
    // live dir is touched, so the lazy reads above stay valid
    IndexFiles.swapIn(spark, storeDir, "view") { tmp =>
      vNew.write.parquet(tmp) }
    val aNew = applySnapshotDiff(aOld, dA, Seq(aKey), aCols)
    IndexFiles.swapIn(spark, storeDir, "fact") { tmp =>
      aNew.write.parquet(tmp) }
    val bNew = applySnapshotDiff(bOld, dB, Seq(bKey), bCols)
    IndexFiles.swapIn(spark, storeDir, "dim") { tmp =>
      bNew.write.parquet(tmp) }
  }

  /** Per-column data profile (the [[schemaDrift]] half-product, also
    * useful alone): one row per column with row/null/exact-distinct
    * counts plus the Spark dtype string. Values profile through their
    * STRING casts so one stack-unpivot covers heterogeneous types —
    * the scan reads each row once and emits |cols| pairs map-side;
    * distinct counting is the standard two-level aggregation. Cost
    * contract: the shuffle carries |cols|·rows pairs — profile the
    * columns you care about, not `*`, on wide tables.
    */
  def schemaProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "schemaProfile needs at least one column")
    val fields = df.schema.fields.map(f => f.name -> f.dataType.typeName)
      .toMap
    val pairs = cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ")
    val dtypes = cols.map(c => (c, fields.getOrElse(c,
      sys.error(s"schemaProfile: no column $c"))))
    val spark = df.sparkSession
    import spark.implicits._
    val meta = dtypes.toDF("col_name", "dtype")
    df.selectExpr(s"stack(${cols.size}, $pairs) AS (col_name, __v)")
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
           sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_nulls"),
           countDistinct(col("__v")).as("n_distinct"))
      .join(broadcast(meta), Seq("col_name"))
  }

  /** Schema/profile drift report (C92 — the data-contract monitor
    * between pipeline runs: a column that vanished, changed type, or
    * went 30% null upstream should page BEFORE the join downstream
    * silently inner-drops half its rows): full-outer compare of two
    * [[schemaProfile]]s. Per column: status (common/added/removed),
    * both dtypes + `type_changed`, both null permilles + signed delta,
    * both distinct counts, and the `drift` verdict — added/removed/
    * type-changed columns always drift; common ones drift when
    * `|null delta| ≥ nullDeltaPermille`. Absent-side counts read 0
    * (not null) so the frame is arithmetic-safe. Everything after the
    * two profiles is column-count-sized.
    */
  def schemaDrift(oldDf: DataFrame, oldCols: Seq[String],
                  newDf: DataFrame, newCols: Seq[String],
                  nullDeltaPermille: Long): DataFrame = {
    require(nullDeltaPermille >= 0, "nullDeltaPermille must be >= 0")
    def side(df: DataFrame, cols: Seq[String], sfx: String) =
      schemaProfile(df, cols).select(col("col_name"),
        col("n_rows").as(s"n_$sfx"), col("n_nulls").as(s"nulls_$sfx"),
        col("n_distinct").as(s"distinct_$sfx"),
        col("dtype").as(s"dtype_$sfx"),
        expr(s"(n_nulls * 1000L) div n_rows").as(s"null_pm_$sfx"))
    side(oldDf, oldCols, "old")
      .join(side(newDf, newCols, "new"), Seq("col_name"), "full_outer")
      .withColumn("status",
        when(col("n_old").isNull, lit("added"))
          .when(col("n_new").isNull, lit("removed"))
          .otherwise(lit("common")))
      .na.fill(0L, Seq("n_old", "nulls_old", "distinct_old", "null_pm_old",
                       "n_new", "nulls_new", "distinct_new", "null_pm_new"))
      .withColumn("type_changed",
        col("status") === "common" && col("dtype_old") =!= col("dtype_new"))
      .withColumn("null_delta_pm",
        col("null_pm_new") - col("null_pm_old"))
      .withColumn("drift",
        col("status") =!= "common" || col("type_changed") ||
          abs(col("null_delta_pm")) >= nullDeltaPermille)
      .select(col("col_name"), col("status"), col("dtype_old"),
        col("dtype_new"), col("type_changed"), col("n_old"), col("n_new"),
        col("null_pm_old"), col("null_pm_new"), col("null_delta_pm"),
        col("distinct_old"), col("distinct_new"), col("drift"))
  }

  /** k-anonymity audit (C90 — the privacy gate before a dataset with
    * quasi-identifiers leaves the warehouse): a row is re-identifiable
    * when its quasi-identifier combination is shared by fewer than `k`
    * rows. One-row summary: group counts, violating groups, rows at
    * risk, and the risk permille (truncating, non-negative). One
    * quasi-keyed aggregation (map-side combined) + one tiny rollup —
    * the fact table shuffles once, nothing group-sized reaches the
    * driver.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs quasi-identifier columns")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(sum("__n").as("n_rows"),
           count(lit(1)).as("n_groups"),
           sum(when(col("__n") < k, 1L).otherwise(0L))
             .as("violating_groups"),
           sum(when(col("__n") < k, col("__n")).otherwise(0L))
             .as("rows_at_risk"))
      .withColumn("risk_permille",
        expr("(rows_at_risk * 1000L) div n_rows"))
  }

  /** The group-level half of [[kAnonymity]]: the `topN` SMALLEST
    * quasi-identifier groups below `k` (the concrete combinations to
    * suppress or generalize first), deterministically ordered by
    * (count asc, quasi values asc). TakeOrdered-shaped: the violating
    * frame never fully sorts — only topN rows survive per partition
    * and reach the driver-side merge.
    */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Long, topN: Int): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2 && topN >= 1,
      s"need quasi cols, k >= 2, topN >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
      .orderBy((col("n") +: quasiCols.map(col)): _*)
      .limit(topN)
  }

  /** Weight-exact quantiles (C109 — the WEIGHTED companion of the
    * clip_outliers/robust_zscore distribution rule: "the median
    * order" and "the median UNIT" differ whenever quantity varies —
    * quantity-weighted price quartiles, revenue-weighted latency,
    * token-weighted doc length): per stratum, type-1 quantiles over
    * the weight mass — `min(v where 4·cum_w ≥ tot_w)` etc., exact
    * integer weights (non-negative by contract, caller owns it).
    *
    * Scale shape: the clip_outliers contract — one (stratum, value)
    * distribution aggregation summing weights map-side, per-stratum
    * distribution windows over the bounded milli domain; the corpus
    * never sorts.
    */
  def weightedQuantiles(df: DataFrame, stratumCol: String,
                        valueCol: String, weightCol: String): DataFrame = {
    val rows = df.select(col(stratumCol).as("stratum"),
      round(col(valueCol) * 1000).cast("long").as("__v"),
      col(weightCol).cast("long").as("__w"))
    val dist = rows.groupBy("stratum", "__v")
      .agg(sum("__w").as("__wc"), count(lit(1)).as("__c"))
    val w = Window.partitionBy("stratum").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dist
      .withColumn("__cum", sum("__wc").over(w))
      .withColumn("__tw",
        sum("__wc").over(Window.partitionBy("stratum")))
      .groupBy("stratum")
      .agg(sum("__c").as("n_rows"), max("__tw").as("total_weight"),
        min(when(col("__cum") * 4 >= col("__tw"), col("__v")))
          .as("wq1_milli"),
        min(when(col("__cum") * 2 >= col("__tw"), col("__v")))
          .as("wmedian_milli"),
        min(when(col("__cum") * 4 >= col("__tw") * 3, col("__v")))
          .as("wq3_milli"))
  }

  /** Calendar gap fill with last-observation-carried-forward (C107 —
    * the densify primitive every downstream time-series operator
    * quietly assumes: [[ewmaSmooth]]/[[holtSmooth]]/C75/C85 recurse
    * over PRESENT rows, so a sparse series weights a 10-day-old
    * observation like yesterday's; LOCF densification is the standard
    * repair, and [[partition_gaps]] only FINDS the holes — this fills
    * them): per key, every day in `[min(day), max(day)]` emits a row —
    * observed days carry their value with `filled = false`, gap days
    * carry the last observed value with `filled = true`. Exact longs;
    * leading gaps cannot exist (the span starts at the first
    * observation — stated).
    *
    * Scale shape: one key-partitioned aggregation collects each key's
    * observed series (calendar-bounded), then the whole densify rides
    * a HOF fold emitting the calendar-sized array — no window, no
    * calendar self-join, the fact table shuffles once.
    */
  def gapFill(daily: DataFrame, keyCols: Seq[String], dayCol: String,
              valueCol: String): DataFrame = {
    val sorted = daily.groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(
        col(dayCol).cast("long").as("day"),
        col(valueCol).cast("long").as("v")))).as("__s"))
    sorted.select((keyCols.map(col) :+ explode(expr("""aggregate(__s,
        struct(CAST(NULL AS BIGINT) AS pd, CAST(NULL AS BIGINT) AS pv,
          CAST(array() AS ARRAY<STRUCT<day: BIGINT, value: BIGINT,
            filled: BOOLEAN>>) AS out),
        (acc, el) -> struct(el.day AS pd, el.v AS pv,
          CASE WHEN acc.pd IS NULL
            THEN array_append(acc.out,
              struct(el.day AS day, el.v AS value, false AS filled))
            ELSE concat(acc.out, transform(
              sequence(acc.pd + 1, el.day), d -> struct(d AS day,
                IF(d = el.day, el.v, acc.pv) AS value,
                d <> el.day AS filled)))
          END AS out)).out""")).as("__r")): _*)
      .select((keyCols.map(col) ++ Seq(col("__r.day").as("day"),
        col("__r.value").as("value"), col("__r.filled").as("filled"))): _*)
  }

  /** l-diversity audit (C105 — [[kAnonymity]]'s second rung: a group
    * can be k-anonymous yet reveal everything when every member shares
    * the SAME sensitive value — homogeneity is the attack k-anonymity
    * cannot see; l-diversity requires ≥ l distinct sensitive values
    * per quasi-identifier group): same one-row report shape as
    * [[kAnonymity]] — groups, violating groups (distinct sensitive
    * count < l), rows at risk, risk permille. Exact distinct counts
    * (the audit is the point).
    *
    * Scale shape: one (quasi..., sensitive) pre-aggregation then one
    * quasi-keyed distinct count — both map-side combined, the same
    * two-level shape as [[fdCheck]].
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity needs quasi-identifier columns")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy((quasiCols.map(col) :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum("__n").as("__rows"), count(lit(1)).as("__d"))
      .agg(sum("__rows").as("n_rows"),
           count(lit(1)).as("n_groups"),
           sum(when(col("__d") < l, 1L).otherwise(0L))
             .as("violating_groups"),
           sum(when(col("__d") < l, col("__rows")).otherwise(0L))
             .as("rows_at_risk"))
      .withColumn("risk_permille",
        expr("(rows_at_risk * 1000L) div n_rows"))
  }

  /** Fuzzy entity resolution (C87) — the WEIGHTED-score complement of
    * [[resolveEntities]] (C54, the canonicalized-equality matcher):
    * block → score candidate pairs with Fellegi-Sunter-style weighted
    * field agreement → threshold → connected components → every
    * record labeled with its entity's MIN record id (singletons label
    * themselves). C54's contract documents WHY naive edit-distance
    * matching is off by default there: ID-like names put distinct
    * entities one typo apart. This operator is how fuzziness is
    * enabled SAFELY — a normalized exact identifier (digits of the
    * name, a tax id, a normalized phone) carries the decisive weight,
    * so name typos merge only when the identifier agrees, and
    * identifier-different records cannot clear the threshold on name
    * similarity alone (set `wName + wNum < threshold ≤ wExact + …`).
    *
    * Score (integer permille, exact):
    *   `wExact·[exactCol equal] + (wName·name_sim) div 1000 +
    *    wNum·[|numCol diff| ≤ numTol]`
    * with `name_sim = max(0, 1000 − 1000·lev(a,b) div max(len_a,
    * len_b, 1))` — Levenshtein is exact integer in both engines, so
    * the match decision is engine-identical; weights/threshold are
    * caller policy.
    *
    * Scale shape: candidates come ONLY from equal blocking keys — the
    * self-join is a key-partitioned equi-join, never a cross join;
    * pair volume is Σ block², so blocking keys must bound block size
    * (the caller's schema knowledge — same contract as every blocked
    * dedup here; a hot block is AQE-skew territory, or add a salt
    * column to the block key). Matched pairs are match-sized;
    * [[Dedup.connectedComponents]] runs pointer-jumped min-label over
    * them (O(log n) rounds); the final labeling is one record-sized
    * left join + one entity-sized count join.
    */
  def fuzzyEntityResolution(records: DataFrame, idCol: String,
                       blockCols: Seq[String], exactCol: String,
                       nameCol: String, numCol: String, numTol: Long,
                       wExact: Long, wName: Long, wNum: Long,
                       thresholdPermille: Long,
                       maxIter: Int = 15): DataFrame = {
    require(blockCols.nonEmpty, "entityResolution needs blocking columns")
    require(numTol >= 0 && wExact >= 0 && wName >= 0 && wNum >= 0,
      "weights and tolerance must be non-negative")
    val base = records.select(col(idCol).cast("long").as("__id"),
      struct(blockCols.map(col): _*).as("__blk"),
      col(exactCol).as("__ex"), col(nameCol).as("__nm"),
      length(col(nameCol)).cast("long").as("__ln"),
      col(numCol).cast("long").as("__num"))
    val a = base.alias("a")
    val b = base.alias("b")
    val nameSim = greatest(lit(0L),
      expr("""1000L - CAST(levenshtein(a.__nm, b.__nm) AS BIGINT) * 1000L
              div greatest(greatest(a.__ln, b.__ln), 1L)"""))
    val score =
      when(col("a.__ex") === col("b.__ex"), lit(wExact)).otherwise(lit(0L)) +
      expr(s"(${wName}L * __nsim) div 1000L") +
      when(abs(col("a.__num") - col("b.__num")) <= numTol, lit(wNum))
        .otherwise(lit(0L))
    val pairs = a.join(b,
        col("a.__blk") === col("b.__blk") && col("a.__id") < col("b.__id"))
      .withColumn("__nsim", nameSim)
      .withColumn("__score", score)
      .filter(col("__score") >= thresholdPermille)
      .select(col("a.__id").as("left_id"), col("b.__id").as("right_id"))
    val labels = Dedup.connectedComponents(pairs, maxIter)
      .select(col("doc_id").as("__id"), col("keep_id").as("__ent"))
    val ent = base.join(labels, Seq("__id"), "left")
      .select(col("__id").as("rec_id"),
              coalesce(col("__ent"), col("__id")).as("entity_id"))
    val sizes = ent.groupBy("entity_id")
      .agg(count(lit(1)).as("cluster_size"))
    ent.join(sizes, Seq("entity_id"))
      .select(col("rec_id"), col("entity_id"), col("cluster_size"))
  }

  /** Robust (MAD-based) outlier flags (C102 — the robust companion of
    * [[anomalyZscore]] and [[iqr_outliers]]: mean/σ are themselves
    * dragged by the outliers they hunt, the median/MAD pair is not —
    * the standard robust-statistics detector): per stratum, the exact
    * type-1 median and the median absolute deviation via TWO passes of
    * the [[clipOutliers]] distribution-window rule (`min(v where
    * 2·cum ≥ n)`), then per row `rz_milli = sign-trunc(1000·(v−med),
    * mad)` — flagged when `|rz_milli| ≥ thresholdMilli` (3500 ≈ the
    * textbook 3.5 MADs; no 1.4826 float constant — the threshold is IN
    * MAD units, stated). Degenerate `mad = 0` (over half the stratum
    * identical): rows with `v ≠ med` flag with rz null (infinitely
    * deviant by the rule — stated).
    *
    * Scale shape: two (stratum, value) distribution aggregations with
    * per-stratum distribution windows (bounded milli domain — the
    * corpus never sorts), thresholds broadcast back, one flag scan.
    *
    * CARDINALITY CONTRACT (shared by the whole distribution-window
    * family — [[clipOutliers]], `score_percentile`): the per-stratum
    * window runs over the DISTINCT-value table, so its single-task
    * sort is bounded by the stratum's distinct MILLI-value count, not
    * its row count. Milli quantization bounds that for ratio/score
    * metrics (≤ a few thousand distinct values); a high-cardinality
    * CONTINUOUS metric (raw latencies, revenue cents) at 100× can
    * still push one stratum's distinct count into the millions — pass
    * `quantMilli > 1` to floor values to multiples of `quantMilli`
    * (distinct count ≤ range/quantMilli; thresholds then exact on the
    * coarsened distribution — the documented approximation).
    */
  def robustZscore(df: DataFrame, stratumCol: String, idCol: String,
                   valueCol: String, thresholdMilli: Long,
                   quantMilli: Long = 1L): DataFrame = {
    require(thresholdMilli >= 1,
      s"thresholdMilli must be >= 1, got $thresholdMilli")
    require(quantMilli >= 1, s"quantMilli must be >= 1, got $quantMilli")
    val raw = round(col(valueCol) * 1000).cast("long")
    val v = if (quantMilli == 1L) raw
            else raw - pmod(raw, lit(quantMilli))
    val rows = df.select(col(stratumCol).as("stratum"),
      col(idCol).as("id"), v.as("value_milli"))
    def median(d: DataFrame, vc: String) = {
      val w = Window.partitionBy("stratum").orderBy(vc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.groupBy(col("stratum"), col(vc)).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum("__c").over(w))
        .withColumn("__n", sum("__c").over(Window.partitionBy("stratum")))
        .groupBy("stratum")
        .agg(min(when(col("__cum") * 2 >= col("__n"), col(vc)))
          .as("__med"))
    }
    val med = median(rows, "value_milli")
    val dev = rows.join(broadcast(med), Seq("stratum"))
      .withColumn("__d", abs(col("value_milli") - col("__med")))
    val mad = median(dev.select(col("stratum"), col("__d")), "__d")
      .withColumnRenamed("__med", "__mad")
    dev.join(broadcast(mad), Seq("stratum"))
      .withColumn("rz_milli", expr(
        """CASE WHEN __mad > 0 THEN
             CASE WHEN 1000 * (value_milli - __med) < 0
               THEN -((-(1000 * (value_milli - __med))) div __mad)
               ELSE (1000 * (value_milli - __med)) div __mad END
           END"""))
      .filter(
        (col("__mad") > 0 && abs(col("rz_milli")) >= thresholdMilli) ||
        (col("__mad") === 0 && col("value_milli") =!= col("__med")))
      .select(col("stratum"), col("id"), col("value_milli"),
        col("__med").as("median_milli"), col("__mad").as("mad_milli"),
        col("rz_milli"))
  }

  /** Functional-dependency audit (C103 — the data-contract primitive
    * next to [[fk_profile]] and [[qualityReport]]: does column A
    * determine column B? A violated FD is a silent join-fanout /
    * dimension-drift bug waiting downstream): one summary row —
    * determinant values, how many map to >1 dependent value, how many
    * rows sit under violating determinants, and the worst fanout.
    * Exact distinct counts (no sketch — the audit is the point).
    *
    * Scale shape: one (det, dep) pre-aggregation then one det-keyed
    * distinct count (both map-side combined), one 1-row final agg.
    */
  def fdCheck(df: DataFrame, detCol: String, depCol: String): DataFrame = {
    val perDet = df.groupBy(col(detCol).as("__det"),
        col(depCol).as("__dep"))
      .agg(count(lit(1)).as("__n"))
      .groupBy("__det")
      .agg(count(lit(1)).as("__ndep"), sum("__n").as("__rows"))
    perDet.agg(count(lit(1)).as("n_determinants"),
      sum(when(col("__ndep") > 1, 1L).otherwise(0L)).as("n_violating"),
      sum(when(col("__ndep") > 1, col("__rows")).otherwise(0L))
        .as("n_violating_rows"),
      max("__ndep").as("max_dependents"))
  }

  /** Concentration / inequality report (C99 — the "how skewed is the
    * business" profiling number next to [[equiDepthHistogram]]'s
    * shape view: revenue concentration, whale dependence, content
    * popularity inequality): per stratum, the EXACT Gini coefficient
    * `gini_permyriad = (10⁴·Σ_v x_v·c_v·(2m_v + c_v − n)) div
    * (n·Σx)` — the sorted-index identity Σ(2i−n−1)x_(i) with ties
    * grouped in closed form (m_v = rows strictly below v), so
    * duplicates never need per-row positions — plus the share of
    * total value held by the top 1% and top 10% OF ROWS
    * (`n div 100` / `n div 10` rows, the boundary value split
    * fractionally: `take = min(c, k − rows_above)` — exact integers;
    * null when the prefix rounds to zero rows). Values are expected
    * non-negative measures (amounts, counts); Gini over signed data
    * is not meaningful and the caller owns that contract.
    *
    * Scale shape: one (stratum, value) distribution aggregation
    * (map-side combined), then BOTH sweeps — the ascending Gini sum
    * and the descending top-k take — ride HOF folds over the collected
    * per-stratum distribution (milli-quantized bounded domain
    * contract). The corpus never sorts; DECIMAL(38,0) products.
    */
  def concentrationReport(df: DataFrame, stratumCol: String,
                          valueCol: String): DataFrame = {
    val dist = df.groupBy(col(stratumCol).as("stratum"),
        round(col(valueCol) * 1000).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    dist.groupBy("stratum")
      .agg(array_sort(collect_list(struct(col("__v"), col("__c"))))
        .as("__a"),
        sum("__c").as("__n"),
        sum(expr("CAST(__v AS DECIMAL(38,0)) * __c")).as("__sum"))
      // ascending fold: Gini numerator with ties in closed form
      .withColumn("__g", expr("""aggregate(__a,
        struct(CAST(0 AS BIGINT) AS m, CAST(0 AS DECIMAL(38,0)) AS s),
        (acc, el) -> struct(acc.m + el.__c AS m,
          acc.s + CAST(el.__v AS DECIMAL(38,0)) * el.__c
            * (2 * acc.m + el.__c - __n) AS s)).s"""))
      // descending fold: value taken by the top-k rows (reverse(__a))
      .withColumn("__top", expr("""aggregate(reverse(__a),
        struct(CAST(__n div 100 AS BIGINT) AS r1,
               CAST(__n div 10 AS BIGINT) AS r10,
               CAST(0 AS DECIMAL(38,0)) AS s1,
               CAST(0 AS DECIMAL(38,0)) AS s10),
        (acc, el) -> struct(
          greatest(acc.r1 - el.__c, 0L) AS r1,
          greatest(acc.r10 - el.__c, 0L) AS r10,
          acc.s1 + CAST(el.__v AS DECIMAL(38,0)) * least(el.__c, acc.r1)
            AS s1,
          acc.s10 + CAST(el.__v AS DECIMAL(38,0)) * least(el.__c, acc.r10)
            AS s10))"""))
      .select(col("stratum"), col("__n").as("n"),
        col("__sum").cast("long").as("total_milli"),
        expr("""CASE WHEN __n > 0 AND __sum > 0 THEN
                  CAST((10000 * __g) div (__n * __sum) AS BIGINT)
                END""").as("gini_permyriad"),
        expr("""CASE WHEN __n >= 100 AND __sum > 0 THEN
                  CAST((1000 * __top.s1) div __sum AS BIGINT)
                END""").as("top1_share_permille"),
        expr("""CASE WHEN __n >= 10 AND __sum > 0 THEN
                  CAST((1000 * __top.s10) div __sum AS BIGINT)
                END""").as("top10_share_permille"))
  }

  /** t-closeness audit (C112 — the third rung of the privacy ladder
    * after [[kAnonymity]] and [[lDiversity]]: a group can be
    * l-diverse yet still leak when its sensitive-value DISTRIBUTION
    * is far from the table's — 90% one diagnosis in a group vs 10%
    * globally is a skewness attack l-diversity cannot see). For each
    * quasi-identifier group, the total-variation distance between the
    * group's categorical sensitive distribution and the GLOBAL one,
    * in exact integer permille:
    * `tvd_permille = (500·Σ_v |n_gv·N − N_v·n_g|) div (n_g·N)` —
    * values absent from the group contribute `N_v·n_g` each, folded
    * in WITHOUT densifying as
    * `S_absent = n_g·(N − Σ_{v∈group} N_v)` (exact, not a floor: the
    * absolute values of absent terms sum linearly). `breach` flags
    * groups with tvd > tPermille.
    *
    * Scale shape: one (quasi..., v) pre-aggregation, the global per-v
    * distribution is a ≤|domain| broadcast, then one quasi-keyed
    * aggregation — [[lDiversity]]'s two-level shape plus a broadcast.
    * Products ≤ n_g·N in DECIMAL(38,0): exact at any realistic N.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, tPermille: Long): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness needs quasi-identifier columns")
    require(tPermille >= 0 && tPermille <= 1000,
      s"tPermille in [0,1000], got $tPermille")
    // NULL sensitive values become their OWN category instead of
    // silently distorting the TVD: an inner join on __v would drop
    // null-valued cells from the numerator while their rows still
    // count in n_rows and the global total — the group's null mass
    // would read as absent-from-group and the privacy metric would
    // misreport exactly on the rows most likely to be suppressed.
    val sv = coalesce(col(sensitiveCol).cast("string"), lit("\u0000null"))
    val cells = df.groupBy((quasiCols.map(col) :+
        sv.as("__v")): _*)
      .agg(count(lit(1)).as("__n"))
    val groupTot = cells.groupBy(quasiCols.map(col): _*)
      .agg(sum("__n").as("__ng"))
    val global = cells.groupBy("__v").agg(sum("__n").as("__nv"))
    val tot = global.agg(sum("__nv").as("__t"))
    cells
      .join(groupTot, quasiCols) // quasi-keyed: reuses cells' exchange
      .join(broadcast(global), "__v")
      .crossJoin(broadcast(tot))
      .groupBy(quasiCols.map(col): _*)
      .agg(first(col("__ng")).as("n_rows"),
        sum(expr("""abs(CAST(__n AS DECIMAL(38,0)) * __t
          - CAST(__nv AS DECIMAL(38,0)) * __ng)""")).as("__s1"),
        sum(col("__nv")).as("__nvpres"),
        first(col("__t")).as("__t"))
      .withColumn("tvd_permille", expr(
        """CAST((500 * (__s1 + CAST(n_rows AS DECIMAL(38,0))
             * (__t - __nvpres)))
           div (CAST(n_rows AS DECIMAL(38,0)) * __t) AS BIGINT)"""))
      .withColumn("breach", col("tvd_permille") > lit(tPermille))
      .drop("__s1", "__nvpres", "__t")
  }

  /** Exact trimmed mean (C121 — the robust location estimate closing
    * the robust-stats set beside [[robustZscore]]'s MAD and
    * [[clipOutliers]]' winsorization: clipping REPLACES tail values,
    * trimming REMOVES them — the mean a metrics reviewer asks for
    * when a handful of whales move the arithmetic mean): per
    * stratum, drop the lowest and highest `k = (n·trimPermille) div
    * 1000` rows BY ORDER-STATISTIC POSITION and average the rest,
    * exactly — per distinct value the kept multiplicity is
    * `max(0, min(cum, n−k) − max(cum−c, k))` (boundary values keep
    * their partial counts — no interpolation, no float), and
    * `tmean_milli = sign-trunc(Σ kept·v, n−2k)`. trimPermille < 500
    * keeps the denominator positive for any n ≥ 1.
    *
    * Scale shape: the [[clipOutliers]] distribution device — one
    * (stratum, value) aggregation, cumulative windows over the
    * per-stratum DISTINCT-VALUE table (the bounded-domain/quantMilli
    * contract), one stratum aggregation. The corpus never sorts.
    */
  def trimmedMean(df: DataFrame, stratumCol: String, valueCol: String,
                  trimPermille: Long): DataFrame = {
    require(trimPermille >= 0 && trimPermille < 500,
      s"trimPermille in [0,500), got $trimPermille")
    val rows = df.select(col(stratumCol).as("stratum"),
      round(col(valueCol) * 1000).cast("long").as("__v"))
    val dist = rows.groupBy("stratum", "__v").agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("stratum").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dist
      .withColumn("__cum", sum("__c").over(w))
      .withColumn("__n", sum("__c").over(Window.partitionBy("stratum")))
      .withColumn("__k", expr(s"(__n * ${trimPermille}L) div 1000"))
      .withColumn("__kept", expr(
        """greatest(0L, least(__cum, __n - __k)
           - greatest(__cum - __c, __k))"""))
      .groupBy("stratum")
      .agg(first(col("__n")).as("n_rows"), first(col("__k")).as("n_trim"),
        sum("__kept").as("__kn"),
        sum(expr("CAST(__kept AS DECIMAL(38,0)) * __v")).as("__ks"))
      .select(col("stratum"), col("n_rows"),
        col("n_trim").as("n_trimmed_each"),
        expr("""CASE WHEN __ks < 0
                  THEN -CAST((-__ks) div __kn AS BIGINT)
                  ELSE CAST(__ks div __kn AS BIGINT)
                END""").as("tmean_milli"))
  }

  /** Per-key interval coalescing (C113 — gaps-and-islands: merge
    * overlapping or touching [start, end] validity/outage/booking
    * intervals per key into maximal disjoint spans; the warehouse
    * primitive under SLA accounting, effective-dating repair, and
    * contact-history consolidation). Overlap-OR-touch merges
    * (`start ≤ running_max_end` joins the island; intervals are
    * closed); output spans carry the merged row count.
    *
    * Scale shape: duplicate (key, start, end) rows are PRE-AGGREGATED
    * (map-side combined) so the running-max island device runs on the
    * DISTINCT-interval table under a TOTAL (start, end) order — ties
    * are impossible by construction, which is a correctness
    * requirement, not just a scale win: the flag column and the
    * cumulative island sum are two window passes, and with tied sort
    * keys an engine may order ties DIFFERENTLY in each pass, splitting
    * an island around whichever tie carried the flag (observed in the
    * sf0.1 oracle before the pre-agg). The windows are KEY-partitioned
    * (the repo's window ban is on partition-LESS windows); one
    * (key, island) aggregation closes. Skewed keys are AQE territory.
    */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String],
                     startCol: String, endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mergeIntervals needs key columns")
    val dist = df
      .groupBy((keyCols.map(col) :+ col(startCol) :+ col(endCol)): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val island = sum(
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    dist.withColumn("__island", island)
      .groupBy((keyCols.map(col) :+ col("__island").as("island")): _*)
      .agg(min(col(startCol)).as("span_start"),
           max(col(endCol)).as("span_end"),
           sum(col("__c")).as("n_merged"))
  }

  /** 2-D skyline / Pareto front (C135 — the classic dominance query:
    * "cheapest-for-the-size" offers, no point both ≤ in cost and ≥ in
    * value than another with one strict — the multi-objective SELECT
    * every catalog/curation ranking eventually needs). Over integer
    * (x minimize, y maximize): a distinct point survives iff
    * `y = max_y(x)` and `y > max_{x' < x} max_y(x')` — equal points
    * (exact duplicates) do not dominate each other and surface as one
    * skyline row with `n_points`. Sort-free at corpus scale: the
    * corpus collapses map-side to (x, y) cells, the per-x maxima form
    * a ≤|X|-row table whose ascending fold computes the running
    * prefix max (the repo's distribution-fold device), and survivors
    * join back to the cell frame.
    *
    * Scale shape: one (x, y) cell aggregation, one ≤|X| fold, one
    * broadcast join back — Θ(distinct x) beyond the first agg. The
    * quantization of x IS the contract (the [[Relational]]-wide
    * bounded-domain discipline), and it is EXECUTABLE: `maxDistinctX`
    * (default 65536 — the fold array is EXACTLY that many structs)
    * rides a 1-row `raise_error` guard so an unquantized caller
    * fails fast before the per-x maxima collect to one row.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
                maxDistinctX: Long = 65536L): DataFrame = {
    require(maxDistinctX >= 1,
      s"maxDistinctX must be >= 1, got $maxDistinctX")
    val cells = df.groupBy(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .agg(count(lit(1)).as("n_points"))
    // guard the FOLD input only — the per-x maxima frame, whose row
    // count IS the array the fold collects to one row; the error
    // fires before that collect, and the join-back use stays
    // single-scan
    val front = skylineFold(Behavior.withCellGuard(
      cells.groupBy("__x").agg(max("__y").as("__my")), maxDistinctX,
      s"skyline2d: distinct x exceeds maxDistinctX=$maxDistinctX " +
        "— x must be quantized to the bounded domain; quantize " +
        "upstream or raise maxDistinctX knowingly"))
    cells.join(broadcast(front), Seq("__x", "__y"))
      .select(col("__x").as("x"), col("__y").as("y"), col("n_points"))
  }

  /** The skyline prefix-max fold over a per-x maxima frame
    * `(__x, __my)` → surviving front points `(__x, __y)` — shared by
    * [[skyline2d]] (fed from the corpus cell agg) and
    * [[readSkylineStore]] (fed from merged store partials). One
    * ascending HOF fold over the ≤|X|-row frame; the corpus never
    * sorts.
    */
  private[operators] def skylineFold(maxima: DataFrame): DataFrame =
    maxima
      .agg(array_sort(collect_list(struct(col("__x"), col("__my"))))
        .as("__a"))
      .select(explode(expr("""aggregate(__a,
        struct(CAST(NULL AS BIGINT) AS run,
          CAST(array() AS ARRAY<STRUCT<x: BIGINT, y: BIGINT>>) AS out),
        (acc, el) -> struct(
          CASE WHEN acc.run IS NULL OR el.__my > acc.run
            THEN el.__my ELSE acc.run END AS run,
          CASE WHEN acc.run IS NULL OR el.__my > acc.run
            THEN array_append(acc.out, struct(el.__x AS x,
              el.__my AS y))
            ELSE acc.out END AS out)).out""")).as("__r"))
      .select(col("__r.x").as("__x"), col("__r.y").as("__y"))

  /** Persisted SKYLINE store — the [[extendAggStore]] lifecycle for
    * the Pareto front (the D28 batch half): the front over an
    * ever-growing point stream is maintained from per-x PARTIAL
    * maxima, never by rescanning point history.
    *
    *  - [[extendSkylineStore]] appends one batch-stamped row per
    *    distinct x in the batch: `(x, max_y, n_points at that max)` —
    *    a pure function of batch content, so an at-least-once replay
    *    writes row-identical partials that the read's
    *    `(x, batch_id)` dedup collapses; point rows never persist;
    *  - the partial MERGE is associative: per x the global max wins
    *    and counts sum only where the partial's max EQUALS it (an
    *    old batch's lower maximum contributes nothing — exactly the
    *    cell-at-max count [[skyline2d]] reports);
    *  - [[readSkylineStore]] merges survivors per x and runs the
    *    shared [[skylineFold]] — identical rows to batch
    *    [[skyline2d]] over the union of every point ever streamed;
    *  - [[compactSkylineStore]] folds partials of committed batches
    *    (strictly below `beforeBatch`) into one row per x via the
    *    shared swap + recover protocol.
    */
  def extendSkylineStore(points: DataFrame, storeDir: String,
                         xCol: String, yCol: String,
                         batchId: Long): Unit =
    points
      .groupBy(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .agg(count(lit(1)).as("__c"))
      .groupBy("x")
      .agg(max(struct(col("y"), col("__c"))).as("__t"),
        max("y").as("max_y"))
      .select(col("x"), col("max_y"),
        col("__t.__c").as("n_points"), lit(batchId).as("batch_id"))
      .write.mode("append").parquet(s"$storeDir/skyline")

  private def mergeSkylinePartials(partials: DataFrame): DataFrame = {
    val tops = partials.groupBy("x").agg(max("max_y").as("__gm"))
    partials.join(tops, "x")
      .filter(col("max_y") === col("__gm"))
      .groupBy(col("x"), col("max_y"))
      .agg(sum("n_points").as("n_points"))
  }

  def readSkylineStore(spark: org.apache.spark.sql.SparkSession,
                       storeDir: String): DataFrame = {
    val merged = mergeSkylinePartials(
      spark.read.parquet(s"$storeDir/skyline")
        .dropDuplicates("x", "batch_id"))
    val front = skylineFold(merged.select(col("x").as("__x"),
      col("max_y").as("__my")))
    merged.join(broadcast(front),
        merged("x") === front("__x") && merged("max_y") === front("__y"))
      .select(col("x"), col("max_y").as("y"), col("n_points"))
  }

  def compactSkylineStore(spark: org.apache.spark.sql.SparkSession,
                          storeDir: String, beforeBatch: Long,
                          partitions: Int = 1): Unit =
    IndexFiles.compactFold(spark, storeDir, "skyline", Seq("x"),
      beforeBatch, partitions)(mergeSkylinePartials)
}
