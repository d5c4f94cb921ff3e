package graft.operators

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scan-parallelism rebalance (guide §2.5, "input skew: one huge
  * unsplittable file … repartition immediately after the read").
  *
  * Parquet can only split a file at row-group boundaries, and the
  * bench corpora are single-row-group files — so a scan yields ONE
  * task per file regardless of `maxPartitionBytes`, and every
  * CPU-dense per-row pipeline downstream (shingle + MinHash
  * signatures, q-gram explodes, media decodes, JSON parses) runs on a
  * handful of cores while the rest of the machine idles (measured,
  * r11: the minhash signature stage of containment_reps ran 9.2s on
  * t=4 of 32 slots).
  *
  * [[fanOut]] inserts one narrow-payload exchange to the session's
  * shuffle parallelism — but ONLY when the input is under-parallel.
  * The decision is STATIC (r12, closing the r11 advice item): the old
  * `df.rdd.getNumPartitions` probe, with AQE enabled, eagerly
  * materialized every exchange stage in the input plan at
  * DataFrame-CONSTRUCTION time (AdaptiveSparkPlanExec submits real
  * shuffle jobs for `Dataset.rdd`), and because fanOut then returned a
  * different Dataset those probe stages were thrown away — shuffle-
  * bearing inputs executed their upstream twice, and even explain-only
  * paths submitted jobs. Now:
  *
  *  - An EXCHANGE-FREE lineage (scan/project/filter/generate/union
  *    over file, cached, checkpointed or local leaves) gets its
  *    planned partition count derived from driver metadata alone
  *    (file listing ÷ split size, cached-plan partitioning, RDD
  *    partition array) — no job, no plan execution — and is fanned out
  *    only when that count is at most half the session's shuffle
  *    parallelism. At production scan parallelism this is a structural
  *    no-op, exactly as before.
  *  - A SHUFFLE-BEARING lineage (aggregate/join/window upstream) is
  *    already at shuffle parallelism in the PLAN, but AQE's byte-based
  *    coalescing collapses a small-byte compute-DENSE stage to one
  *    task at runtime (r11: edit_distance_reps' q-gram explode over a
  *    groupBy output). For these the keyed repartition is applied
  *    whenever the plan-stats size estimate fits under `n ×
  *    advisoryPartitionSizeInBytes` — i.e. when the whole input is
  *    small enough that re-fanning it costs one narrow hop — and
  *    skipped for genuinely large inputs, so no payload-sized exchange
  *    is ever added at 100 TB. (The explicit-N repartition is exempt
  *    from AQE coalescing, which is the point.)
  *
  * Keyed repartition when a high-cardinality key is available
  * (deterministic placement under task retry — no round-robin re-draw
  * hazard, no sort-before-repartition pass); round-robin otherwise.
  */
object Par {
  /** Kill switch for A/B measurement (`SPARK_GRAFT_FANOUT=off`);
    * `SPARK_GRAFT_FANOUT=probe` restores the r11 `.rdd` probe for A/B
    * against the static decision.
    */
  private val mode = sys.env.getOrElse("SPARK_GRAFT_FANOUT", "")
  private val off = mode == "off"
  private val legacyProbe = mode == "probe"

  def fanOut(df: DataFrame, keys: Column*): DataFrame = {
    if (off || df.isStreaming) return df
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    def rebalance =
      if (keys.nonEmpty) df.repartition(n, keys: _*) else df.repartition(n)
    if (legacyProbe) {
      return if (df.rdd.getNumPartitions * 2 <= n) rebalance else df
    }
    plannedParallelism(df) match {
      case Some(cur) =>                       // exchange-free lineage
        if (cur * 2 <= n) rebalance else df
      case None =>                            // shuffle-bearing lineage
        val conf = df.sparkSession.sessionState.conf
        val sizeEst = Try(df.queryExecution.optimizedPlan.stats.sizeInBytes)
          .getOrElse(BigInt(Long.MaxValue))
        val cap = BigInt(n) * conf.getConf(
          org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
        if (sizeEst <= cap) rebalance else df
    }
  }

  /** Unconditional explicit-N keyed repartition, for placement
    * IMMEDIATELY before an equi-join on `keys`: the exchange REPLACES
    * the join's own EnsureRequirements shuffle on that side (same
    * bytes, same hop — no extra exchange at ANY scale) but, being
    * explicit-N, is exempt from AQE's byte-based partition coalescing.
    * Use where the join's probe/projection work is compute-DENSE per
    * row while its input bytes are small (exact-verify joins: set
    * intersections, banded levenshtein) — AQE's heuristic sees only
    * bytes and collapses those stages to one task (r11: the
    * containment verify ran 6.6 s single-task). Trade, stated: the
    * pinned side also opts out of AQE skew splitting, so use only on
    * id-keyed joins with bounded per-key fan-in. `SPARK_GRAFT_FANOUT=
    * off` disables it for A/B, like [[fanOut]].
    */
  def pin(df: DataFrame, keys: Column*): DataFrame = {
    if (off || df.isStreaming) return df
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(n, keys: _*)
  }

  /** Planned partition count of a lineage whose parallelism is PINNED
    * in the plan — exchange-free chains over file/cached/checkpointed/
    * local leaves, or chains topped by an explicit-N repartition (which
    * AQE never coalesces). Derived from driver metadata only: no job
    * submission, no AQE stage materialization. None when the effective
    * parallelism is decided at runtime (aggregate/join/window shuffles,
    * which AQE's byte heuristic may coalesce below slot count).
    */
  private[operators] def plannedParallelism(df: DataFrame): Option[Int] = {
    val plan = Try(df.queryExecution.optimizedPlan).getOrElse(return None)
    val sess = df.sparkSession
    def walk(p: LogicalPlan): Option[Int] = p match {
      case n: Project => walk(n.child)
      case n: Filter => walk(n.child)
      case n: Generate => walk(n.child)
      case n: Expand => walk(n.child)
      case u: Union =>
        val cs = u.children.map(walk)
        if (cs.nonEmpty && cs.forall(_.isDefined)) Some(cs.flatten.sum)
        else None
      case r: Repartition =>
        if (r.shuffle) Some(r.numPartitions)               // repartition(N)
        else walk(r.child).map(math.min(r.numPartitions, _)) // coalesce(N)
      case r: RepartitionByExpression =>
        // explicit-N keyed repartition is exempt from AQE coalescing;
        // keyless-N variants are runtime-sized — treat as unknown
        r.optNumPartitions
      case m: InMemoryRelation =>
        // static partitioning metadata of the cached plan (valid whether
        // or not the cache is materialized; never touches the RDD)
        Try(m.cachedPlan.outputPartitioning.numPartitions).toOption
          .filter(_ > 0)
      case r: LogicalRDD => Try(r.rdd.getNumPartitions).toOption
      case _: LocalRelation => Some(1)
      case r: Range =>
        Some(r.numSlices.getOrElse(sess.sparkContext.defaultParallelism))
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          // emulate FilePartition packing coarsely from the (cached)
          // driver-side file listing; single-row-group parquet files
          // yield at most one row-bearing task per file either way
          Try {
            val confSql = sess.sessionState.conf
            val openCost = confSql.filesOpenCostInBytes
            val nFiles = fs.location.inputFiles.length.max(1)
            val bytes = fs.location.sizeInBytes + openCost * nFiles
            // FilePartition.maxSplitBytes: shrink the split size toward
            // bytesPerCore so small inputs still spread over the cluster
            val maxSplit = math.min(confSql.filesMaxPartitionBytes,
              math.max(openCost,
                bytes / math.max(1, sess.sparkContext.defaultParallelism)))
            ((bytes + maxSplit - 1) / maxSplit).toInt.max(1)
          }.toOption
        case _ => None
      }
      case _ => None // aggregate/join/window/sort: runtime-sized by AQE
    }
    walk(plan)
  }
}
