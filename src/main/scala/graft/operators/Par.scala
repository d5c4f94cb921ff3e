package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

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
  * shuffle parallelism — but ONLY when the frame's planned partition
  * count is materially below it. The condition, not a tuned constant,
  * decides: at production scale a corpus scan already carries at least
  * slot-many partitions and this is a no-op; only an under-split read
  * (single file, small SF, gzip-like unsplittable input) pays the one
  * extra exchange, exactly the guide's remedy. Keyed repartition when
  * a high-cardinality key is available (deterministic placement under
  * task retry — no round-robin re-draw hazard, no sort-before-
  * repartition pass); round-robin otherwise.
  */
object Par {
  /** Kill switch for A/B measurement (`SPARK_GRAFT_FANOUT=off`). */
  private val off = sys.env.get("SPARK_GRAFT_FANOUT").contains("off")
  def fanOut(df: DataFrame, keys: Column*): DataFrame = {
    if (off || df.isStreaming) return df
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val cur = df.rdd.getNumPartitions
    if (cur * 2 <= n)
      if (keys.nonEmpty) df.repartition(n, keys: _*)
      else df.repartition(n)
    else df
  }
}
