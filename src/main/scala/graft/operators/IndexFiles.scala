package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Shared file lifecycle for persisted index tables (dedup bands,
  * span windows, IVF-PQ cells): atomic-ish compaction swaps and
  * crash recovery.
  *
  * The swap order is write-tmp → delete-live → rename-tmp-to-live, so
  * exactly two crash states exist per table: live AND tmp (crash
  * before the delete — live is still valid, tmp is an orphan) or tmp
  * ONLY (crash between delete and rename — tmp holds the only copy).
  * [[recoverTable]] repairs both, is idempotent, and is safe to call
  * at job startup.
  */
private[operators] object IndexFiles {

  def swapIn(spark: SparkSession, indexDir: String, sub: String)
            (write: String => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val live = new Path(s"$indexDir/$sub")
    val tmp = new Path(s"$indexDir/$sub.compact.tmp")
    val fs = live.getFileSystem(conf)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    write(tmp.toString)
    fs.delete(live, true)
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"compact swap failed for $live")
  }

  /** Shared COMPACTION protocol for the batch-stamped sketch stores
    * (agg counts/sums, KLL distributions, KMV distinct sets — any
    * store whose rows are `keys… , payload, batch_id` partials with
    * replay-exact `(keys, batch_id)` dedup): recover, then swap in a
    * table where every batch strictly below `beforeBatch` is folded
    * into ONE canonical `batch_id = −1` partial per key (`fold` is the
    * store's merge aggregation — sum/min/max, KLL merge, KMV union —
    * and gets the already-deduped below-threshold frame; the helper
    * re-stamps its output) while in-flight batches ride through
    * untouched. Only the in-flight batch can replay, so folding
    * committed batches preserves replay exactness — the same argument
    * each store used to make individually, now made once.
    */
  def compactFold(spark: SparkSession, storeDir: String, sub: String,
                  keys: Seq[String], beforeBatch: Long, partitions: Int)
                 (fold: DataFrame => DataFrame): Unit = {
    recoverTable(spark, storeDir, sub)
    swapIn(spark, storeDir, sub) { tmp =>
      val all = spark.read.parquet(s"$storeDir/$sub")
        .dropDuplicates(keys :+ "batch_id")
      val folded = fold(all.filter(col("batch_id") < beforeBatch))
        .withColumn("batch_id", lit(-1L))
      folded.unionByName(all.filter(col("batch_id") >= beforeBatch))
        .repartition(partitions)
        .write.mode("overwrite").parquet(tmp)
    }
  }

  /** Returns true if anything was repaired. */
  def recoverTable(spark: SparkSession, indexDir: String,
                   sub: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val live = new Path(s"$indexDir/$sub")
    val tmp = new Path(s"$indexDir/$sub.compact.tmp")
    val fs = live.getFileSystem(conf)
    if (fs.exists(tmp) && !fs.exists(live)) {
      if (!fs.rename(tmp, live))
        throw new java.io.IOException(s"recovery rename failed for $live")
      true
    } else if (fs.exists(tmp)) {
      fs.delete(tmp, true); true
    } else false
  }
}
