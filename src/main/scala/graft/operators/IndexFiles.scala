package graft.operators

import org.apache.spark.sql.SparkSession

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
