package graft.sources

import org.apache.spark.sql.DataFrame

/** The mutation surface of the datasync target — what the ingest
  * pipeline writes through. Two implementations: [[DataSyncStore]]
  * (hash-bucketed parquet, the data-lake shape) and [[JdbcSyncSink]]
  * (batched INSERT … ON CONFLICT into PostgreSQL, the reference's
  * actual target — database_insert.py).
  */
trait SyncSink {
  def exists(name: String): Boolean
  def read(name: String): DataFrame

  /** `INSERT … ON CONFLICT(keys) DO UPDATE …, version = version + 1`. */
  def upsert(name: String, updates: DataFrame, keys: Seq[String],
             versionCol: String = "version"): Unit

  /** `INSERT … ON CONFLICT DO NOTHING`. */
  def insertOnly(name: String, incoming: DataFrame, keys: Seq[String]): Unit

  /** Guarded upsert — the item_base_status shape: a conflicting row is
    * replaced only when the stored row is older than the update's
    * `guardCol` (alma_publish_to_database.py:124).
    */
  def guardedUpsert(name: String, updates: DataFrame, keys: Seq[String],
                    guardCol: String): Unit

  /** Delete every row matching a key in `keys` (projected to `keyCols`). */
  def deleteKeys(name: String, keys: DataFrame, keyCols: Seq[String]): Unit
}
