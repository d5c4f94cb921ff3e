package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** Parquet-backed "datasync" store: the reference's PostgreSQL target
  * schema (ddl/data_sync_db.sql) re-expressed as hash-bucketed parquet
  * tables with the same ON CONFLICT semantics (database_insert.py).
  *
  * The environment has no PostgreSQL; at 100 TB the natural sink is a
  * data-lake table anyway. Scale design:
  *
  *   - every table is partitioned by `__bucket = pmod(xxhash64(id),
  *     numBuckets)` where `id` is the FIRST key column of the table's
  *     ops (the stable record id — mms_id / holding_id / pid /
  *     record_id). All mutations of a table must lead with that same
  *     column.
  *   - an upsert/insert/delete computes the DIRTY bucket set from its
  *     update batch (a tiny distinct over ≤numBuckets values), reads
  *     ONLY those buckets back (partition pruning), merges, and
  *     rewrites ONLY those buckets via dynamic partition overwrite.
  *     An incremental publish touching 1% of records rewrites ~1% of
  *     the store, not 100%.
  *   - no local-filesystem rename tricks: creation is a plain
  *     partitioned write, increments are dynamic partition overwrites —
  *     both work on object stores. (Per-batch atomicity across buckets
  *     is the job of a table format with a commit log; the semantics
  *     here mirror the reference's per-record transaction, where a
  *     mid-run crash also leaves earlier records committed.)
  */
final class DataSyncStore(spark: SparkSession, root: String,
                          val numBuckets: Int = 64) extends SyncSink {

  private val BucketCol = "__bucket"

  private def tableDir(name: String) = s"$root/$name"

  private def bucketOf(idCol: String): Column =
    pmod(xxhash64(col(idCol)), lit(numBuckets.toLong))

  def exists(name: String): Boolean =
    Files.exists(Paths.get(tableDir(name), "_SUCCESS"))

  /** A table can be legitimately empty (every row deleted → every
    * bucket dir dropped); parquet then has nothing to infer a schema
    * from, so the logical schema is persisted beside the data at
    * creation time.
    */
  private def schemaPath(name: String) = Paths.get(tableDir(name), "_schema.json")

  private def savedSchema(name: String): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.DataType.fromJson(
      Files.readString(schemaPath(name)))
      .asInstanceOf[org.apache.spark.sql.types.StructType]

  private def hasDataFiles(name: String): Boolean = {
    val dir = new Path(tableDir(name))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(dir) && {
      val it = fs.listFiles(dir, true)
      var found = false
      while (!found && it.hasNext)
        found = it.next().getPath.getName.endsWith(".parquet")
      found
    }
  }

  private def emptyTable(name: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], savedSchema(name))

  def read(name: String): DataFrame =
    if (hasDataFiles(name)) spark.read.parquet(tableDir(name)).drop(BucketCol)
    else emptyTable(name)

  /** Read only the given buckets — partition-pruned scan. */
  private def readBuckets(name: String, buckets: Seq[Long]): DataFrame =
    if (hasDataFiles(name))
      spark.read.parquet(tableDir(name))
        .filter(col(BucketCol).isin(buckets: _*)).drop(BucketCol)
    else emptyTable(name)

  /** The bucket ids the update batch lands in (≤ numBuckets values). */
  private def dirtyBuckets(batch: DataFrame, idCol: String): Seq[Long] =
    batch.select(bucketOf(idCol).as(BucketCol)).distinct()
      .collect().map(_.getLong(0)).toSeq

  /** Replace the whole table (initial load / full refresh). */
  def overwrite(name: String, df: DataFrame, keys: Seq[String]): Unit = {
    df.withColumn(BucketCol, bucketOf(keys.head))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd") // ~2× denser than snappy at rest
      .partitionBy(BucketCol)
      .parquet(tableDir(name))
    Files.writeString(schemaPath(name), df.schema.json)
  }

  /** Overwrite only the buckets present in `df` (which must already be
    * exactly the merged contents of those buckets).
    */
  private def writeDirty(name: String, df: DataFrame, idCol: String): Unit =
    df.withColumn(BucketCol, bucketOf(idCol))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .partitionBy(BucketCol)
      .parquet(tableDir(name))

  /** `INSERT … ON CONFLICT(keys) DO UPDATE …, version = version+1`.
    * Touches only the buckets the update batch lands in.
    */
  def upsert(name: String, updates: DataFrame, keys: Seq[String],
             versionCol: String = "version"): Unit = {
    if (!exists(name)) {
      overwrite(name, updates.withColumn(versionCol, lit(0L)), keys)
    } else {
      val dirty = dirtyBuckets(updates, keys.head)
      val base = readBuckets(name, dirty)
      writeDirty(name, Upsert.merge(base, updates, keys, versionCol), keys.head)
    }
  }

  /** Guarded upsert (item_base_status): conflicting rows replaced only
    * when strictly older than the update's `guardCol`. Same dirty-bucket
    * flow as [[upsert]].
    */
  def guardedUpsert(name: String, updates: DataFrame, keys: Seq[String],
                    guardCol: String): Unit = {
    if (!exists(name)) {
      overwrite(name, updates.withColumn("version", lit(0L)), keys)
    } else {
      val dirty = dirtyBuckets(updates, keys.head)
      val base = readBuckets(name, dirty)
      writeDirty(name, Upsert.mergeGuarded(base, updates, keys, guardCol), keys.head)
    }
  }

  /** `INSERT … ON CONFLICT DO NOTHING` (the --no-updates path). */
  def insertOnly(name: String, incoming: DataFrame, keys: Seq[String]): Unit = {
    if (!exists(name)) overwrite(name, incoming, keys)
    else {
      val dirty = dirtyBuckets(incoming, keys.head)
      val base = readBuckets(name, dirty)
      writeDirty(name, Upsert.insertOnly(base, incoming, keys), keys.head)
    }
  }

  /** History retention maintenance pass: rewrite `name` keeping, per
    * key, only the newest `keepN` rows with `orderCol >= cutoff`
    * (see [[graft.operators.Relational.retainHistory]]). The lifecycle
    * step the reference's webhook history tables (record_update,
    * request_event — ddl has no TTL) lack. The retention window
    * partitions by the record key, which is consistent WITHIN a hash
    * bucket, so the pass is embarrassingly parallel across buckets; it
    * rewrites the whole table (a deliberate, scheduled compaction — run
    * it per publish cycle or cron, not per micro-batch).
    */
  def retain(name: String, keys: Seq[String], orderCol: String,
             keepN: Int, cutoff: Column,
             tiebreak: Seq[Column] = Nil): Unit =
    if (exists(name)) {
      // materialize before the rewrite — the output path is also the
      // input path (localCheckpoint holds the survivors in executor
      // storage for the duration of the rewrite, spilling if large)
      val kept = graft.operators.Relational.retainHistory(
        read(name), keys, orderCol, keepN, cutoff, tiebreak)
        .repartition(numBuckets, bucketOf(keys.head)) // compact while here
        .localCheckpoint(true)
      overwrite(name, kept, keys)
    }

  /** Small-file compaction maintenance pass: each dirty-bucket write
    * can leave up to `shuffle.partitions` files per bucket dir;
    * repeated cycles keep the count bounded (dynamic overwrite replaces
    * the dir) but a 64-bucket table can still sit at thousands of small
    * files. Rewrites every bucket as ~one file by clustering the
    * rewrite shuffle on the bucket id. Read-side at 100 TB this is the
    * difference between numBuckets file opens and numBuckets×32.
    */
  def compact(name: String, keys: Seq[String]): Unit =
    if (exists(name)) {
      val compacted = read(name)
        .repartition(numBuckets, bucketOf(keys.head))
        .localCheckpoint(true)
      overwrite(name, compacted, keys)
    }

  /** Delete by key set (orphan cleanup / delete files): anti-join over
    * the dirty buckets only. `keyCols.head` must be the table's bucket
    * column (the same first key its upserts use). A bucket whose rows
    * are all deleted is removed explicitly — dynamic overwrite only
    * replaces partitions present in the written data.
    */
  def deleteKeys(name: String, keys: DataFrame, keyCols: Seq[String]): Unit =
    if (exists(name)) {
      val dirty = dirtyBuckets(keys, keyCols.head)
      val base = readBuckets(name, dirty)
      val remaining = base.join(keys, keyCols, "left_anti")
        .withColumn(BucketCol, bucketOf(keyCols.head))
      val kept = remaining.select(BucketCol).distinct()
        .collect().map(_.getLong(0)).toSet
      remaining.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", "zstd")
        .partitionBy(BucketCol)
        .parquet(tableDir(name))
      val conf = spark.sessionState.newHadoopConf()
      dirty.filterNot(kept).foreach { b =>
        val dir = new Path(s"${tableDir(name)}/$BucketCol=$b")
        val fs = dir.getFileSystem(conf)
        if (fs.exists(dir)) fs.delete(dir, true)
      }
    }
}
