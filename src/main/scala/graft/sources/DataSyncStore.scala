package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.operators.Upsert

/** Parquet-backed "datasync" store: the reference's PostgreSQL target
  * schema (ddl/data_sync_db.sql) re-expressed as versioned parquet
  * tables with the same ON CONFLICT semantics (database_insert.py).
  *
  * The environment has no PostgreSQL; at 100 TB the natural sink is a
  * data-lake table anyway. Each upsert is one distributed merge
  * ([[Upsert.merge]] / [[Upsert.insertOnly]]) + an atomic
  * directory-swap publish — readers always see a complete version,
  * mirroring the reference's per-record transaction boundary at batch
  * granularity.
  */
final class DataSyncStore(spark: SparkSession, root: String) {

  private def tableDir(name: String) = s"$root/$name"

  def exists(name: String): Boolean =
    Files.exists(Paths.get(tableDir(name), "_SUCCESS"))

  def read(name: String): DataFrame = spark.read.parquet(tableDir(name))

  /** Replace the table contents atomically (write to a staging dir,
    * then swap).
    */
  def overwrite(name: String, df: DataFrame): Unit = {
    val stage = s"${tableDir(name)}__stage"
    df.write.mode(SaveMode.Overwrite).parquet(stage)
    val target = Paths.get(tableDir(name))
    val tmpOld = Paths.get(s"${tableDir(name)}__old")
    if (Files.exists(target))
      Files.move(target, tmpOld, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(stage), target, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(tmpOld))
      org.apache.commons.io.FileUtils.deleteDirectory(tmpOld.toFile)
  }

  /** `INSERT … ON CONFLICT(keys) DO UPDATE …, version = version+1`. */
  def upsert(name: String, updates: DataFrame, keys: Seq[String],
             versionCol: String = "version"): Unit = {
    if (!exists(name)) {
      overwrite(name, updates.withColumn(versionCol,
        org.apache.spark.sql.functions.lit(0L)))
    } else {
      overwrite(name, Upsert.merge(read(name), updates, keys, versionCol))
    }
  }

  /** `INSERT … ON CONFLICT DO NOTHING` (the --no-updates path). */
  def insertOnly(name: String, incoming: DataFrame, keys: Seq[String]): Unit = {
    if (!exists(name)) overwrite(name, incoming)
    else overwrite(name, Upsert.insertOnly(read(name), incoming, keys))
  }

  /** Delete by key set (orphan cleanup / delete files): anti-join. */
  def deleteKeys(name: String, keys: DataFrame, keyCols: Seq[String]): Unit =
    if (exists(name))
      overwrite(name, read(name).join(keys, keyCols, "left_anti"))
}
