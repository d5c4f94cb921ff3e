package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch re-expression of the reference's PostgreSQL upsert shapes.
  *
  * Reference: database_insert.py:11-31 generates
  * `INSERT ... ON CONFLICT(keys) DO UPDATE SET ..., version = version+1`
  * and database_insert.py:34-49 the `--no-updates` variant
  * `ON CONFLICT DO NOTHING`.
  *
  * Spark-first design: a row-at-a-time prepared statement becomes a
  * single distributed merge — one shuffle on the conflict keys (or a
  * broadcast when the update batch is small; Catalyst/AQE picks). The
  * version bump and column replacement are map-side projections.
  */
object Upsert {

  /** `ON CONFLICT(keys) DO UPDATE`: rows in `updates` replace the
    * matching base rows wholesale (PostgreSQL semantics: every listed
    * column is overwritten, nulls included) and bump `versionCol`;
    * unmatched update rows are inserted with version 0; untouched base
    * rows pass through.
    *
    * `base` must carry `versionCol`; `updates` carries the key and data
    * columns only. `updates` must be unique per key (the caller
    * dedupes, e.g. with [[Relational.latestPerKey]]) — mirrors the
    * reference executing one statement per record.
    */
  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String],
            versionCol: String = "version"): DataFrame = {
    val dataCols = base.columns.toSeq.filterNot(keys.contains).filterNot(_ == versionCol)
    require(updates.columns.toSet == (keys ++ dataCols).toSet,
      s"updates must have columns ${keys ++ dataCols}, got ${updates.columns.toSeq}")
    val b = base.withColumn("__in_base", lit(1)).alias("b")
    val u = updates.withColumn("__in_upd", lit(1)).alias("u")
    val cond = keys.map(k => col(s"b.$k") === col(s"u.$k")).reduce(_ && _)
    val matched = col("u.__in_upd").isNotNull
    val inBase = col("b.__in_base").isNotNull
    b.join(u, cond, "full_outer").select(
      keys.map(k => coalesce(col(s"u.$k"), col(s"b.$k")).as(k)) ++
      dataCols.map(c => when(matched, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)) :+
      when(matched && inBase, col(s"b.$versionCol") + 1)
        .when(matched, lit(0L))
        .otherwise(col(s"b.$versionCol")).as(versionCol): _*)
  }

  /** `ON CONFLICT DO NOTHING`: keep base rows as-is, insert only the
    * incoming rows whose key is absent. `incoming` must have the same
    * schema as `base`.
    */
  def insertOnly(base: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val freshKeys = incoming.join(base.selectExpr(keys: _*).distinct(), keys, "left_anti")
    base.unionByName(freshKeys)
  }

  /** Guarded merge — the item_base_status shape
    * (`… do update set … where item_base_status.update_date_time < $new`,
    * alma_publish_to_database.py:124): a matched update replaces the
    * base row only when its `guardCol` is strictly newer. Null guards
    * follow SQL comparison semantics exactly, matching
    * [[graft.sources.JdbcSyncSink.guardedUpsert]]'s `stored < ?`
    * predicate: a null on EITHER side makes the comparison unknown, so
    * the stored row is kept. Unmatched updates insert; everything else
    * passes through untouched.
    */
  def mergeGuarded(base: DataFrame, updates: DataFrame, keys: Seq[String],
                   guardCol: String, versionCol: String = "version"): DataFrame = {
    val dataCols = base.columns.toSeq.filterNot(keys.contains).filterNot(_ == versionCol)
    require(updates.columns.toSet == (keys ++ dataCols).toSet,
      s"updates must have columns ${keys ++ dataCols}, got ${updates.columns.toSeq}")
    require(dataCols.contains(guardCol), s"guard column $guardCol must be a data column")
    val b = base.withColumn("__in_base", lit(1)).alias("b")
    val u = updates.withColumn("__in_upd", lit(1)).alias("u")
    val cond = keys.map(k => col(s"b.$k") === col(s"u.$k")).reduce(_ && _)
    val matched = col("u.__in_upd").isNotNull
    val inBase = col("b.__in_base").isNotNull
    val wins = matched && (!inBase ||
      col(s"u.$guardCol") > col(s"b.$guardCol"))
    b.join(u, cond, "full_outer").select(
      keys.map(k => coalesce(col(s"u.$k"), col(s"b.$k")).as(k)) ++
      dataCols.map(c => when(wins, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)) :+
      when(wins && inBase, col(s"b.$versionCol") + 1)
        .when(wins, lit(0L))
        .otherwise(col(s"b.$versionCol")).as(versionCol): _*)
  }
}
