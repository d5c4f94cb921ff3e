package graft.sources

import java.sql.Connection

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** PostgreSQL `INSERT … ON CONFLICT` statement generation — the exact
  * shapes of database_insert.py:11-60, with JDBC `?` placeholders in
  * textual bind order instead of PostgreSQL `$n` (a JDBC
  * PreparedStatement cannot reference one parameter twice, so the SET
  * clause re-binds the same columns; `bindColumns` spells out the
  * per-row bind order: VALUES fields, then SET fields, then WHERE
  * parameters).
  */
object JdbcStatements {

  /** `sql` with `?` placeholders; `bindColumns(i)` names the DataFrame
    * column bound to placeholder i+1.
    */
  final case class Statement(sql: String, bindColumns: Seq[String])

  /** generate_insert_prepared_statements (database_insert.py:11-30):
    * version seeded 0, create/update stamped now(); on conflict on the
    * first `conflictFieldCount` fields every NON-key… strictly every
    * field after the first is overwritten, version bumps, update time
    * restamps; optional guard (the item_base_status
    * `where item_base_status.update_date_time < ?` shape,
    * alma_publish_to_database.py:124).
    */
  def upsert(table: String, fields: Seq[String], conflictFieldCount: Int = 1,
             where: String = "", whereParams: Seq[String] = Nil): Statement = {
    require(fields.size > 1, s"upsert into $table needs a key and data fields")
    val values = fields.map(_ => "?").mkString(",")
    val conflict = fields.take(conflictFieldCount).mkString(",")
    val set = fields.drop(1).map(f => s"$f = ?").mkString(", ")
    val guard = if (where.isEmpty) "" else s" $where"
    Statement(
      s"insert into $table (${fields.mkString(",")}, version, create_date_time, update_date_time) " +
        s"values ($values, 0, now(), now()) " +
        s"on conflict($conflict) do update set $set, " +
        s"version = $table.version + 1, update_date_time = now()$guard",
      fields ++ fields.drop(1) ++ whereParams)
  }

  /** generate_insert_prepared_statements_no_updates (database_insert.py:33-46). */
  def insertOnly(table: String, fields: Seq[String]): Statement =
    Statement(
      s"insert into $table (${fields.mkString(",")}, version, create_date_time, update_date_time) " +
        s"values (${fields.map(_ => "?").mkString(",")}, 0, now(), now()) " +
        "on conflict do nothing",
      fields)

  /** generate_insert_link_prepared_statement (database_insert.py:49-60):
    * bare link tables carry no version/date columns.
    */
  def link(table: String, fields: Seq[String]): Statement =
    Statement(
      s"insert into $table (${fields.mkString(",")}) " +
        s"values (${fields.map(_ => "?").mkString(",")}) " +
        "on conflict do nothing",
      fields)

  /** Keyed delete (the reference's per-record deletes, e.g.
    * alma_publish_to_database.py:128,217,224).
    */
  def delete(table: String, keyCols: Seq[String]): Statement =
    Statement(
      s"delete from $table where " + keyCols.map(k => s"$k = ?").mkString(" and "),
      keyCols)

  /** History retention as ONE set-based DELETE — the SQL twin of
    * [[DataSyncStore.retain]] / Relational.retainHistory: drop every
    * row that is below the cutoff or ranked past `keepN` within its
    * key (newest first, tiebreak columns descending). The reference's
    * record_update/request_event tables grow unboundedly (ddl has no
    * TTL); this is the statement a DBA would schedule. Binds: cutoff.
    */
  def retention(table: String, keyCols: Seq[String], orderCol: String,
                keepN: Int, tiebreak: Seq[String] = Nil): Statement = {
    val key = keyCols.mkString(", ")
    val ord = (orderCol +: tiebreak).map(c => s"$c desc").mkString(", ")
    val tupleCols = (keyCols :+ orderCol) ++ tiebreak
    val tuple = tupleCols.mkString(", ")
    Statement(
      s"delete from $table where ($tuple) in (" +
        s"select $tuple from (" +
        s"select $tuple, row_number() over (partition by $key order by $ord) as __rn " +
        s"from $table) ranked " +
        s"where __rn > $keepN or $orderCol < ?)",
      Seq(orderCol))
  }
}

object JdbcSyncSink {
  /** Serializable connection source so executors (and tests) can supply
    * their own; the default opens a DriverManager connection per
    * partition.
    */
  type ConnectionFactory = () => Connection

  def driverManager(url: String, props: Map[String, String]): ConnectionFactory =
    () => {
      val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }
      java.sql.DriverManager.getConnection(url, p)
    }
}

/** JDBC ON CONFLICT sink: the reference's PostgreSQL write path
  * (database_insert.py StatementExecutor + the per-table prepared
  * statements) as a distributed sink — each partition opens one
  * connection, binds rows into JDBC batches of `batchSize`, and
  * commits once per partition. Point it at the reference's database
  * and [[graft.AlmaPipeline]] publishes into the same ddl tables.
  *
  * Scale shape: writes are `df.foreachPartition` (parallel across
  * executors, no driver funnel); batches amortize round-trips exactly
  * like the reference's prepared-statement reuse; one commit per
  * partition mirrors the reference's per-file commit granularity.
  */
final class JdbcSyncSink(
    spark: SparkSession,
    url: String,
    connectionProperties: Map[String, String] = Map.empty,
    batchSize: Int = 500,
    noUpdates: Boolean = false,
    connectionFactory: JdbcSyncSink.ConnectionFactory = null) extends SyncSink {

  private val factory: JdbcSyncSink.ConnectionFactory =
    if (connectionFactory != null) connectionFactory
    else JdbcSyncSink.driverManager(url, connectionProperties)

  /** True iff the metadata lookup SUCCEEDS and finds no table. A
    * connection/SQL failure propagates instead of reading as "absent":
    * AlmaPipeline gates orphan cleanup on `exists`, and a transient DB
    * hiccup must fail the run, not silently skip cleanup.
    */
  def exists(name: String): Boolean = {
    val c = factory()
    try {
      val rs = c.getMetaData.getTables(null, null, name, null)
      try rs.next() finally rs.close()
    } finally c.close()
  }

  def read(name: String): DataFrame = {
    val p = new java.util.Properties()
    connectionProperties.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, name, p)
  }

  /** Bind + batch + execute a statement for every row of `df`.
    *
    * Failure contract: autoCommit is off and the single commit is the
    * partition's last step, so a mid-partition failure rolls the whole
    * partition back on close and Spark's task retry re-runs it cleanly —
    * at-most-once per attempt, idempotent under ON CONFLICT on success.
    */
  private def executeBatched(df: DataFrame, stmt: JdbcStatements.Statement): Unit = {
    val f = factory
    val bs = batchSize
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = f()
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(stmt.sql)
          try {
            var pending = 0
            rows.foreach { row =>
              var i = 0
              while (i < stmt.bindColumns.length) {
                ps.setObject(i + 1, row.getAs[Any](stmt.bindColumns(i)))
                i += 1
              }
              ps.addBatch()
              pending += 1
              if (pending >= bs) { ps.executeBatch(); pending = 0 }
            }
            if (pending > 0) ps.executeBatch()
            conn.commit()
          } finally ps.close()
        } finally conn.close()
      }
    }
  }

  /** Key columns lead the field list (they are the conflict target). */
  private def keysFirst(df: DataFrame, keys: Seq[String]): (DataFrame, Seq[String]) = {
    val fields = keys ++ df.columns.filterNot(keys.contains)
    (df.select(fields.map(org.apache.spark.sql.functions.col): _*), fields)
  }

  def upsert(name: String, updates: DataFrame, keys: Seq[String],
             versionCol: String = "version"): Unit = {
    val (df, fields) = keysFirst(updates, keys)
    val stmt =
      if (noUpdates) JdbcStatements.insertOnly(name, fields)
      else JdbcStatements.upsert(name, fields, conflictFieldCount = keys.size)
    executeBatched(df, stmt)
  }

  /** Guarded upsert — the item_base_status shape
    * (alma_publish_to_database.py:124): `guardCol` is NOT an inserted
    * field (the table stamps its own update_date_time via now()); it
    * binds only the guard parameter in
    * `where $name.update_date_time < ?`.
    */
  def guardedUpsert(name: String, updates: DataFrame, keys: Seq[String],
                    guardCol: String): Unit = {
    val fields = (keys ++ updates.columns.filterNot(keys.contains))
      .filterNot(_ == guardCol)
    val stmt = JdbcStatements.upsert(name, fields,
      conflictFieldCount = keys.size,
      where = s"where $name.update_date_time < ?",
      whereParams = Seq(guardCol))
    executeBatched(updates.select((fields :+ guardCol)
      .map(org.apache.spark.sql.functions.col): _*), stmt)
  }

  def insertOnly(name: String, incoming: DataFrame, keys: Seq[String]): Unit = {
    val (df, fields) = keysFirst(incoming, keys)
    executeBatched(df, JdbcStatements.insertOnly(name, fields))
  }

  /** Link-table insert (no version/date columns — database_insert.py:49). */
  def insertLink(name: String, incoming: DataFrame, keys: Seq[String]): Unit = {
    val (df, fields) = keysFirst(incoming, keys)
    executeBatched(df, JdbcStatements.link(name, fields))
  }

  def deleteKeys(name: String, keys: DataFrame, keyCols: Seq[String]): Unit =
    executeBatched(keys.select(keyCols.map(org.apache.spark.sql.functions.col): _*)
      .distinct(), JdbcStatements.delete(name, keyCols))

  /** History retention — one driver-side set-based DELETE (see
    * [[JdbcStatements.retention]]); the SQL twin of
    * [[DataSyncStore.retain]], scheduled per publish cycle.
    */
  def retain(name: String, keys: Seq[String], orderCol: String,
             keepN: Int, cutoff: Any, tiebreak: Seq[String] = Nil): Unit = {
    val stmt = JdbcStatements.retention(name, keys, orderCol, keepN, tiebreak)
    val conn = factory()
    try {
      val ps = conn.prepareStatement(stmt.sql)
      try { ps.setObject(1, cutoff); ps.executeUpdate(); () }
      finally ps.close()
    } finally conn.close()
  }
}
