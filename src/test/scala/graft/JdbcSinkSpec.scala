package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JdbcStatements, JdbcSyncSink}

/** Recording stand-in for a PostgreSQL connection (no PG in this
  * environment): reflective proxies that capture prepared SQL, batch
  * sizes, and commits, so the sink's distributed write path runs for
  * real — everything except the socket.
  *
  * Top-level object so the sink's foreachPartition closure captures
  * only a static method reference (serializable), and counters are
  * shared across local-mode executor threads.
  */
object MockJdbc {
  val preparedSql = new ConcurrentLinkedQueue[String]()
  val batchSizes = new ConcurrentLinkedQueue[Integer]()
  val commits = new AtomicInteger(0)
  val connections = new AtomicInteger(0)
  val maxPendingSeen = new AtomicInteger(0)

  def reset(): Unit = {
    preparedSql.clear(); batchSizes.clear()
    commits.set(0); connections.set(0); maxPendingSeen.set(0)
  }

  private def proxy[T](cls: Class[T])(h: (String, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          h(m.getName, if (args == null) Array.empty else args)
      }).asInstanceOf[T]

  private def preparedStatement(): PreparedStatement = {
    val pending = new AtomicInteger(0)
    proxy(classOf[PreparedStatement]) {
      case ("addBatch", _) =>
        val p = pending.incrementAndGet()
        maxPendingSeen.updateAndGet(m => math.max(m, p)); null
      case ("executeBatch", _) =>
        val n = pending.getAndSet(0)
        if (n > 0) batchSizes.add(n)
        new Array[Int](n)
      case ("setObject" | "close", _) => null
      case ("executeUpdate", _) => Integer.valueOf(0)
      case _ => null
    }
  }

  def connect(): Connection = {
    connections.incrementAndGet()
    proxy(classOf[Connection]) {
      case ("prepareStatement", args) =>
        preparedSql.add(args(0).asInstanceOf[String]); preparedStatement()
      case ("commit", _) => commits.incrementAndGet(); null
      case ("setAutoCommit" | "close" | "rollback", _) => null
      case ("isClosed", _) => java.lang.Boolean.FALSE
      case _ => null
    }
  }
}

/** JDBC ON CONFLICT sink: statement shapes must match
  * database_insert.py:11-60 (with `?` in textual bind order instead of
  * PostgreSQL `$n` — a JDBC parameter can't be referenced twice, so the
  * SET clause re-binds), and the write path must batch and commit per
  * partition.
  */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------ statement text

  test("upsert statement matches the reference ON CONFLICT DO UPDATE shape") {
    val s = JdbcStatements.upsert("item", Seq("pid", "holding_id", "barcode"))
    assert(s.sql ==
      "insert into item (pid,holding_id,barcode, version, create_date_time, update_date_time) " +
      "values (?,?,?, 0, now(), now()) " +
      "on conflict(pid) do update set holding_id = ?, barcode = ?, " +
      "version = item.version + 1, update_date_time = now()")
    assert(s.bindColumns ==
      Seq("pid", "holding_id", "barcode", "holding_id", "barcode"))
  }

  test("guarded upsert reproduces the item_base_status where clause") {
    // alma_publish_to_database.py:124: conflict on pid, update guarded by
    // 'where item_base_status.update_date_time < $4' with the extra param
    val s = JdbcStatements.upsert("item_base_status",
      Seq("pid", "status_code", "process_type"),
      conflictFieldCount = 1,
      where = "where item_base_status.update_date_time < ?",
      whereParams = Seq("system_update_date"))
    assert(s.sql.endsWith(
      "on conflict(pid) do update set status_code = ?, process_type = ?, " +
      "version = item_base_status.version + 1, update_date_time = now() " +
      "where item_base_status.update_date_time < ?"))
    assert(s.bindColumns == Seq("pid", "status_code", "process_type",
      "status_code", "process_type", "system_update_date"))
  }

  test("no-updates and link statements match the DO NOTHING shapes") {
    val noUpd = JdbcStatements.insertOnly("bib_marc", Seq("mms_id", "raw_marc"))
    assert(noUpd.sql ==
      "insert into bib_marc (mms_id,raw_marc, version, create_date_time, update_date_time) " +
      "values (?,?, 0, now(), now()) on conflict do nothing")
    val link = JdbcStatements.link("location_circ_desk",
      Seq("circ_desk_id", "location_id"))
    assert(link.sql ==
      "insert into location_circ_desk (circ_desk_id,location_id) " +
      "values (?,?) on conflict do nothing")
    assert(JdbcStatements.delete("external_id",
      Seq("record_id", "external_id_type")).sql ==
      "delete from external_id where record_id = ? and external_id_type = ?")
  }

  // ------------------------------------------------ distributed write

  private def newSink(batchSize: Int) = new JdbcSyncSink(spark,
    url = "jdbc:postgresql://unused/test",
    batchSize = batchSize,
    connectionFactory = () => MockJdbc.connect())

  test("retention statement is one set-based ranked delete, cutoff bound") {
    val s = JdbcStatements.retention("record_update", Seq("record_id"),
      "update_date_time", keepN = 2, tiebreak = Seq("id"))
    assert(s.sql ==
      "delete from record_update where (record_id, update_date_time, id) in (" +
        "select record_id, update_date_time, id from (" +
        "select record_id, update_date_time, id, " +
        "row_number() over (partition by record_id " +
        "order by update_date_time desc, id desc) as __rn " +
        "from record_update) ranked " +
        "where __rn > 2 or update_date_time < ?)")
    assert(s.bindColumns == Seq("update_date_time"))

    // the sink executes it as a single driver-side statement
    MockJdbc.reset()
    val sink = new JdbcSyncSink(spark, "jdbc:mock", Map.empty,
      connectionFactory = () => MockJdbc.connect())
    sink.retain("record_update", Seq("record_id"), "update_date_time",
      keepN = 2, cutoff = java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    assert(MockJdbc.preparedSql.size() == 1)
    assert(MockJdbc.preparedSql.peek().startsWith("delete from record_update"))
    assert(MockJdbc.connections.get() == 1)
  }

  test("upsert binds rows into bounded batches, one connection+commit per partition") {
    MockJdbc.reset()
    val df = (1L to 120L).map(i => (i, s"h$i", s"b$i"))
      .toDF("pid", "holding_id", "barcode").coalesce(1)
    newSink(batchSize = 50).upsert("item", df, Seq("pid"))
    assert(MockJdbc.connections.get() == 1)
    assert(MockJdbc.commits.get() == 1)
    assert(MockJdbc.batchSizes.toArray.toSeq == Seq(50, 50, 20))
    assert(MockJdbc.maxPendingSeen.get() <= 50, "pending rows must stay bounded")
    assert(MockJdbc.preparedSql.toArray.head.asInstanceOf[String]
      .startsWith("insert into item "))
  }

  test("parallel partitions each get their own connection; keys lead the field list") {
    MockJdbc.reset()
    // columns deliberately NOT key-first: the sink must reorder
    val df = (1L to 40L).map(i => (s"t$i", i)).toDF("title", "mms_id")
      .repartition(4)
    newSink(batchSize = 500).upsert("bib_brief", df, Seq("mms_id"))
    assert(MockJdbc.connections.get() == 4)
    assert(MockJdbc.commits.get() == 4)
    assert(MockJdbc.batchSizes.toArray.map(_.asInstanceOf[Integer].toInt).sum == 40)
    assert(MockJdbc.preparedSql.toArray.forall(
      _.asInstanceOf[String].startsWith("insert into bib_brief (mms_id,title,")))
  }

  test("deleteKeys executes the keyed delete distinct per key") {
    MockJdbc.reset()
    val keys = Seq(1L, 2L, 2L, 3L).toDF("pid").coalesce(1)
    newSink(batchSize = 10).deleteKeys("item", keys, Seq("pid"))
    assert(MockJdbc.preparedSql.toArray.head.asInstanceOf[String] ==
      "delete from item where pid = ?")
    assert(MockJdbc.batchSizes.toArray.map(_.asInstanceOf[Integer].toInt).sum == 3)
  }
}
