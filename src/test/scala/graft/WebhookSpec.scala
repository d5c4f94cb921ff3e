package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DataSyncStore, WebhookIngest, WebhookReceiver, WebhookTransport}

/** Webhook receiver source → stream tables e2e: canned Alma webhook
  * POST bodies staged by the receiver, driven through the file stream
  * into the store, landing as the three webhook ddl tables with the
  * reference's guarded-upsert semantics (README:51-53,
  * ddl/data_sync_db.sql:184,247,294).
  */
class WebhookSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** A transport whose drains are pre-scripted queues of POST bodies. */
  private final class FakeTransport(batches: Seq[String]*) extends WebhookTransport {
    private val q = scala.collection.mutable.Queue(batches: _*)
    def drain(): Seq[String] = if (q.isEmpty) Nil else q.dequeue()
  }

  private def bibEvent(mms: String, time: String, by: String = "exl_impl") =
    s"""{"action": "BIB", "event": {"value": "BIB_UPDATED"}, "time": "$time",
        "modified_by": "$by", "bib": {"mms_id": "$mms"}}""".replace('\n', ' ')

  private def itemEvent(pid: String, status: String, ptype: String,
                        modified: String, time: String) =
    s"""{"action": "ITEM", "event": {"value": "ITEM_UPDATED"}, "time": "$time",
        "modified_by": "exl_impl", "item": {
          "bib_data": {"mms_id": "998651"},
          "holding_data": {"holding_id": "228651"},
          "item_data": {"pid": "$pid", "barcode": "39002$pid",
            "base_status": {"value": "$status"},
            "process_type": {"value": "$ptype"},
            "due_date": "", "modification_date": "$modified"}}}""".replace('\n', ' ')

  private val requestEventJson =
    """{"action": "REQUEST", "event": {"value": "REQUEST_CREATED"},
        "time": "2024-05-01T12:00:00Z", "user_request": {
          "request_id": "83441", "mms_id": "998651", "holding_id": "228651",
          "item_pid": "231", "barcode": "39002231", "volume": "v.1",
          "part": "", "issue": "", "material_type": {"value": "BOOK"},
          "request_type": "HOLD", "request_sub_type": {"value": "PATRON_PHYSICAL"},
          "request_status": "In Process", "comment": "rush",
          "managed_by_library_code": "sml",
          "managed_by_circulation_desk_code": "DEFAULT_CIRC_DESK",
          "place_in_queue": 1, "task_name": "Pickup From Shelf",
          "pickup_location": "Sterling", "pickup_location_type": "LIBRARY",
          "pickup_location_library": "sml",
          "request_date": "2024-05-01T11:59:00Z",
          "expiry_date": "2024-05-08T00:00:00Z",
          "last_interest_date": ""}}""".replace('\n', ' ')

  test("receiver stages one jsonl file per non-empty drain, resuming its sequence") {
    val dir = Files.createTempDirectory("webhook_stage_").toString
    val t = new FakeTransport(Seq(bibEvent("1", "2024-05-01T10:00:00Z")),
      Nil, Seq(bibEvent("2", "2024-05-01T10:01:00Z"),
               bibEvent("3", "2024-05-01T10:02:00Z")))
    val r = new WebhookReceiver(spark, t, dir)
    assert(r.drainToStaging() == 1)
    assert(r.drainToStaging() == 0) // empty drain leaves no file
    assert(r.drainToStaging() == 2)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted // local-FS .crc sidecars excluded
    assert(files.toSeq == Seq("webhook-000000000.jsonl", "webhook-000000001.jsonl"))
    // a restarted receiver continues after the existing files
    val r2 = new WebhookReceiver(spark,
      new FakeTransport(Seq(bibEvent("4", "2024-05-01T10:03:00Z"))), dir)
    assert(r2.drainToStaging() == 1)
    assert(new java.io.File(dir, "webhook-000000002.jsonl").exists())
  }

  test("webhook payloads → record_update / item_base_status / request_event e2e") {
    val dir = Files.createTempDirectory("webhook_in_").toString
    val storeDir = Files.createTempDirectory("webhook_store_").toString
    val ckpt = Files.createTempDirectory("webhook_ckpt_").toString
    val store = new DataSyncStore(spark, storeDir, numBuckets = 4)

    // drain 1: a bib update; two updates of pid 231 in ONE batch
    // (latest wins: 09:30 → status 1, empty process_type → null); a
    // request event; one malformed body (listener 4xx → dropped)
    val drain1 = Seq(
      bibEvent("998651", "2024-05-01T10:00:00Z"),
      itemEvent("231", "0", "LOAN", "2024-05-01 09:00:00", "2024-05-01T10:00:01Z"),
      itemEvent("231", "1", "", "2024-05-01 09:30:00", "2024-05-01T10:00:02Z"),
      requestEventJson,
      """{"this is": "not a webhook payload"}""")
    // drain 2: a STALE item update for 231 (08:00 < stored 09:30 →
    // guard keeps the stored row), a fresh pid 232, and an exact
    // duplicate of the bib event (insert-only natural key → 1 row)
    val drain2 = Seq(
      itemEvent("231", "0", "REQUEST", "2024-05-01 08:00:00", "2024-05-01T13:00:00Z"),
      itemEvent("232", "0", "", "2024-05-01 12:30:00", "2024-05-01T13:00:01Z"),
      bibEvent("998651", "2024-05-01T10:00:00Z"))

    val receiver = new WebhookReceiver(spark, new FakeTransport(drain1, drain2), dir)
    assert(receiver.drainToStaging() == 5)
    assert(receiver.drainToStaging() == 3)

    // maxFilesPerTrigger=1 → micro-batches replay the drains in order
    val q = WebhookIngest.ingestStream(spark, dir, store, ckpt,
      maxFilesPerTrigger = 1, availableNow = true)
    q.awaitTermination(120000)

    // record_update: 5 distinct (type, id, notification) keys — every
    // item event (even the later-rejected stale one) is history, the
    // duplicate bib event collapsed, the malformed line dropped
    val ru = store.read("record_update")
      .select("record_type", "record_id", "modified_by").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(store.read("record_update").count() == 5)
    assert(ru == Set(("BIB", "998651", "exl_impl"), ("ITEM", "231", "exl_impl"),
                     ("ITEM", "232", "exl_impl")))

    // item_base_status: 231 kept the 09:30 state through both the
    // within-batch latest-wins and the cross-batch stale guard
    val ibs = store.read("item_base_status")
      .selectExpr("pid", "status_code", "process_type",
        "CAST(update_date_time AS STRING)").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(ibs == Set(
      ("231", "1", null, "2024-05-01 09:30:00"),
      ("232", "0", null, "2024-05-01 12:30:00")))

    // request_event: the full ddl row shape, presence semantics on ''
    val re = store.read("request_event")
    assert(re.count() == 1)
    val row = re.selectExpr("request_id", "mms_id", "pid", "request_event",
      "request_type", "request_sub_type", "material_type", "place_in_queue",
      "issue", "last_interest_date", "CAST(request_date AS STRING)").collect()(0)
    assert(row.getString(0) == "83441" && row.getString(1) == "998651" &&
      row.getString(2) == "231" && row.getString(3) == "REQUEST_CREATED" &&
      row.getString(4) == "HOLD" && row.getString(5) == "PATRON_PHYSICAL" &&
      row.getString(6) == "BOOK" && row.getInt(7) == 1)
    assert(row.isNullAt(8) && row.isNullAt(9)) // '' → null presence
    assert(row.getString(10) == "2024-05-01 11:59:00")

    // a webhook arrival and the publish path agree: re-applying the
    // SAME item state via the pipeline's guarded upsert is a no-op
    store.guardedUpsert("item_base_status",
      WebhookIngest.itemBaseStatus(WebhookIngest.parse(
        spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
            itemEvent("231", "1", "", "2024-05-01 09:30:00",
              "2024-05-01T14:00:00Z")))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.StringType))))))
        .select("pid", "status_code", "process_type", "due_date",
          "update_date_time", "create_date_time"),
      Seq("pid"), "update_date_time")
    val after = store.read("item_base_status")
      .selectExpr("pid", "CAST(update_date_time AS STRING)").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(after == Set(("231", "2024-05-01 09:30:00"),
                        ("232", "2024-05-01 12:30:00")))
  }

  test("backfill parity: one applyBatch over all staged files ≡ the streamed run") {
    // the replay/ordering contract the JDBC twin relies on: reprocessing
    // a staging directory as ONE batch (disaster recovery, initial
    // backfill) must land the same store state as the original
    // file-at-a-time stream — latest-wins keys resolve by
    // update_date_time (order-independent), insert-only keys dedupe on
    // the natural key whether duplicates span batches or share one.
    val dir = Files.createTempDirectory("webhook_bf_in_").toString
    val drains = Seq(
      Seq(bibEvent("998651", "2024-05-01T10:00:00Z"),
          itemEvent("231", "0", "LOAN", "2024-05-01 09:00:00", "2024-05-01T10:00:01Z"),
          itemEvent("231", "1", "", "2024-05-01 09:30:00", "2024-05-01T10:00:02Z"),
          requestEventJson,
          """{"this is": "not a webhook payload"}"""),
      Seq(itemEvent("231", "0", "REQUEST", "2024-05-01 08:00:00", "2024-05-01T13:00:00Z"),
          itemEvent("232", "0", "", "2024-05-01 12:30:00", "2024-05-01T13:00:01Z"),
          bibEvent("998651", "2024-05-01T10:00:00Z")))
    val receiver = new WebhookReceiver(spark, new FakeTransport(drains: _*), dir)
    assert(receiver.drainToStaging() == 5)
    assert(receiver.drainToStaging() == 3)

    // streamed run: one micro-batch per staged file, in order
    val streamedDir = Files.createTempDirectory("webhook_bf_stream_").toString
    val streamed = new DataSyncStore(spark, streamedDir, numBuckets = 4)
    val q = WebhookIngest.ingestStream(spark, dir,
      streamed, Files.createTempDirectory("webhook_bf_ck_").toString,
      maxFilesPerTrigger = 1, availableNow = true)
    q.awaitTermination(120000)

    // backfill: the SAME files as one batch read → one applyBatch
    val batchDir = Files.createTempDirectory("webhook_bf_batch_").toString
    val batch = new DataSyncStore(spark, batchDir, numBuckets = 4)
    WebhookIngest.applyBatch(WebhookIngest.parse(spark.read.text(dir)), batch)

    Seq("record_update", "item_base_status", "request_event").foreach { t =>
      val a = streamed.read(t)
      val b = batch.read(t)
      assert(a.schema == b.schema, s"$t schema drift")
      val cols = a.columns.sorted.map(org.apache.spark.sql.functions.col)
      val av = a.select(cols: _*).collect().map(_.toSeq).toSet
      val bv = b.select(cols: _*).collect().map(_.toSeq).toSet
      assert(av == bv, s"$t state diverged:\n streamed-only=${av diff bv}\n batch-only=${bv diff av}")
      assert(a.count() == b.count(), s"$t row-count drift")
    }
  }

  test("webhook batch routes through the JDBC sink with the reference statement shapes") {
    // same applyBatch, PostgreSQL target: record_update / request_event
    // must go ON CONFLICT DO NOTHING, item_base_status must carry the
    // reference's guarded where clause (alma_publish_to_database.py:124)
    MockJdbc.reset()
    val lines = Seq(
      bibEvent("998651", "2024-05-01T10:00:00Z"),
      itemEvent("231", "1", "", "2024-05-01 09:30:00", "2024-05-01T10:00:02Z"),
      requestEventJson)
    import spark.implicits._
    val sink = new graft.sources.JdbcSyncSink(spark,
      url = "jdbc:postgresql://unused/test", batchSize = 100,
      connectionFactory = () => MockJdbc.connect())
    WebhookIngest.applyBatch(WebhookIngest.parse(lines.toDF("value")), sink)
    val sql = MockJdbc.preparedSql.toArray.map(_.asInstanceOf[String]).toSeq
    assert(sql.exists(s => s.startsWith(
      "insert into record_update (record_type,record_id,notification_date_time,") &&
      s.endsWith("on conflict do nothing")), sql.mkString("\n"))
    assert(sql.exists(s => s.startsWith("insert into item_base_status (pid,") &&
      s.endsWith("where item_base_status.update_date_time < ?")), sql.mkString("\n"))
    assert(sql.exists(s => s.startsWith(
      "insert into request_event (request_id,notification_date_time,request_event,") &&
      s.endsWith("on conflict do nothing")), sql.mkString("\n"))
  }
}
