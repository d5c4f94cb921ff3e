package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.marc.Extract
import graft.operators.Relational

/** Transport seam for the Alma webhook listener — the counterpart of
  * [[AlmaTransport]] for PUSH traffic. The reference's webhook-fed
  * tables (`record_update`, `item_base_status`, `request_event`;
  * README:51-53, grants in alma_publish_to_database.py:361-365) are
  * populated by an out-of-repo HTTP listener that receives Alma event
  * POSTs; this trait is where that listener hands its request bodies
  * to the engine. Implementations return pending POST bodies in
  * arrival order and are free to block or return empty.
  */
trait WebhookTransport extends Serializable {
  /** Drain pending webhook POST bodies (JSON), in arrival order. */
  def drain(): Seq[String]
}

/** Durable-log boundary between the webhook listener and Structured
  * Streaming: each drain appends ONE JSONL staging file, written via
  * attempt-unique temp + rename so the downstream file stream never
  * observes a half-written file. The receiver is deliberately
  * driver-side and tiny — webhook traffic is event-sized, and the
  * distributed work starts at the stream that reads the staging dir
  * ([[WebhookIngest.ingestStream]]).
  */
final class WebhookReceiver(spark: SparkSession, transport: WebhookTransport,
                            stagingDir: String) {
  private val conf = spark.sessionState.newHadoopConf()
  private val base = new Path(stagingDir)
  private val fs = base.getFileSystem(conf)
  if (!fs.exists(base)) fs.mkdirs(base)

  private val FileName = """webhook-(\d+)\.jsonl""".r
  private val seq = new java.util.concurrent.atomic.AtomicLong {
    val existing = fs.globStatus(new Path(s"$stagingDir/webhook-*.jsonl"))
    val max = if (existing == null) -1L else existing.map(_.getPath.getName)
      .collect { case FileName(n) => n.toLong }.foldLeft(-1L)(math.max)
    set(max + 1L)
  }

  /** Drain the transport and stage the payloads; returns the number of
    * payloads written (0 leaves no file behind).
    */
  def drainToStaging(): Int = {
    val payloads = transport.drain().map(_.replace('\n', ' '))
    if (payloads.nonEmpty) {
      val n = seq.getAndIncrement()
      val out = new Path(f"$stagingDir/webhook-$n%09d.jsonl")
      val tmp = new Path(s"$stagingDir/.webhook-$n.${java.util.UUID.randomUUID}.tmp")
      val stream = fs.create(tmp, true)
      try stream.write((payloads.mkString("\n") + "\n").getBytes("UTF-8"))
      finally stream.close()
      if (!fs.rename(tmp, out)) { fs.delete(tmp, false); sys.error(s"stage collision: $out") }
    }
    payloads.size
  }
}

/** The webhook event → table transforms. Payload shapes follow Alma's
  * public webhook POST bodies: a common envelope (`action`, `event:
  * {value}`, `time`) plus one of `bib`, `item` (the SAME item JSON the
  * publish export carries — item-template.json), or `user_request`.
  * Targets are the three webhook DDL tables verbatim
  * (ddl/data_sync_db.sql:184,247,294).
  */
object WebhookIngest {

  /** Envelope + the union of the three event bodies. Unknown fields in
    * real traffic are simply not projected; rows that fail to parse
    * (null struct) are dropped, mirroring a listener 4xx.
    */
  val PayloadSchema: String =
    "STRUCT<action: STRING, event: STRUCT<value: STRING>, time: STRING," +
    " modified_by: STRING," +
    " bib: STRUCT<mms_id: STRING>," +
    " item: STRUCT<bib_data: STRUCT<mms_id: STRING>," +
    "   holding_data: STRUCT<holding_id: STRING>," +
    "   item_data: STRUCT<pid: STRING, barcode: STRING," +
    "     base_status: STRUCT<value: STRING>," +
    "     process_type: STRUCT<value: STRING>, due_date: STRING," +
    "     modification_date: STRING>>," +
    " user_request: STRUCT<request_id: STRING, mms_id: STRING," +
    "   holding_id: STRING, item_pid: STRING, barcode: STRING," +
    "   volume: STRING, part: STRING, issue: STRING," +
    "   material_type: STRUCT<value: STRING>, request_type: STRING," +
    "   request_sub_type: STRUCT<value: STRING>, request_status: STRING," +
    "   comment: STRING, managed_by_library_code: STRING," +
    "   managed_by_circulation_desk_code: STRING, place_in_queue: INT," +
    "   task_name: STRING, pickup_location: STRING," +
    "   pickup_location_type: STRING, pickup_location_library: STRING," +
    "   request_date: STRING, expiry_date: STRING," +
    "   last_interest_date: STRING>>"

  private def presence(c: org.apache.spark.sql.Column) = nullif(c, lit(""))

  /** Lenient ISO-8601 parse: ''/garbage → null instead of an ANSI cast
    * error — a dirty payload field must never fail the whole stream.
    */
  private def tryTs(c: org.apache.spark.sql.Column) = try_to_timestamp(presence(c))

  /** Raw staged lines (column `value`) → parsed envelopes (column `w`).
    * Malformed JSON parses to null and is dropped.
    *
    * The parse sits behind [[graft.functions.OncePerRowExpr]] on
    * purpose: JsonToStructs is a CodegenFallback expression and both
    * predicate pushdown and CollapseProject clone it into every
    * reference site — the routed extraction plans would otherwise
    * carry 9 independent from_json copies (measured 12s vs 4.5s for
    * 600k payloads at sf0.1). The barrier's non-determinism flag stops
    * that inlining while keeping the plan a plain codegen Project; the
    * explode(array(…)) Generate barrier it replaces pinned the same
    * single parse but the Generate node itself cost more than the
    * duplicates it prevented (~1.9s plain parse vs ~4.4s behind the
    * explode barrier, graft.Debug). Plan-asserted in PlanQualitySpec:
    * exactly one from_json, zero Generate nodes.
    */
  def parse(raw: DataFrame): DataFrame =
    raw.select(graft.functions.OncePerRowExpr(
        from_json(col("value"), PayloadSchema, Map.empty[String, String])).as("w"))
      .filter(col("w").isNotNull && col("w")("action").isNotNull)

  /** `record_update` history rows (ddl:247-254): record_type + id per
    * event, "currently only Items and Bibs" (README:51). The `id`
    * sequence column is the sink's concern (record_update_id_seq on
    * JDBC; the parquet store keys on the natural key instead).
    */
  def recordUpdates(parsed: DataFrame): DataFrame =
    parsed.select(upper(col("w")("action")).as("record_type"),
        coalesce(col("w")("bib")("mms_id"),
          col("w")("item")("item_data")("pid")).as("record_id"),
        tryTs(col("w")("time")).as("notification_date_time"),
        tryTs(col("w")("time")).as("create_date_time"),
        col("w")("modified_by").as("modified_by"))
      .filter(col("record_type").isin("BIB", "ITEM") && col("record_id").isNotNull)

  /** `item_base_status` rows (ddl:184-195) from ITEM events: the same
    * base_status/process_type/modification_date extraction as the
    * publish path (Pipeline item handling), so a webhook update and a
    * nightly publish of the same item state produce identical rows.
    */
  def itemBaseStatus(parsed: DataFrame): DataFrame = {
    val d = col("w")("item")("item_data")
    parsed.filter(upper(col("w")("action")) === "ITEM" && d("pid").isNotNull)
      .select(d("pid").as("pid"),
        coalesce(presence(d("base_status")("value")), lit("1")).as("status_code"),
        presence(d("process_type")("value")).as("process_type"),
        Extract.parseDateStr(presence(d("due_date"))).as("due_date"),
        Extract.parseDateStr(presence(d("modification_date")))
          .as("update_date_time"),
        tryTs(col("w")("time")).as("create_date_time"))
  }

  /** `request_event` append rows — the full ddl column set
    * (ddl:294-320), `request_event` itself being the envelope's event
    * code (REQUEST_CREATED / _CLOSED / …).
    */
  def requestEvents(parsed: DataFrame): DataFrame = {
    val r = col("w")("user_request")
    parsed.filter(upper(col("w")("action")) === "REQUEST" && r.isNotNull)
      .select(r("request_id").as("request_id"),
        tryTs(col("w")("time")).as("create_date_time"),
        tryTs(col("w")("time")).as("notification_date_time"),
        r("mms_id").as("mms_id"),
        r("holding_id").as("holding_id"),
        r("item_pid").as("pid"),
        presence(r("barcode")).as("barcode"),
        presence(r("volume")).as("volume"),
        presence(r("part")).as("part"),
        presence(r("material_type")("value")).as("material_type"),
        presence(r("issue")).as("issue"),
        col("w")("event")("value").as("request_event"),
        r("request_type").as("request_type"),
        presence(r("request_sub_type")("value")).as("request_sub_type"),
        presence(r("request_status")).as("request_status"),
        presence(r("comment")).as("comment"),
        presence(r("managed_by_library_code")).as("managed_by_library_code"),
        presence(r("managed_by_circulation_desk_code"))
          .as("managed_by_circulation_desk_code"),
        r("place_in_queue").as("place_in_queue"),
        presence(r("task_name")).as("task_name"),
        presence(r("pickup_location")).as("pickup_location"),
        presence(r("pickup_location_type")).as("pickup_location_type"),
        presence(r("pickup_location_library")).as("pickup_location_library"),
        tryTs(r("request_date")).as("request_date"),
        tryTs(r("expiry_date")).as("expiry_date"),
        tryTs(r("last_interest_date")).as("last_interest_date"))
  }

  /** The live webhook pipeline: staging dir → file stream → per-batch
    * routing into the store. Per batch: record_update history is
    * insert-only on its natural key, item_base_status applies the
    * `update_date_time < new` guard (within-batch latest first, so one
    * batch carrying two updates of a pid resolves like two arrivals),
    * request_event appends. `maxFilesPerTrigger=1` keeps micro-batches
    * in staging-file order — the receiver's arrival order.
    */
  def ingestStream(spark: SparkSession, stagingDir: String, store: SyncSink,
                   checkpointDir: String,
                   maxFilesPerTrigger: Int = 1,
                   availableNow: Boolean = false): StreamingQuery = {
    val writer = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(stagingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(parse(batch), store)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** One micro-batch (or backfill) of parsed envelopes → the store.
    *
    * The two insert-only frames dedupe on their natural keys WITHIN the
    * batch first: the reference's row-at-a-time `ON CONFLICT DO
    * NOTHING` collapses a same-statement duplicate exactly like a
    * cross-statement one, so a one-shot BACKFILL over a whole staging
    * directory must land the same state as the original file-at-a-time
    * stream (duplicate events that straddled micro-batches there share
    * one batch here) — parity spec-asserted in WebhookSpec.
    */
  def applyBatch(parsed: DataFrame, store: SyncSink): Unit = {
    val p = parsed.persist()
    try {
      val ruKey = Seq("record_type", "record_id", "notification_date_time")
      val ru = recordUpdates(p).dropDuplicates(ruKey)
      if (!ru.isEmpty) store.insertOnly("record_update", ru, ruKey)
      val ibs = itemBaseStatus(p)
      if (!ibs.isEmpty)
        store.guardedUpsert("item_base_status",
          Relational.latestPerKey(ibs, Seq("pid"),
            Seq(col("update_date_time"), col("status_code"))),
          Seq("pid"), "update_date_time")
      val reKey = Seq("request_id", "notification_date_time", "request_event")
      val re = requestEvents(p).dropDuplicates(reKey)
      if (!re.isEmpty) store.insertOnly("request_event", re, reKey)
    } finally { p.unpersist(); () }
  }
}
