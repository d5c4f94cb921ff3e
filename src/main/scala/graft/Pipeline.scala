package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.marc.{DeleteFiles, Extract, Iso2709, MarcXml, PublishSplit}
import graft.marc.PublishSplit.PublishRow
import graft.operators.{Relational, RunMetrics}
import graft.sources.{DataSyncStore, SyncSink}

/** The end-to-end ingest pipeline — what `alma_publish_to_marc.py` +
  * `alma_publish_to_database.py` do per publish run, as one
  * distributed flow into a [[graft.sources.SyncSink]] (parquet store or JDBC):
  *
  *   parse → split → first-record-wins dedup → brief extraction →
  *   marc blobs → upserts → external-id refresh → bound-with links →
  *   orphan cleanup → run metrics.
  *
  * A user of the reference switches by pointing this at their publish
  * files and a store root; every table written here matches a
  * ddl/data_sync_db.sql table (bib_brief, bib_marc, bib_marc_xml,
  * holding_brief, holding_marc, item, item_data, external_id,
  * bib_part, deleted_record).
  */
object AlmaPipeline {

  case class IngestCounts(records: Long, bibs: Long, holdings: Long,
                          items: Long, errors: Long)

  /** Ingest one batch of publish records. `locationDim` is the config
    * location dimension (id, library_code, code) for surrogate-key
    * resolution; pass an empty frame to leave location ids null.
    */
  def ingestPublish(records: Dataset[PublishRow], store: SyncSink,
                    locationDim: DataFrame): IngestCounts = {
    val spark = records.sparkSession
    import spark.implicits._

    val (split, obs) = RunMetrics.observeSplit(
      PublishSplit.split(records.toDF()).toDF())
    val cached = split.persist()
    try {
      // first-record-wins within the batch — the parser's bib_ids /
      // holding_ids sets (alma_publish_parser.py:172-183), distributed
      val bibs = Relational.firstPerKey(
        cached.filter(col("kind") === "bib"),
        Seq("mms_id"), Seq(col("holding_id")))
      val holdings = Relational.firstPerKey(
        cached.filter(col("kind") === "holding"),
        Seq("holding_id"), Seq(col("mms_id")))
      val items = cached.filter(col("kind") === "item")

      // ---- bib tables
      val f = col("fields")
      store.upsert("bib_brief", bibs.select(
        col("mms_id"),
        Extract.title(f).as("title"),
        Extract.author(f).as("author"),
        Extract.publicationDate(f).as("publication_date"),
        Extract.publicationPlace(f).as("publication_place"),
        Extract.publisher(f).as("publisher"),
        Extract.fixedField(f, "008").as("field008"),
        Extract.extent(f).as("extent"),
        Extract.material(f).as("material"),
        col("leader"),
        Extract.issn(f).as("issn"),
        Extract.isbn(f).as("isbn"),
        Extract.oclcNumber(f).as("oclc_number"),
        Extract.voyagerId(f).as("voyager_bib_id"),
        Extract.suppress(f, "BIB").as("suppress"),
        Extract.systemDates(f, "BIB")("create").as("system_create_date_time"),
        Extract.systemDates(f, "BIB")("update").as("system_update_date_time")),
        Seq("mms_id"))

      val bibRows = bibs.select("mms_id", "leader", "fields").as[PublishRow]
      store.upsert("bib_marc_xml",
        bibRows.map(r => (r.mms_id, MarcXml.toXml(r.leader, r.fields)))
          .toDF("mms_id", "marc_xml"),
        Seq("mms_id"))
      // AVE/AVD removed before binary marc; BIB dropped if over the cap
      // (alma_publish_to_database.py:173-184)
      store.upsert("bib_marc",
        bibRows.flatMap { r =>
          val trimmed = r.fields.filterNot(x => x.tag == "AVE" || x.tag == "AVD")
          Iso2709.encodeCapped(r.leader, trimmed, "BIB").map(b => (r.mms_id, b))
        }.toDF("mms_id", "raw_marc"),
        Seq("mms_id"))

      // ---- external ids: delete-then-insert refresh per record
      // (alma_publish_to_database.py:186-194, 223-233)
      val extIds = bibs.select(col("mms_id"), explode(array(
          struct(lit("oclc").as("t"), Normalize.formatOclc(Extract.oclcNumber(f)).as("v")),
          struct(lit("issn").as("t"), Normalize.formatNumberDashes(Extract.issn(f)).as("v")),
          struct(lit("isbn").as("t"), Normalize.formatNumberDashes(Extract.isbn(f)).as("v"))))
          .as("e"))
        .select(col("mms_id").as("record_id"), lit("bib").as("record_type"),
                col("e")("t").as("external_id_type"), col("e")("v").as("external_value"))
        .filter(col("external_value").isNotNull && col("external_value") =!= "")
        .distinct()
      store.deleteKeys("external_id", bibs.select(col("mms_id").as("record_id")),
                       Seq("record_id"))
      store.insertOnly("external_id", extIds,
                       Seq("record_id", "external_id_type", "external_value"))

      // ---- bound-with links (774$w, 99…8651 filter) — delete+insert
      val links = bibs.select(col("mms_id"), explode(
          filter(Extract.fieldsWithTag(f, "774"),
            x => size(Extract.subfieldValues(x, "w")) > 0)).as("f774"))
        .select(col("mms_id"),
                get(Extract.subfieldValues(col("f774"), "w"), lit(0)).as("part_mms_id"))
        .filter(col("part_mms_id").startsWith("99") &&
                col("part_mms_id").endsWith("8651"))
        .distinct()
      store.deleteKeys("bib_part", bibs.select(col("mms_id")), Seq("mms_id"))
      store.insertOnly("bib_part", links, Seq("mms_id", "part_mms_id"))

      // ---- holding tables
      val locDim = broadcast(locationDim.select(
        col("id").as("location_id"), col("library_code").as("__lib"),
        col("code").as("__loc")))
      store.upsert("holding_brief", holdings
        .join(locDim, Extract.libraryCode(f) === col("__lib") &&
                      Extract.locationCode(f) === col("__loc"), "left")
        .select(
          col("holding_id"), col("mms_id"),
          Extract.callNumber(f).as("display_call_number"),
          col("location_id"),
          Extract.fixedField(f, "008").as("field008"),
          Extract.voyagerId(f).as("voyager_holding_id"),
          Extract.suppress(f, "HLD").as("suppress"),
          Extract.systemDates(f, "HLD")("create").as("system_create_date_time"),
          Extract.systemDates(f, "HLD")("update").as("system_update_date_time")),
        Seq("holding_id"))
      val holdingRows = holdings.select("holding_id", "leader", "fields")
        .withColumnRenamed("holding_id", "mms_id").as[PublishRow]
      store.upsert("holding_marc",
        holdingRows.flatMap { r =>
          Iso2709.encodeCapped(r.leader, r.fields, "HLD").map(b => (r.mms_id, b))
        }.toDF("holding_id", "raw_marc"),
        Seq("holding_id"))

      // ---- items (store_item_json, alma_publish_to_database.py:278-312)
      val itemSchema = "STRUCT<holding_data: STRUCT<in_temp_location: BOOLEAN," +
        " temp_library: STRUCT<value: STRING>, copy_id: STRING>," +
        " item_data: STRUCT<barcode: STRING, library: STRUCT<value: STRING>," +
        " location: STRUCT<value: STRING>, base_status: STRUCT<value: STRING>," +
        " description: STRING, enumeration_a: STRING, pieces: STRING>>"
      val j = from_json(col("item_json"), itemSchema, Map.empty[String, String])
      store.upsert("item", items.withColumn("__j", j)
        .join(locDim,
          col("__j")("item_data")("library")("value") === col("__lib") &&
          col("__j")("item_data")("location")("value") === col("__loc"), "left")
        .select(
          col("pid"), col("holding_id"),
          col("location_id").as("perm_location_id"),
          col("__j")("item_data")("enumeration_a").as("item_enum"),
          col("__j")("item_data")("barcode").as("barcode"),
          coalesce(col("__j")("item_data")("base_status")("value"), lit("1"))
            .as("status_code"),
          Normalize.normWs(col("__j")("item_data")("description")).as("description"),
          col("__j")("item_data")("pieces").as("pieces"),
          col("__j")("holding_data")("copy_id").as("copy_id")),
        Seq("pid"))
      store.upsert("item_data",
        items.select(col("pid"), col("item_json").as("data")), Seq("pid"))

      // ---- orphan cleanup (alma_publish_to_database.py:139-143, 236-241)
      if (store.exists("holding_brief")) {
        val published = holdings.select(col("mms_id"), col("holding_id"))
        store.deleteKeys("holding_brief",
          Relational.orphans(
            store.read("holding_brief").select("mms_id", "holding_id"),
            published, Seq("mms_id"), Seq("holding_id"))
            .select("holding_id"),
          Seq("holding_id"))
      }
      if (store.exists("item")) {
        val publishedItems = items.select(col("holding_id"), col("pid"))
        store.deleteKeys("item",
          Relational.orphans(store.read("item").select("holding_id", "pid"),
            publishedItems, Seq("holding_id"), Seq("pid"))
            .select("pid"),
          Seq("pid"))
      }

      val m = obs.get
      IngestCounts(m("records").asInstanceOf[Long],
        m("bibs").asInstanceOf[Long], m("holdings").asInstanceOf[Long],
        m("items").asInstanceOf[Long], m("errors").asInstanceOf[Long])
    } finally cached.unpersist()
  }

  /** Process a delete file: remove bibs/holdings, append history rows
    * (alma_publish_parser.py:341-380; deleted_record table).
    */
  def processDeletes(records: Dataset[PublishRow], store: SyncSink): Unit = {
    val actions = DeleteFiles.deleteActions(records).persist()
    try {
      store.deleteKeys("bib_brief",
        actions.filter(col("record_type") === "bib")
          .select(col("record_id").as("mms_id")), Seq("mms_id"))
      store.deleteKeys("holding_brief",
        actions.filter(col("record_type") === "holding")
          .select(col("record_id").as("holding_id")), Seq("holding_id"))
      // record_id leads: it is the store's bucket key (record_type has
      // cardinality 2 — bucketing on it would put the table in 2 buckets)
      store.insertOnly("deleted_record", actions,
        Seq("record_id", "record_type"))
    } finally actions.unpersist()
  }
}
