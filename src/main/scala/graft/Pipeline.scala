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
  * holding_brief, holding_marc, item, item_data, item_base_status,
  * external_id, bib_part, deleted_record).
  */
object AlmaPipeline {

  case class IngestCounts(records: Long, bibs: Long, holdings: Long,
                          items: Long, errors: Long)

  /** Ingest one batch of publish records (no source ordering
    * available — intra-batch duplicate keys dedup on a content
    * tiebreak). Prefer [[ingestPublishOrdered]] fed by
    * [[graft.sources.PublishFiles.readPublishFilesOrdered]] for the
    * reference's exact first-in-sorted-file-order semantics.
    */
  def ingestPublish(records: Dataset[PublishRow], store: SyncSink,
                    locationDim: DataFrame,
                    metrics: RunMetrics.MetricsSink = RunMetrics.LogMetricsSink)
      : IngestCounts =
    ingestPublishOrdered(records.toDF().withColumn("ordinal", lit("")),
      store, locationDim, metrics)

  /** Ingest one batch of publish records carrying an `ordinal` column
    * (source path + in-file record index — see
    * [[graft.sources.PublishFiles.readPublishFilesOrdered]]).
    * `locationDim` is the config location dimension
    * (id, library_code, code) for surrogate-key resolution; pass an
    * empty frame to leave location ids null.
    */
  def ingestPublishOrdered(records: DataFrame, store: SyncSink,
                           locationDim: DataFrame,
                           metrics: RunMetrics.MetricsSink = RunMetrics.LogMetricsSink)
      : IngestCounts = {
    val spark = records.sparkSession
    import spark.implicits._

    val (split, obs) = RunMetrics.observeSplit(
      PublishSplit.splitOrdered(records))
    val cached = split.persist()
    try {
      // first-record-wins within the batch — the parser's bib_ids /
      // holding_ids sets (alma_publish_parser.py:172-183), distributed
      // and deterministic: sorted-file record order leads the tiebreak;
      // a content hash breaks remaining ties (the unordered entry point
      // has empty ordinals — the pick is then arbitrary-but-reproducible,
      // and ties between identical contents are harmless by definition)
      val bibs = Relational.firstPerKey(
        cached.filter(col("kind") === "bib"),
        Seq("mms_id"),
        Seq(col("ordinal"), xxhash64(col("leader"), col("fields"))))
      val holdings = Relational.firstPerKey(
        cached.filter(col("kind") === "holding"),
        Seq("holding_id"),
        Seq(col("ordinal"), xxhash64(col("leader"), col("fields"))))
      // items: the reference executes ON CONFLICT DO UPDATE per
      // occurrence in file order → the LAST occurrence per pid wins
      val items = Relational.latestPerKey(
        cached.filter(col("kind") === "item"),
        Seq("pid"), Seq(col("ordinal"), xxhash64(col("item_json"))))

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

      // ---- external ids: delete-then-insert refresh per (record, type)
      // (alma_publish_to_database.py:186-194, 223-233): ALL extracted
      // values insert (every qualifying 035/079 OCLC, every $a of the
      // first qualifying 020/022), and the delete is scoped to the
      // (record_id, external_id_type) pairs whose NEW raw list is
      // non-empty — a type whose values disappeared is retained, exactly
      // like the reference's `if oclcs:` guard around insert_external_ids
      val rawLists = bibs.select(col("mms_id").as("record_id"), explode(array(
          struct(lit("oclc").as("t"), Extract.oclcs(f).as("vals")),
          struct(lit("issn").as("t"), Extract.issns(f).as("vals")),
          struct(lit("isbn").as("t"), Extract.isbns(f).as("vals")))).as("e"))
        .select(col("record_id"), col("e")("t").as("external_id_type"),
                col("e")("vals").as("vals"))
        .filter(col("vals").isNotNull && size(col("vals")) > 0)
      val extIds = rawLists
        .select(col("record_id"), lit("bib").as("record_type"),
          col("external_id_type"),
          explode(col("vals")).as("raw"))
        .withColumn("external_value",
          when(col("external_id_type") === "oclc", Normalize.formatOclc(col("raw")))
            .otherwise(Normalize.formatNumberDashes(col("raw"))))
        .filter(col("external_value").isNotNull && col("external_value") =!= "")
        .select("record_id", "record_type", "external_id_type", "external_value")
        .distinct()
      store.deleteKeys("external_id",
        rawLists.select("record_id", "external_id_type").distinct(),
        Seq("record_id", "external_id_type"))
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

      // ---- items (store_item_json, alma_publish_to_database.py:278-326):
      // the full ddl `item` row — temp location resolved only when
      // in_temp_location, '' → null presence semantics, parse_date_str
      // dates, inventory_number → voyager_item_id, sequence_number 1 —
      // plus the update_date_time-guarded item_base_status upsert
      val itemSchema = "STRUCT<holding_data: STRUCT<in_temp_location: BOOLEAN," +
        " temp_library: STRUCT<value: STRING>, temp_location: STRUCT<value: STRING>," +
        " copy_id: STRING>," +
        " item_data: STRUCT<barcode: STRING, library: STRUCT<value: STRING>," +
        " location: STRUCT<value: STRING>, base_status: STRUCT<value: STRING>," +
        " description: STRING, enumeration_a: STRING, chronology_i: STRING," +
        " pieces: STRING, creation_date: STRING, modification_date: STRING," +
        " inventory_date: STRING, physical_material_type: STRUCT<value: STRING>," +
        " policy: STRUCT<value: STRING>, process_type: STRUCT<value: STRING>," +
        " inventory_number: STRING>>"
      def presence(c: org.apache.spark.sql.Column) = nullif(c, lit(""))
      val j = from_json(col("item_json"), itemSchema, Map.empty[String, String])
      val inTemp = coalesce(col("__j")("holding_data")("in_temp_location"), lit(false))
      val parsed = items.withColumn("__j", j)
        .withColumn("__temp_lib",
          when(inTemp, col("__j")("holding_data")("temp_library")("value")))
        .withColumn("__temp_loc",
          when(inTemp, col("__j")("holding_data")("temp_location")("value")))
      val tempDim = broadcast(locationDim.select(
        col("id").as("temp_location_id"), col("library_code").as("__tlib"),
        col("code").as("__tloc")))
      val itemFull = parsed
        .join(locDim,
          col("__j")("item_data")("library")("value") === col("__lib") &&
          col("__j")("item_data")("location")("value") === col("__loc"), "left")
        .join(tempDim,
          col("__temp_lib") === col("__tlib") &&
          col("__temp_loc") === col("__tloc"), "left")
        .select(
          col("pid"), col("holding_id"),
          col("location_id").as("perm_location_id"),
          col("temp_location_id"),
          lit(1L).as("sequence_number"),
          presence(col("__j")("item_data")("enumeration_a")).as("item_enum"),
          presence(col("__j")("item_data")("chronology_i")).as("chron"),
          presence(col("__j")("item_data")("barcode")).as("barcode"),
          Extract.parseDateStr(col("__j")("item_data")("creation_date"))
            .as("system_create_date_time"),
          Extract.parseDateStr(col("__j")("item_data")("modification_date"))
            .as("system_update_date_time"),
          presence(col("__j")("item_data")("physical_material_type")("value"))
            .as("material_type"),
          presence(col("__j")("item_data")("pieces")).as("pieces"),
          presence(col("__j")("holding_data")("copy_id")).as("copy_id"),
          presence(col("__j")("item_data")("policy")("value")).as("policy"),
          Normalize.normWs(presence(col("__j")("item_data")("description")))
            .as("description"),
          Extract.parseDateStr(col("__j")("item_data")("inventory_date"))
            .as("inventory_date_time"),
          presence(col("__j")("item_data")("inventory_number")).as("voyager_item_id"),
          coalesce(col("__j")("item_data")("base_status")("value"), lit("1"))
            .as("__status_code"),
          presence(col("__j")("item_data")("process_type")("value"))
            .as("__process_type"))
      store.upsert("item", itemFull.drop("__status_code", "__process_type"),
        Seq("pid"))
      store.upsert("item_data",
        items.select(col("pid"), col("item_json").as("data")), Seq("pid"))
      store.guardedUpsert("item_base_status",
        itemFull.select(col("pid"), col("__status_code").as("status_code"),
          col("__process_type").as("process_type"),
          col("system_update_date_time").as("update_date_time")),
        Seq("pid"), "update_date_time")

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
      val counts = IngestCounts(m("records").asInstanceOf[Long],
        m("bibs").asInstanceOf[Long], m("holdings").asInstanceOf[Long],
        m("items").asInstanceOf[Long], m("errors").asInstanceOf[Long])
      // the reference pushes these to CloudWatch after each run
      // (alma_publish_parser.py:302-308, metrics/aws_metrics.py)
      RunMetrics.sendCounts(metrics, "datasync", Map(
        "records" -> counts.records, "bibs" -> counts.bibs,
        "holdings" -> counts.holdings, "items" -> counts.items,
        "errors" -> counts.errors))
      counts
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
