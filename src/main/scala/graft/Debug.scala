package graft

/** Scratch diagnostics main (not part of the driver contract).
  *
  * Current experiment: stage-by-stage cost of the split-corpus
  * materialization (the dominant bench item) at sf0.1.
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val sf = "/root/testdata/sf0.1"
    val t = graft.sources.Tables(spark, sf)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // JIT warm-up identical to Bench
    SparkEntry.queries("publish_split_item")(spark, "/root/testdata/sf0.01").count()

    import org.apache.spark.sql.functions._
    import graft.marc.Extract
    import graft.functions.Normalize
    (1 to 3).foreach { round =>
      val df = graft.marc.MarcCorpus.splitRecords(t).toDF()
      val isH = col("kind") === "holding"
      time(s"r$round split only")(df.count())
      time(s"r$round + holding HOF extracts")(df.select(col("kind"),
        when(isH, array_join(transform(col("fields"), f => f("tag")), ",")).as("field_tags"),
        when(isH, Extract.callNumber(col("fields"))).as("display_call_number"),
        when(isH, Extract.libraryCode(col("fields"))).as("library_code"),
        when(isH, Extract.locationCode(col("fields"))).as("location_code"),
        when(isH, Extract.fixedField(col("fields"), "008")).as("field008"),
        when(isH, Extract.voyagerId(col("fields"))).as("voyager_holding_id"),
        when(isH, Extract.suppress(col("fields"), "HLD")).as("suppress"),
        when(isH, Extract.systemDates(col("fields"), "HLD")("update").cast("long")).as("update_epoch")).count())
      val schema = "STRUCT<holding_data: STRUCT<in_temp_location: BOOLEAN," +
        " temp_library: STRUCT<value: STRING>, temp_location: STRUCT<value: STRING>," +
        " copy_id: STRING>," +
        " item_data: STRUCT<barcode: STRING, library: STRUCT<value: STRING>," +
        " location: STRUCT<value: STRING>, base_status: STRUCT<value: STRING>," +
        " description: STRING, enumeration_a: STRING, pieces: STRING>>"
      time(s"r$round + item from_json")(df.select(col("kind"),
        from_json(col("item_json"), schema, Map.empty[String, String]).as("__j")).count())
      time(s"r$round + bib-fields persist encode")(
        { val p = df.select(col("kind"), col("mms_id"),
            when(col("kind") === "bib", col("fields")).as("fields"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          p.count(); p.unpersist(true) })
      // the REAL full projection splitCorpus builds (all columns), no persist
      val isB = col("kind") === "bib"
      val full = df
        .withColumn("__j", from_json(col("item_json"), schema, Map.empty[String, String]))
        .select(
          col("kind"), col("mms_id"), col("holding_id"), col("pid"),
          col("leader"), col("item_pids"), col("error"),
          when(isB, col("fields")).as("fields"),
          when(isH, array_join(transform(col("fields"), f => f("tag")), ",")).as("field_tags"),
          when(isH, Extract.callNumber(col("fields"))).as("display_call_number"),
          when(isH, Extract.libraryCode(col("fields"))).as("library_code"),
          when(isH, Extract.locationCode(col("fields"))).as("location_code"),
          when(isH, Extract.fixedField(col("fields"), "008")).as("field008"),
          when(isH, Extract.voyagerId(col("fields"))).as("voyager_holding_id"),
          when(isH, Extract.suppress(col("fields"), "HLD")).as("suppress"),
          when(isH, Extract.systemDates(col("fields"), "HLD")("update").cast("long")).as("update_epoch"),
          col("__j")("item_data")("barcode").as("barcode"),
          col("__j")("item_data")("library")("value").as("perm_library"),
          col("__j")("item_data")("location")("value").as("perm_location"),
          col("__j")("holding_data")("temp_library")("value").as("temp_library"),
          col("__j")("holding_data")("temp_location")("value").as("temp_location"),
          col("__j")("holding_data")("in_temp_location").cast("string").as("in_temp_location"),
          col("__j")("item_data")("base_status")("value").as("status_code"),
          Normalize.normWs(col("__j")("item_data")("description")).as("description"),
          col("__j")("item_data")("enumeration_a").as("item_enum"),
          col("__j")("item_data")("pieces").as("pieces"),
          col("__j")("holding_data")("copy_id").as("copy_id"))
      time(s"r$round FULL projection (no persist)")(full.count())
      time(s"r$round FULL projection + persist")(
        { val p = full.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          p.count(); p.unpersist(true) })
    }
    spark.stop()
  }
}
