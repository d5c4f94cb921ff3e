package graft

/** Scratch diagnostics main (not part of the driver contract).
  *
  * Current experiment: webhook envelope parse — measured single-parse
  * cost vs the optimizer's from_json duplication, and the explode
  * barrier that pins the parse to exactly once per row.
  *
  * CONCLUSION (round 3): plain parse ~1.9s, explode barrier ~4.4s at
  * sf0.1 — the Generate node costs more than the duplicate parses it
  * prevents for single-struct payloads. WebhookIngest.parse now uses
  * functions.OncePerRowExpr (non-determinism flag blocks alias
  * inlining, plan stays a codegen Project) instead.
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val sf = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.queries("webhook_item_status")(spark, "/root/testdata/sf0.01").count()

    import org.apache.spark.sql.functions._
    val t = graft.sources.Tables(spark, sf)
    val payloads = t.lineitem.select(format_string(
      "{\"action\":\"ITEM\",\"event\":{\"value\":\"ITEM_UPDATED\"}," +
      "\"time\":\"2024-05-01T10:00:00Z\",\"modified_by\":\"exl\"," +
      "\"item\":{\"item_data\":{\"pid\":\"%s\",\"base_status\":{\"value\":\"%s\"}," +
      "\"process_type\":{\"value\":\"%s\"},\"due_date\":\"\"," +
      "\"modification_date\":\"%s\"}}}",
      concat(lit("23"), (col("l_orderkey") * 100 + col("l_linenumber")).cast("string"), lit("8651")),
      when(col("l_returnflag") === "R", "0").otherwise("1"),
      when(col("l_linestatus") === "O", "LOAN").otherwise(""),
      concat(date_format(col("l_shipdate"), "yyyy-MM-dd"), lit(" 12:00:00"))).as("value"))
      .persist()
    println(s"[dbg] payload rows ${payloads.count()}")

    val schema = graft.sources.WebhookIngest.PayloadSchema

    (1 to 2).foreach { round =>
      // true single-parse cost: one project, aggregate forces eval of a field
      time(s"r$round single parse, field agg") {
        payloads.select(from_json(col("value"), schema,
            Map.empty[String, String]).as("w"))
          .agg(count(col("w")("action"))).collect()
      }
      // explode barrier: Generate pins one from_json eval per row;
      // downstream filter/extract reference the generator output
      time(s"r$round explode-barrier parse+filter+extract") {
        val p = payloads
          .select(explode(array(from_json(col("value"), schema,
            Map.empty[String, String]))).as("w"))
          .filter(col("w").isNotNull && col("w")("action").isNotNull)
        val d = col("w")("item")("item_data")
        p.filter(upper(col("w")("action")) === "ITEM" && d("pid").isNotNull)
          .select(d("pid").as("pid"),
            coalesce(nullif(d("base_status")("value"), lit("")), lit("1")).as("status_code"),
            nullif(d("process_type")("value"), lit("")).as("process_type"),
            graft.marc.Extract.parseDateStr(nullif(d("due_date"), lit(""))).as("due_date"),
            graft.marc.Extract.parseDateStr(nullif(d("modification_date"), lit("")))
              .as("update_date_time"),
            try_to_timestamp(nullif(col("w")("time"), lit(""))).as("create_date_time"))
          .agg(count(col("pid")), count(col("update_date_time"))).collect()
      }
      // current production path
      time(s"r$round current parse→itemBaseStatus") {
        graft.sources.WebhookIngest.itemBaseStatus(
          graft.sources.WebhookIngest.parse(payloads))
          .agg(count(col("pid")), count(col("update_date_time"))).collect()
      }
    }
    spark.stop()
  }
}
