package graft

/** Scratch diagnostics main (not part of the driver contract).
  *
  * Current experiment (round 4): ANN recall@10 vs knob settings on the
  * sf0.01 embedding corpus — a NEAR-UNIFORM random-vector corpus, i.e.
  * the ANN worst case (cosine gaps between true and false neighbors
  * are tiny, so any method that prunes the scan loses recall). The
  * sweep quantifies the recall ↔ scan-fraction tradeoff to pick
  * defaults and spec floors; numbers recorded in SURVEY §5.
  *
  * Previous experiment (round 3, kept for the record): webhook
  * envelope parse — plain parse ~1.9s vs ~4.4s behind an explode
  * barrier at sf0.1; WebhookIngest.parse uses OncePerRowExpr instead.
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity

    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .persist()
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.annBruteForce(emb, queries, "vec_id", "embedding",
      k = 10).persist()
    println(s"[dbg] corpus=${emb.count()} queries=50 ground-truth rows=${exact.count()}")

    for (nprobe <- Seq(2, 4, 8, 16, 32)) {
      val ivf = Similarity.annIvf(emb, queries, "vec_id", "embedding",
        k = 10, nlist = 32, nprobe = nprobe, lloydIters = 2)
      val r = Similarity.recallAtK(ivf, exact)
      println(f"[dbg] ivf nlist=32 nprobe=$nprobe%-2d scan=${nprobe / 32.0}%.3f recall@10=$r%.4f")
    }
    for ((tables, bits) <- Seq((8, 8), (16, 8), (8, 6), (16, 6), (32, 6), (16, 4))) {
      val lsh = Similarity.annLsh(emb, queries, "vec_id", "embedding",
        dim = 64, k = 10, tables = tables, bits = bits)
      val r = Similarity.recallAtK(lsh, exact)
      println(f"[dbg] lsh tables=$tables%-2d bits=$bits recall@10=$r%.4f")
    }

    // dedup_clusters timing: r2→r3 showed +1.5s (4.99→6.53) at sf0.1 —
    // min-of-3 separates host variance from a real regression
    val sf = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[dbg] $label%-40s $s%6.2fs"); s
    }
    SparkEntry.queries("dedup_minhash")(spark, "/root/testdata/sf0.01").count() // JIT warm
    val runs = (1 to 3).map { i =>
      SparkEntry.resetCaches(spark)
      time(s"dedup_clusters sf0.1 run$i") {
        SparkEntry.queries("dedup_clusters")(spark, sf).count(); ()
      }
    }
    println(f"[dbg] dedup_clusters min-of-3: ${runs.min}%.2fs  (all: ${runs.map(r => f"$r%.2f").mkString(", ")})")

    // OncePerRowExpr barrier vs SharedExpr (With/CommonExpressionRef)
    // on the webhook parse→route shape: SharedExpr lets the action
    // filter push below the hoisted parse, so every row pays a pruned
    // parse in the Filter AND survivors pay the full parse — while the
    // barrier parses exactly once per row but cannot push. Which wins
    // depends on filter selectivity (webhook fixture: ~100% survive).
    val payloads = SparkEntry.webhookPayloads(spark, sf)
    println(s"[dbg] webhook payload rows ${payloads.count()}")
    val schema = graft.sources.WebhookIngest.PayloadSchema
    def viaShared() = {
      import org.apache.spark.sql.Column
      graft.functions.SharedExpr.select(payloads,
        from_json(col("value"), schema, Map.empty[String, String])) { w =>
        val d = w("item")("item_data")
        def presence(c: Column) = nullif(c, lit(""))
        Seq("action" -> upper(w("action")),
          "pid" -> d("pid"),
          "status_code" -> coalesce(presence(d("base_status")("value")), lit("1")),
          "process_type" -> presence(d("process_type")("value")),
          "due_date" -> graft.marc.Extract.parseDateStr(presence(d("due_date"))),
          "update_date_time" -> graft.marc.Extract.parseDateStr(
            presence(d("modification_date"))))
      }.agg(count(when(col("action") === "ITEM", col("pid"))),
            count(col("update_date_time"))).collect()
    }
    def viaBarrier() = {
      graft.sources.WebhookIngest.itemBaseStatus(
        graft.sources.WebhookIngest.parse(payloads))
        .agg(count(col("pid")), count(col("update_date_time"))).collect()
    }
    // CONCLUSION (r4): plain-extraction SharedExpr 3.47s vs barrier
    // 4.31s over 600k payloads — the native With machinery wins AND
    // keeps pushdown, but viaShared (with parseDateStr/upper) dies in
    // RewriteWithExpression (nested RuntimeReplaceable With orphans
    // the outer def: NoSuchElementException CommonExpressionId) — so
    // the production webhook route keeps the barrier. viaShared kept
    // here as the repro.
    def viaSharedPlain() = {
      graft.functions.SharedExpr.select(payloads,
        from_json(col("value"), schema, Map.empty[String, String])) { w =>
        val d = w("item")("item_data")
        Seq("action" -> w("action"), "pid" -> d("pid"),
          "status" -> d("base_status")("value"),
          "mod" -> d("modification_date"))
      }.agg(count(col("pid")), count(col("status"))).collect()
    }
    (1 to 2).foreach { r =>
      time(s"r$r webhook via SharedExpr PLAIN")(viaSharedPlain())
      time(s"r$r webhook via OncePerRowExpr barrier")(viaBarrier())
    }
    try { viaShared(); println("[dbg] viaShared unexpectedly SUCCEEDED — nested-With fixed upstream?") }
    catch { case e: Throwable => println(s"[dbg] viaShared (known limitation): ${e.getClass.getSimpleName}") }
    spark.stop()
  }
}
