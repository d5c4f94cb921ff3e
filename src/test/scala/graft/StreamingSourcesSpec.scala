package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.marc.{Iso2709, MarcCorpus, MarcXml}
import graft.marc.PublishSplit.PublishRow
import graft.operators.Multimodal
import graft.sources.{PublishFiles, Tables}
import graft.streaming.Streams
import graft.streaming.Streams.StatusEvent

/** D-group (streaming, file staging) and F-group (sources) specs. */
class StreamingSourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- D1 / D2

  test("latest-status stream equals the batch twin after all batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatusEvent]
    val out = Streams.latestStatusUpdates(input.toDS())
    val q = out.writeStream.format("memory").queryName("latest_t")
      .outputMode("append").start()
    try {
      input.addData(StatusEvent(1, 10, "a"), StatusEvent(2, 5, "x"))
      q.processAllAvailable()
      // batch 2: key 1 gets older + equal + newer events
      input.addData(StatusEvent(1, 9, "stale"), StatusEvent(1, 10, "dup"),
                    StatusEvent(1, 12, "b"), StatusEvent(2, 6, "y"))
      q.processAllAvailable()
      val emitted = spark.table("latest_t").as[StatusEvent].collect().toSet
      // stale (9 < 10) and dup (10 == 10) are dropped by the
      // update_date_time guard; b and y are strictly newer
      assert(emitted == Set(
        StatusEvent(1, 10, "a"), StatusEvent(2, 5, "x"),
        StatusEvent(1, 12, "b"), StatusEvent(2, 6, "y")))
      // final state per key == batch latest-wins
      val finalState = emitted.groupBy(_.key).map { case (k, es) => k -> es.maxBy(_.ts) }
      assert(finalState == Map(1L -> StatusEvent(1, 12, "b"),
                               2L -> StatusEvent(2, 6, "y")))
    } finally q.stop()
  }

  test("windowed event stream matches the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val out = Streams.windowedEventCounts(df, "ts", "event_type", "value")
    val q = out.writeStream.format("memory").queryName("win_t")
      .outputMode("complete").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        (t("2024-01-01 10:05:00"), "click", 1.0),
        (t("2024-01-01 10:55:00"), "click", 2.0),
        (t("2024-01-01 11:05:00"), "click", 4.0),
        (t("2024-01-01 10:20:00"), "view", 8.0))
      q.processAllAvailable()
      val got = spark.table("win_t")
        .select(date_format($"window_start", "HH:mm").as("w"), $"event_type", $"n", $"total_value")
        .as[(String, String, Long, Double)].collect().toSet
      assert(got == Set(("10:00", "click", 2L, 3.0), ("11:00", "click", 1L, 4.0),
                        ("10:00", "view", 1L, 8.0)))
    } finally q.stop()
  }

  test("session windows merge across micro-batches; closed sessions match batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val out = Streams.sessionWindowStats(df, "user_id", "ts", "value",
      gap = "10 minutes", watermark = Some("0 seconds"))
    val q = out.writeStream.format("memory").queryName("sess_t")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val all = Seq(
      (t("2024-01-01 10:00:00"), 1L, 1.0),
      (t("2024-01-01 10:05:00"), 1L, 2.0),
      // second micro-batch EXTENDS the open session (10:12 < 10:05+10m)
      (t("2024-01-01 10:12:00"), 1L, 4.0),
      (t("2024-01-01 11:00:00"), 1L, 8.0),
      (t("2024-01-01 10:30:00"), 2L, 16.0))
    try {
      input.addData(all.take(2))
      q.processAllAvailable()
      input.addData(all.drop(2))
      q.processAllAvailable()
      // sentinel advances the watermark past every session_end → all
      // real sessions close and emit; the sentinel's own stays open
      input.addData((t("2024-01-02 12:00:00"), 99L, 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_t").filter($"user_id" =!= 99L)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      def us(s: String) = t(s).getTime * 1000L
      assert(got == Set(
        (1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:22:00"), 3L, 7000L),
        (1L, us("2024-01-01 11:00:00"), us("2024-01-01 11:10:00"), 1L, 8000L),
        (2L, us("2024-01-01 10:30:00"), us("2024-01-01 10:40:00"), 1L, 16000L)))
      // the stream's closed sessions are exactly the batch run's output
      val batch = Streams.sessionWindowStats(
          all.toDF("ts", "user_id", "value"), "user_id", "ts", "value",
          gap = "10 minutes")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("native session_window equals the sessionize rollup on real events") {
    // two entirely different constructions — merging session windows
    // vs lag/running-sum numbering — must agree session-for-session
    // (end differs by the documented +gap)
    val gapUs = 86400000000L
    val viaWindow = SparkEntry.queries("session_window_stats")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val viaLag = SparkEntry.queries("sessionize")(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"start_us", ($"end_us" + gapUs).as("end_us"),
              $"n_events", $"total_value_milli")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(viaWindow == viaLag)
  }

  test("streaming postings extend: indexed scores track the growing corpus") {
    import graft.operators.Retrieval
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_postings")
    val ix = s"$dir/index"; val ckpt = s"$dir/ckpt"
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    Retrieval.buildPostingsIndex(base.filter($"doc_id" % 2 === 0),
      "doc_id", "text", ix)
    val rest = base.filter($"doc_id" % 2 =!= 0)
      .as[Streams.Doc].collect().toSeq
    val input = MemoryStream[Streams.Doc]
    val q = Streams.streamPostingsExtend(input.toDS(), ix, ckpt,
      compactEvery = Some(1))
    try {
      input.addData(rest.take(rest.size / 2))
      q.processAllAvailable()
      input.addData(rest.drop(rest.size / 2))
      q.processAllAvailable()
    } finally q.stop()
    val terms = Seq("window", "merge", "scan")
    val indexed = Retrieval.bm25AgainstIndex(spark, ix, terms)
      .as[(Long, Long)].collect().toSeq
    val inline = Retrieval.bm25(base, "doc_id", "text", terms)
      .as[(Long, Long)].collect().toSeq
    assert(indexed == inline,
      "after streaming in the rest, indexed must equal inline over the union")
    // compactEvery bounded the growth: one file per term_pt partition
    val ptDirs = new java.io.File(s"$ix/postings").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("term_pt="))
    assert(ptDirs.forall(_.listFiles.count(_.getName.endsWith(".parquet")) == 1))
  }

  test("streaming exact dedup: duplicates drop within and across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Doc]
    val q = Streams.streamDedupExact(input.toDS())
      .writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      // batch 1: intra-batch dup (1,2 same text; min id wins) + unique
      input.addData(Streams.Doc(2, "same  text"), Streams.Doc(1, "same text"),
                    Streams.Doc(3, "other"))
      q.processAllAvailable()
      // batch 2: cross-batch dup (4 repeats batch-1 text) + unique
      input.addData(Streams.Doc(4, "SAME TEXT"), Streams.Doc(5, "fresh"))
      q.processAllAvailable()
      val got = spark.table("dedup_t").as[Streams.Doc].collect().map(_.doc_id).toSet
      // normalization folds case/whitespace → 1 survives for "same text"
      assert(got == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("stable-file manifest join flags only size-stable files") {
    val prev = Seq(("a", 10L), ("b", 5L)).toDF("path", "size")
    val cur = Seq(("a", 10L), ("b", 9L), ("c", 4L)).toDF("path", "size")
    val stable = Streams.stableFiles(prev, cur).as[(String, Long)].collect().toSeq
    assert(stable == Seq(("a", 10L))) // b grew, c is new
  }

  // ------------------------------------------------------------- F sources

  private def writePublishFiles(): (String, Long) = {
    val dir = Files.createTempDirectory("graft_pub").toFile
    val corpus = MarcCorpus.publishRecords(Tables(spark, sf))
      .limit(30).select("mms_id", "leader", "fields").as[PublishRow].collect()
    val (aXml, bXml, cBin) = (corpus.take(10), corpus.slice(10, 20), corpus.drop(20))
    // plain .xml collection file
    val xml = "<collection>" + aXml.map(r => MarcXml.toXml(r.leader, r.fields)).mkString + "</collection>"
    Files.write(new java.io.File(dir, "pub_new_1.xml").toPath, xml.getBytes("UTF-8"))
    // tar.gz with one xml member
    val xml2 = "<collection>" + bXml.map(r => MarcXml.toXml(r.leader, r.fields)).mkString + "</collection>"
    val tgz = new java.io.File(dir, "pub_new_2.tar.gz")
    val tarOut = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
      new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(tgz)))
    val entry = new org.apache.commons.compress.archivers.tar.TarArchiveEntry("member.xml")
    val bytes = xml2.getBytes("UTF-8")
    entry.setSize(bytes.length)
    tarOut.putArchiveEntry(entry); tarOut.write(bytes); tarOut.closeArchiveEntry(); tarOut.close()
    // binary iso-2709 file
    val bin = cBin.flatMap(r => Iso2709.encode(r.leader, r.fields)).toArray
    Files.write(new java.io.File(dir, "pub_3.mrc").toPath, bin)
    (dir.getAbsolutePath, corpus.length.toLong)
  }

  test("publish files read back across xml / tar.gz / binary formats") {
    val (dir, n) = writePublishFiles()
    val recs = PublishFiles.readPublishFiles(spark, dir + "/*")
    assert(recs.count() == n)
    // mms ids survive every container format
    assert(recs.map(_.mms_id).filter(_ != null).distinct().count() == n)
  }

  test("streaming publish-file source decodes the same records") {
    val (dir, n) = writePublishFiles()
    val q = PublishFiles.streamPublishFiles(spark, dir, maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("pub_t").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("pub_t").count() == n)
    } finally q.stop()
  }

  test("streaming ingest: file stream → pipeline → store, per micro-batch") {
    val (dir, n) = writePublishFiles()
    val store = new graft.sources.DataSyncStore(spark,
      Files.createTempDirectory("graft_stream_store").toFile.getAbsolutePath)
    val locDim = {
      val t = Tables(spark, sf)
      t.nation.join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("id"), col("r_name").as("library_code"),
                col("n_name").as("code"))
    }
    val ckpt = Files.createTempDirectory("graft_ckpt").toFile.getAbsolutePath
    // one micro-batch covering all files: the per-batch pipeline is a
    // full ~15-table publish round, so triggering per-file makes a
    // slow spec without testing anything extra
    val q = Streams.ingestStream(
      PublishFiles.streamPublishFiles(spark, dir, maxFilesPerTrigger = 8),
      store, locDim, ckpt)
    try q.processAllAvailable() finally q.stop()
    assert(store.read("bib_brief").count() == n)
    assert(store.read("bib_marc_xml").count() == n)
    assert(store.read("holding_brief").count() > 0)
  }

  test("ordered streaming ingest: ordinals flow through micro-batches") {
    val (dir, n) = writePublishFiles()
    val store = new graft.sources.DataSyncStore(spark,
      Files.createTempDirectory("graft_stream_ord").toFile.getAbsolutePath)
    val locDim = {
      val t = Tables(spark, sf)
      t.nation.join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("id"), col("r_name").as("library_code"),
                col("n_name").as("code"))
    }
    val ckpt = Files.createTempDirectory("graft_ckpt_ord").toFile.getAbsolutePath
    val q = Streams.ingestFileStreamOrdered(spark, dir, store, locDim, ckpt)
    try q.processAllAvailable() finally q.stop()
    assert(store.read("bib_brief").count() == n)
    assert(store.read("item_base_status").count() > 0)
  }

  test("watermark: in-window late data aggregates, too-late data drops") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val out = Streams.windowedEventCounts(df, "ts", "event_type", "value")
    // append mode: a window emits once the watermark passes its end —
    // the mode that actually exercises late-data semantics
    val q = out.writeStream.format("memory").queryName("wm_t")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((t("2024-01-01 10:05:00"), "click", 1.0),
                    (t("2024-01-01 11:05:00"), "click", 2.0))
      q.processAllAvailable() // watermark → 09:05, nothing closed
      // 10:40 is LATE (before max event time) but within the 2h
      // watermark → must still count into the 10:00 window
      input.addData((t("2024-01-01 10:40:00"), "click", 4.0),
                    (t("2024-01-01 13:30:00"), "click", 0.0))
      q.processAllAvailable() // watermark → 11:30, closes 10:00 window
      // 10:50 is TOO LATE (10:00 window closed at watermark 11:30) →
      // dropped; 14:30 advances the watermark to 12:30, closing 11:00
      input.addData((t("2024-01-01 10:50:00"), "click", 8.0),
                    (t("2024-01-01 14:30:00"), "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("wm_t")
        .select(date_format($"window_start", "HH:mm").as("w"), $"n", $"total_value")
        .as[(String, Long, Double)].collect().toSet
      // 10:00 window: on-time 10:05 + late-but-in-watermark 10:40 (not
      // the dropped 10:50); 11:00 window: just the 11:05 event
      assert(got == Set(("10:00", 2L, 5.0), ("11:00", 1L, 2.0)))
    } finally q.stop()
  }

  test("publish-to-marc job: files in, bib/holding MARC + item JSONL out, round-trips") {
    val (dir, n) = writePublishFiles()
    val out = Files.createTempDirectory("graft_p2m").toFile.getAbsolutePath
    val res = graft.marc.PublishToMarc.run(spark, dir + "/*",
      s"$out/bib", s"$out/holding", s"$out/items")
    assert(res.bibs == n)
    assert(res.holdings > 0 && res.items > 0)
    // the .mrc parts decode back to exactly the published bib set
    val bibBytes = new java.io.File(s"$out/bib").listFiles()
      .filter(_.getName.endsWith(".mrc")).sortBy(_.getName)
      .flatMap(f => Files.readAllBytes(f.toPath))
    val decoded = Iso2709.decodeAll(bibBytes)
    assert(decoded.size == n)
    // item JSONL is valid JSON with the item pids
    val items = spark.read.json(s"$out/items")
    assert(items.count() == res.items)
    assert(items.select("item_data.pid").distinct().count() == res.items)

    // re-running into the same directories must clear prior contents:
    // a stale part from a wider previous run may not survive into the
    // new output that downstream tools concatenate
    val stale = new java.io.File(s"$out/bib/part-99999.mrc")
    Files.write(stale.toPath, "GARBAGE".getBytes)
    val res2 = graft.marc.PublishToMarc.run(spark, dir + "/*",
      s"$out/bib", s"$out/holding", s"$out/items")
    assert(res2.bibs == n)
    assert(!stale.exists(), "stale .mrc part survived an overwrite re-run")
    val rerunBytes = new java.io.File(s"$out/bib").listFiles()
      .filter(_.getName.endsWith(".mrc")).sortBy(_.getName)
      .flatMap(f => Files.readAllBytes(f.toPath))
    assert(Iso2709.decodeAll(rerunBytes).size == n)
    // no leftover attempt temp files either
    assert(new java.io.File(s"$out/bib").listFiles()
      .forall(f => !f.getName.endsWith(".tmp")))
  }

  test("streaming exact dedup runs on the RocksDB state store, with TTL wiring") {
    implicit val sqlCtx = spark.sqlContext
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
    val input = MemoryStream[Streams.Doc]
    // ttl enabled exercises the ProcessingTimeTimeout path end-to-end.
    // NOTE: with a timeout registered the engine keeps running empty
    // batches to evaluate expirations, so processAllAvailable never
    // settles — poll the sink to a deadline instead.
    val out = Streams.streamDedupExact(input.toDS(), ttl = Some("1 hour"))
    val q = out.writeStream.format("memory").queryName("rocks_dedup_t")
      .outputMode("append").start()
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 120e9.toLong
      while (spark.table("rocks_dedup_t").count() < n) {
        assert(System.nanoTime() < deadline, s"timed out waiting for $n rows")
        Thread.sleep(200)
      }
    }
    try {
      input.addData(Streams.Doc(1, "alpha beta"), Streams.Doc(2, "ALPHA  beta "))
      awaitRows(1)
      input.addData(Streams.Doc(3, "alpha beta"), Streams.Doc(4, "gamma"))
      awaitRows(2)
      Thread.sleep(1000) // a few more empty batches: no late duplicates
      val got = spark.table("rocks_dedup_t").as[Streams.Doc].collect().toSet
      assert(got == Set(Streams.Doc(1, "alpha beta"), Streams.Doc(4, "gamma")))
      // the state operator really is RocksDB-backed, not executor-heap
      val progress = q.recentProgress.map(_.json).mkString
      assert(progress.contains("rocksdb"), s"no rocksdb metrics in:\n$progress")
    } finally q.stop()
  }

  test("file batch grouping follows the reference prefix regex") {
    val files = Seq(
      "/in/setA_new_1.tar.gz", "/in/setA_new_2.tar.gz", "/in/setA_delete.tar.gz",
      "/in/setB_new_1.tar.gz").toDF("path")
    val out = PublishFiles.groupFileBatches(files, "path")
      .select("path", "file_prefix", "batch_ix")
      .as[(String, String, Long)].collect().sortBy(_._1).toSeq
    // sorted order: setA_delete, setA_new_1, setA_new_2, setB_new_1
    assert(out.map(_._2).distinct == Seq("/in/setA", "/in/setB"))
    assert(out.map(_._3) == Seq(0L, 0L, 0L, 1L))
  }

  test("utf-16 tsv import (the analytics feed encoding)") {
    val dir = Files.createTempDirectory("graft_tsv").toFile
    val content = "pid\tstatus\tflag\n231\tItem not in place\tActive\n232\tItem in place\tActive\n"
    Files.write(new java.io.File(dir, "report.tsv").toPath,
                content.getBytes("UTF-16"))
    val df = spark.read
      .option("sep", "\t").option("header", "true").option("encoding", "UTF-16")
      .csv(dir.getAbsolutePath)
    assert(df.count() == 2)
    assert(df.filter($"status" === "Item not in place").select("pid")
      .as[String].collect().toSeq == Seq("231"))
  }

  test("maxRecordsPerFile chunked write (split_jsonl semantics)") {
    val dir = Files.createTempDirectory("graft_chunk").toFile.getAbsolutePath + "/out"
    spark.range(250).selectExpr("id", "concat('doc', id) AS body")
      .coalesce(1).write.option("maxRecordsPerFile", 100).json(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".json"))
    assert(files.length == 3) // 100 + 100 + 50
    assert(spark.read.json(dir).count() == 250)
  }

  // ------------------------------------------------------------- E12

  test("multimodal featurize batches per partition and preserves rows") {
    val assets = Multimodal.assetsFromDocuments(
      spark.read.parquet(s"$sf/documents.parquet")).repartition(4)
    val out = Multimodal.featurize(assets, batchSize = 32)
    assert(out.count() == 500)
    assert(out.select("features").head().getSeq[Float](0).length == 8)
    // decode ran in real batches (not row-at-a-time; per-kind regroup
    // tails may be small) AND memory stayed bounded (never a whole
    // partition buffered: 500 rows / 4 partitions would exceed the
    // 32-row cap if toArray'd)
    val batchSizes = out.select("decoded_in_batch").distinct()
      .as[Int].collect()
    assert(batchSizes.max > 1, s"row-at-a-time decode: ${batchSizes.toSeq}")
    assert(batchSizes.forall(_ <= 32), s"batch exceeded cap: ${batchSizes.toSeq}")
    // deterministic: same payload → same features
    val f1 = out.orderBy("asset_id").select("features").head().getSeq[Float](0)
    val f2 = Multimodal.featurize(assets, batchSize = 32).orderBy("asset_id")
      .select("features").head().getSeq[Float](0)
    assert(f1 == f2)
  }

  test("frame-sample → featurize chaining; per-kind batch caps") {
    val assets = Multimodal.assetsFromDocuments(
      spark.read.parquet(s"$sf/documents.parquet")).repartition(4)
    val stride = 30
    val frames = Multimodal.featurizeSampledFrames(assets, stride, batchSize = 32)
    // every video asset contributes ceil(n_frames/stride) frame rows
    val expected = Multimodal.sampleFrames(assets, stride).count()
    assert(frames.count() == expected)
    assert(frames.filter($"decode_error".isNotNull).count() == 0)
    // distinct frames of one asset get distinct features (stub "seeks")
    val one = frames.filter($"asset_id" === frames.select("asset_id")
        .as[Long].head())
      .select("features").as[Seq[Float]].collect()
    if (one.length > 1) assert(one.distinct.length > 1)
    // per-kind sizing: video batches are 8× smaller for the same bound
    assert(Multimodal.batchSizeFor("video", 64) == 8)
    assert(Multimodal.batchSizeFor("audio", 64) == 16)
    assert(Multimodal.batchSizeFor("image", 64) == 64)
  }

  test("resize plan caps the longest side; frame sampling strides") {
    val assets = Multimodal.assetsFromDocuments(
      spark.read.parquet(s"$sf/documents.parquet"))
    val rs = Multimodal.resizePlan(assets, 256)
    assert(rs.filter($"target_width" > 256 || $"target_height" > 256).count() == 0)
    val frames = Multimodal.sampleFrames(assets, 30)
    assert(frames.count() > 0)
    assert(frames.filter($"frame_ix" % 30 =!= 0).count() == 0)
  }

  private def solidPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("REAL image decode: PNG bytes through ImageIO, exact channel means") {
    val png = solidPng(32, 16, 200, 100, 50)
    assert(Multimodal.isImagePayload(png))
    val feats = Multimodal.decodeImageFeatures(png)
    assert(feats(0) == 32f && feats(1) == 16f)
    assert(feats(2) == 200f && feats(3) == 100f && feats(4) == 50f)
    val luma = (0.299 * 200 + 0.587 * 100 + 0.114 * 50).toFloat
    assert(math.abs(feats(5) - luma) < 1e-3f)
    assert(feats(6) < 1e-3f)                  // solid color: ~zero variance
                                              // (fp dust from sl2/n − ml²)
    assert(feats(7) == 2f)                    // 32/16 aspect

    // through the featurize stage: image-kind rows with PNG payloads
    // take the REAL path (dims land in the features), text-byte
    // payloads still take the stub — and a CORRUPT png yields an error
    // ROW, never a failed task
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(1L, "image", png, null),
      Row(2L, "image", "not an image".getBytes("UTF-8"), null),
      Row(3L, "image", png.take(20), null)) // truncated: magic ok, body gone
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.AssetSchema)
    val out = Multimodal.featurize(assets, batchSize = 8)
      .orderBy("asset_id").collect()
    assert(out(0).getSeq[Float](out(0).fieldIndex("features")).take(2) ==
           Seq(32f, 16f))
    assert(out(0).isNullAt(out(0).fieldIndex("decode_error")))
    assert(!out(1).isNullAt(out(1).fieldIndex("features"))) // stub path
    assert(out(2).isNullAt(out(2).fieldIndex("features")))
    assert(!out(2).isNullAt(out(2).fieldIndex("decode_error")))
  }

  test("REAL image resize: bilinear PNG roundtrip hits the target box") {
    val png = solidPng(64, 32, 10, 20, 30)
    val resized = Multimodal.resizeImagePng(png, 8, 4)
    val feats = Multimodal.decodeImageFeatures(resized)
    assert(feats(0) == 8f && feats(1) == 4f)
    // solid color survives resampling exactly
    assert(feats(2) == 10f && feats(3) == 20f && feats(4) == 30f)
    intercept[java.io.IOException] {
      Multimodal.resizeImagePng("junk".getBytes("UTF-8"), 8, 4)
    }
  }

  /** Minimal 16-bit PCM mono WAV: 44-byte canonical header + samples. */
  private def pcmWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                    // PCM, mono
      .putInt(rate).putInt(rate * 2)              // byte rate
      .putShort(2).putShort(16)                   // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("REAL audio decode: WAV/PCM through javax.sound, exact integer stats") {
    // square wave ±1000: rms exactly 1000, peak 1000, a crossing at
    // every second transition (period 4: + + − −)
    val sq = Array.tabulate(8000)(i =>
      (if ((i / 2) % 2 == 0) 1000 else -1000).toShort)
    val wav = pcmWav(8000, sq)
    assert(Multimodal.isWavPayload(wav))
    val f = Multimodal.decodeWavFeatures(wav)
    assert(f(0) == 8000f && f(1) == 1f && f(2) == 16f) // rate, mono, bits
    assert(f(3) == 8000f)                              // frames
    assert(f(4) == 1000f)                              // exactly 1 s
    assert(f(5) == 1000000f)                           // rms milli = 1000.000
    assert(f(6) == 1000f)                              // peak
    // sign pattern + + − − …: a flip at every even index ≥ 2, i.e.
    // 3999 crossings over 7999 boundaries → permille 499 (integer div)
    assert(f(7) == (3999L * 1000L / 7999L).toFloat)

    // silence: rms and peak exactly zero
    val silent = Multimodal.decodeWavFeatures(
      pcmWav(16000, Array.fill(160)(0.toShort)))
    assert(silent(5) == 0f && silent(6) == 0f && silent(7) == 0f)

    // featurize routes audio-kind WAV payloads to the REAL path and a
    // truncated WAV to an error ROW; text bytes still take the stub
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(1L, "audio", wav, null),
      Row(2L, "audio", "not audio at all".getBytes("UTF-8"), null),
      Row(3L, "audio", wav.take(30), null))
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.AssetSchema)
    val out = Multimodal.featurize(assets, batchSize = 8)
      .orderBy("asset_id").collect()
    assert(out(0).getSeq[Float](out(0).fieldIndex("features"))(5) == 1000000f)
    assert(out(0).isNullAt(out(0).fieldIndex("decode_error")))
    assert(!out(1).isNullAt(out(1).fieldIndex("features"))) // stub path
    assert(out(2).isNullAt(out(2).fieldIndex("features")))
    assert(!out(2).isNullAt(out(2).fieldIndex("decode_error")))
  }

  private def gradientPng(w: Int, h: Int, invert: Boolean,
                          noise: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val base = (if (invert) (w - 1 - x) else x) * 255 / (w - 1)
        val v = math.max(0, math.min(255,
          base + (if (noise) (x + y) % 5 - 2 else 0)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("imageDHash + imageNearDup (E90): gradient reads all-ones, a " +
       "noisy re-encode lands within hamming 3, the inverted copy " +
       "does not; undecodable and too-small payloads become error rows") {
    // strictly increasing luma left->right: every gradient bit set
    val grad = gradientPng(90, 80, invert = false, noise = false)
    assert(Multimodal.imageDHash(grad) == -1L)
    val inv = gradientPng(90, 80, invert = true, noise = false)
    assert(Multimodal.imageDHash(inv) == 0L)
    val noisy = gradientPng(90, 80, invert = false, noise = true)
    assert(java.lang.Long.bitCount(
      Multimodal.imageDHash(grad) ^ Multimodal.imageDHash(noisy)) <= 3)
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(1L, "image", grad, null), Row(2L, "image", noisy, null),
      Row(3L, "image", inv, null),
      Row(4L, "image", "not an image".getBytes("UTF-8"), null),
      Row(5L, "image", solidPng(4, 4, 9, 9, 9), null)) // too small
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.AssetSchema)
    val (pairs, errors) = Multimodal.imageNearDup(assets, maxHamming = 3)
    assert(pairs.select("id_a", "id_b").as[(Long, Long)]
      .collect().toSet == Set((1L, 2L)))
    assert(errors.select("asset_id").as[Long].collect().toSet ==
      Set(4L, 5L))
  }

  test("syntheticDHashImage: dHash round-trips the pattern exactly for " +
       "arbitrary patterns and any lumaBase; flipped bits -> exact " +
       "hamming; re-lit copy hashes identically") {
    val pats = Seq(0L, -1L, 0x123456789ABCDEFL,
      Multimodal.scramble64(7L), Multimodal.scramble64(-3L))
    for (p <- pats; base <- Seq(0, 128, 246)) {
      assert(Multimodal.imageDHash(
        Multimodal.syntheticDHashImage(p, base)) == p,
        s"pattern $p base $base")
    }
    // k flipped bits = hamming exactly k; different luma, same pattern
    // = hamming 0 on a byte-distinct payload
    val p = Multimodal.scramble64(42L)
    val a = Multimodal.syntheticDHashImage(p, 128)
    val b = Multimodal.syntheticDHashImage(
      p ^ (1L << 5) ^ (1L << 21) ^ (1L << 47), 128)
    assert(java.lang.Long.bitCount(
      Multimodal.imageDHash(a) ^ Multimodal.imageDHash(b)) == 3)
    val relit = Multimodal.syntheticDHashImage(p, 168)
    assert(!java.util.Arrays.equals(a, relit))
    assert(Multimodal.imageDHash(relit) == Multimodal.imageDHash(a))
  }
}
