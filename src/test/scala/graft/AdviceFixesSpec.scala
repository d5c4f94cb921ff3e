package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.marc.{Extract, Iso2709, ItemTemplate, MarcCorpus, PublishSplit}
import graft.marc.PublishSplit.PublishRow
import graft.model.{MarcField, MarcSubfield}
import graft.operators.Upsert
import graft.sources.{DataSyncStore, Tables}

/** Reference-fidelity fixes: deterministic intra-batch dedup, full
  * external-id lists with scoped deletes, malformed-record resilience,
  * ensure_ascii JSON escaping, guarded status upserts.
  */
class AdviceFixesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fld(tag: String, subs: (String, String)*) =
    MarcField.data(tag, " ", " ", subs.map { case (c, v) => MarcSubfield(c, v) })

  // ---------------------------------------------- multi-value extractors

  private val idFields = Seq(
    MarcField.control("001", "991008651"),
    fld("020", "a" -> "0-123", "a" -> "978-0-123-45678-9"),
    fld("020", "a" -> "0-456"), // not first qualifying 020 → ignored
    fld("022", "a" -> "1111-2222", "a" -> "3333-4444"),
    fld("035", "a" -> "(OCoLC)111"),
    fld("035", "a" -> "(OCoLC)222", "z" -> "bad"), // $z → skipped
    fld("079", "a" -> "ocm333"),
    fld("035", "a" -> "(CtY)1-yaledb-Voyager")) // not oclc-ish → skipped

  test("isbns: all $a of first qualifying 020, >=13-char value first") {
    val df = Seq(1).toDF("x").withColumn("fields",
      typedlit(idFields.map(f => (f.tag, f.ind1, f.ind2, f.data,
        f.subfields.map(s => (s.code, s.value))))).cast(
        "array<struct<tag:string,ind1:string,ind2:string,data:string," +
        "subfields:array<struct<code:string,value:string>>>>"))
    val out = df.select(
      Extract.isbns(col("fields")).as("isbns"),
      Extract.issns(col("fields")).as("issns"),
      Extract.oclcs(col("fields")).as("oclcs")).head()
    assert(out.getSeq[String](0) == Seq("978-0-123-45678-9", "0-123"))
    assert(out.getSeq[String](1) == Seq("1111-2222", "3333-4444"))
    assert(out.getSeq[String](2) == Seq("(OCoLC)111", "ocm333"))
  }

  // ---------------------------------------------- iso2709 resilience

  test("decodeAll skips a corrupt chunk and keeps later records") {
    val r1 = Iso2709.encode("00000cam a2200000 a 4500",
      Seq(MarcField.control("001", "99A8651"), fld("245", "a" -> "one")))
    val r2 = Iso2709.encode("00000cam a2200000 a 4500",
      Seq(MarcField.control("001", "99B8651"), fld("245", "a" -> "two")))
    val garbage = "XXXXX-not-marc".getBytes("UTF-8")
    val out = Iso2709.decodeAll(garbage ++ r1 ++ garbage ++ r2)
    assert(out.map(_.mms_id) == Seq("99A8651", "99B8651"))
    // truncated record at the tail: earlier records survive
    val out2 = Iso2709.decodeAll(r1 ++ r2.take(r2.length / 2))
    assert(out2.map(_.mms_id).headOption.contains("99A8651"))
  }

  // ---------------------------------------------- ensure_ascii escaping

  test("jsonEscape matches json.dumps ensure_ascii=True for non-ASCII") {
    assert(ItemTemplate.jsonEscape("café") == "caf\\u00e9")
    assert(ItemTemplate.jsonEscape("日本") == "\\u65e5\\u672c")
    // astral char → surrogate pair, like json.dumps
    assert(ItemTemplate.jsonEscape(new String(Character.toChars(0x1F600))) ==
      "\\ud83d\\ude00")
    assert(ItemTemplate.jsonEscape("plain ~ text") == "plain ~ text")
  }

  // ---------------------------------------------- guarded merge

  test("mergeGuarded: only strictly-newer updates win") {
    val base = Seq((1L, "old", 10L, 0L), (2L, "keep", 20L, 0L))
      .toDF("pid", "status_code", "update_date_time", "version")
    val updates = Seq((1L, "new", 11L), (2L, "stale", 19L), (3L, "ins", 5L))
      .toDF("pid", "status_code", "update_date_time")
    val out = Upsert.mergeGuarded(base, updates, Seq("pid"), "update_date_time")
      .orderBy("pid").as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "new", 11L, 1L),   // newer → replaced, version bumped
      (2L, "keep", 20L, 0L),  // stale → untouched
      (3L, "ins", 5L, 0L)))   // fresh key → inserted at version 0
  }

  test("mergeGuarded: null guards follow SQL `stored < new` semantics (JDBC-sink parity)") {
    // PostgreSQL's `where stored < ?` is UNKNOWN when either side is
    // null → no update. The parquet store must behave identically so
    // item_base_status doesn't diverge between the two sinks.
    val base = Seq((1L, "a", Option(10L), 0L), (2L, "b", Option.empty[Long], 0L),
                   (3L, "c", Option.empty[Long], 0L))
      .toDF("pid", "status_code", "update_date_time", "version")
    val updates = Seq((1L, "A", Option.empty[Long]), // null update guard → loses
                      (2L, "B", Option(5L)),         // null STORED guard → loses
                      (3L, "C", Option.empty[Long])) // null both → loses
      .toDF("pid", "status_code", "update_date_time")
    val out = Upsert.mergeGuarded(base, updates, Seq("pid"), "update_date_time")
      .orderBy("pid").select("pid", "status_code", "version")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L)))
  }

  // ---------------------------------------------- ordinal determinism

  test("ordered ingest: first-in-file-order record wins for duplicate keys") {
    val rec1 = PublishRow("9918651", "00000cam a2200000 a 4500", Seq(
      MarcField.control("001", "9918651"), fld("245", "a" -> "FIRST")))
    val rec2 = rec1.copy(fields = Seq(
      MarcField.control("001", "9918651"), fld("245", "a" -> "SECOND")))
    // same mms_id twice; ordinal says rec1 came first in sorted files
    val records = Seq(("b.xml#000000001", rec2), ("a.xml#000000000", rec1))
      .toDF("ordinal", "r")
      .select(col("r")("mms_id").as("mms_id"), col("r")("leader").as("leader"),
              col("r")("fields").as("fields"), col("ordinal"))
    val store = new DataSyncStore(spark,
      Files.createTempDirectory("graft_ord").toFile.getAbsolutePath, 4)
    val emptyDim = Seq.empty[(Long, String, String)]
      .toDF("id", "library_code", "code")
    val captured = collection.mutable.ArrayBuffer.empty[graft.operators.RunMetrics.MetricDatum]
    val sink = new graft.operators.RunMetrics.MetricsSink {
      def send(data: Seq[graft.operators.RunMetrics.MetricDatum]): Unit =
        captured.synchronized { captured ++= data }
    }
    AlmaPipeline.ingestPublishOrdered(records, store, emptyDim, sink)
    val titles = store.read("bib_brief").select("title").as[String].collect()
    assert(titles.toSeq == Seq("FIRST"))
    // metrics emitted through the pluggable sink (aws_metrics.py shape)
    val byName = captured.map(d => d.name -> d.value).toMap
    assert(captured.forall(_.namespace == "datasync"))
    assert(byName("records") == 2.0 && byName("bibs") == 2.0)
  }

  // ---------------------------------------------- scoped external-id refresh

  test("external-id refresh: all values inserted, vanished types retained") {
    val store = new DataSyncStore(spark,
      Files.createTempDirectory("graft_ext").toFile.getAbsolutePath, 4)
    val emptyDim = Seq.empty[(Long, String, String)]
      .toDF("id", "library_code", "code")
    def rec(fields: Seq[MarcField]) =
      PublishRow("9918651", "00000cam a2200000 a 4500",
        MarcField.control("001", "9918651") +: fields)
    // round 1: two OCLCs and one ISSN
    AlmaPipeline.ingestPublish(Seq(rec(Seq(
      fld("035", "a" -> "(OCoLC)111"), fld("079", "a" -> "ocm333"),
      fld("022", "a" -> "1111-2222")))).toDS(), store, emptyDim)
    val r1 = store.read("external_id")
      .select("external_id_type", "external_value").as[(String, String)]
      .collect().toSet
    assert(r1 == Set(("oclc", "ocm111"), ("oclc", "ocm333"),
                     ("issn", "1111-2222")))
    // round 2: the record now has only an ISSN (different value): the
    // oclc rows are RETAINED (type not republished), issn rows replaced
    AlmaPipeline.ingestPublish(Seq(rec(Seq(
      fld("022", "a" -> "9999-8888")))).toDS(), store, emptyDim)
    val r2 = store.read("external_id")
      .select("external_id_type", "external_value").as[(String, String)]
      .collect().toSet
    assert(r2 == Set(("oclc", "ocm111"), ("oclc", "ocm333"),
                     ("issn", "9999-8888")))
  }
}
