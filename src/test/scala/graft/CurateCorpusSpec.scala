package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CurateCorpus

/** End-to-end curation pipeline: audit completeness, drop semantics,
  * packing consistency, and the observed counters.
  */
class CurateCorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  // plant: an exact copy (dup family) and a junk doc (length filter)
  private def planted = docs
    .select(col("doc_id"), col("text"), col("source"))
    .unionByName(docs.filter(col("doc_id") === 3)
      .select((col("doc_id") + 9000000L).as("doc_id"), col("text"),
              col("source")))
    .unionByName(Seq((9900001L, "tiny", "src0")).toDF("doc_id", "text", "source"))

  private lazy val result =
    CurateCorpus.run(planted, "doc_id", "text", "source")
  private lazy val decisions = result.decisions.cache()
  private lazy val curated = result.curated.cache()

  test("every input document gets exactly one audited decision") {
    assert(decisions.count() == planted.count())
    assert(decisions.select("doc_id").distinct().count() == planted.count())
    // kept XOR drop_reason
    assert(decisions.filter(col("kept") && col("drop_reason").isNotNull)
      .count() == 0)
    assert(decisions.filter(!col("kept") && col("drop_reason").isNull)
      .count() == 0)
  }

  test("planted junk drops for length; exact copy loses to its canonical") {
    val junk = decisions.filter(col("doc_id") === 9900001L).head()
    assert(!junk.getAs[Boolean]("kept"))
    assert(junk.getAs[String]("drop_reason") == "length")
    // the copy of doc 3: doc 3 (min id) is canonical, the copy drops
    val copy = decisions.filter(col("doc_id") === 9000003L).head()
    assert(!copy.getAs[Boolean]("kept"))
    assert(Set("exact_dup", "near_dup")(copy.getAs[String]("drop_reason")))
    assert(decisions.filter(col("doc_id") === 3).head().getAs[Boolean]("kept"))
  }

  test("curated = kept decisions; packing offsets are consistent per shard") {
    val keptIds = decisions.filter(col("kept")).select("doc_id")
      .as[Long].collect().toSet
    val curIds = curated.select("doc_id").as[Long].collect().toSet
    assert(curIds == keptIds)
    // within a shard, walking docs in id order reproduces seq_id/offset
    val rows = curated.select("shard", "doc_id", "n_tokens", "seq_id",
        "seq_offset", "crosses_cut")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .groupBy(_._1)
    val ctx = 2048L
    rows.foreach { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._2).foreach { case (_, _, n, seqId, off, crosses) =>
        assert(seqId == cum / ctx)
        assert(off == cum % ctx)
        assert(crosses == (cum % ctx + n > ctx))
        cum += n
      }
    }
  }

  test("null-text and dirty docs still get audit rows; canonical death doesn't kill the family") {
    // doc 100 (min id) fails the length gate; doc 101 is its clean
    // near-dup prefix — with rule-survivor dedup, 101 must survive,
    // not drop as 100's cluster casualty (pre-fix, cluster canonical
    // min(100,101)=100 made 101 a near_dup drop). Null text audits too.
    val words = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee").split(" ")
    val long = words.take(25).mkString(" ")  // 25 tokens > maxTokens=20
    val short = words.take(18).mkString(" ") // shared prefix, 18 tokens
    val input = Seq(
      (100L, long, "s"), (101L, short, "s"),
      (103L, "a perfectly ordinary clean document of nine words", "s"))
      .toDF("doc_id", "text", "source")
      .unionByName(Seq((104L, null.asInstanceOf[String], "s"))
        .toDF("doc_id", "text", "source"))
    val r = CurateCorpus.run(input, "doc_id", "text", "source",
      CurateCorpus.Config(maxTokens = 20, jaccardThreshold = 0.5))
    val d = r.decisions.select("doc_id", "kept", "drop_reason")
      .as[(Long, Boolean, String)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(d.size == 4)
    assert(d(100L) == (false, "length"))
    assert(d(101L)._1, s"clean near-dup of a rule-failed doc must survive: ${d(101L)}")
    assert(d(103L)._1)
    assert(!d(104L)._1 && d(104L)._2 == "length") // null text audits as dropped
    r.release()
  }

  test("partial sample-rate table: unnamed strata default to keep-all, rate 0 drops") {
    val input = Seq(
      (1L, "a perfectly ordinary clean document of nine words", "named"),
      (2L, "another perfectly reasonable document with enough words here", "unnamed"),
      (3L, "a third acceptable document that still has enough tokens", "zeroed"))
      .toDF("doc_id", "text", "source")
    val r = CurateCorpus.run(input, "doc_id", "text", "source",
      CurateCorpus.Config(sampleRates = Map("named" -> 1000, "zeroed" -> 0)))
    val d = r.decisions.select("doc_id", "kept", "drop_reason")
      .as[(Long, Boolean, String)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(d(1L)._1, s"named stratum at 1000‰ must keep: ${d(1L)}")
    assert(d(2L)._1, s"stratum MISSING from the rate table must keep-all: ${d(2L)}")
    assert(d(3L) == (false, "sampled_out"), s"explicit 0‰ must drop: ${d(3L)}")
    r.release()
  }

  test("observed counters match the materialized result") {
    val c = curated.count() // action → observation resolves
    val m = result.observation.get
    assert(m("kept_docs") == c)
    val tokens = curated.agg(sum("n_tokens")).as[Long].head()
    assert(m("kept_tokens") == tokens)
  }
}
