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

  test("observed counters match the materialized result") {
    val c = curated.count() // action → observation resolves
    val m = result.observation.get
    assert(m("kept_docs") == c)
    val tokens = curated.agg(sum("n_tokens")).as[Long].head()
    assert(m("kept_tokens") == tokens)
  }
}
