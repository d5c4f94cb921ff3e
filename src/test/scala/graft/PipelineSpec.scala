package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.marc.MarcCorpus
import graft.marc.PublishSplit.PublishRow
import graft.sources.{DataSyncStore, Tables}

/** End-to-end: publish corpus → AlmaPipeline → datasync store, across
  * full-publish, re-publish, partial-publish (orphans) and delete-file
  * rounds — the reference's whole operational cycle.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def corpus() = {
    MarcCorpus.publishRecords(Tables(spark, sf))
      .filter(regexp_extract(col("mms_id"), "^99(\\d+)8651$", 1)
        .cast("long") % 50 === 0) // small slice
      .select("mms_id", "leader", "fields").as[PublishRow]
  }

  private def locationDim() = {
    val t = Tables(spark, sf)
    t.nation.join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("id"), col("r_name").as("library_code"),
              col("n_name").as("code"))
  }

  test("full cycle: ingest, re-publish, partial publish, delete file") {
    val store = new DataSyncStore(spark,
      Files.createTempDirectory("graft_pipe").toFile.getAbsolutePath)
    val recs = corpus().persist()
    val n = recs.count()
    assert(n > 5)

    // round 1: fresh ingest
    val c1 = AlmaPipeline.ingestPublish(recs, store, locationDim())
    assert(c1.bibs == n && c1.errors == 0)
    assert(store.read("bib_brief").count() == n)
    assert(store.read("bib_brief").filter($"version" =!= 0L).count() == 0)
    val nHoldings = store.read("holding_brief").count()
    val nItems = store.read("item").count()
    assert(nHoldings == c1.holdings && nItems == c1.items)
    // briefs carry real extractions + resolved locations
    assert(store.read("bib_brief").filter($"title".isNull).count() == 0)
    assert(store.read("holding_brief").filter($"location_id".isNull).count() == 0)
    assert(store.read("item").filter($"perm_location_id".isNull).count() == 0)
    assert(store.read("external_id").count() >= n * 3 - 3) // oclc+issn+isbn per bib
    assert(store.read("bib_marc_xml").count() == n)
    assert(store.read("bib_marc").count() == n)
    assert(store.read("holding_marc").count() == nHoldings)

    // round 2: identical re-publish → versions bump, counts stable
    AlmaPipeline.ingestPublish(recs, store, locationDim())
    assert(store.read("bib_brief").count() == n)
    assert(store.read("bib_brief").filter($"version" =!= 1L).count() == 0)
    assert(store.read("holding_brief").count() == nHoldings)
    assert(store.read("item").count() == nItems)

    // round 3: simulate a publish where one bib arrives without one of its
    // holdings: take a bib with >=2 holdings and drop its last 852+ITM
    val multi = recs.collect().find(r => r.fields.count(_.tag == "852") >= 2)
    assume(multi.isDefined)
    val victim = multi.get
    val dropHid = victim.fields.filter(_.tag == "852")
      .flatMap(f => graft.marc.PublishSplit.holdingIdSubfield(f)).last.value
    val shrunk = victim.copy(fields = victim.fields.filterNot { x =>
      graft.marc.PublishSplit.holdingIdSubfield(x).exists(_.value == dropHid) ||
      graft.marc.PublishSplit.holdingIdSubfield(x, "0").exists(_.value == dropHid)
    })
    // also drop the orphaned holding's control group — the LAST
    // [009 … 009] span (group order == 852 order)
    val nine = shrunk.fields.zipWithIndex.filter(_._1.tag == "009").map(_._2)
    val (gStart, gEnd) = (nine(nine.size - 2), nine.last)
    val shrunk2 = shrunk.copy(fields = shrunk.fields.zipWithIndex.collect {
      case (fld, ix) if ix < gStart || ix > gEnd => fld
    })
    AlmaPipeline.ingestPublish(Seq(shrunk2).toDS(), store, locationDim())
    assert(store.read("holding_brief").filter($"holding_id" === dropHid).count() == 0,
      "orphaned holding survived")
    assert(store.read("holding_brief").count() == nHoldings - 1)

    // round 4: delete file removes a bib and appends history
    val target = recs.map(_.mms_id).head()
    AlmaPipeline.processDeletes(recs.filter(_.mms_id == target), store)
    assert(store.read("bib_brief").filter($"mms_id" === target).count() == 0)
    assert(store.read("deleted_record")
      .filter($"record_type" === "bib" && $"record_id" === target).count() == 1)
    recs.unpersist()
  }
}
