package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DataSyncStore

/** The parquet-backed datasync sink: ON CONFLICT semantics across
  * multiple publish rounds (database_insert.py shapes, minus the
  * PostgreSQL that this environment doesn't have).
  */
class DataSyncStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def newStore() = new DataSyncStore(spark,
    Files.createTempDirectory("graft_store").toFile.getAbsolutePath)

  test("upsert: first load seeds version 0, re-publish bumps changed keys") {
    val store = newStore()
    store.upsert("bib_brief", Seq((1L, "t1"), (2L, "t2")).toDF("mms_id", "title"),
                 Seq("mms_id"))
    assert(store.read("bib_brief").orderBy("mms_id")
      .as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "t1", 0L), (2L, "t2", 0L)))

    store.upsert("bib_brief", Seq((2L, "t2-v2"), (3L, "t3")).toDF("mms_id", "title"),
                 Seq("mms_id"))
    assert(store.read("bib_brief").orderBy("mms_id")
      .as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "t1", 0L), (2L, "t2-v2", 1L), (3L, "t3", 0L)))

    // third round: only key 2 again — version keeps climbing
    store.upsert("bib_brief", Seq((2L, "t2-v3")).toDF("mms_id", "title"),
                 Seq("mms_id"))
    assert(store.read("bib_brief").filter($"mms_id" === 2L)
      .as[(Long, String, Long)].head() == ((2L, "t2-v3", 2L)))
  }

  test("insertOnly never touches existing rows") {
    val store = newStore()
    store.insertOnly("ids", Seq((1L, "a")).toDF("id", "v"), Seq("id"))
    store.insertOnly("ids", Seq((1L, "CHANGED"), (2L, "b")).toDF("id", "v"), Seq("id"))
    assert(store.read("ids").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("deleteKeys removes exactly the keyed rows (orphan cleanup)") {
    val store = newStore()
    store.insertOnly("item", Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("pid", "v"),
                     Seq("pid"))
    store.deleteKeys("item", Seq(2L).toDF("pid"), Seq("pid"))
    assert(store.read("item").orderBy("pid").as[(Long, String)].collect().toSeq ==
      Seq((1L, "x"), (3L, "z")))
  }

  // ---- incremental (dirty-bucket) behavior ---------------------------

  /** (bucket dir name → sorted (file name, byte checksum) list). */
  private def bucketState(root: String, table: String): Map[String, Seq[(String, Long)]] = {
    val dir = new java.io.File(s"$root/$table")
    dir.listFiles().filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
      .map { b =>
        b.getName -> b.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
          .map(f => f.getName ->
            java.util.Arrays.hashCode(Files.readAllBytes(f.toPath)).toLong)
          .sortBy(_._1)
      }.toMap
  }

  test("incremental upsert rewrites only dirty buckets; untouched buckets byte-identical") {
    val root = Files.createTempDirectory("graft_store").toFile.getAbsolutePath
    val store = new DataSyncStore(spark, root, numBuckets = 8)
    store.upsert("bib_brief",
      (1L to 200L).map(i => (i, s"t$i")).toDF("mms_id", "title"), Seq("mms_id"))
    val before = bucketState(root, "bib_brief")
    assert(before.size > 4, s"200 keys should spread over >4 of 8 buckets, got ${before.size}")

    // second publish: 2 keys → at most 2 dirty buckets
    store.upsert("bib_brief", Seq((7L, "t7-v2"), (8L, "t8-v2")).toDF("mms_id", "title"),
                 Seq("mms_id"))
    val after = bucketState(root, "bib_brief")
    val changed = after.keySet.filter(k => before.get(k) != after.get(k))
    assert(changed.size <= 2, s"2 updated keys must dirty <=2 buckets, got $changed")
    assert((before.keySet -- changed).forall(k => before(k) == after(k)),
      "untouched buckets must be byte-identical")
    // and the merge is still correct
    assert(store.read("bib_brief").count() == 200)
    assert(store.read("bib_brief").filter($"version" === 1L).count() == 2)
    assert(store.read("bib_brief").filter($"mms_id" === 7L)
      .select("title").as[String].head() == "t7-v2")
  }

  test("deleteKeys prunes to dirty buckets and drops emptied bucket dirs") {
    val root = Files.createTempDirectory("graft_store").toFile.getAbsolutePath
    val store = new DataSyncStore(spark, root, numBuckets = 4)
    // one lonely key: deleting it must empty (and remove) its bucket dir
    store.insertOnly("item", Seq((42L, "x")).toDF("pid", "v"), Seq("pid"))
    val only = bucketState(root, "item").keySet
    assert(only.size == 1)
    store.insertOnly("item", (100L to 120L).map(i => (i, s"v$i")).toDF("pid", "v"),
                     Seq("pid"))
    store.deleteKeys("item",
      Seq(42L).toDF("pid").filter($"pid" === 42L), Seq("pid"))
    assert(store.read("item").filter($"pid" === 42L).count() == 0)
    assert(store.read("item").count() == 21)
  }

  test("retain keeps newest-N per key above the cutoff (history lifecycle)") {
    val store = newStore()
    store.insertOnly("record_update",
      Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
          (2L, 5L, "old"), (2L, 40L, "d")).toDF("record_id", "ts", "v"),
      Seq("record_id"))
    store.retain("record_update", Seq("record_id"), "ts",
      keepN = 2, cutoff = lit(10L))
    // record 1: ts=10 survives the cutoff but ranks 3rd → dropped;
    // record 2: ts=5 below cutoff → dropped even though within newest-2
    assert(store.read("record_update").orderBy("record_id", "ts")
      .select("record_id", "ts", "v").as[(Long, Long, String)]
      .collect().toSeq ==
      Seq((1L, 20L, "b"), (1L, 30L, "c"), (2L, 40L, "d")))
    // the store stays mutable after the maintenance rewrite
    store.insertOnly("record_update", Seq((3L, 50L, "e")).toDF("record_id", "ts", "v"),
      Seq("record_id"))
    assert(store.read("record_update").count() == 4)
  }

  test("compact rewrites each bucket to a single file, contents unchanged") {
    val root = Files.createTempDirectory("graft_store").toFile.getAbsolutePath
    val store = new DataSyncStore(spark, root, numBuckets = 4)
    // a deliberately fragmented write: many shuffle partitions → many
    // files per bucket dir
    store.insertOnly("item",
      (1L to 400L).map(i => (i, s"v$i")).toDF("pid", "v").repartition(16),
      Seq("pid"))
    val before = bucketState(root, "item")
    assert(before.values.exists(_.size > 1),
      s"fragmented write should leave multi-file buckets, got ${before.view.mapValues(_.size).toMap}")
    store.compact("item", Seq("pid"))
    val after = bucketState(root, "item")
    assert(after.values.forall(_.size == 1),
      s"every bucket must be one file after compact, got ${after.view.mapValues(_.size).toMap}")
    assert(store.read("item").orderBy("pid").as[(Long, String)].collect().toSeq ==
      (1L to 400L).map(i => (i, s"v$i")))
  }

  test("end-to-end: split corpus briefs land in the store and re-publish is idempotent") {
    val store = newStore()
    val bibs = SparkEntry.queries("bib_brief")(spark, "/root/testdata/sf0.001")
    store.upsert("bib_brief", bibs, Seq("mms_id"))
    val n = store.read("bib_brief").count()
    assert(n == bibs.count())
    // identical re-publish: every version bumps by 1, row count unchanged
    store.upsert("bib_brief", bibs, Seq("mms_id"))
    assert(store.read("bib_brief").count() == n)
    assert(store.read("bib_brief").filter($"version" =!= 1L).count() == 0)
  }
}
