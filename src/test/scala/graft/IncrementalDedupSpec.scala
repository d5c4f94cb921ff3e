package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Persisted band index + incremental dedup: result equivalence with
  * the batch path, planted-duplicate recovery, and the
  * broadcast-new-side plan shape.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def ix(tag: String) =
    new java.io.File(s"target/graft_indexes/spec_$tag").getAbsolutePath

  private def oldDocs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))
  private def newDocs = oldDocs.filter(col("doc_id") % 7 === 0)
    .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" appended")).as("text"))
    .unionByName(oldDocs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))

  test("index path ≡ batch minhashPairs restricted to old×new pairs") {
    val dir = ix("equiv")
    Dedup.buildDedupIndex(oldDocs, "doc_id", "text", dir)
    val incremental = Dedup.dedupAgainstIndex(newDocs, dir, "doc_id", "text")
      .select("new_id", "dup_of", "jaccard")
      .as[(Long, Long, Double)].collect().toSet

    // batch path over the union; new ids are all > 1e6 so cross pairs
    // are exactly (left=old, right=new)
    val batch = Dedup.minhashPairs(oldDocs.unionByName(newDocs),
        "doc_id", "text")
      .filter(col("left_id") < 1000000L && col("right_id") >= 1000000L)
      .select(col("right_id"), col("left_id"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet

    assert(incremental == batch)
    assert(incremental.nonEmpty)
  }

  test("every planted exact copy resolves to its source at jaccard 1.0") {
    val dir = ix("planted")
    Dedup.buildDedupIndex(oldDocs, "doc_id", "text", dir)
    val got = Dedup.dedupAgainstIndex(newDocs, dir, "doc_id", "text")
      .filter(col("new_id") >= 2000000L)
      .select("new_id", "dup_of", "jaccard")
      .as[(Long, Long, Double)].collect()
    val exactIds = oldDocs.filter(col("doc_id") % 11 === 0)
      .select("doc_id").as[Long].collect().toSet
    // each exact copy finds its own source (it may also match other
    // near-identical docs; the self pair must be there at 1.0)
    val selfPairs = got.filter { case (n, o, _) => n == o + 2000000L }
    assert(selfPairs.map(_._2).toSet == exactIds)
    assert(selfPairs.forall(_._3 == 1.0))
  }

  test("extendDedupIndex: extended index ≡ fresh build over history ∪ batch") {
    val half = oldDocs.filter(col("doc_id") % 2 === 0)
    val rest = oldDocs.filter(col("doc_id") % 2 =!= 0)
    val ext = ix("extend")
    Dedup.buildDedupIndex(half, "doc_id", "text", ext)
    Dedup.extendDedupIndex(rest, "doc_id", "text", ext)
    val fresh = ix("fresh")
    Dedup.buildDedupIndex(oldDocs, "doc_id", "text", fresh)
    def q(dir: String) = Dedup.dedupAgainstIndex(newDocs, dir, "doc_id", "text")
      .select("new_id", "dup_of", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val (a, b) = (q(ext), q(fresh))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("streaming twin: decisions append per batch, admitted survivors catch later copies") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streams
    implicit val sq = spark.sqlContext

    val base = java.nio.file.Files.createTempDirectory("graft_sdi").toString
    val (ixDir, decDir, ckDir) = (s"$base/ix", s"$base/dec", s"$base/ck")
    Dedup.buildDedupIndex(oldDocs, "doc_id", "text", ixDir)

    val input = MemoryStream[Streams.Doc]
    val q = Streams.streamDedupIncremental(input.toDS(), ixDir, decDir, ckDir)
    try {
      // batch 1: one exact copy of history doc 0, one genuinely new doc
      val copied = oldDocs.filter(col("doc_id") === 0)
        .select(col("text")).as[String].head()
      input.addData(Streams.Doc(5000001L, copied),
                    Streams.Doc(5000002L, "a genuinely novel document xyzzy"))
      q.processAllAvailable()
      // batch 2: an exact copy of batch 1's SURVIVOR — only the
      // extended index can catch it
      input.addData(Streams.Doc(5000003L, "a genuinely novel document xyzzy"))
      q.processAllAvailable()
    } finally q.stop()

    val dec = spark.read.parquet(decDir)
      .dropDuplicates("new_id", "dup_of")
      .select("new_id", "dup_of", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(dec.contains((5000001L, 0L, 1.0)), dec.mkString(", "))
    assert(dec.contains((5000003L, 5000002L, 1.0)), dec.mkString(", "))
    // the batch-1 novel doc matched nothing
    assert(!dec.exists(_._1 == 5000002L))
  }

  test("replayed batch (already admitted to the index) emits no self-duplicates") {
    val dir = ix("replay")
    Dedup.buildDedupIndex(oldDocs, "doc_id", "text", dir)
    val novel = Seq((7000001L, "an entirely original replay test document"))
      .toDF("doc_id", "text")
    // first run: novel doc survives and is admitted
    assert(Dedup.dedupAgainstIndex(novel, dir, "doc_id", "text").isEmpty)
    Dedup.extendDedupIndex(novel, "doc_id", "text", dir)
    // replay: the doc now exists in the index — it must NOT be reported
    // as a duplicate of itself
    val replay = Dedup.dedupAgainstIndex(novel, dir, "doc_id", "text")
      .select("new_id", "dup_of").as[(Long, Long)].collect()
    assert(replay.isEmpty, replay.mkString(", "))
  }

  test("the new batch broadcasts against the index scan (no index shuffle join)") {
    val dir = ix("plan")
    Dedup.buildDedupIndex(oldDocs, "doc_id", "text", dir)
    val plan = Dedup.dedupAgainstIndex(newDocs, dir, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"index side must not shuffle for the candidate join:\n$plan")
  }
}
