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
